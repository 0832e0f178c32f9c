"""Reference query-corpus parity (SURVEY.md §5).

The reference's test suites are Q-A* (single-table selection/projection/
spatial-function queries over GML/KML point+polygon tables), Q-B* (two-
table joins incl. spatial joins), Q-C* (aggregation/group-by), and
Q-1*..Q-3* (GeoJSON document suites). The exact SQL text lives in an
untracked module (reference: test/testmanual/testing.ts:6), so these
tests reconstruct each suite's *shape* from the operator inventory and
run it end-to-end: XML/GeoJSON documents on disk → engine table
registration → ``engine.sql(<SQL with st_* functions>)`` → exact
hand-computed results. This is the "switch engines, keep your queries"
guarantee.

Layout of the synthetic world (exact arithmetic, hand-checkable):
- 5 provinces: axis-aligned boxes [10i, 0] .. [10i+10, 10], named P0..P4
- 30 mosques: mosque j at (10*(j%5) + 5 + j*0.01, 5.0) → inside province
  j%5; kapasitas 50+10j
- 8 hospitals (GeoJSON Features): hospital k at (k*3.0, 2.0), beds 100+k
"""

from __future__ import annotations

import json

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.engine import create_engine

N_MASJID = 30
N_RS = 8


def _masjid_gml() -> str:
    members = []
    for j in range(N_MASJID):
        x = 10 * (j % 5) + 5 + j * 0.01
        members.append(
            f"""  <gml:featureMember>
    <masjid>
      <nama>Masjid {j:02d}</nama>
      <kapasitas>{50 + 10 * j}</kapasitas>
      <gml:Point><gml:coordinates>{x},5.0</gml:coordinates></gml:Point>
    </masjid>
  </gml:featureMember>"""
        )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml">\n'
        + "\n".join(members)
        + "\n</gml:FeatureCollection>\n"
    )


def _provinces_kml() -> str:
    marks = []
    for i in range(5):
        x0, x1 = 10 * i, 10 * i + 10
        ring = f"{x0},0 {x1},0 {x1},10 {x0},10 {x0},0"
        marks.append(
            f"""    <Placemark>
      <name>P{i}</name>
      <populasi>{1000 * (i + 1)}</populasi>
      <Polygon><outerBoundaryIs><LinearRing>
        <coordinates>{ring}</coordinates>
      </LinearRing></outerBoundaryIs></Polygon>
    </Placemark>"""
        )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<kml xmlns="http://www.opengis.net/kml/2.2">\n  <Document>\n'
        + "\n".join(marks)
        + "\n  </Document>\n</kml>\n"
    )


def _hospitals_geojson() -> str:
    feats = [
        {
            "type": "Feature",
            "properties": {"nama": f"RS {k}", "beds": 100 + k},
            "geometry": {"type": "Point", "coordinates": [k * 3.0, 2.0]},
        }
        for k in range(N_RS)
    ]
    return json.dumps({"type": "FeatureCollection", "features": feats})


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("refworld")
    gml = d / "gml"
    kml = d / "kml"
    gml.mkdir()
    kml.mkdir()
    (gml / "masjid.xml").write_text(_masjid_gml())
    (kml / "provinces.kml").write_text(_provinces_kml())
    (d / "rs.json").write_text(_hospitals_geojson())
    eng = create_engine(spark)
    eng.register_xml("masjid", str(gml))
    eng.register_xml("provinces", str(kml))
    eng.register_geojson("rs", str(d / "rs.json"))
    return eng


# -- Q-A*: single-table selection / projection / spatial functions --------


def test_qa1_spatial_within_select(engine):
    """Q-A1 shape: WHERE ST_Within(geom, <polygon literal>) — mosques in
    province 0's box (6 of 30, matching the reference's 6-row Q-A1)."""
    rows = engine.sql_rows(
        """
        SELECT nama FROM masjid
        WHERE st_within(geometry, 'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))') = true
        ORDER BY nama
        """
    )
    assert [r["nama"] for r in rows] == [f"Masjid {j:02d}" for j in (0, 5, 10, 15, 20, 25)]


def test_qa2_distance_filter(engine):
    """Q-A2 shape: ST_Distance(geom, point) < r selection."""
    rows = engine.sql_rows(
        """
        SELECT nama, st_distance(geometry, st_point(5.0, 5.0)) AS d
        FROM masjid WHERE st_distance(geometry, st_point(5.0, 5.0)) < 1.0
        ORDER BY d
        """
    )
    # mosques j%5==0 sit at x = 5 + 0.01j: within 1.0 of (5,5) → j in {0,5,...} with 0.01j<1
    assert [r["nama"] for r in rows] == [f"Masjid {j:02d}" for j in (0, 5, 10, 15, 20, 25)]
    assert rows[1]["d"] == pytest.approx(0.05)


def test_qa3_attribute_filter_projection(engine):
    """Q-A3 shape: plain attribute predicate + ST_AsText projection."""
    rows = engine.sql_rows(
        "SELECT nama, st_astext(geometry) AS wkt FROM masjid WHERE kapasitas >= 300 ORDER BY nama"
    )
    assert len(rows) == [50 + 10 * j >= 300 for j in range(N_MASJID)].count(True)
    assert rows[0]["wkt"].startswith("POINT (")


def test_qa5_kml_geometrytype(engine):
    """Q-A5 shape (KML suite): ST_GeometryType / ST_Area over placemarks."""
    rows = engine.sql_rows(
        """
        SELECT name, st_geometrytype(geometry) AS gt, st_area(geometry) AS a
        FROM provinces ORDER BY name
        """
    )
    assert len(rows) == 5
    assert all(r["gt"] == "ST_Polygon" for r in rows)
    assert all(r["a"] == 100.0 for r in rows)


# -- Q-B*: two-table joins -------------------------------------------------


def test_qb1_spatial_join(engine):
    """Q-B1 shape: masjid × provinces spatial join (point-in-polygon)."""
    rows = engine.sql_rows(
        """
        SELECT p.name AS prov, count(*) AS n
        FROM masjid m JOIN provinces p
          ON st_within(m.geometry, p.geometry) = true
        GROUP BY p.name ORDER BY p.name
        """
    )
    assert [(r["prov"], r["n"]) for r in rows] == [(f"P{i}", 6) for i in range(5)]


def test_qb2_theta_join(engine):
    """Q-B2 shape: attribute theta-join across document tables."""
    rows = engine.sql_rows(
        """
        SELECT m.nama, r.nama AS rs_nama
        FROM masjid m JOIN rs r ON m.kapasitas < r.beds
        WHERE m.kapasitas = 100 ORDER BY r.nama
        """
    )
    # kapasitas 100 (j=5) < beds 100+k → all k with beds>100 → k=1..7
    assert len(rows) == 7


# -- Q-C*: aggregation / group-by ------------------------------------------


def test_qc1_groupby_count(engine):
    """Q-C1 shape: COUNT + GROUP BY (the reference's only pushable
    aggregate, SURVEY.md §2.4 A1/A2)."""
    rows = engine.sql_rows(
        """
        SELECT CAST(kapasitas / 100 AS INT) AS band, count(nama) AS n
        FROM masjid GROUP BY CAST(kapasitas / 100 AS INT) ORDER BY band
        """
    )
    assert sum(r["n"] for r in rows) == N_MASJID


def test_qc2_join_aggregate(engine):
    """Q-C2/Q-D5 shape: join + aggregate (the 204s reference query —
    BASELINE.md kinerja Q-D5)."""
    rows = engine.sql_rows(
        """
        SELECT p.name AS prov, sum(m.kapasitas) AS total_kap
        FROM masjid m JOIN provinces p ON st_within(m.geometry, p.geometry) = true
        GROUP BY p.name ORDER BY prov
        """
    )
    expected = {}
    for j in range(N_MASJID):
        expected.setdefault(f"P{j % 5}", 0)
        expected[f"P{j % 5}"] += 50 + 10 * j
    assert {r["prov"]: r["total_kap"] for r in rows} == expected


# -- Q-1*: GeoJSON document suite ------------------------------------------


def test_q1_geojson_near(engine):
    """Q-1 shape: Mongo $near analog — st_dwithin over GeoJSON docs."""
    rows = engine.sql_rows(
        """
        SELECT nama FROM rs
        WHERE st_dwithin(geometry, st_point(0.0, 2.0), 7.0) = true
        ORDER BY nama
        """
    )
    assert [r["nama"] for r in rows] == ["RS 0", "RS 1", "RS 2"]


def test_q1d_feature_collection_output(engine):
    """Q-1D shape + S10 sink: full fetch returned as a GeoJSON
    FeatureCollection (reference: convertRestoGeoJSON, src/index.ts:360-363)."""
    fc = engine.sql_geojson("SELECT nama, beds, geometry FROM rs")
    assert fc["type"] == "FeatureCollection"
    assert len(fc["features"]) == N_RS
    f0 = min(fc["features"], key=lambda f: f["properties"]["nama"])
    assert f0["geometry"] == {"type": "Point", "coordinates": [0, 2]}
    assert f0["properties"]["beds"] == 100


def test_process_query_auto_geojson(engine):
    """processQuery parity: an st_asgeojson projection triggers automatic
    FeatureCollection wrapping, like the reference's convertRestoGeoJSON
    (src/index.ts:360-363); without it only rows come back."""
    res = engine.process_query(
        "SELECT nama, beds, st_asgeojson(geometry) AS st_asgeojson FROM rs WHERE beds <= 102"
    )
    assert res["totalData"] == 3
    assert "geojson" in res
    fc = res["geojson"]
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) == 3
    f = min(fc["features"], key=lambda f: f["properties"]["nama"])
    assert f["geometry"] == {"type": "Point", "coordinates": [0, 2]}
    assert f["properties"] == {"nama": "RS 0", "beds": 100}

    plain = engine.process_query("SELECT nama FROM rs")
    assert "geojson" not in plain and plain["totalData"] == N_RS
    assert plain["fields"] == ["nama"]
