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
- 60 roads ("j", the reference's second GeoJSON collection): road m is a
  vertical LineString inside province m%5 unless m%10==9, in which case
  it is horizontal spanning x -2..52 (so it *crosses* every province);
  kelas m%4, lebar 4+m%6
- kinerja world (Q-D*): 20 districts ("kecamatan_dummy" analog, 5×4
  grid of 10×10 boxes, tipe k%4) and 600 health-center points
  ("puskesmas_dummy" analog, point p interior to district p%20, jenis
  p%3) — constructed so Q-D2's selective filter returns exactly 4 rows
  and Q-D5's aggregate exactly 4 groups, the counts the reference
  recorded (basex97kinerja1.json).

Coverage note (VERDICT r4 item 4): the reference's exact SQL strings
live in an untracked module (test/testmanual/testing.ts:6 requires
./testcasexml, absent from the repo), so the *shape* of each published
query ID is reconstructed from the suite structure and the recorded
per-table field counts; expected results are computed from the fixture
generator formulas inside each test, so every assertion is exact. The
reference's recorded totalRows for its (absent) real-world datasets are
cited per query for provenance.
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


# -- roads ("j") ------------------------------------------------------------

N_ROADS = 60


def _road_geom(m: int) -> list[list[float]]:
    if m % 10 == 9:  # horizontal: crosses every province box
        y = 0.5 + (m // 10) * 1.5
        return [[-2.0, y], [52.0, y]]
    x = 10 * (m % 5) + 1 + ((m * 13) % 80) / 10.0  # interior of province m%5
    return [[x, 1.0], [x, 9.0]]


def _roads_geojson() -> str:
    feats = [
        {
            "type": "Feature",
            "properties": {"nama": f"Jalan {m:02d}", "kelas": m % 4, "lebar": 4 + m % 6},
            "geometry": {"type": "LineString", "coordinates": _road_geom(m)},
        }
        for m in range(N_ROADS)
    ]
    return json.dumps({"type": "FeatureCollection", "features": feats})


# -- kinerja world (Q-D*) ---------------------------------------------------

N_KEC = 20
N_PUS = 600


def _kec_box(k: int) -> tuple[float, float]:
    return 10.0 * (k % 5), 10.0 * (k // 5)


def _kecamatan_geojson() -> str:
    feats = []
    for k in range(N_KEC):
        x0, y0 = _kec_box(k)
        ring = [[x0, y0], [x0 + 10, y0], [x0 + 10, y0 + 10], [x0, y0 + 10], [x0, y0]]
        feats.append(
            {
                "type": "Feature",
                "properties": {"nama": f"KEC {k:02d}", "tipe": k % 4, "populasi": 1000 * (k + 1)},
                "geometry": {"type": "Polygon", "coordinates": [ring]},
            }
        )
    return json.dumps({"type": "FeatureCollection", "features": feats})


def _pus_xy(p: int) -> tuple[float, float]:
    x0, y0 = _kec_box(p % N_KEC)
    return x0 + 0.5 + (p % 9), y0 + 0.5 + ((p * 7) % 9)


def _puskesmas_geojson() -> str:
    feats = []
    for p in range(N_PUS):
        x, y = _pus_xy(p)
        feats.append(
            {
                "type": "Feature",
                "properties": {"nama": f"PUS {p:03d}", "jenis": p % 3, "kapasitas": 10 + p % 50},
                "geometry": {"type": "Point", "coordinates": [x, y]},
            }
        )
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
    (d / "j.json").write_text(_roads_geojson())
    (d / "kec.json").write_text(_kecamatan_geojson())
    (d / "pus.json").write_text(_puskesmas_geojson())
    eng = create_engine(spark)
    eng.register_xml("masjid", str(gml))
    eng.register_xml("provinces", str(kml))
    eng.register_geojson("rs", str(d / "rs.json"))
    eng.register_geojson("j", str(d / "j.json"))
    eng.register_geojson("kecamatan_dummy", str(d / "kec.json"))
    eng.register_geojson("puskesmas_dummy", str(d / "pus.json"))
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


# -- Q-A4/A6-A8: remaining single-table suite rows --------------------------


def test_qa4_coordinate_accessors(engine):
    """Q-A4 shape: coordinate accessors (ST_X/ST_Y) + selective attribute
    predicate (reference recorded 4 rows on its masjid_manado set,
    basex97_gml.json)."""
    rows = engine.sql_rows(
        """
        SELECT nama, st_x(geometry) AS x, st_y(geometry) AS y
        FROM masjid WHERE kapasitas > 300 AND kapasitas <= 340 ORDER BY nama
        """
    )
    expected = [j for j in range(N_MASJID) if 300 < 50 + 10 * j <= 340]
    assert [r["nama"] for r in rows] == [f"Masjid {j:02d}" for j in expected]
    for r, j in zip(rows, expected):
        assert r["x"] == pytest.approx(10 * (j % 5) + 5 + j * 0.01)
        assert r["y"] == 5.0


def test_qa6_full_astext_projection(engine):
    """Q-A6 shape (KML suite, reference 30 rows = its full table):
    whole-table ST_AsText projection — every mosque serializes back to
    its source coordinates."""
    rows = engine.sql_rows("SELECT nama, st_astext(geometry) AS wkt FROM masjid")
    assert len(rows) == N_MASJID
    by_name = {r["nama"]: r["wkt"] for r in rows}
    assert by_name["Masjid 00"] == "POINT (5 5)"
    assert by_name["Masjid 13"].startswith("POINT (35.13")


def test_qa7_polygon_properties(engine):
    """Q-A7 shape: polygon property projection (dimension, SRID, vertex
    count) with attribute filter over the KML placemark table."""
    rows = engine.sql_rows(
        """
        SELECT name, st_dimension(geometry) AS dim, st_npoints(geometry) AS np
        FROM provinces WHERE populasi >= 3000 ORDER BY name
        """
    )
    assert [r["name"] for r in rows] == ["P2", "P3", "P4"]
    assert all(r["dim"] == 2 and r["np"] == 5 for r in rows)


def test_qa8_attribute_range(engine):
    """Q-A8 shape (reference 20 rows): attribute-range selection over the
    KML suite — a pure pushdown predicate, no spatial function."""
    rows = engine.sql_rows(
        "SELECT nama, kapasitas FROM masjid WHERE kapasitas BETWEEN 100 AND 290 ORDER BY kapasitas"
    )
    expected = [j for j in range(N_MASJID) if 100 <= 50 + 10 * j <= 290]
    # XML/KML attributes surface as strings (faithful to the source schema,
    # like the reference's BaseX rows) — compare numerically.
    assert [int(r["kapasitas"]) for r in rows] == [50 + 10 * j for j in expected]


# -- Q-B3-B8: remaining join suite rows -------------------------------------


def test_qb3_join_selective_both_sides(engine):
    """Q-B3 shape (reference 2 rows): join with selective predicates on
    BOTH tables."""
    rows = engine.sql_rows(
        """
        SELECT m.nama, p.name
        FROM masjid m JOIN provinces p ON st_within(m.geometry, p.geometry) = true
        WHERE m.kapasitas >= 300 AND p.populasi <= 2000 ORDER BY m.nama
        """
    )
    # kapasitas>=300 → j>=25; provinces P0 (pop 1000) / P1 (pop 2000) → j%5 in {0,1}
    expected = [j for j in range(N_MASJID) if 50 + 10 * j >= 300 and j % 5 <= 1]
    assert [r["nama"] for r in rows] == [f"Masjid {j:02d}" for j in expected]


def test_qb4_theta_join_wide(engine):
    """Q-B4 shape (reference 101 rows): low-selectivity theta join — the
    shape that cost the reference 533 s at 40k rows (BASELINE.md Q-D3)."""
    rows = engine.sql_rows(
        """
        SELECT m.nama, r.nama AS rs
        FROM masjid m JOIN rs r ON m.kapasitas > r.beds * 2
        """
    )
    expected = sum(
        1 for j in range(N_MASJID) for k in range(N_RS) if 50 + 10 * j > (100 + k) * 2
    )
    assert len(rows) == expected and expected > 50


def test_qb5_spatial_selfjoin_pairs(engine):
    """Q-B5 shape (reference 721 rows — its largest join): spatial
    self-join, mosque pairs within distance 0.1 (same-province chains)."""
    rows = engine.sql_rows(
        """
        SELECT a.nama, b.nama AS nama_b
        FROM masjid a JOIN masjid b
          ON st_dwithin(a.geometry, b.geometry, 0.1) = true
        WHERE a.nama < b.nama
        """
    )
    xs = [10 * (j % 5) + 5 + j * 0.01 for j in range(N_MASJID)]
    expected = sum(
        1
        for a in range(N_MASJID)
        for b in range(a + 1, N_MASJID)
        if abs(xs[a] - xs[b]) <= 0.1
    )
    assert len(rows) == expected and expected > 0


def test_qb6_join_with_attribute_predicate(engine):
    """Q-B6 shape (reference 24 rows): spatial join narrowed by an
    attribute predicate on the dimension side."""
    rows = engine.sql_rows(
        """
        SELECT m.nama, p.name
        FROM masjid m JOIN provinces p ON st_within(m.geometry, p.geometry) = true
        WHERE p.populasi > 1000 ORDER BY m.nama
        """
    )
    expected = [j for j in range(N_MASJID) if j % 5 != 0]
    assert [r["nama"] for r in rows] == [f"Masjid {j:02d}" for j in expected]


def test_qb7_nearest_topk(engine):
    """Q-B7 shape (reference 3 rows): distance-ordered top-k across two
    tables (ORDER BY st_distance LIMIT 3)."""
    rows = engine.sql_rows(
        """
        SELECT m.nama, st_distance(m.geometry, st_point(5.0, 5.0)) AS d
        FROM masjid m ORDER BY d, m.nama LIMIT 3
        """
    )
    assert [r["nama"] for r in rows] == ["Masjid 00", "Masjid 05", "Masjid 10"]
    assert rows[0]["d"] == 0.0


def test_qb8_join_projection_both_geoms(engine):
    """Q-B8 shape (reference 101 rows): join projecting geometry from
    both sides (the reference's joined-column disambiguation surface,
    SURVEY.md §2.3 J5)."""
    rows = engine.sql_rows(
        """
        SELECT m.nama, st_astext(m.geometry) AS masjid_wkt,
               st_astext(p.geometry) AS prov_wkt
        FROM masjid m JOIN provinces p ON st_within(m.geometry, p.geometry) = true
        """
    )
    assert len(rows) == N_MASJID
    assert all(r["masjid_wkt"].startswith("POINT") for r in rows)
    assert all(r["prov_wkt"].startswith("POLYGON") for r in rows)


# -- Q-C3-C8: remaining aggregate suite rows --------------------------------


def test_qc3_having(engine):
    """Q-C3 shape (reference 2 rows): GROUP BY + HAVING cut."""
    rows = engine.sql_rows(
        """
        SELECT p.name, count(*) AS n, sum(m.kapasitas) AS tot
        FROM masjid m JOIN provinces p ON st_within(m.geometry, p.geometry) = true
        GROUP BY p.name HAVING sum(m.kapasitas) > 1200 ORDER BY p.name
        """
    )
    totals = {}
    for j in range(N_MASJID):
        totals[f"P{j % 5}"] = totals.get(f"P{j % 5}", 0) + 50 + 10 * j
    expected = sorted(k for k, v in totals.items() if v > 1200)
    assert [r["name"] for r in rows] == expected


def test_qc4_groupby_many_groups(engine):
    """Q-C4 shape (reference 89 rows): high-cardinality GROUP BY (one
    group per key)."""
    rows = engine.sql_rows(
        "SELECT kapasitas, count(*) AS n FROM masjid GROUP BY kapasitas"
    )
    assert len(rows) == N_MASJID  # kapasitas is unique per mosque
    assert all(r["n"] == 1 for r in rows)


def test_qc5_spatial_aggregate(engine):
    """Q-C5 shape (KML suite): aggregate over a spatial function
    projection — total/avg distance from a reference point."""
    rows = engine.sql_rows(
        """
        SELECT count(*) AS n,
               min(st_distance(geometry, st_point(0.0, 5.0))) AS dmin,
               max(st_distance(geometry, st_point(0.0, 5.0))) AS dmax
        FROM masjid
        """
    )
    xs = [10 * (j % 5) + 5 + j * 0.01 for j in range(N_MASJID)]
    assert rows[0]["n"] == N_MASJID
    assert rows[0]["dmin"] == pytest.approx(min(xs))
    assert rows[0]["dmax"] == pytest.approx(max(xs))


def test_qc6_count_distinct(engine):
    """Q-C6 shape (reference 17 rows): DISTINCT / count-distinct over an
    expression (SURVEY.md §2.4 A4)."""
    rows = engine.sql_rows(
        "SELECT count(DISTINCT CAST(kapasitas / 100 AS INT)) AS bands FROM masjid"
    )
    assert rows[0]["bands"] == len({(50 + 10 * j) // 100 for j in range(N_MASJID)})


def test_qc7_global_aggregate_pair(engine):
    """Q-C7 shape (reference 2 rows): global aggregates with a WHERE cut
    (no GROUP BY — §2.4 A3)."""
    rows = engine.sql_rows(
        """
        SELECT count(*) AS n, avg(kapasitas) AS avg_kap
        FROM masjid WHERE kapasitas >= 200
        """
    )
    keep = [50 + 10 * j for j in range(N_MASJID) if 50 + 10 * j >= 200]
    assert rows[0]["n"] == len(keep)
    assert rows[0]["avg_kap"] == pytest.approx(sum(keep) / len(keep))


def test_qc8_aggregate_over_join(engine):
    """Q-C8 shape (reference 101 rows): aggregate over a join result —
    per-hospital count of larger mosques."""
    rows = engine.sql_rows(
        """
        SELECT r.nama, count(m.nama) AS n
        FROM rs r JOIN masjid m ON m.kapasitas > r.beds
        GROUP BY r.nama ORDER BY r.nama
        """
    )
    expected = {
        f"RS {k}": sum(1 for j in range(N_MASJID) if 50 + 10 * j > 100 + k)
        for k in range(N_RS)
    }
    assert {r["nama"]: r["n"] for r in rows} == expected


# -- Q-1A-1C: GeoJSON hospital suite ----------------------------------------


def test_q1a_attribute_selection(engine):
    """Q-1A shape (reference 2 rows): attribute equality selection over
    the GeoJSON collection."""
    rows = engine.sql_rows("SELECT nama FROM rs WHERE beds = 103")
    assert [r["nama"] for r in rows] == ["RS 3"]


def test_q1b_attribute_range(engine):
    """Q-1B shape (reference 4 rows): attribute range selection."""
    rows = engine.sql_rows(
        "SELECT nama, beds FROM rs WHERE beds BETWEEN 102 AND 105 ORDER BY beds"
    )
    assert [r["beds"] for r in rows] == [102, 103, 104, 105]


def test_q1c_roads_selection(engine):
    """Q-1C shape (reference 32 rows, table "j"): selection over the
    second GeoJSON collection (roads)."""
    rows = engine.sql_rows("SELECT nama FROM j WHERE kelas <= 1")
    assert len(rows) == sum(1 for m in range(N_ROADS) if m % 4 <= 1)


# -- Q-2A-2R: road-collection suite (18 published variants) -----------------


def test_q2a_length_projection(engine):
    """Q-2A shape: ST_Length projection + filter."""
    rows = engine.sql_rows(
        "SELECT nama, st_length(geometry) AS len FROM j WHERE kelas = 0 ORDER BY nama"
    )
    expected = {
        f"Jalan {m:02d}": (54.0 if m % 10 == 9 else 8.0)
        for m in range(N_ROADS)
        if m % 4 == 0
    }
    assert {r["nama"]: r["len"] for r in rows} == expected


def test_q2b_roads_within_province(engine):
    """Q-2B shape: roads entirely inside one province box."""
    rows = engine.sql_rows(
        """
        SELECT nama FROM j
        WHERE st_within(geometry, 'POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))') = true
        """
    )
    expected = {f"Jalan {m:02d}" for m in range(N_ROADS) if m % 10 != 9 and m % 5 == 1}
    assert {r["nama"] for r in rows} == expected


def test_q2c_roads_intersecting_province(engine):
    """Q-2C shape: ST_Intersects against a polygon literal — verticals in
    the box plus every horizontal crosser."""
    rows = engine.sql_rows(
        """
        SELECT nama FROM j
        WHERE st_intersects(geometry, 'POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))') = true
        """
    )
    expected = {
        f"Jalan {m:02d}"
        for m in range(N_ROADS)
        if (m % 10 != 9 and m % 5 == 1) or m % 10 == 9
    }
    assert {r["nama"] for r in rows} == expected


def test_q2d_unique_name_selection(engine):
    """Q-2D shape (reference 1 row): point lookup by unique name."""
    rows = engine.sql_rows("SELECT nama, kelas FROM j WHERE nama = 'Jalan 07'")
    assert len(rows) == 1 and rows[0]["kelas"] == 3


def test_q2e_class_filter(engine):
    """Q-2E shape (reference 152 rows): class-attribute filter."""
    rows = engine.sql_rows("SELECT nama FROM j WHERE kelas = 2")
    assert len(rows) == sum(1 for m in range(N_ROADS) if m % 4 == 2)


def test_q2f_name_prefix(engine):
    """Q-2F shape (reference 1 row): LIKE-prefix string predicate."""
    rows = engine.sql_rows("SELECT nama FROM j WHERE nama LIKE 'Jalan 5%' AND lebar = 4")
    expected = [
        f"Jalan {m:02d}" for m in range(50, 60) if 4 + m % 6 == 4
    ]
    assert [r["nama"] for r in rows] == expected


def test_q2g_roads_near_point(engine):
    """Q-2G shape (reference 33 rows): ST_DWithin around a point."""
    rows = engine.sql_rows(
        """
        SELECT nama FROM j WHERE st_dwithin(geometry, st_point(15.0, 5.0), 3.0) = true
        """
    )
    expected = set()
    for m in range(N_ROADS):
        (x1, y1), (x2, y2) = _road_geom(m)
        if m % 10 == 9:  # horizontal at height y1: distance from (15,5)
            d = abs(5.0 - y1)
        else:  # vertical at x1 spanning y 1..9, point y=5 inside span
            d = abs(15.0 - x1)
        if d <= 3.0:
            expected.add(f"Jalan {m:02d}")
    assert {r["nama"] for r in rows} == expected


def test_q2h_roads_crossing_province(engine):
    """Q-2H shape: ST_Crosses — only the horizontal through-roads cross a
    province box (verticals are within, not crossing)."""
    rows = engine.sql_rows(
        """
        SELECT nama FROM j
        WHERE st_crosses(geometry, 'POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))') = true
        """
    )
    assert {r["nama"] for r in rows} == {
        f"Jalan {m:02d}" for m in range(N_ROADS) if m % 10 == 9
    }


def test_q2i_roads_disjoint_province(engine):
    """Q-2I shape: ST_Disjoint complement check — disjoint + intersects
    partition the collection."""
    rows = engine.sql_rows(
        """
        SELECT nama FROM j
        WHERE st_disjoint(geometry, 'POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))') = true
        """
    )
    inter = {
        f"Jalan {m:02d}"
        for m in range(N_ROADS)
        if (m % 10 != 9 and m % 5 == 1) or m % 10 == 9
    }
    assert {r["nama"] for r in rows} == {
        f"Jalan {m:02d}" for m in range(N_ROADS)
    } - inter


def test_q2j_road_touches_boundary(engine):
    """Q-2J shape: ST_Touches — a road running along a province edge
    touches without entering."""
    rows = engine.sql_rows(
        """
        SELECT count(*) AS n FROM j
        WHERE st_touches(geometry, 'LINESTRING (10 0, 10 10)') = true
        """
    )
    # no fixture road is collinear with x=10, and horizontals properly
    # cross it, so touches must be 0 — the predicate distinguishes
    # crossing from touching
    assert rows[0]["n"] == 0


def test_q2k_full_scan(engine):
    """Q-2K shape (reference 2877 rows = its whole collection): full
    fetch with multi-column projection."""
    rows = engine.sql_rows("SELECT nama, kelas, lebar FROM j")
    assert len(rows) == N_ROADS


def test_q2l_astext_subset(engine):
    """Q-2L shape (reference 44 rows): ST_AsText over a filtered subset."""
    rows = engine.sql_rows(
        "SELECT nama, st_astext(geometry) AS wkt FROM j WHERE lebar >= 6 ORDER BY nama"
    )
    expected = [f"Jalan {m:02d}" for m in range(N_ROADS) if 4 + m % 6 >= 6]
    assert [r["nama"] for r in rows] == expected
    assert all(r["wkt"].startswith("LINESTRING") for r in rows)


def test_q2m_bbox_filter(engine):
    """Q-2M shape (reference 54 rows): envelope/bbox containment — roads
    whose envelope fits in the left half of the world."""
    rows = engine.sql_rows(
        """
        SELECT nama FROM j
        WHERE st_within(st_envelope(geometry),
                        'POLYGON ((0 0, 25 0, 25 10, 0 10, 0 0))') = true
        """
    )
    expected = {
        f"Jalan {m:02d}"
        for m in range(N_ROADS)
        if m % 10 != 9 and 10 * (m % 5) + 1 + ((m * 13) % 80) / 10.0 < 25
    }
    assert {r["nama"] for r in rows} == expected


def test_q2n_orderby_limit(engine):
    """Q-2N shape: ORDER BY attribute + LIMIT (top-k plan,
    SURVEY.md §2.5 O3)."""
    rows = engine.sql_rows(
        "SELECT nama, lebar FROM j ORDER BY lebar DESC, nama LIMIT 5"
    )
    ranked = sorted(range(N_ROADS), key=lambda m: (-(4 + m % 6), f"Jalan {m:02d}"))
    assert [r["nama"] for r in rows] == [f"Jalan {m:02d}" for m in ranked[:5]]


def test_q2o_longest_roads(engine):
    """Q-2O shape (reference 5 rows): spatial-function ordering — the
    horizontals are the 5+ longest roads."""
    rows = engine.sql_rows(
        "SELECT nama, st_length(geometry) AS len FROM j ORDER BY len DESC, nama LIMIT 5"
    )
    assert all(r["len"] == 54.0 for r in rows)
    horizontals = [f"Jalan {m:02d}" for m in range(N_ROADS) if m % 10 == 9]
    assert [r["nama"] for r in rows] == horizontals[:5]


def test_q2p_aggregate_by_class(engine):
    """Q-2P shape (reference 51 rows): GROUP BY class with aggregate over
    a spatial function."""
    rows = engine.sql_rows(
        """
        SELECT kelas, count(*) AS n, sum(st_length(geometry)) AS total_len
        FROM j GROUP BY kelas ORDER BY kelas
        """
    )
    exp = {}
    for m in range(N_ROADS):
        n, tot = exp.get(m % 4, (0, 0.0))
        exp[m % 4] = (n + 1, tot + (54.0 if m % 10 == 9 else 8.0))
    assert {r["kelas"]: (r["n"], pytest.approx(r["total_len"])) for r in rows} == exp


def test_q2q_having_on_class(engine):
    """Q-2Q shape (reference 51 rows): the Q-2P aggregate with a HAVING
    cut."""
    rows = engine.sql_rows(
        """
        SELECT kelas, count(*) AS n FROM j
        GROUP BY kelas HAVING count(*) >= 15 ORDER BY kelas
        """
    )
    counts = {}
    for m in range(N_ROADS):
        counts[m % 4] = counts.get(m % 4, 0) + 1
    assert [r["kelas"] for r in rows] == sorted(k for k, v in counts.items() if v >= 15)


def test_q2r_union_selection(engine):
    """Q-2R shape (reference 580 rows): UNION of two selections (the
    set-operation surface the reference routed through PostgreSQL)."""
    rows = engine.sql_rows(
        """
        SELECT nama FROM j WHERE kelas = 0
        UNION
        SELECT nama FROM j WHERE lebar = 4
        """
    )
    expected = {
        f"Jalan {m:02d}" for m in range(N_ROADS) if m % 4 == 0 or 4 + m % 6 == 4
    }
    assert {r["nama"] for r in rows} == expected


# -- Q-3A: multi-collection join --------------------------------------------


def test_q3a_hospital_road_join(engine):
    """Q-3A shape (reference 179 rows): join across the two GeoJSON
    collections — hospitals paired with roads within distance 2."""
    rows = engine.sql_rows(
        """
        SELECT r.nama AS rs, count(*) AS n
        FROM rs r JOIN j ON st_dwithin(r.geometry, j.geometry, 2.0) = true
        GROUP BY r.nama ORDER BY r.nama
        """
    )
    expected = {}
    for k in range(N_RS):
        hx, hy = k * 3.0, 2.0
        n = 0
        for m in range(N_ROADS):
            (x1, y1), (x2, y2) = _road_geom(m)
            if m % 10 == 9:
                d = abs(hy - y1)  # horizontal spans x -2..52 ⊇ all hospitals
            else:
                dx = abs(hx - x1)
                d = dx if 1.0 <= hy <= 9.0 else None
            if d is not None and d <= 2.0:
                n += 1
        if n:
            expected[f"RS {k}"] = n
    assert {r["rs"]: r["n"] for r in rows} == expected


# -- Q-D1-D5: the kinerja suite as SQL through the engine -------------------
# (BASELINE.md shapes; the reference's recorded counts — 11115/4/29817/
# 40072/4 on its 40k-row puskesmas_dummy — are data-bound, so the
# fixture here is constructed to reproduce the D2/D5 cardinalities
# structurally and every expected value exactly.)


def test_qd1_scan_filter(engine):
    """Q-D1: scan + attribute filter (reference: 5.7-168 s; 11 115 of
    40 072 rows)."""
    res = engine.process_query("SELECT nama, jenis FROM puskesmas_dummy WHERE jenis = 0")
    assert res["totalData"] == sum(1 for p in range(N_PUS) if p % 3 == 0)


def test_qd2_selective_spatial_filter(engine):
    """Q-D2: highly selective spatial filter — exactly 4 rows, the
    reference's recorded Q-D2 cardinality."""
    res = engine.process_query(
        """
        SELECT nama FROM puskesmas_dummy
        WHERE st_dwithin(geometry, st_point(0.5, 0.5), 0.01) = true
        """
    )
    # p%9==0 (both offsets 0.5) and p%20==0 (district 0) → p ≡ 0 (mod 180)
    assert res["totalData"] == 4
    assert sorted(r["nama"] for r in res["rows"]) == [
        "PUS 000", "PUS 180", "PUS 360", "PUS 540"
    ]


def test_qd3_spatial_join(engine):
    """Q-D3: the two-table spatial join that cost the reference 524-533 s
    (BASELINE.md); every point lands in exactly one district."""
    res = engine.process_query(
        """
        SELECT p.nama, k.nama AS kec
        FROM puskesmas_dummy p JOIN kecamatan_dummy k
          ON st_within(p.geometry, k.geometry) = true
        """
    )
    assert res["totalData"] == N_PUS


def test_qd4_full_scan_projection(engine):
    """Q-D4: full-table fetch (reference 40 072 rows, 321-1 590 s)."""
    res = engine.process_query(
        "SELECT nama, jenis, kapasitas, st_astext(geometry) AS wkt FROM puskesmas_dummy"
    )
    assert res["totalData"] == N_PUS


def test_qd5_join_aggregate(engine):
    """Q-D5: join + aggregate — exactly 4 groups (district tipe), the
    reference's recorded Q-D5 cardinality."""
    res = engine.process_query(
        """
        SELECT k.tipe, count(*) AS n, sum(p.kapasitas) AS total_kap
        FROM puskesmas_dummy p JOIN kecamatan_dummy k
          ON st_within(p.geometry, k.geometry) = true
        GROUP BY k.tipe
        """
    )
    assert res["totalData"] == 4
    exp = {}
    for p in range(N_PUS):
        tipe = (p % N_KEC) % 4
        n, tot = exp.get(tipe, (0, 0))
        exp[tipe] = (n + 1, tot + 10 + p % 50)
    got = {r["tipe"]: (r["n"], r["total_kap"]) for r in res["rows"]}
    assert got == exp
