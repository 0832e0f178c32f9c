"""GML/KML writers (functions/geo_export.py) and spheroidal distances
(functions/spheroid.py): published anchors, reader round trips, gates."""

from __future__ import annotations

import math

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import geo_export as X
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import geometry as G
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import spheroid as S

ROUND_TRIP_FIXTURES = (
    "POINT (10 20)",
    "LINESTRING (0 0, 3 4)",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
    "MULTIPOINT (1 1, 2 2)",
    "MULTILINESTRING ((0 0, 1 0), (5 5, 6 6))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
    "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 0))",
    "POINT (-5.5 42.25)",
)


def test_gml_kml_round_trip_through_the_readers():
    for w in ROUND_TRIP_FIXTURES:
        assert G.to_wkt(G.from_xml_geometry(X.asgml_wkt(w))) == w
        assert G.to_wkt(G.from_xml_geometry(X.askml_wkt(w))) == w


def test_export_shapes():
    assert X.askml_wkt("POINT (10 20)") == (
        "<Point><coordinates>10,20</coordinates></Point>"
    )
    assert X.asgml_wkt("POINT (10 20)") == (
        "<gml:Point><gml:coordinates>10,20</gml:coordinates></gml:Point>"
    )
    assert "outerBoundaryIs" in X.asgml_wkt(
        "POLYGON ((0 0, 1 0, 1 1, 0 0))"
    )
    assert "innerBoundaryIs" in X.askml_wkt(
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    )
    # KML flattens collections into MultiGeometry
    k = X.askml_wkt("GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 0))")
    assert k.startswith("<MultiGeometry>") and "geometryMember" not in k
    g = X.asgml_wkt("GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 0))")
    assert "gml:MultiGeometry" in g and "gml:geometryMember" in g


def test_export_gates():
    for fn in (X.asgml_wkt, X.askml_wkt):
        assert fn("POINT EMPTY") is None
        assert fn("junk") is None
        assert fn(None) is None


# ---- spheroid -----------------------------------------------------------


def test_vincenty_published_anchor():
    # the Vincenty/GDA reference line: Flinders Peak -> Buninyong
    d = S.vincenty_inverse(
        144.42486789, -37.95103342, 143.92649553, -37.65282114
    )
    assert abs(d - 54972.271) < 0.002


def test_equatorial_closed_form():
    # the equator is a geodesic of radius a: s = a·Δλ exactly
    for dl in (0.5, 1, 2, 7):
        d = S.vincenty_inverse(10, 0, 10 + dl, 0)
        assert abs(d - 6378137.0 * math.radians(dl)) < 1e-6


def test_meridian_and_symmetry():
    d = S.vincenty_inverse(10, 0, 10, 1)
    # published WGS84 meridian arc for the first degree ≈ 110 574.39 m
    assert abs(d - 110574.39) < 0.01
    assert S.vincenty_inverse(10, 0, 10, 1) == S.vincenty_inverse(10, 1, 10, 0)


def test_antipodal_window_is_loud_null():
    assert S.vincenty_inverse(0, 0, 179.5, 0) is None


def test_distancespheroid_gates():
    assert S.distancespheroid_of("POINT (5 5)", "POINT (5 5)") == 0.0
    assert S.distancespheroid_of("POINT (0 0)", "LINESTRING (0 0, 1 1)") is None
    assert S.distancespheroid_of("POINT (190 0)", "POINT (0 0)") is None
    assert S.distancespheroid_of("POINT (0 91)", "POINT (0 0)") is None
    assert S.distancespheroid_of(None, "POINT (0 0)") is None
    assert S.distancespheroid_of("junk", "POINT (0 0)") is None
    assert S.distancespheroid_of("POINT EMPTY", "POINT (0 0)") is None


def test_lengthspheroid():
    two_deg = S.lengthspheroid_of("LINESTRING (10 0, 11 0, 12 0)")
    assert abs(two_deg - 2 * 6378137.0 * math.radians(1)) < 1e-6
    ml = S.lengthspheroid_of(
        "MULTILINESTRING ((10 0, 11 0), (11 0, 12 0))"
    )
    assert abs(ml - two_deg) < 1e-9
    assert S.lengthspheroid_of("POINT (1 1)") == 0.0
    assert S.lengthspheroid_of("MULTIPOINT (1 1, 2 2)") == 0.0
    assert S.lengthspheroid_of("LINESTRING EMPTY") == 0.0
    assert S.lengthspheroid_of("LINESTRING (0 0, 200 0)") is None
    assert S.lengthspheroid_of("junk") is None
    assert S.lengthspheroid_of(None) is None


def test_lengthspheroid_perimeter_and_spheroid_arg():
    """r15 (ADVICE r14): areal input returns the PERIMETER and the
    PostGIS spheroid-text argument is parsed and used."""
    # closed equatorial "ring" degenerates are invalid; use the
    # quarter-equator + two-quarter-meridian triangle against the
    # published WGS84 quarter meridian 10 001 965.7293 m
    p = S.lengthspheroid_of("POLYGON ((0 0, 90 0, 0 90, 0 0))")
    assert abs(p - (6378137.0 * math.pi / 2 + 2 * 10001965.7293)) < 0.005
    # polygon perimeter == the same ring walked as a LINESTRING
    ring = S.lengthspheroid_of("LINESTRING (0 0, 90 0, 0 90, 0 0)")
    assert p == ring
    assert S.lengthspheroid_of("POLYGON EMPTY") == 0.0
    assert S.lengthspheroid_of("GEOMETRYCOLLECTION (POINT (1 1))") is None
    # spheroid text: sphere (rf = 0) gives r·Δλ exactly on the equator
    sph = 'SPHEROID["sphere",6371000,0]'
    d = S.distancespheroid_of("POINT (10 0)", "POINT (12 0)", sph)
    assert d == 6371000.0 * math.radians(2.0)
    assert S.parse_spheroid('SPHEROID["WGS 84",6378137,298.257223563]') == (
        6378137.0, 1.0 / 298.257223563,
    )
    for bad in ("SPHEROID[oops]", 'SPHEROID["x",0,298]', 'SPHEROID["x",6378137,0.5]', "junk"):
        assert S.parse_spheroid(bad) is None, bad
        assert S.distancespheroid_of("POINT (0 0)", "POINT (1 0)", bad) is None
    # NULL spheroid → the WGS84 default (documented convenience)
    assert S.distancespheroid_of("POINT (10 0)", "POINT (11 0)", None) == (
        S.distancespheroid_of("POINT (10 0)", "POINT (11 0)")
    )


def test_antipodal_window_karney_fallback():
    """r15 (VERDICT r14 missing item 5): the Vincenty non-convergence
    window answers through the quadrature Karney-style solver."""
    # raw Vincenty still refuses (the fallback is a separate kernel)
    assert S.vincenty_inverse(0, 0, 179.5, 0) is None
    # Karney (2013)'s published nearly-antipodal worked example:
    # (−30°, 0°) → (29.9°, 179.8°) = 19 989 832.827610 m — mm-pinned
    d = S.distancespheroid_of("POINT (0 -30)", "POINT (179.8 29.9)")
    assert abs(d - 19989832.827610605) < 0.001
    # meridional antipodes run two quarter meridians (published WGS84
    # Mq = 10 001 965.7293 m) — 0.5 mm
    d = S.distancespheroid_of("POINT (0 0)", "POINT (180 0)")
    assert abs(d - 2 * 10001965.7293) < 0.0005
    # continuity at the window edge: the two kernels agree sub-mm on
    # the shared domain just outside the window
    for dl in (179.2, 179.25, 179.3):
        v = S.vincenty_inverse(0, 0.7, dl, -0.6)
        k = S._antipodal_inverse(0, 0.7, dl, -0.6)
        assert v is not None and k is not None
        assert abs(v - k) < 0.001, dl
    # the previously-NULL window now answers, monotone in Δλ and
    # bounded by the meridional ceiling
    prev = S.vincenty_inverse(0, 0.7, 179.3, -0.6)
    for dl in (179.4, 179.5, 179.7, 179.9):
        d = S.distancespheroid_of("POINT (0 0.7)", f"POINT ({dl} -0.6)")
        assert d is not None and prev < d < 2 * 10001965.7293 + 0.001
        prev = d
    # symmetric antipodes go over the pole: exactly the meridional run
    d = S.distancespheroid_of("POINT (0 -30)", "POINT (180 30)")
    assert abs(d - 2 * 10001965.7293) < 0.0005
    # st_lengthspheroid composes through the fallback too
    ln = S.lengthspheroid_of("LINESTRING (0 0, 179.5 0)")
    assert abs(ln - S.distancespheroid_of("POINT (0 0)", "POINT (179.5 0)")) < 1e-9


# ---- Vincenty direct (st_projectspheroid, r15 continuation) -------------


def test_direct_lands_on_published_anchor():
    # Flinders Peak + published azimuth 306°52'05.37" + 54 972.271 m
    # lands on Buninyong to ~1 mm (the azimuth itself is published to
    # 0.01", ~0.3 mm of arc)
    az = 306 + 52 / 60 + 5.37 / 3600
    out = S.vincenty_direct(144.42486789, -37.95103342, 54972.271, az)
    assert abs(out[0] - 143.92649553) < 2e-8
    assert abs(out[1] - (-37.65282114)) < 2e-8


def test_direct_inverse_roundtrip_fuzz():
    import random

    rng = random.Random(4)
    for _ in range(150):
        lon, lat = rng.uniform(-179, 179), rng.uniform(-85, 85)
        s = rng.uniform(1, 15_000_000)
        az = rng.uniform(0, 360)
        out = S.vincenty_direct(lon, lat, s, az)
        d = S._inverse(lon, lat, out[0], out[1])
        assert abs(d - s) < 1e-6  # sub-micrometre closure


def test_projectspheroid_semantics():
    assert S.projectspheroid_of("POINT (0 0)", 0.0, 45.0, None) == "POINT (0 0)"
    # negative distance travels the reciprocal azimuth
    north = S.projectspheroid_of("POINT (0 0)", 10000.0, 0.0, None)
    south = S.projectspheroid_of("POINT (0 0)", -10000.0, 0.0, None)
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
        geometry as G,
    )

    yn = G.parse_wkt(north).coords[1]
    ys = G.parse_wkt(south).coords[1]
    assert abs(yn + ys) < 1e-12 and yn > 0
    # gates
    assert S.projectspheroid_of("LINESTRING (0 0, 1 1)", 1.0, 0.0, None) is None
    assert S.projectspheroid_of("POINT (0 0)", float("nan"), 0.0, None) is None
    assert S.projectspheroid_of("POINT (0 0)", 1.0, None, None) is None
    assert S.projectspheroid_of("POINT (0 0)", 1.0, 0.0, "junk") is None
    assert S.projectspheroid_of("junk", 1.0, 0.0, None) is None


def test_direct_equatorial_closed_form():
    # eastward along the equator: s = a·Δλ exactly in the limit
    import math

    out = S.vincenty_direct(10.0, 0.0, S._A * math.radians(5.0), 90.0)
    assert abs(out[0] - 15.0) < 1e-9 and abs(out[1]) < 1e-12


def test_azimuth_spheroid():
    import math

    assert S.azimuthspheroid_of("POINT (0 0)", "POINT (0 1)", None) == 0.0
    assert (
        abs(S.azimuthspheroid_of("POINT (0 0)", "POINT (1 0)", None)
            - math.pi / 2) < 1e-12
    )
    assert S.azimuthspheroid_of("POINT (0 0)", "POINT (0 0)", None) is None
    assert S.azimuthspheroid_of("POINT (0 0)", "POINT (0 1)", "junk") is None
    # azimuth ∘ direct lands back on the target (the inverse problem's
    # two outputs are mutually consistent)
    import random

    rng = random.Random(9)
    for _ in range(60):
        lon1, lat1 = rng.uniform(-179, 179), rng.uniform(-85, 85)
        lon2, lat2 = rng.uniform(-179, 179), rng.uniform(-85, 85)
        az = S.vincenty_azimuth(lon1, lat1, lon2, lat2)
        if az is None:
            continue
        d = S._inverse(lon1, lat1, lon2, lat2)
        out = S.vincenty_direct(lon1, lat1, d, math.degrees(az))
        assert S._inverse(out[0], out[1], lon2, lat2) < 1e-6
