"""GML/KML writers (functions/geo_export.py) and spheroidal distances
(functions/spheroid.py): published anchors, reader round trips, gates."""

from __future__ import annotations

import math
import random

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


class TestDWithinSpheroid:
    """r16 (VERDICT r15 task 5): the predicate form of the Vincenty
    kernel, with the chord lower bound as the far-pair fast path."""

    EQ_1DEG = 6378137.0 * math.pi / 180.0  # equatorial arc: s = a·Δλ exactly
    QUARTER_MERIDIAN = 10_001_965.7293  # WGS84, published

    def test_equator_threshold(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.spheroid import (
            dwithinspheroid_of,
        )

        a, b = "POINT (0 0)", "POINT (1 0)"
        assert dwithinspheroid_of(a, b, self.EQ_1DEG + 0.001) is True
        assert dwithinspheroid_of(a, b, self.EQ_1DEG - 0.001) is False

    def test_meridian_threshold(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.spheroid import (
            dwithinspheroid_of,
        )

        a, b = "POINT (0 0)", "POINT (0 90)"
        assert dwithinspheroid_of(a, b, self.QUARTER_MERIDIAN + 0.01) is True
        assert dwithinspheroid_of(a, b, self.QUARTER_MERIDIAN - 0.01) is False

    def test_chord_fast_reject_agrees_with_kernel(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.spheroid import (
            chord_3d,
            distancespheroid_of,
            dwithinspheroid_of,
        )

        rng = random.Random(16)
        for _ in range(200):
            lon1, lat1 = rng.uniform(-180, 180), rng.uniform(-89, 89)
            lon2, lat2 = rng.uniform(-180, 180), rng.uniform(-89, 89)
            a, b = f"POINT ({lon1} {lat1})", f"POINT ({lon2} {lat2})"
            g = distancespheroid_of(a, b)
            if g is None:
                continue
            # the chord is a true lower bound
            assert chord_3d(lon1, lat1, lon2, lat2) <= g + 1e-6
            # predicate agrees with the distance on both sides
            assert dwithinspheroid_of(a, b, g * 1.0000001) is True
            assert dwithinspheroid_of(a, b, g * 0.9999) is False

    def test_antipodal_window(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.spheroid import (
            dwithinspheroid_of,
        )

        # Karney (2013) worked example: 19 989 832.827 610 m
        a, b = "POINT (0 -30)", "POINT (179.8 29.9)"
        assert dwithinspheroid_of(a, b, 19_989_833.0) is True
        assert dwithinspheroid_of(a, b, 19_989_832.0) is False

    def test_null_and_refusals(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.spheroid import (
            dwithinspheroid_of,
        )

        assert dwithinspheroid_of(None, "POINT (0 0)", 1.0) is None
        assert dwithinspheroid_of("POINT (0 0)", "LINESTRING (0 0, 1 1)", 1.0) is None
        assert dwithinspheroid_of("POINT (200 0)", "POINT (0 0)", 1.0) is None
        assert dwithinspheroid_of("POINT (0 0)", "POINT (1 0)", None) is None
        assert dwithinspheroid_of("POINT (0 0)", "POINT (1 0)", float("nan")) is None
        assert dwithinspheroid_of("POINT (0 0)", "POINT (1 0)", -5.0) is False
        assert dwithinspheroid_of("POINT (0 0)", "POINT (0 0)", 0.0) is True
        assert (
            dwithinspheroid_of("POINT (0 0)", "POINT (1 0)", 1.0, "SPHEROID[junk")
            is None
        )

    def test_sql_surface(self, spark):
        row = spark.sql(
            "SELECT st_dwithinspheroid('POINT (0 0)', 'POINT (1 0)',"
            " 111320.0D, NULL) AS near,"
            " st_dwithinspheroid('POINT (0 0)', 'POINT (90 0)',"
            " 1000.0D, NULL) AS far,"
            " st_dwithinspheroid(NULL, 'POINT (0 0)', 1.0D, NULL) AS nul"
        ).collect()[0]
        assert row["near"] is True and row["far"] is False and row["nul"] is None


class TestAreaSpheroid:
    """r16: geodesic polygon area on the authalic sphere (van
    Oosterom–Strackee excess over authalic latitudes)."""

    def test_octant_and_lune_exact(self):
        # meridian/equator-bounded polygons are EXACT (those geodesics
        # map to great circles on the authalic sphere)
        qp, e = S._authalic_setup(6378137.0, 1.0 / 298.257223563)
        r2 = 6378137.0**2 * qp / 2.0
        # the authalic mean radius itself is a published WGS84 constant
        assert abs(math.sqrt(r2) - 6371007.1809) < 1e-3
        a = S.areaspheroid_of("POLYGON ((0 0, 90 0, 0 90, 0 0))")
        assert a == r2 * math.pi / 2.0
        for d in (1, 7, 30, 89):
            lune = S.areaspheroid_of(f"POLYGON ((0 0, {d} 0, 0 90, 0 0))")
            assert abs(lune - r2 * math.radians(d)) <= 1e-12 * lune

    def test_winding_holes_and_multipolygon(self):
        a1 = S.areaspheroid_of("POLYGON ((0 0, 90 0, 0 90, 0 0))")
        a2 = S.areaspheroid_of("POLYGON ((0 0, 0 90, 90 0, 0 0))")
        assert a1 == a2  # winding-independent (abs per ring)
        outer = S.areaspheroid_of("POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0))")
        hole = S.areaspheroid_of("POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))")
        holed = S.areaspheroid_of(
            "POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0),"
            " (10 10, 20 10, 20 20, 10 20, 10 10))"
        )
        assert abs(holed - (outer - hole)) < 1e-6
        two = S.areaspheroid_of(
            "MULTIPOLYGON (((0 0, 40 0, 40 40, 0 40, 0 0)),"
            " ((50 0, 60 0, 60 10, 50 10, 50 0)))"
        )
        small = S.areaspheroid_of("POLYGON ((50 0, 60 0, 60 10, 50 10, 50 0))")
        assert abs(two - (outer + small)) < 1e-6

    def test_small_square_matches_planar(self):
        # a 0.1° square at the equator ≈ (Δλ·N·cosφ)·(Δφ·M) planar
        a = S.areaspheroid_of("POLYGON ((0 0, 0.1 0, 0.1 0.1, 0 0.1, 0 0))")
        assert abs(a / 1e6 - 123.09) < 0.05  # km², planar cross-check

    def test_sphere_and_custom_spheroid(self):
        a = S.areaspheroid_of(
            "POLYGON ((0 0, 90 0, 0 90, 0 0))", 'SPHEROID["s",6371000,0]'
        )
        assert abs(a - 6371000.0**2 * math.pi / 2.0) < 1.0

    def test_zeros_nulls_and_refusals(self):
        assert S.areaspheroid_of("LINESTRING (0 0, 1 1)") == 0.0
        assert S.areaspheroid_of("POINT (3 4)") == 0.0
        assert S.areaspheroid_of("POLYGON EMPTY") == 0.0
        assert S.areaspheroid_of("GEOMETRYCOLLECTION (POINT (1 1))") is None
        assert S.areaspheroid_of("POLYGON ((0 0, 200 0, 0 90, 0 0))") is None
        assert S.areaspheroid_of("junk((") is None
        assert S.areaspheroid_of(None) is None
        assert S.areaspheroid_of("POLYGON ((0 0, 1 0, 1 1, 0 0))", "SPHEROID[x") is None

    def test_perimeterspheroid(self):
        # octant perimeter = quarter equator + two quarter meridians
        p = S.lengthspheroid_of("POLYGON ((0 0, 90 0, 0 90, 0 0))")
        assert abs(p - (6378137.0 * math.pi / 2.0 + 2 * 10_001_965.7293)) < 0.005

    def test_sql_surface(self, spark):
        row = spark.sql(
            "SELECT st_areaspheroid('POLYGON ((0 0, 90 0, 0 90, 0 0))',"
            " NULL) AS oct,"
            " st_perimeterspheroid('LINESTRING (0 0, 1 1)', NULL) AS lin,"
            " st_areaspheroid(NULL, NULL) AS nul"
        ).collect()[0]
        assert abs(row["oct"] - 6.3758202715511086e13) < 1e3
        assert row["lin"] == 0.0 and row["nul"] is None
