"""ST_Transform (4326 ↔ 3857): known references, inverse round trip,
structure preservation, loud unsupported-pair failure."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import geometry as G
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import projection as P


def test_known_reference_point():
    # Eiffel Tower (2.2945, 48.8584) — the widely published Web-Mercator
    # coordinates for this lon/lat are (255422.57, 6250868.90).
    x, y = P._fwd(2.2945, 48.8584)
    assert abs(x - 255422.5716) < 0.01
    assert abs(y - 6250868.9015) < 0.01
    # equator/prime-meridian fixed point
    assert P._fwd(0.0, 0.0) == (0.0, 0.0)


def test_mercator_square_edges():
    # ±180° maps to ±πR; the clamp latitude maps to the same magnitude
    # (the defining property of the Web-Mercator square).
    x, _ = P._fwd(180.0, 0.0)
    assert abs(x - math.pi * P.R) < 1e-6
    _, y = P._fwd(0.0, P.MAX_LAT)
    assert abs(y - math.pi * P.R) < 1e-3
    # out-of-range latitude clamps instead of diverging
    _, y_over = P._fwd(0.0, 89.9)
    assert abs(y_over - y) < 1e-6


@settings(max_examples=300, deadline=None)
@given(
    st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
    st.floats(min_value=-85.0, max_value=85.0, allow_nan=False),
)
def test_roundtrip_inverse(lon, lat):
    x, y = P._fwd(lon, lat)
    lon2, lat2 = P._inv(x, y)
    assert abs(lon2 - lon) < 1e-9
    assert abs(lat2 - lat) < 1e-9


def test_structure_preserved():
    wkt = (
        "GEOMETRYCOLLECTION (POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0), "
        "(0.2 0.2, 0.4 0.2, 0.4 0.4, 0.2 0.4, 0.2 0.2)), "
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3)), POINT (5 5))"
    )
    g = G.parse_wkt(wkt)
    t = P.transform(g, 4326, 3857)
    assert t.kind == "GeometryCollection"
    assert [s.kind for s in t.coords] == ["Polygon", "MultiLineString", "Point"]
    assert len(t.coords[0].coords) == 2  # hole preserved
    back = P.transform(t, 3857, 4326)
    for (x1, y1), (x2, y2) in zip(G._points(g), G._points(back)):
        assert abs(x1 - x2) < 1e-9 and abs(y1 - y2) < 1e-9


def test_same_srid_is_identity():
    g = G.parse_wkt("POINT (7 8)")
    assert P.transform(g, 4326, 4326) is g


def test_unsupported_pair_raises():
    with pytest.raises(ValueError, match="no transform"):
        P.transform(G.parse_wkt("POINT (0 0)"), 4326, 5514)  # Czech Krovak


def test_sql_surface(spark):
    row = spark.sql(
        "SELECT st_transform('POINT (0 0)', 4326, 3857) AS a,"
        " st_transform(CAST(NULL AS STRING), 4326, 3857) AS b"
    ).collect()[0]
    assert row["a"] == "POINT (0 0)"
    assert row["b"] is None


# -- ST_Azimuth -------------------------------------------------------------


def test_azimuth_cardinal_directions(spark):
    rows = spark.sql(
        "SELECT st_azimuth('POINT (0 0)', 'POINT (0 1)') AS north,"
        " st_azimuth('POINT (0 0)', 'POINT (1 0)') AS east,"
        " st_azimuth('POINT (0 0)', 'POINT (0 -1)') AS south,"
        " st_azimuth('POINT (0 0)', 'POINT (-1 0)') AS west,"
        " st_azimuth('POINT (0 0)', 'POINT (0 0)') AS degenerate,"
        " st_azimuth('LINESTRING (0 0, 1 1)', 'POINT (0 0)') AS nonpoint"
    ).collect()[0]
    assert rows["north"] == 0.0
    assert abs(rows["east"] - math.pi / 2) < 1e-12
    assert abs(rows["south"] - math.pi) < 1e-12
    assert abs(rows["west"] - 3 * math.pi / 2) < 1e-12
    assert rows["degenerate"] is None and rows["nonpoint"] is None


class TestUTM:
    """4326 <-> EPSG:326xx/327xx via the third-order Krüger series
    (VERDICT r6 item 4). Verified by internal consistency (round-trip,
    central-meridian anchors) plus an independent numeric meridian-arc
    integration — no proj, no remembered constants."""

    def test_central_meridian_anchors(self):
        # On the central meridian: E = 500000 exactly-ish, and at the
        # equator N = 0 (north) / 10_000_000 (south false northing).
        e, n = P._utm_fwd(9.0, 0.0, 32, True)  # zone 32: lam0 = 9E
        assert abs(e - 500_000.0) < 1e-6
        assert abs(n) < 1e-6
        e_s, n_s = P._utm_fwd(9.0, 0.0, 32, False)
        assert abs(n_s - 10_000_000.0) < 1e-6

    def test_meridian_arc_matches_numeric_integration(self):
        # N on the central meridian must equal k0 * meridian arc length,
        # integrated numerically on the WGS84 ellipsoid (Simpson).
        import math

        a, f = 6378137.0, 1.0 / 298.257223563
        e2 = f * (2 - f)

        def m_prime(phi):  # meridian radius of curvature
            return a * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5

        for lat_deg in (12.0, 45.0, 60.0, 77.5):
            phi1 = math.radians(lat_deg)
            steps = 20000
            h = phi1 / steps
            s = m_prime(0) + m_prime(phi1)
            for k in range(1, steps):
                s += (4 if k % 2 else 2) * m_prime(k * h)
            arc = s * h / 3
            _e, n = P._utm_fwd(9.0, lat_deg, 32, True)
            assert abs(n - 0.9996 * arc) < 5e-3, lat_deg

    def test_roundtrip_across_zone(self):
        # Round-trip 4326 -> UTM -> 4326 to ~1e-8 deg (third-order series
        # truncation; ~1 mm) everywhere reasonable in-zone.
        for lon in (5.2, 9.0, 12.9):
            for lat in (-79.5, -33.25, 0.5, 41.125, 83.75):
                zone = int((lon + 180) // 6) + 1
                north = lat >= 0
                e, n = P._utm_fwd(lon, lat, zone, north)
                lon2, lat2 = P._utm_inv(e, n, zone, north)
                assert abs(lon2 - lon) < 1e-8 and abs(lat2 - lat) < 1e-8

    def test_transform_dispatch_and_composition(self):
        g = P.G.parse_wkt("POINT (9.5 47.25)")
        utm = P.transform(g, 4326, 32632)
        assert 500_000 < utm.coords[0] < 600_000  # east of lam0=9E
        back = P.transform(utm, 32632, 4326)
        assert abs(back.coords[0] - 9.5) < 1e-8
        assert abs(back.coords[1] - 47.25) < 1e-8
        # 3857 -> UTM composes through 4326
        merc = P.transform(g, 4326, 3857)
        utm2 = P.transform(merc, 3857, 32632)
        assert abs(utm2.coords[0] - utm.coords[0]) < 1e-6
        import pytest as _pt

        with _pt.raises(ValueError):
            P.transform(g, 4326, 5514)  # Krovak oblique conic: unsupported, loud


class TestLambertConformalConic:
    """LCC 2SP (r12, VERDICT r11 item 4): Snyder closed forms for
    EPSG:2154 (Lambert-93) and EPSG:3034 (LCC Europe)."""

    def test_false_origin_anchor(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _LCC,
        )

        e, n = _LCC[2154].fwd(3.0, 46.5)
        assert abs(e - 700_000.0) < 1e-6 and abs(n - 6_600_000.0) < 1e-6
        e, n = _LCC[3034].fwd(10.0, 52.0)
        assert abs(e - 4_000_000.0) < 1e-6 and abs(n - 2_800_000.0) < 1e-6

    def test_central_meridian_is_vertical(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _LCC,
        )

        for lat in (41.0, 46.5, 51.0):
            assert abs(_LCC[2154].fwd(3.0, lat)[0] - 700_000.0) < 1e-6

    def test_paris_known_coordinates(self):
        # Lambert-93 Paris (2.3522 E, 48.8566 N) ~ (652469, 6862035):
        # the well-known magnitude class for the city; sub-meter match
        # against the published grid is what the closed form delivers
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _LCC,
        )

        e, n = _LCC[2154].fwd(2.3522, 48.8566)
        assert abs(e - 652_469.02) < 0.05
        assert abs(n - 6_862_035.26) < 0.05

    def test_round_trip_grid(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _LCC,
        )

        for srid in (2154, 3034):
            crs = _LCC[srid]
            for lon in range(-150, 151, 30):
                for lat in range(-75, 76, 15):
                    e, n = crs.fwd(float(lon), float(lat))
                    lo, la = crs.inv(e, n)
                    assert abs(lo - lon) < 1e-9 and abs(la - lat) < 1e-9

    def test_dispatcher_and_composition(self, spark):
        row = spark.sql(
            "SELECT st_transform(st_transform('POINT (2.3522 48.8566)',"
            " 4326, 2154), 2154, 3034) AS p,"
            " st_transform('POINT (nan 1)', 4326, 2154) AS bad,"
            " st_transform('POINT (1 inf)', 4326, 3857) AS bad2"
        ).collect()[0]
        assert row["p"].startswith("POINT (")
        # code-review r12: non-finite coordinates go NULL, never a
        # silently corrupt 'POINT (nan nan)'
        assert row["bad"] is None and row["bad2"] is None


class TestLambertAzimuthalEqualArea:
    """LAEA EPSG:3035 (r12): Snyder ellipsoidal oblique-aspect forms."""

    def test_false_origin_anchor(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _LAEA,
        )

        e, n = _LAEA[3035].fwd(10.0, 52.0)
        assert abs(e - 4_321_000.0) < 1e-6 and abs(n - 3_210_000.0) < 1e-6

    def test_equal_area_property(self):
        # the defining property: projected areas match authalic truth;
        # a 1-degree cell at the origin parallel is ~7556 km^2 and two
        # equal-authalic-area cells project to equal areas
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _LAEA,
        )

        c = _LAEA[3035]

        def cell_area(lon, lat):
            pts = [(lon, lat), (lon + 1, lat), (lon + 1, lat + 1), (lon, lat + 1)]
            pr = [c.fwd(*p) for p in pts]
            return 0.5 * abs(
                sum(
                    pr[i][0] * pr[(i + 1) % 4][1] - pr[(i + 1) % 4][0] * pr[i][1]
                    for i in range(4)
                )
            )

        # same latitude band, different lon: areas equal to ~planar
        # quadrilateral truncation noise (the cell edges are chords)
        assert abs(cell_area(0, 50) - cell_area(20, 50)) / cell_area(0, 50) < 1e-4

    def test_round_trip_domain(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _LAEA,
        )

        c = _LAEA[3035]
        for lon in range(-30, 61, 10):
            for lat in range(0, 76, 5):
                e, n = c.fwd(float(lon), float(lat))
                lo, la = c.inv(e, n)
                # inverse uses the published truncated authalic series
                assert abs(lo - lon) < 1e-7 and abs(la - lat) < 1e-7

    def test_dispatcher(self, spark):
        row = spark.sql(
            "SELECT st_transform('POINT (10 52)', 4326, 3035) AS o,"
            " st_transform(st_transform('POINT (10 52)', 4326, 3035),"
            " 3035, 2154) AS comp"
        ).collect()[0]
        assert row["o"] == "POINT (4321000 3210000)" or row["o"].startswith("POINT (4321000")
        assert row["comp"].startswith("POINT (")


class TestAlbersEqualAreaConic:
    """Albers EAC EPSG:5070/3577 (r13): Snyder PP 1395 pp. 98-103."""

    def test_false_origin_anchors_are_exact_zero(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _AEA,
        )

        # rho(q0) is the same expression as rho0 and theta is exactly 0,
        # so the anchors are EXACT zeros, not epsilon-close ones
        assert _AEA[5070].fwd(-96.0, 23.0) == (0.0, 0.0)
        assert _AEA[3577].fwd(132.0, 0.0) == (0.0, 0.0)

    def test_equal_area_property_exact(self):
        # the defining property, checked against the EXACT ellipsoid quad
        # area A = a^2/2 * dlam * (q(lat2) - q(lat1)) (q is authalic)
        import math

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _AEA,
        )

        for srid, probes in ((5070, [(-100, 40), (-80, 30)]), (3577, [(140, -25), (120, -40)])):
            c = _AEA[srid]
            for lon, lat in probes:
                d = 0.01
                pts = [(lon, lat), (lon + d, lat), (lon + d, lat + d), (lon, lat + d)]
                pr = [c.fwd(*p) for p in pts]
                area_p = 0.5 * abs(
                    sum(
                        pr[i][0] * pr[(i + 1) % 4][1] - pr[(i + 1) % 4][0] * pr[i][1]
                        for i in range(4)
                    )
                )
                q1 = c._q(math.radians(lat))
                q2 = c._q(math.radians(lat + d))
                area_e = c.a * c.a / 2.0 * math.radians(d) * (q2 - q1)
                assert abs(area_p / area_e - 1.0) < 1e-8

    def test_standard_parallels_are_distortion_free(self):
        # along each standard parallel the cone touches the ellipsoid:
        # projected E-W distance == a * m(phi_sp) * dlam exactly
        import math

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _AEA,
        )

        for srid, sps in ((5070, (29.5, 45.5)), (3577, (-18.0, -36.0))):
            c = _AEA[srid]
            for sp in sps:
                d = 0.01
                (x1, y1), (x2, y2) = c.fwd(-96.0, sp), c.fwd(-96.0 + d, sp)
                chord = math.hypot(x2 - x1, y2 - y1)
                truth = c.a * c._m(math.radians(sp)) * math.radians(d)
                assert abs(chord / truth - 1.0) < 1e-6

    def test_round_trip_global_grid(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _AEA,
        )

        for srid in (5070, 3577):
            c = _AEA[srid]
            for lon in range(-178, 180, 17):
                for lat in range(-80, 81, 8):
                    e, n = c.fwd(lon + 0.25, lat + 0.25)
                    lo, la = c.inv(e, n)
                    # truncated authalic series: ~1.4e-8 deg worst case
                    assert abs(lo - (lon + 0.25)) < 1e-7
                    assert abs(la - (lat + 0.25)) < 1e-7

    def test_south_aspect_cone_axes(self):
        # 3577's cone constant n < 0 (southern SPs): moving NORTH from
        # the origin parallel must still increase northing
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _AEA,
        )

        c = _AEA[3577]
        assert c.n < 0
        _, n_lo = c.fwd(132.0, -35.0)
        _, n_hi = c.fwd(132.0, -20.0)
        assert n_hi > n_lo

    def test_dispatcher_and_composition(self, spark):
        row = spark.sql(
            "SELECT st_transform('POINT (-96 23)', 4326, 5070) AS us,"
            " st_transform('POINT (132 0)', 4326, 3577) AS au,"
            " st_transform(st_transform('POINT (-100 40)', 4326, 5070),"
            " 5070, 3857) AS comp"
        ).collect()[0]
        assert row["us"] == "POINT (0 0)"
        assert row["au"] == "POINT (0 0)"
        assert row["comp"].startswith("POINT (")


class TestPolarStereographic:
    """EPSG variant-B polar stereographic (r14, VERDICT r13 item 6):
    Snyder PP 1395 pp. 160-162 ellipsoidal forms, EPSG:3413 (Arctic),
    3031 (Antarctic), 3032 (the EPSG Guidance Note 7-2 worked example)."""

    def test_epsg_guidance_note_worked_example(self):
        # GN 7-2, Polar Stereographic variant B example (EPSG:3032):
        # (75°S, 120°E) -> E 7 255 380.79, N 7 053 389.56
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _PS,
        )

        e, n = _PS[3032].fwd(120.0, -75.0)
        assert e == pytest.approx(7_255_380.79, abs=0.01)
        assert n == pytest.approx(7_053_389.56, abs=0.01)
        lon, lat = _PS[3032].inv(7_255_380.79, 7_053_389.56)
        assert lon == pytest.approx(120.0, abs=1e-7)
        assert lat == pytest.approx(-75.0, abs=1e-7)

    def test_poles_are_exact(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _PS,
        )

        assert _PS[3413].fwd(37.0, 90.0) == (0.0, 0.0)  # any longitude
        assert _PS[3031].fwd(-123.0, -90.0) == (0.0, 0.0)
        assert _PS[3032].fwd(0.0, -90.0) == (6_000_000.0, 6_000_000.0)
        # the pole's inverse longitude is the CRS's own central meridian
        lon, lat = _PS[3031].inv(0.0, 0.0)
        assert (lon, lat) == (0.0, pytest.approx(-90.0))

    def test_standard_parallel_scale_true(self):
        # at the standard parallel the map distance equals the true
        # parallel-circle distance (k = 1): compare a 0.1° arc at 70°N
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _PS,
        )
        import math

        c = _PS[3413]
        x1, y1 = c.fwd(-45.0, 70.0)
        x2, y2 = c.fwd(-44.9, 70.0)
        mapped = math.hypot(x2 - x1, y2 - y1)
        a, inv_f = 6378137.0, 298.257223563
        f = 1.0 / inv_f
        e2 = f * (2.0 - f)
        s = math.sin(math.radians(70.0))
        true_arc = (
            a * math.cos(math.radians(70.0)) / math.sqrt(1.0 - e2 * s * s)
        ) * math.radians(0.1)
        assert mapped == pytest.approx(true_arc, rel=1e-6)

    def test_round_trip_both_aspects(self):
        import random

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _PS,
        )

        rng = random.Random(7)
        for _ in range(500):
            lon, lat = rng.uniform(-180, 180), rng.uniform(55, 89.95)
            for srid, la in ((3413, lat), (3031, -lat), (3032, -lat)):
                x, y = _PS[srid].fwd(lon, la)
                lo, lb = _PS[srid].inv(x, y)
                dl = abs((lo - lon + 180.0) % 360.0 - 180.0)
                assert dl < 1e-9 and abs(lb - la) < 1e-9, (srid, lon, la)

    def test_dispatcher_and_composition(self, spark):
        row = spark.sql(
            "SELECT st_transform('POINT (10 90)', 4326, 3413) AS np,"
            " st_transform('POINT (55 -90)', 4326, 3031) AS sp,"
            " st_transform(st_transform('POINT (-45 70)', 4326, 3413),"
            " 3413, 3031) AS comp"
        ).collect()[0]
        assert row["np"] == "POINT (0 0)"
        assert row["sp"] == "POINT (0 0)"
        assert row["comp"].startswith("POINT (")


class TestNationalTmGrids:
    """r14: general transverse Mercator (Krüger series per-ellipsoid) —
    EPSG:27700 British National Grid (Airy 1830 + EPSG:1314 Helmert)
    and EPSG:2180 Poland CS92 (GRS80, no shift)."""

    def test_os_worked_example(self):
        # "A guide to coordinate systems in Great Britain", Annex C:
        # OSGB36 (52°39'27.2531"N, 1°43'4.5177"E) -> E 651409.903,
        # N 313177.270 (TM kernel only, local datum)
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _TM,
        )

        lat = 52 + 39 / 60 + 27.2531 / 3600
        lon = 1 + 43 / 60 + 4.5177 / 3600
        e, n = _TM[27700].fwd_local(lon, lat)
        assert e == pytest.approx(651409.903, abs=0.002)
        assert n == pytest.approx(313177.270, abs=0.002)
        lo, la = _TM[27700].inv_local(651409.903, 313177.270)
        assert lo == pytest.approx(lon, abs=1e-8)
        assert la == pytest.approx(lat, abs=1e-8)

    def test_natural_origin_anchors_exact(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _TM,
        )

        assert _TM[27700].fwd_local(-2.0, 49.0) == (400_000.0, -100_000.0)
        assert _TM[2180].fwd(19.0, 0.0) == (500_000.0, -5_300_000.0)

    def test_helmert_datum_shift_magnitude_and_round_trip(self):
        import math

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _TM, _WGS84_AB, _helmert_geodetic,
        )

        c = _TM[27700]
        # OSGB36 and WGS84 geodetic coordinates of a London point
        # differ by the well-known ~120 m (would be ~0 if the shift
        # were silently skipped — the wrong-answer class this closes)
        lo2, la2 = _helmert_geodetic(
            -0.1276, 51.5072, _WGS84_AB, c._ab(), c.helmert, inverse=True
        )
        d = math.hypot(
            (lo2 + 0.1276) * math.cos(math.radians(51.5)) * 111_320.0,
            (la2 - 51.5072) * 111_132.0,
        )
        assert 80.0 < d < 180.0
        # the algebraic-inverse Helmert round-trips to ~1e-9 deg
        lo3, la3 = _helmert_geodetic(
            lo2, la2, c._ab(), _WGS84_AB, c.helmert, inverse=False
        )
        # ~1e-8 deg (~1.4 mm): the 2D convention drops ellipsoidal
        # height like proj's 2D pipeline, so the shifted point re-seats
        # on the target ellipsoid surface — not an inverse-formula error
        # (the rotation inverse is algebraically exact)
        assert lo3 == pytest.approx(-0.1276, abs=5e-8)
        assert la3 == pytest.approx(51.5072, abs=5e-8)

    def test_round_trip_domains(self):
        import random

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _TM,
        )

        rng = random.Random(11)
        for _ in range(300):
            lon, lat = rng.uniform(-7.5, 2.0), rng.uniform(49.5, 60.5)  # GB
            e, n = _TM[27700].fwd(lon, lat)
            lo, la = _TM[27700].inv(e, n)
            assert abs(lo - lon) < 1e-7 and abs(la - lat) < 1e-7
            lon, lat = rng.uniform(14.0, 24.2), rng.uniform(49.0, 55.0)  # PL
            e, n = _TM[2180].fwd(lon, lat)
            lo, la = _TM[2180].inv(e, n)
            assert abs(lo - lon) < 1e-7 and abs(la - lat) < 1e-7

    def test_dispatcher(self, spark):
        row = spark.sql(
            "SELECT st_transform('POINT (19 0)', 4326, 2180) AS pl,"
            " st_transform(st_transform('POINT (-0.1276 51.5072)', 4326, 27700),"
            " 27700, 4326) AS rt"
        ).collect()[0]
        assert row["pl"] == "POINT (500000 -5300000)"
        x, y = map(float, row["rt"][7:-1].split())
        assert x == pytest.approx(-0.1276, abs=1e-7)
        assert y == pytest.approx(51.5072, abs=1e-7)


def test_tm_pole_is_finite_not_crash(spark):
    # code-review r14: atanh(sin(±90°)) raised inside the UDF and
    # failed the whole Spark task; the Krüger limit at the pole is
    # finite (ξ' = ±π/2, η' = 0)
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
        _TM, _utm_fwd,
    )

    e, n = _TM[2180].fwd(19.0, 90.0)
    assert e == 500_000.0 and 4_000_000.0 < n < 5_000_000.0
    e, n = _utm_fwd(9.0, 90.0, 32, True)
    assert e == 500_000.0 and 9_900_000.0 < n < 10_100_000.0
    row = spark.sql(
        "SELECT st_transform('POINT (19 90)', 4326, 2180) AS p"
    ).collect()[0]
    assert row["p"].startswith("POINT (500000 ")


class TestProjParamStrings:
    """'+proj=' parameter strings (r16, VERDICT r15 task 3): published
    EPSG parameter sets over the existing closed-form kernels."""

    def _pt(self, x, y):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.geometry import (
            Geometry,
        )

        return Geometry("Point", (x, y))

    def test_nztm_anchor_and_roundtrip(self):
        # NZGD2000 / NZTM2000 (EPSG:2193, LINZ published definition):
        # tmerc lat_0=0 lon_0=173E k=0.9996 FE 1 600 km FN 10 000 km GRS80
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        nztm = (
            "+proj=tmerc +lat_0=0 +lon_0=173 +k=0.9996 +x_0=1600000 "
            "+y_0=10000000 +ellps=GRS80 +units=m +no_defs"
        )
        assert transform_any(self._pt(173.0, 0.0), 4326, nztm).coords == (
            1_600_000.0,
            10_000_000.0,
        )
        e, n = transform_any(self._pt(174.76, -36.85), 4326, nztm).coords
        # Auckland lands in the published NZTM range
        assert 1_740_000 < e < 1_780_000 and 5_900_000 < n < 5_940_000
        lon, lat = transform_any(self._pt(e, n), nztm, 4326).coords
        assert abs(lon - 174.76) < 1e-9 and abs(lat + 36.85) < 1e-8

    def test_ups_north_gn72_worked_example(self):
        # EPSG GN 7-2 §3.2.4 Polar Stereographic VARIANT A worked
        # example (WGS84 / UPS North, EPSG:5041): k0=0.994,
        # FE=FN=2 000 km; 73°N 44°E -> E 3 320 416.75, N 632 668.43
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        ups = (
            "+proj=stere +lat_0=90 +k=0.994 +x_0=2000000 +y_0=2000000 "
            "+ellps=WGS84"
        )
        e, n = transform_any(self._pt(44.0, 73.0), 4326, ups).coords
        assert round(e, 2) == 3_320_416.75 and round(n, 2) == 632_668.43
        # the pole itself is the false origin, exactly
        assert transform_any(self._pt(44.0, 90.0), 4326, ups).coords == (
            2_000_000.0,
            2_000_000.0,
        )
        lon, lat = transform_any(self._pt(e, n), ups, 4326).coords
        assert abs(lon - 44.0) < 1e-9 and abs(lat - 73.0) < 1e-9

    def test_param_paths_equal_table_paths_exactly(self):
        # same parameters -> same kernel classes -> bitwise-equal
        # results; pins that every parameter lands in the right slot
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform,
            transform_any,
        )

        pairs = [
            # UTM 59S vs EPSG:32759
            ("+proj=utm +zone=59 +south +ellps=WGS84", 32759, (171.5, -41.3)),
            # British National Grid full params incl. the EPSG:1314
            # Helmert vs EPSG:27700
            (
                "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
                "+x_0=400000 +y_0=-100000 +ellps=airy "
                "+towgs84=446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894",
                27700,
                (-0.1276, 51.5072),
            ),
            # Lambert-93 vs EPSG:2154
            (
                "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 "
                "+x_0=700000 +y_0=6600000 +ellps=GRS80",
                2154,
                (2.35, 48.85),
            ),
            # LAEA Europe vs EPSG:3035
            (
                "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
                "+ellps=GRS80",
                3035,
                (10.5, 51.0),
            ),
            # Conus Albers vs EPSG:5070
            (
                "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 "
                "+x_0=0 +y_0=0 +ellps=GRS80",
                5070,
                (-96.5, 39.0),
            ),
            # Antarctic variant-B stere vs EPSG:3032
            (
                "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=70 "
                "+x_0=6000000 +y_0=6000000 +ellps=WGS84",
                3032,
                (120.0, -75.0),
            ),
        ]
        for text, srid, (lon, lat) in pairs:
            a = transform_any(self._pt(lon, lat), 4326, text).coords
            b = transform(self._pt(lon, lat), 4326, srid).coords
            assert a == b, (text, srid, a, b)
            # and the inverse direction
            aa = transform_any(self._pt(*a), text, 4326).coords
            bb = transform(self._pt(*b), srid, 4326).coords
            assert aa == bb

    def test_california_albers_3310(self):
        # NAD83 / California Albers (EPSG:3310): aea 34/40.5, origin
        # (0, -120), FN -4 000 km — a US state grid outside the closed
        # table; origin anchor is exact
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        ca = (
            "+proj=aea +lat_1=34 +lat_2=40.5 +lat_0=0 +lon_0=-120 "
            "+x_0=0 +y_0=-4000000 +ellps=GRS80 +units=m"
        )
        assert transform_any(self._pt(-120.0, 0.0), 4326, ca).coords == (
            0.0,
            -4_000_000.0,
        )
        e, n = transform_any(self._pt(-118.24, 34.05), 4326, ca).coords
        lon, lat = transform_any(self._pt(e, n), ca, 4326).coords
        assert abs(lon + 118.24) < 1e-9 and abs(lat - 34.05) < 1e-7

    def test_longlat_and_towgs84_only(self):
        # a pure datum leg: longlat + OSGB Helmert must equal the
        # geodetic part of the 27700 path (inverse-of-inverse identity)
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        osgb_geo = (
            "+proj=longlat +ellps=airy "
            "+towgs84=446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894"
        )
        lon, lat = transform_any(self._pt(-0.1276, 51.5072), 4326, osgb_geo).coords
        # the shift moves London coordinates by order-of-arcseconds
        assert 1e-5 < abs(lon + 0.1276) < 3e-3 and 1e-5 < abs(lat - 51.5072) < 3e-3
        back = transform_any(self._pt(lon, lat), osgb_geo, 4326).coords
        # 1e-8-degree class: the 2-D height-drop through the XYZ hop
        # (same residue the 27700 path documents)
        assert abs(back[0] + 0.1276) < 1e-7 and abs(back[1] - 51.5072) < 1e-7

    def test_loud_rejections(self):
        import pytest as _pytest

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        bads = [
            "+proj=robin +lon_0=0",           # unsupported projection
            "+proj=lcc +lat_1=30 +lat_2=30",  # 1SP degeneracy
            "+proj=stere +lat_0=52",          # oblique stere -> sterea
            "+proj=utm",                      # missing zone
            "+proj=utm +zone=61",             # zone out of range
            "+proj=tmerc +units=km",          # unknown unit (r17)
            "+proj=tmerc +units=m +to_meter=1",  # both unit forms (r17)
            "+proj=tmerc +to_meter=0",        # degenerate factor (r17)
            "+proj=longlat +units=us-ft",     # units on geographic (r17)
            "+proj=tmerc +lat_0=",            # empty value (ADVICE r16)
            "+proj=tmerc +foo=1",             # unknown parameter
            "+proj=tmerc +ellps=venus",       # unknown ellipsoid
            "+proj=tmerc +a=6378137",         # +a without +rf/+b
            "+proj=tmerc +datum=NAD27",       # grid-file datum
            "+proj=aea +lat_1=30",            # aea missing lat_2
            "+proj=omerc +lat_0=4 +alpha=53",            # omerc no lonc
            "+proj=omerc +lat_0=4 +lonc=115 +alpha=90",  # somerc's azimuth
            "+proj=omerc +lat_0=4 +lonc=115 +alpha=0",   # degenerate azimuth
            "+proj=omerc +lat_0=0 +lonc=115 +alpha=53",  # equatorial omerc
            "+proj=omerc +lat_0=4 +lonc=115 +lon_0=1 +alpha=53",  # lon_0
            "+proj=omerc +lat_0=4 +lonc=115 +alpha=53 +lat_1=5",  # 2-point
            "+proj=sterea +lat_0=90",         # polar sterea -> stere
            "no_plus_prefix",                 # bad token
            "+towgs84=1,2",                   # no +proj
        ]
        for text in bads:
            with _pytest.raises(ValueError):
                transform_any(self._pt(0.0, 0.0), 4326, text)

    def test_sql_surface_with_proj_strings(self, spark):
        row = spark.sql(
            "SELECT st_transform('POINT (173 0)', 4326,"
            " '+proj=tmerc +lat_0=0 +lon_0=173 +k=0.9996 +x_0=1600000"
            " +y_0=10000000 +ellps=GRS80') AS nztm,"
            " st_transform('POINT (19 0)', 'EPSG:4326', 'EPSG:2180') AS pl,"
            " st_transform(NULL, 4326, '+proj=utm +zone=1') AS nul"
        ).collect()[0]
        assert row["nztm"] == "POINT (1600000 10000000)"
        assert row["pl"] == "POINT (500000 -5300000)"
        assert row["nul"] is None


def test_projdef_silent_corruption_guards():
    # r16 self-review: parameters that previously produced silently
    # WRONG output (not a crash) must refuse loudly at parse
    import pytest as _pytest

    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.geometry import (
        Geometry,
    )
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
        transform_any,
    )

    pt = Geometry("Point", (1.0, 2.0))
    for text in [
        "+proj=tmerc +k=0",            # forward collapses to origin
        "+proj=tmerc +k=nan",
        "+proj=laea +lat_0=89.5",      # near-polar oblique: garbage
        "+proj=laea +lat_0=-89.5",
        "+proj=tmerc +a=nan +rf=298",  # NaN axis → NaN coordinates
        "+proj=tmerc +a=6378137 +rf=0.5",
        "+proj=tmerc +a=6378137 +b=7000000",  # b >= a
        "+proj=tmerc +lat_0=95",
        "+proj=tmerc +x_0=inf",
    ]:
        with _pytest.raises(ValueError):
            transform_any(pt, 4326, text)
    # the guards must not reject legitimate defs
    assert transform_any(pt, 4326, "+proj=laea +lat_0=52 +lon_0=10").coords


class TestPolarLaea:
    """r16: the polar LAEA aspect (Snyder PP 1395 pp. 188-190) — the
    EPSG:3574/3575/3576 Arctic/Antarctic grid class."""

    N = "+proj=laea +lat_0=90 +lon_0=10 +x_0=0 +y_0=0 +ellps=WGS84"
    S = "+proj=laea +lat_0=-90 +lon_0=0 +ellps=WGS84"

    def _pt(self, x, y):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.geometry import (
            Geometry,
        )

        return Geometry("Point", (x, y))

    def test_pole_exact_and_roundtrips(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        assert transform_any(self._pt(123.0, 90.0), 4326, self.N).coords == (
            0.0,
            0.0,
        )
        for lon, lat in [(10, 80), (0, 60), (-45, 75), (170, 55), (10, 0)]:
            e, n = transform_any(self._pt(lon, lat), 4326, self.N).coords
            lo, la = transform_any(self._pt(e, n), self.N, 4326).coords
            assert abs(lo - lon) < 1e-8 and abs(la - lat) < 1e-8, (lon, lat)
        e, n = transform_any(self._pt(13.0, -70.0), 4326, self.S).coords
        lo, la = transform_any(self._pt(e, n), self.S, 4326).coords
        assert abs(lo - 13.0) < 1e-8 and abs(la + 70.0) < 1e-8

    def test_equator_radius_is_authalic_hemisphere(self):
        # ρ at the equator = a·√(q_p) EXACTLY (q(0) = 0): a strong
        # internal pin tying the polar kernel to the authalic setup
        import math

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.spheroid import (
            _authalic_setup,
        )

        qp, _e = _authalic_setup(6378137.0, 1.0 / 298.257223563)
        e, n = transform_any(self._pt(10.0, 0.0), 4326, self.N).coords
        assert math.hypot(e, n) == 6378137.0 * math.sqrt(qp)

    def test_central_meridian_axis(self):
        # along λ = λ₀ the easting is exactly 0 (sin 0 = 0) and points
        # march straight down the -N axis (north aspect)
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        last = 0.0
        for lat in (89, 80, 60, 30, 0):
            e, n = transform_any(self._pt(10.0, lat), 4326, self.N).coords
            assert e == 0.0 and n <= last
            last = n


class TestMercatorEllipsoidal:
    """r16: ellipsoidal Mercator — EPSG:3395 (World Mercator) in the
    SRID table, '+proj=merc' variants A (+k) and B (+lat_ts)."""

    def _pt(self, x, y):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.geometry import (
            Geometry,
        )

        return Geometry("Point", (x, y))

    def test_gn72_makassar_worked_example(self):
        # EPSG GN 7-2 Mercator (variant A) worked example — Makassar /
        # NEIEZ (EPSG:3002, Bessel 1841): 3°S 120°E ->
        # E 5 009 726.58, N 569 150.82
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        m = (
            "+proj=merc +lon_0=110 +k=0.997 +x_0=3900000 +y_0=900000 "
            "+ellps=bessel"
        )
        e, n = transform_any(self._pt(120.0, -3.0), 4326, m).coords
        assert round(e, 2) == 5_009_726.58 and round(n, 2) == 569_150.82
        lo, la = transform_any(self._pt(e, n), m, 4326).coords
        assert abs(lo - 120.0) < 1e-9 and abs(la + 3.0) < 1e-9

    def test_world_mercator_3395(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform,
        )

        # the equator is exact, and x matches spherical 3857 exactly
        # (both are a·λ) while y differs by the ellipsoidal correction
        eq = transform(self._pt(13.0, 0.0), 4326, 3395).coords
        assert eq[1] == 0.0
        a = transform(self._pt(10.0, 50.0), 4326, 3395).coords
        b = transform(self._pt(10.0, 50.0), 4326, 3857).coords
        assert a[0] == b[0]
        assert 30_000 < b[1] - a[1] < 36_000  # the known ~33 km gap
        for lon, lat in [(13, 52), (-70, -33), (179, 84), (0, -80)]:
            e, n = transform(self._pt(lon, lat), 4326, 3395).coords
            lo, la = transform(self._pt(e, n), 3395, 4326).coords
            assert abs(lo - lon) < 1e-9 and abs(la - lat) < 1e-8

    def test_variant_b_lat_ts(self):
        # +lat_ts=0 is variant A with k0=1; a nonzero standard parallel
        # scales both axes by cos(φts)/√(1−e²sin²φts)
        import math

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        a0 = transform_any(self._pt(10.0, 30.0), 4326, "+proj=merc").coords
        b0 = transform_any(
            self._pt(10.0, 30.0), 4326, "+proj=merc +lat_ts=0"
        ).coords
        assert a0 == b0
        c = transform_any(
            self._pt(10.0, 30.0), 4326, "+proj=merc +lat_ts=45"
        ).coords
        e2 = (1.0 / 298.257223563) * (2.0 - 1.0 / 298.257223563)
        s = math.sin(math.radians(45.0))
        k = math.cos(math.radians(45.0)) / math.sqrt(1.0 - e2 * s * s)
        assert abs(c[0] - a0[0] * k) < 1e-6 and abs(c[1] - a0[1] * k) < 1e-6

    def test_merc_rejections(self):
        import pytest as _pytest

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        for text in ["+proj=merc +lat_0=5", "+proj=merc +lat_ts=90"]:
            with _pytest.raises(ValueError):
                transform_any(self._pt(0.0, 0.0), 4326, text)


class TestSwissGrids:
    """r16: CH1903 / LV03 (EPSG:21781) and CH1903+ / LV95 (EPSG:2056)
    via the swisstopo rigorous double projection."""

    def _pt(self, x, y):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.geometry import (
            Geometry,
        )

        return Geometry("Point", (x, y))

    def test_swisstopo_published_test_point(self):
        # swisstopo's own WGS84 example: 8°43'49.79" E, 46°02'38.87" N
        # -> LV03 (700 000 / 100 000); the single-Helmert leg lands
        # within the documented ~5 cm of the grid truth
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform,
        )

        lon = 8 + 43 / 60 + 49.79 / 3600
        lat = 46 + 2 / 60 + 38.87 / 3600
        e, n = transform(self._pt(lon, lat), 4326, 21781).coords
        assert abs(e - 700_000.0) < 0.05 and abs(n - 100_000.0) < 0.05
        # LV95 is the same projection shifted by (+2 000 000, +1 000 000)
        e95, n95 = transform(self._pt(lon, lat), 4326, 2056).coords
        # equal up to the larger false origin's float granularity
        assert abs(e95 - (e + 2_000_000.0)) < 1e-6
        assert abs(n95 - (n + 1_000_000.0)) < 1e-6

    def test_fundamental_point_is_false_origin(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _SWISS,
        )

        phi0 = 46 + 57 / 60 + 8.66 / 3600
        lam0 = 7 + 26 / 60 + 22.50 / 3600
        y, x = _SWISS[21781]._fwd_local(lam0, phi0)
        assert abs(y - 600_000.0) < 1e-6 and abs(x - 200_000.0) < 1e-6

    def test_roundtrip_over_switzerland(self):
        import random

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform,
        )

        rng = random.Random(2056)
        for _ in range(120):
            lon, lat = rng.uniform(5.9, 10.5), rng.uniform(45.8, 47.8)
            e, n = transform(self._pt(lon, lat), 4326, 21781).coords
            assert 480_000 < e < 850_000 and 70_000 < n < 300_000
            lo, la = transform(self._pt(e, n), 21781, 4326).coords
            assert abs(lo - lon) < 1e-7 and abs(la - lat) < 1e-7

    def test_sql_surface(self, spark):
        row = spark.sql(
            "SELECT st_transform('POINT (7.43958333333 46.9524055556)',"
            " 4326, 21781) AS bern"
        ).collect()[0]
        # Bern's WGS84 coordinates sit ~100-200 m from the CH1903
        # fundamental point's numbers (the datum shift) — magnitude pin
        x, y = map(float, row["bern"][7:-1].split())
        assert abs(x - 600_000) < 500 and abs(y - 200_000) < 500


def test_somerc_param_string_matches_swiss_table():
    # the full proj string for EPSG:21781 (+towgs84 = the CH1903
    # shift) must match the table path bitwise — pins the somerc
    # parser wiring end to end
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.geometry import (
        Geometry,
    )
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
        transform,
        transform_any,
    )

    text = (
        "+proj=somerc +lat_0=46.952405555555554 "
        "+lon_0=7.439583333333333 +k_0=1 +x_0=600000 +y_0=200000 "
        "+ellps=bessel +towgs84=674.374,15.056,405.346 +units=m +no_defs"
    )
    for lon, lat in [(8.0, 46.5), (7.44, 46.95), (9.83, 46.5), (6.14, 46.2)]:
        a = transform_any(Geometry("Point", (lon, lat)), 4326, text).coords
        b = transform(Geometry("Point", (lon, lat)), 4326, 21781).coords
        # the decimal +lat_0/+lon_0 literals differ from the table's
        # DMS fractions at the last ulp → sub-µm, not bitwise
        assert abs(a[0] - b[0]) < 1e-6 and abs(a[1] - b[1]) < 1e-6, (lon, lat)
        aa = transform_any(Geometry("Point", a), text, 4326).coords
        bb = transform(Geometry("Point", b), 21781, 4326).coords
        assert abs(aa[0] - bb[0]) < 1e-12 and abs(aa[1] - bb[1]) < 1e-12


class TestProjUnits:
    """+units= / +to_meter= (r17, VERDICT r16 task 2): projected output
    units as a linear scale over the existing kernels — +x_0/+y_0 stay
    in meters, the proj convention."""

    def _pt(self, x, y):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.geometry import (
            Geometry,
        )

        return Geometry("Point", (x, y))

    # EPSG GN 7-2 §3.2.1 Lambert Conic Conformal (2SP) worked example:
    # NAD27 / Texas South Central in US survey feet (Clarke 1866,
    # SP 28°23' / 30°17', origin 27°50'N 99°W, FE 2 000 000 ftUS
    # = 609 601.2192024384 m)
    TX = (
        "+proj=lcc +lat_1=28.383333333333333 +lat_2=30.283333333333333 "
        "+lat_0=27.833333333333332 +lon_0=-99 +x_0=609601.2192024384 "
        "+y_0=0 +ellps=clrk66 +units=us-ft"
    )

    def test_gn72_texas_south_central_ftus(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        # published: 28°30'N 96°W -> E 2 963 503.91, N 254 759.80 ftUS
        e, n = transform_any(self._pt(-96.0, 28.5), 4326, self.TX).coords
        assert round(e, 2) == 2_963_503.91 and round(n, 2) == 254_759.80
        lon, lat = transform_any(self._pt(e, n), self.TX, 4326).coords
        assert abs(lon + 96.0) < 1e-9 and abs(lat - 28.5) < 1e-7

    def test_to_meter_matches_units_bitwise(self):
        # +to_meter= with the exact us-ft double (1200/3937) must take
        # the SAME code path scale -> bitwise-equal output
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        tm = self.TX.replace("+units=us-ft", f"+to_meter={1200.0 / 3937.0!r}")
        for lon, lat in [(-96.0, 28.5), (-99.0, 29.0), (-97.5, 30.0)]:
            a = transform_any(self._pt(lon, lat), 4326, self.TX).coords
            b = transform_any(self._pt(lon, lat), 4326, tm).coords
            assert a == b, (lon, lat)

    def test_unit_roundtrips_against_meter_form_exactly(self):
        # the meter form x must equal the ftUS form x times the factor
        # (one IEEE divide then multiply: within 1 ulp), and the
        # inverse must recover the input to the kernel's own precision
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        m = self.TX.replace(" +units=us-ft", "")
        u = 1200.0 / 3937.0
        for lon, lat in [(-96.0, 28.5), (-98.0, 28.0), (-100.0, 31.0)]:
            xm, ym = transform_any(self._pt(lon, lat), 4326, m).coords
            xf, yf = transform_any(self._pt(lon, lat), 4326, self.TX).coords
            assert abs(xf * u - xm) <= abs(xm) * 1e-15
            assert abs(yf * u - ym) <= max(abs(ym) * 1e-15, 1e-9)
            lo, la = transform_any(self._pt(xf, yf), self.TX, 4326).coords
            assert abs(lo - lon) < 1e-9 and abs(la - lat) < 1e-7

    def test_nad83_datum_and_intl_foot(self):
        # a pasted EPSG:2263 string (NY Long Island, +datum=NAD83,
        # ftUS): Manhattan lands in the published coordinate range
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        ny = (
            "+proj=lcc +lat_1=41.03333333333333 +lat_2=40.66666666666666 "
            "+lat_0=40.16666666666666 +lon_0=-74 +x_0=300000.0000000001 "
            "+y_0=0 +ellps=GRS80 +datum=NAD83 +units=us-ft +no_defs"
        )
        e, n = transform_any(self._pt(-73.98, 40.75), 4326, ny).coords
        assert 975_000 < e < 1_005_000 and 195_000 < n < 230_000
        lon, lat = transform_any(self._pt(e, n), ny, 4326).coords
        assert abs(lon + 73.98) < 1e-9 and abs(lat - 40.75) < 1e-7
        # international foot differs from us-ft by 2 ppm — visibly
        # different at the ~1M-ft magnitudes but same kernel
        ift = ny.replace("+units=us-ft", "+units=ft")
        e2, _n2 = transform_any(self._pt(-73.98, 40.75), 4326, ift).coords
        assert abs(e2 - e) > 1.0 and abs(e2 - e) < 10.0


class TestHotineObliqueMercator:
    """'+proj=omerc' (r17, VERDICT r16 task 3): EPSG GN 7-2 Hotine
    Oblique Mercator closed forms, variants A/B."""

    def _pt(self, x, y):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.geometry import (
            Geometry,
        )

        return Geometry("Point", (x, y))

    # Timbalai 1948 / RSO Borneo (m) — the GN 7-2 §3.2.6 worked
    # example (Everest 1830 1967, φc 4°N λc 115°E,
    # αc 53°18'56.9537" γc 53°07'48.3685" kc 0.99984,
    # Ec 590 476.87 Nc 442 857.65 — variant B)
    RSO = (
        "+proj=omerc +lat_0=4 +lonc=115 "
        "+alpha=53.31582047222222 +gamma=53.13010236111111 "
        "+k=0.99984 +x_0=590476.87 +y_0=442857.65 +ellps=evrstSS"
    )

    def test_gn72_timbalai_worked_example(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        # published test point: 5°23'14.1129"N 115°48'19.8196"E
        # -> E 679 245.73, N 596 562.78
        lon = 115.0 + 48.0 / 60.0 + 19.8196 / 3600.0
        lat = 5.0 + 23.0 / 60.0 + 14.1129 / 3600.0
        e, n = transform_any(self._pt(lon, lat), 4326, self.RSO).coords
        assert round(e, 2) == 679_245.73 and round(n, 2) == 596_562.78
        lo, la = transform_any(self._pt(e, n), self.RSO, 4326).coords
        assert abs(lo - lon) < 1e-9 and abs(la - lat) < 1e-7

    def test_variant_a_no_uoff_offset(self):
        # variant A differs from B by exactly the (u_c sin/cos γc)
        # offset — a rigid translation of the grid
        import math

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _parse_projdef,
        )

        b = _parse_projdef(self.RSO)
        a = _parse_projdef(self.RSO + " +no_uoff")
        pts = [(115.5, 5.0), (114.0, 4.5), (116.5, 6.0)]
        deltas = set()
        for lon, lat in pts:
            eb, nb = b.fwd(lon, lat)
            ea, na = a.fwd(lon, lat)
            deltas.add((round(ea - eb, 6), round(na - nb, 6)))
        assert len(deltas) == 1  # constant shift
        de, dn = deltas.pop()
        assert math.hypot(de, dn) > 100_000  # u_c is ~738 km for RSO

    def test_alaska_zone_1_negative_azimuth(self):
        # NAD27 / Alaska zone 1 (EPSG:26731 parameter set, meters form):
        # αc = -36°52'11.6315", γc defaults to αc; Juneau round-trips
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        ak = (
            "+proj=omerc +lat_0=57 +lonc=-133.6666666666667 "
            "+alpha=-36.86989764583333 +k=0.9999 "
            "+x_0=5000000 +y_0=-5000000 +ellps=clrk66"
        )
        e, n = transform_any(self._pt(-134.42, 58.3), 4326, ak).coords
        lo, la = transform_any(self._pt(e, n), ak, 4326).coords
        assert abs(lo + 134.42) < 1e-9 and abs(la - 58.3) < 1e-7

    def test_pole_is_null_domain(self):
        import math

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _parse_projdef,
        )

        e, n = _parse_projdef(self.RSO).fwd(115.0, 90.0)
        assert math.isnan(e) and math.isnan(n)


class TestObliqueStereographic:
    """'+proj=sterea' (r17, VERDICT r16 task 3): EPSG GN 7-2 oblique
    stereographic (double projection via the Gauss conformal sphere)."""

    def _pt(self, x, y):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.geometry import (
            Geometry,
        )

        return Geometry("Point", (x, y))

    # Amersfoort / RD New (EPSG:28992 parameter set, no datum leg):
    # Bessel 1841, origin 52°09'22.178"N 5°23'15.500"E, k0 0.9999079,
    # FE 155 000, FN 463 000
    RD = (
        "+proj=sterea +lat_0=52.15616055555556 "
        "+lon_0=5.387638888888889 +k=0.9999079 "
        "+x_0=155000 +y_0=463000 +ellps=bessel"
    )

    def test_gn72_rd_new_worked_example(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        # published: 53°N 6°E -> E 196 105.283, N 557 057.739
        e, n = transform_any(self._pt(6.0, 53.0), 4326, self.RD).coords
        assert round(e, 3) == 196_105.283 and round(n, 3) == 557_057.739
        lo, la = transform_any(self._pt(e, n), self.RD, 4326).coords
        assert abs(lo - 6.0) < 1e-12 and abs(la - 53.0) < 1e-12

    def test_origin_is_false_origin(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        e, n = transform_any(
            self._pt(5.387638888888889, 52.15616055555556), 4326, self.RD
        ).coords
        # χ(φ0) = χ0 and Λ = Λ0 -> E,N = FE,FN up to one trig rounding
        assert abs(e - 155_000.0) < 1e-6 and abs(n - 463_000.0) < 1e-6

    def test_roundtrip_over_netherlands(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        for lon, lat in [(4.9, 52.37), (6.57, 53.22), (5.12, 51.44), (3.61, 51.5)]:
            e, n = transform_any(self._pt(lon, lat), 4326, self.RD).coords
            lo, la = transform_any(self._pt(e, n), self.RD, 4326).coords
            assert abs(lo - lon) < 1e-11 and abs(la - lat) < 1e-11, (lon, lat)


def test_ellipsoidal_mercator_pole_is_null(spark):
    # ADVICE r16: a pole through ellipsoidal Mercator must NOT clamp to
    # a plausible finite northing — the UDF returns NULL (±inf gate)
    row = spark.sql(
        "SELECT st_transform('POINT (10 90)', 4326, 3395) AS p,"
        " st_transform('POINT (10 -90)', 4326,"
        " '+proj=merc +lon_0=0 +ellps=WGS84') AS s,"
        " st_transform('POINT (10 89.9)', 4326, 3395) AS near"
    ).collect()[0]
    assert row["p"] is None and row["s"] is None
    assert row["near"] is not None  # in-domain stays finite


class TestKrovak:
    """'+proj=krovak' (r17): EPSG 9819 oblique conformal conic — the
    Czech/Slovak S-JTSK grid, GN 7-2 worked example pinned."""

    # EPSG:5514 parameter set WITHOUT the datum leg (the worked
    # example's input coordinates are Bessel geodetic already)
    KR = (
        "+proj=krovak +lat_0=49.5 +lon_0=24.833333333333332 "
        "+alpha=30.28813972222222 +k=0.9999 +x_0=0 +y_0=0 +ellps=bessel"
    )
    LON = 16.0 + 50.0 / 60.0 + 59.1790 / 3600.0
    LAT = 50.0 + 12.0 / 60.0 + 32.4416 / 3600.0

    def _pt(self, x, y):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.geometry import (
            Geometry,
        )

        return Geometry("Point", (x, y))

    def test_gn72_worked_example(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        # published: southing 1 050 538.64, westing 568 991.00 ->
        # Krovak East North: E -568 991.00, N -1 050 538.64/.65
        e, n = transform_any(self._pt(self.LON, self.LAT), 4326, self.KR).coords
        assert abs(e + 568_991.00) < 0.01 and abs(n + 1_050_538.646) < 0.01
        lo, la = transform_any(self._pt(e, n), self.KR, 4326).coords
        assert abs(lo - self.LON) < 1e-9 and abs(la - self.LAT) < 1e-9

    def test_czech_flag_is_southing_westing(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _parse_projdef,
        )

        en = _parse_projdef(self.KR)
        sw = _parse_projdef(self.KR.replace("+proj=krovak", "+proj=krovak +czech"))
        for lon, lat in [(self.LON, self.LAT), (14.42, 50.09), (17.1, 48.15)]:
            e, n = en.fwd(lon, lat)
            x, y = sw.fwd(lon, lat)
            assert (x, y) == (-n, -e), (lon, lat)
            lo, la = sw.inv(x, y)
            assert abs(lo - lon) < 1e-9 and abs(la - lat) < 1e-9

    def test_defaults_match_explicit(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _parse_projdef,
        )

        d = _parse_projdef("+proj=krovak +ellps=bessel")
        x = _parse_projdef(self.KR)
        # the DMS defaults reproduce the explicit decimal parameters
        # to float precision
        a = d.fwd(self.LON, self.LAT)
        b = x.fwd(self.LON, self.LAT)
        assert abs(a[0] - b[0]) < 1e-4 and abs(a[1] - b[1]) < 1e-4

    def test_degenerate_refusals(self):
        import pytest as _pytest

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _parse_projdef,
        )

        for bad in [
            "+proj=krovak +lat_0=5",     # out of the method's domain
            "+proj=krovak +lat_0=75",
            "+proj=krovak +alpha=0",     # degenerate rotation
            "+proj=krovak +alpha=90",
            "+proj=krovak +k=0",         # zero scale (shared guard)
        ]:
            with _pytest.raises(ValueError):
                _parse_projdef(bad)


class TestEqcCassPm:
    """'+proj=eqc', '+proj=cass', and '+pm=' (r17)."""

    def _pt(self, x, y):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.geometry import (
            Geometry,
        )

        return Geometry("Point", (x, y))

    def test_eqc_closed_form_and_meridian_arc(self):
        import math

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        eq = "+proj=eqc +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84"
        e, n = transform_any(self._pt(10.0, 55.0), 4326, eq).coords
        assert e == 6378137.0 * math.radians(10.0)  # exact closed form
        # N equals the numerically integrated WGS84 meridian arc
        a, f = 6378137.0, 1.0 / 298.257223563
        e2 = f * (2 - f)

        def mp(phi):
            return a * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5

        phi1 = math.radians(55.0)
        steps = 20000
        h = phi1 / steps
        s = mp(0) + mp(phi1)
        for k in range(1, steps):
            s += (4 if k % 2 else 2) * mp(k * h)
        assert abs(n - s * h / 3) < 1e-6
        lo, la = transform_any(self._pt(e, n), eq, 4326).coords
        assert abs(lo - 10.0) < 1e-12 and abs(la - 55.0) < 1e-9
        # lat_ts shrinks E by cos(φ1)-with-ellipsoidal-correction
        eq30 = eq.replace("+lat_ts=0", "+lat_ts=30")
        e30, _ = transform_any(self._pt(10.0, 55.0), 4326, eq30).coords
        assert e30 < e

    def test_cass_gn72_trinidad_links(self):
        # EPSG GN 7-2 §3.2.2 Cassini-Soldner worked example: Trinidad
        # 1903, Clarke 1858, FE 430 000 / FN 325 000 Clarke's links
        # (1 link = 0.201166195164 m): 10°N 62°W ->
        # E 66 644.94, N 82 536.22 links
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            transform_any,
        )

        ca = (
            "+proj=cass +lat_0=10.441666666666666 "
            "+lon_0=-61.333333333333336 "
            "+x_0=86501.46392052001 +y_0=65379.0134283 "
            "+a=6378293.645208759 +b=6356617.987679838 "
            "+to_meter=0.201166195164"
        )
        e, n = transform_any(self._pt(-62.0, 10.0), 4326, ca).coords
        assert round(e, 2) == 66_644.94 and round(n, 2) == 82_536.22
        # the natural origin is the false origin, exactly-ish
        e0, n0 = transform_any(
            self._pt(-61.333333333333336, 10.441666666666666), 4326, ca
        ).coords
        assert abs(e0 - 430_000.0) < 1e-6 and abs(n0 - 325_000.0) < 1e-6
        lo, la = transform_any(self._pt(e, n), ca, 4326).coords
        assert abs(lo + 62.0) < 1e-9 and abs(la - 10.0) < 1e-9

    def test_pm_paris_equals_explicit_greenwich_lon0(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _parse_projdef,
        )

        pmv = 2.0 + 20.0 / 60.0 + 14.025 / 3600.0
        ntf = (
            "+proj=lcc +lat_1=45.89891888888889 +lat_2=47.69601444444444 "
            "+lat_0=46.8 +lon_0=0 +x_0=600000 +y_0=2200000 "
            "+a=6378249.2 +b=6356515 +towgs84=-168,-60,320,0,0,0,0"
        )
        with_pm = _parse_projdef(ntf + " +pm=paris")
        explicit = _parse_projdef(ntf.replace("+lon_0=0", f"+lon_0={pmv!r}"))
        for lon, lat in [(2.3522, 48.8566), (5.37, 43.3), (-1.55, 47.22)]:
            a = with_pm.fwd(lon, lat)
            b = explicit.fwd(lon, lat)
            assert a == b, (lon, lat)  # same double for λ₀ -> bitwise
        # numeric +pm accepted too
        numeric = _parse_projdef(ntf + f" +pm={pmv!r}")
        assert numeric.fwd(2.3522, 48.8566) == with_pm.fwd(2.3522, 48.8566)

    def test_pm_ferro_krovak(self):
        # the historical Krovak λ₀ is 42°30' east of FERRO; via +pm it
        # must land within float noise of the Greenwich default
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _parse_projdef,
        )

        d = _parse_projdef("+proj=krovak +ellps=bessel")
        f = _parse_projdef("+proj=krovak +lon_0=42.5 +pm=ferro +ellps=bessel")
        a = d.fwd(16.85, 50.21)
        b = f.fwd(16.85, 50.21)
        assert abs(a[0] - b[0]) < 1e-5 and abs(a[1] - b[1]) < 1e-5

    def test_pm_longlat_shift(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _parse_projdef,
        )

        pmv = 2.0 + 20.0 / 60.0 + 14.025 / 3600.0
        ll = _parse_projdef("+proj=longlat +ellps=WGS84 +pm=paris")
        lon, lat = ll.fwd(2.3372291666666666, 48.0)
        assert abs(lon - (2.3372291666666666 - pmv)) < 1e-15 and lat == 48.0
        back = ll.inv(lon, lat)
        assert abs(back[0] - 2.3372291666666666) < 1e-12

    def test_loud_rejections_r17(self):
        import pytest as _pytest

        from sql_interface_to_xml_database_for_spatial_operations_spark.functions.projection import (
            _parse_projdef,
        )

        for bad in [
            "+proj=eqc +lat_0=10",       # eqc origin off the equator
            "+proj=eqc +lat_ts=90",      # degenerate parallel
            "+proj=cass +lat_0=90",      # polar cassini
            "+proj=tmerc +pm=mars",      # unknown named meridian
            "+proj=tmerc +pm=200",       # out-of-range numeric
        ]:
            with _pytest.raises(ValueError):
                _parse_projdef(bad)
