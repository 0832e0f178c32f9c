"""Driver rows for the r6 geometry-function remainder (VERDICT r6 #1/#4):
st_simplify, st_snaptogrid, st_transform (incl. UTM), st_azimuth.

The reference forwards these PostGIS names to PostGIS itself
(reference src/index.ts:44-63); the implementations live in
``functions/simplify.py`` and ``functions/projection.py``. This module
registers the oracle-gated queries, in a separate module so staleness
fingerprints of the verified spatial families stay untouched
(same rationale as relations_ops.py).

Oracle design per query (every fixture value derives from integer keys
with identical arithmetic on both engines):

- **q128**: Douglas-Peucker with tolerance 0 removes exactly the
  collinear vertices, so the expected simplified WKT is STRING-BUILDABLE
  in SQL — the oracle reconstructs the full zigzag WKT with midpoints
  dropped, checking the parse → DP → serialize path end to end.
- **q129**: the snap is ``floor(x/size + 0.5) * size`` (half-up — see
  functions/simplify.py::_snap_seq), a pure composition of IEEE double
  ops, so DuckDB recomputes the snapped coordinates bit-for-bit.
- **q130**: Mercator x is transcendental-free (R·lon·π/180) and compares
  as an exact micro-meter integer; Mercator y compares at whole meters
  (the ln-vs-atanh formulation differs by ~1 ulp ≈ 4e-9 m — meter
  flooring puts the noise 8 orders of magnitude below the quantum);
  round-trips (4326→3857→4326 and 4326→UTM→4326) compare at
  micro-degrees against the ORIGINAL coordinates, which the oracle
  recomputes from keys exactly — fixture coordinates are integral in
  micro-degrees, and round-trip error is ≤3.3e-9 deg (0.0033 µdeg), so
  the floor is deterministic with 150× margin. UTM forward accuracy
  itself is pinned by tests/test_projection.py's independent
  meridian-arc integration (the oracle only sanity-bounds the easting).
- **q131**: azimuth = atan2 over small-integer deltas, compared at
  micro-radians. The engine's delta is ``(lon+dx) − lon`` — equal to
  ``dx`` only to ~1 ulp of ``lon`` — while the oracle uses exact
  ``dx``; that perturbs the azimuth by ≲1e-8 µrad, 7 orders of
  magnitude under the floor quantum, so a flip would need one of the
  ~1000 fixture azimuths within 1e-8 of a micro-radian boundary
  (deterministic per fixture; the three-SF sweep confirms none are).
  Coincident points exercise the NULL-not-crash convention on both
  sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._sql_fixtures import sql_union_rows
from .registry import query
from .spatial_ops import NATION_BOXES_SQL


def _ensure_udfs(spark: SparkSession) -> None:
    from ..functions.projection import register_projection_functions
    from ..functions.simplify import register_simplify_functions
    from ..functions.spatial import register_spatial_functions

    register_spatial_functions(spark)
    register_simplify_functions(spark)
    register_projection_functions(spark)


# ---------------------------------------------------------------------------
# q128: ST_Simplify (tolerance 0 → exact collinear-vertex removal)
# ---------------------------------------------------------------------------

# Zigzag with m = n%4 + 2 segments: real vertices (10k, (k%2)*10) for
# k = 0..m, midpoints ((10k+5), 5) inserted between each pair. Midpoints
# lie exactly on their segment (all-small-integer float math), so DP at
# tolerance 0 removes them and nothing else.
_Q128_ORACLE = """
    WITH k AS (
      SELECT n_nationkey, n_nationkey % 4 + 2 AS m FROM nation
    ),
    verts AS (
      SELECT n_nationkey, m, i,
             CAST(i * 10 AS BIGINT) AS x, CAST((i % 2) * 10 AS BIGINT) AS y
      FROM k, LATERAL unnest(generate_series(0, m)) AS t(i)
    )
    SELECT n_nationkey,
           CAST(2 * m + 1 AS BIGINT) AS n_before,
           CAST(m + 1 AS BIGINT) AS n_after,
           'LINESTRING (' || string_agg(x || ' ' || y, ', ' ORDER BY i) || ')'
             AS line_simplified,
           CAST(9 AS BIGINT) AS ring_before,
           CAST(5 AS BIGINT) AS ring_after,
           'POLYGON ((0 0, ' || (10 * (n_nationkey % 2 + 1)) || ' 0, '
             || (10 * (n_nationkey % 2 + 1)) || ' 10, 0 10, 0 0))'
             AS ring_simplified
    FROM verts
    GROUP BY n_nationkey, m
"""


@query("q128_st_simplify", oracle=_Q128_ORACLE)
def q128_st_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Simplify driver row (functions/simplify.py — Douglas-Peucker,
    reference F12 surface src/index.ts:44-63). Tolerance 0 keeps exactly
    the non-collinear vertices, so the oracle string-builds the expected
    output WKT. The WKT fixture build is JVM concat over a sequence();
    only the simplify UDF runs Python (Arrow-vectorized, map-only)."""
    from ..sources.tables import load_table

    _ensure_udfs(spark)
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", (F.col("n_nationkey") % 4 + 2).alias("m")
    )
    # Interleaved real/midpoint vertices: index i in 0..2m, even i are
    # real vertex i/2, odd i the midpoint of (i div 2, i div 2 + 1).
    line = F.expr(
        "concat('LINESTRING (', array_join(transform(sequence(0, 2*m), i -> "
        "CASE WHEN i % 2 = 0 THEN concat(string((i div 2) * 10), ' ', string(((i div 2) % 2) * 10)) "
        "ELSE concat(string((i div 2) * 10 + 5), ' 5') END), ', '), ')')"
    )
    w = F.expr("10 * (n_nationkey % 2 + 1)")
    ring = F.concat(
        F.lit("POLYGON ((0 0, "),
        (w / 2).cast("bigint").cast("string"), F.lit(" 0, "),
        w.cast("bigint").cast("string"), F.lit(" 0, "),
        w.cast("bigint").cast("string"), F.lit(" 5, "),
        w.cast("bigint").cast("string"), F.lit(" 10, "),
        (w / 2).cast("bigint").cast("string"), F.lit(" 10, "),
        F.lit("0 10, 0 5, 0 0))"),
    )
    return (
        n.withColumn("line", line)
        .withColumn("ring", ring)
        .select(
            "n_nationkey",
            F.expr("st_npoints(line)").cast("bigint").alias("n_before"),
            F.expr("st_npoints(st_simplify(line, 0.0D))").cast("bigint").alias("n_after"),
            F.expr("st_simplify(line, 0.0D)").alias("line_simplified"),
            F.expr("st_npoints(ring)").cast("bigint").alias("ring_before"),
            F.expr("st_npoints(st_simplify(ring, 0.0D))").cast("bigint").alias("ring_after"),
            F.expr("st_simplify(ring, 0.0D)").alias("ring_simplified"),
        )
    )


# ---------------------------------------------------------------------------
# q129: ST_SnapToGrid (exact half-up grid rounding)
# ---------------------------------------------------------------------------

_Q129_ORACLE = """
    WITH pts AS (
      SELECT c_custkey,
             ((c_custkey * 7919) % 36000) / 100.0 - 180.0 AS lon,
             ((c_custkey * 104729) % 17000) / 100.0 - 85.0 AS lat
      FROM customer WHERE c_custkey < 500
    )
    SELECT c_custkey,
           floor(lon / 0.5 + 0.5) * 0.5 AS sx,
           floor(lat / 0.5 + 0.5) * 0.5 AS sy,
           CAST(CASE WHEN floor(lon / 0.5 + 0.5) = floor((lon + 0.1) / 0.5 + 0.5)
                THEN 2 ELSE 3 END AS BIGINT) AS line_n_after
    FROM pts
"""


@query("q129_st_snaptogrid", oracle=_Q129_ORACLE)
def q129_st_snaptogrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_SnapToGrid driver row: snapped point coordinates read back via
    st_x/st_y, plus consecutive-duplicate collapse on a 3-vertex line
    whose first two vertices may or may not share a snapped cell. The
    half-up snap is pure IEEE ops, so the oracle recomputes it exactly
    (functions/simplify.py::_snap_seq docstring)."""
    from .spatial_ops import customer_points

    _ensure_udfs(spark)
    pts = customer_points(spark, sf_dir).filter(F.col("c_custkey") < 500)
    line = F.concat(
        F.lit("LINESTRING ("),
        F.col("lon").cast("string"), F.lit(" "), F.col("lat").cast("string"), F.lit(", "),
        (F.col("lon") + 0.1).cast("string"), F.lit(" "), F.col("lat").cast("string"), F.lit(", "),
        (F.col("lon") + 2.0).cast("string"), F.lit(" "), F.col("lat").cast("string"),
        F.lit(")"),
    )
    return (
        pts.withColumn("snapped", F.expr("st_snaptogrid(st_point(lon, lat), 0.5D)"))
        .withColumn("line", line)
        .select(
            "c_custkey",
            F.expr("st_x(snapped)").alias("sx"),
            F.expr("st_y(snapped)").alias("sy"),
            F.expr("st_npoints(st_snaptogrid(line, 0.5D))").cast("bigint").alias("line_n_after"),
        )
    )


# ---------------------------------------------------------------------------
# q130: ST_Transform — 3857 forward/round-trip + UTM round-trip
# ---------------------------------------------------------------------------

# In-zone UTM fixture: zone = key%60 + 1 (central meridian 6*zone-183),
# lon = west edge + 1.5..5.25 in 0.75 steps, lat in [-79.75, 79.25] in
# 0.25 steps — every coordinate integral in micro-degrees.
_Q130_FIXTURE = """
      SELECT c_custkey,
             (c_custkey % 60) * 6 - 180 + 1.5 + (c_custkey % 6) * 0.75 AS lon,
             ((c_custkey * 13) % 160) - 80 + 0.25 + (c_custkey % 2) * 0.5 AS lat,
             c_custkey % 60 + 1 AS zone
      FROM customer WHERE c_custkey < 300
"""

_Q130_ORACLE = f"""
    WITH pts AS ({_Q130_FIXTURE})
    SELECT c_custkey,
           CAST(floor(6378137.0 * (lon * (pi() / 180.0)) * 1000000 + 0.5) AS BIGINT)
             AS merc_x_micro,
           CAST(floor(6378137.0 * 0.5 * ln((1.0 + sin(lat * (pi() / 180.0)))
                / (1.0 - sin(lat * (pi() / 180.0)))) + 0.5) AS BIGINT)
             AS merc_y_m,
           CAST(floor(lon * 1000000 + 0.5) AS BIGINT) AS rt_lon_micro,
           CAST(floor(lat * 1000000 + 0.5) AS BIGINT) AS rt_lat_micro,
           CAST(floor(lon * 1000000 + 0.5) AS BIGINT) AS utm_rt_lon_micro,
           CAST(floor(lat * 1000000 + 0.5) AS BIGINT) AS utm_rt_lat_micro,
           TRUE AS utm_easting_in_range,
           CAST(floor(lon * 1000000 + 0.5) AS BIGINT) AS lcc_rt_lon_micro,
           CAST(floor(lat * 1000000 + 0.5) AS BIGINT) AS lcc_rt_lat_micro,
           TRUE AS lcc_origin_ok,
           CAST(floor((lon / 4 + 10) * 1000000 + 0.5) AS BIGINT) AS laea_rt_lon_micro,
           CAST(floor((lat / 2 + 30) * 1000000 + 0.5) AS BIGINT) AS laea_rt_lat_micro,
           TRUE AS laea_origin_ok,
           CAST(floor(lon * 1000000 + 0.5) AS BIGINT) AS aea_rt_lon_micro,
           CAST(floor(lat * 1000000 + 0.5) AS BIGINT) AS aea_rt_lat_micro,
           TRUE AS aea_origin_ok,
           CAST(floor(lon * 1000000 + 0.5) AS BIGINT) AS ps_rt_lon_micro,
           CAST(floor((CASE WHEN c_custkey % 2 = 0 THEN lat / 8 + 75
                            ELSE -(lat / 8 + 75) END) * 1000000 + 0.5) AS BIGINT)
             AS ps_rt_lat_micro,
           TRUE AS ps_pole_ok,
           CAST(floor((CASE WHEN c_custkey % 2 = 0 THEN lon / 40 - 3
                            ELSE lon / 40 + 19 END) * 1000000 + 0.5) AS BIGINT)
             AS tm_rt_lon_micro,
           CAST(floor((CASE WHEN c_custkey % 2 = 0 THEN lat / 16 + 55
                            ELSE lat / 16 + 52 END) * 1000000 + 0.5) AS BIGINT)
             AS tm_rt_lat_micro,
           TRUE AS tm_origin_ok,
           TRUE AS pd_anchor_ok,
           TRUE AS pd_eq_ok,
           CAST(floor((lon / 40 + 173) * 1000000 + 0.5) AS BIGINT)
             AS pd_rt_lon_micro,
           CAST(floor((lat / 2 - 20) * 1000000 + 0.5) AS BIGINT)
             AS pd_rt_lat_micro,
           CAST(floor(6378137.0 * (
                 0.5 * ln((1.0 + sin(lat * pi() / 180.0))
                        / (1.0 - sin(lat * pi() / 180.0)))
                 - 0.0818191908426215 * 0.5
                   * ln((1.0 + 0.0818191908426215 * sin(lat * pi() / 180.0))
                      / (1.0 - 0.0818191908426215 * sin(lat * pi() / 180.0)))
               ) * 1000 + 0.5) AS BIGINT) AS m3395_y_mm,
           TRUE AS m3395_x_eq,
           TRUE AS eqc_x_eq
    FROM pts
"""


@query("q130_st_transform", oracle=_Q130_ORACLE)
def q130_st_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Transform driver row (functions/projection.py): Web-Mercator
    forward (x exact in micro-meters — no transcendentals; y at whole
    meters), 3857 round-trip, UTM (EPSG:326xx/327xx, Krüger series —
    VERDICT r6 item 4) and LCC 2SP (EPSG:2154/3034, Snyder closed
    forms — VERDICT r11 item 4), LAEA EPSG:3035 (Snyder
    authalic-sphere forms, r12), and Albers equal-area conic
    EPSG:5070/3577 (Snyder PP 1395 pp. 98-103, r13) round-trips at
    micro-degrees vs the original key-derived coordinates, plus the
    exact false-origin anchors. See module docstring for why every
    floor is deterministic."""
    from ..sources.tables import load_table

    _ensure_udfs(spark)
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") % 60) * 6 - 180 + 1.5 + (F.col("c_custkey") % 6) * 0.75).alias("lon"),
        (((F.col("c_custkey") * 13) % 160) - 80 + 0.25 + (F.col("c_custkey") % 2) * 0.5).alias("lat"),
        (F.col("c_custkey") % 60 + 1).alias("zone"),
    )
    utm_srid = (F.when(F.col("lat") >= 0, F.lit(32600)).otherwise(F.lit(32700)) + F.col("zone")).cast("int")
    # LCC 2SP family (r12, VERDICT r11 item 4): alternate the two
    # national-grid CRSs; round-trip at micro-degrees plus the
    # published anchor "projection origin = false origin" (Lambert-93's
    # (3 E, 46.5 N) -> exactly (700000, 6600000), Snyder 2SP).
    lcc_srid = F.when(F.col("c_custkey") % 2 == 1, F.lit(2154)).otherwise(F.lit(3034)).cast("int")
    df = (
        pts.withColumn("g", F.expr("st_point(lon, lat)"))
        .withColumn("merc", F.expr("st_transform(g, 4326, 3857)"))
        .withColumn("back", F.expr("st_transform(merc, 3857, 4326)"))
        .withColumn("utm", F.call_function("st_transform", F.col("g"), F.lit(4326), utm_srid))
        .withColumn("utm_back", F.call_function("st_transform", F.col("utm"), utm_srid, F.lit(4326)))
        .withColumn("lcc", F.call_function("st_transform", F.col("g"), F.lit(4326), lcc_srid))
        .withColumn("lcc_back", F.call_function("st_transform", F.col("lcc"), lcc_srid, F.lit(4326)))
        .withColumn("lcc_origin", F.expr("st_transform('POINT (3 46.5)', 4326, 2154)"))
        # LAEA EPSG:3035 (r12): its oblique aspect is singular at the
        # antipode of (10 E, 52 N), so the fixture maps the global grid
        # into the European domain (lon/4+10, lat/2+30 — still exact
        # quarter/eighth-degree micro-integers); round-trip error is
        # the published authalic-series truncation (~1.4e-8 deg,
        # 0.014 micro-units, far under the 0.5 floor guard)
        .withColumn("glaea", F.expr("st_point(lon / 4 + 10, lat / 2 + 30)"))
        .withColumn("laea", F.expr("st_transform(glaea, 4326, 3035)"))
        .withColumn("laea_back", F.expr("st_transform(laea, 3035, 4326)"))
        .withColumn(
            "laea_origin", F.expr("st_transform('POINT (10 52)', 4326, 3035)")
        )
        # Albers equal-area conic (r13): the conic is defined globally
        # (|θ| = |n·Δλ| stays under 180° for both CRSs on this fixture),
        # so the GLOBAL grid round-trips directly like LCC; alternate
        # the US and Australian grids by key parity. Origin anchors are
        # exact zeros (ρ(q₀) ≡ ρ₀, θ ≡ 0 — no cancellation).
        .withColumn(
            "aea_srid",
            F.when(F.col("c_custkey") % 2 == 0, F.lit(5070)).otherwise(F.lit(3577)).cast("int"),
        )
        .withColumn("aea", F.call_function("st_transform", F.col("g"), F.lit(4326), F.col("aea_srid")))
        .withColumn("aea_back", F.call_function("st_transform", F.col("aea"), F.col("aea_srid"), F.lit(4326)))
        .withColumn("aea_origin_us", F.expr("st_transform('POINT (-96 23)', 4326, 5070)"))
        .withColumn("aea_origin_au", F.expr("st_transform('POINT (132 0)', 4326, 3577)"))
        # Polar stereographic EPSG:3413/3031 (r14, Snyder PP 1395
        # pp. 160-162): fixture maps the grid into each aspect's polar
        # domain (lat/8 + 75 ∈ [65.03, 84.91], still exact 1/32-degree
        # micro-integers); round-trip error is the conformal-series
        # truncation (~1e-11 deg). The poles themselves are EXACT
        # (t(±90°) = 0 → ρ = 0 → the false origin, no transcendental
        # residue), so the anchors compare as exact doubles.
        .withColumn(
            "ps_srid",
            F.when(F.col("c_custkey") % 2 == 0, F.lit(3413)).otherwise(F.lit(3031)).cast("int"),
        )
        .withColumn(
            "ps_lat",
            F.when(F.col("c_custkey") % 2 == 0, F.col("lat") / 8 + 75).otherwise(
                -(F.col("lat") / 8 + 75)
            ),
        )
        .withColumn("gps", F.expr("st_point(lon, ps_lat)"))
        .withColumn("ps", F.call_function("st_transform", F.col("gps"), F.lit(4326), F.col("ps_srid")))
        .withColumn("ps_back", F.call_function("st_transform", F.col("ps"), F.col("ps_srid"), F.lit(4326)))
        .withColumn("ps_pole_n", F.expr("st_transform('POINT (37 90)', 4326, 3413)"))
        .withColumn("ps_pole_s", F.expr("st_transform('POINT (0 -90)', 4326, 3031)"))
        # National TM grids (r14): British National Grid 27700 (Airy
        # 1830 + the EPSG:1314 Helmert datum shift — round-trip error is
        # the 2D height-drop convention, ~1.3e-8 deg ≈ 0.013 micro,
        # under the 0.5 floor guard) and Poland CS92 2180 (GRS80, no
        # shift, Krüger truncation ~6e-9 deg). Fixtures map the grid
        # into each CRS's domain with exact 1/40- and 1/64-degree
        # micro-integers. The 2180 natural origin is EXACT (ξ−ξ₀ is a
        # subtraction of identical float computations; η ≡ 0 on the
        # central meridian).
        .withColumn(
            "tm_srid",
            F.when(F.col("c_custkey") % 2 == 0, F.lit(27700)).otherwise(F.lit(2180)).cast("int"),
        )
        .withColumn(
            "tm_lon",
            F.when(F.col("c_custkey") % 2 == 0, F.col("lon") / 40 - 3).otherwise(
                F.col("lon") / 40 + 19
            ),
        )
        .withColumn(
            "tm_lat",
            F.when(F.col("c_custkey") % 2 == 0, F.col("lat") / 16 + 55).otherwise(
                F.col("lat") / 16 + 52
            ),
        )
        .withColumn("gtm", F.expr("st_point(tm_lon, tm_lat)"))
        .withColumn("tm", F.call_function("st_transform", F.col("gtm"), F.lit(4326), F.col("tm_srid")))
        .withColumn("tm_back", F.call_function("st_transform", F.col("tm"), F.col("tm_srid"), F.lit(4326)))
        .withColumn("tm_origin", F.expr("st_transform('POINT (19 0)', 4326, 2180)"))
        # Parameterized '+proj=' strings (r16, VERDICT r15 task 3):
        # published EPSG parameter sets over the same kernels —
        # NZTM2000 (EPSG:2193, LINZ definition) anchors at its false
        # origin EXACTLY and round-trips the grid mapped into its
        # domain; the per-row '+proj=utm +zone=N [+south]' string must
        # be BYTE-IDENTICAL to the EPSG:326xx/327xx path (same kernel,
        # same parameters); EPSG GN 7-2's variant-A UPS North worked
        # example (73N 44E -> E 3320416.75, N 632668.43) pins the
        # k0-at-pole form in centimeters; NAD83/California Albers
        # (EPSG:3310) and the OSGB full-parameter string (incl. the
        # EPSG:1314 +towgs84 Helmert leg) anchor/agree with the
        # closed-table paths.
        .withColumn(
            "pd_nztm",
            F.lit(
                "+proj=tmerc +lat_0=0 +lon_0=173 +k=0.9996 +x_0=1600000 "
                "+y_0=10000000 +ellps=GRS80 +units=m +no_defs"
            ),
        )
        .withColumn(
            "utm_def",
            F.concat(
                F.lit("+proj=utm +ellps=WGS84 +zone="),
                F.col("zone").cast("string"),
                F.when(F.col("lat") < 0, F.lit(" +south")).otherwise(F.lit("")),
            ),
        )
        .withColumn(
            "utm_pd",
            F.call_function("st_transform", F.col("g"), F.lit(4326), F.col("utm_def")),
        )
        .withColumn("gpd", F.expr("st_point(lon / 40 + 173, lat / 2 - 20)"))
        .withColumn(
            "pd_fwd",
            F.call_function("st_transform", F.col("gpd"), F.lit(4326), F.col("pd_nztm")),
        )
        .withColumn(
            "pd_back",
            F.call_function("st_transform", F.col("pd_fwd"), F.col("pd_nztm"), F.lit(4326)),
        )
        .withColumn(
            "pd_anchor",
            F.call_function(
                "st_transform",
                F.lit("POINT (173 0)"),
                F.lit(4326),
                F.col("pd_nztm"),
            ),
        )
        .withColumn(
            "pd_ca_anchor",
            F.call_function(
                "st_transform",
                F.lit("POINT (-120 0)"),
                F.lit(4326),
                F.lit(
                    "+proj=aea +lat_1=34 +lat_2=40.5 +lat_0=0 +lon_0=-120 "
                    "+x_0=0 +y_0=-4000000 +ellps=GRS80 +units=m"
                ),
            ),
        )
        .withColumn(
            "pd_osgb",
            F.call_function(
                "st_transform",
                F.lit("POINT (-0.1276 51.5072)"),
                F.lit(4326),
                F.lit(
                    "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
                    "+x_0=400000 +y_0=-100000 +ellps=airy "
                    "+towgs84=446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894"
                ),
            ),
        )
        .withColumn(
            "pd_osgb_tbl",
            F.expr("st_transform('POINT (-0.1276 51.5072)', 4326, 27700)"),
        )

        # Ellipsoidal Mercator (r16): EPSG:3395 shares x with 3857
        # (both a·λ) while y carries the ellipsoidal correction —
        # oracled in closed form via atanh = ½ln((1+x)/(1−x))
        .withColumn("merc2", F.expr("st_transform(g, 4326, 3395)"))
        # Equidistant cylindrical (r17, EPSG 1028 / EPSG:4087 class):
        # E at lat_ts=0 is the SAME closed form as spherical-Mercator
        # x (a·λrad) — bitwise-equal per row; N is the meridian arc,
        # pinned at mm against the Snyder 3-21 series value that the
        # tests verify against numeric integration
        .withColumn(
            "eqcp",
            F.call_function(
                "st_transform", F.col("g"), F.lit(4326),
                F.lit("+proj=eqc +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84"),
            ),
        )
    )
    micro = lambda c_: F.floor(c_ * 1000000 + F.lit(0.5)).cast("bigint")  # noqa: E731
    return df.select(
        "c_custkey",
        micro(F.expr("st_x(merc)")).alias("merc_x_micro"),
        F.floor(F.expr("st_y(merc)") + F.lit(0.5)).cast("bigint").alias("merc_y_m"),
        micro(F.expr("st_x(back)")).alias("rt_lon_micro"),
        micro(F.expr("st_y(back)")).alias("rt_lat_micro"),
        micro(F.expr("st_x(utm_back)")).alias("utm_rt_lon_micro"),
        micro(F.expr("st_y(utm_back)")).alias("utm_rt_lat_micro"),
        F.expr("st_x(utm)").between(100000.0, 900000.0).alias("utm_easting_in_range"),
        micro(F.expr("st_x(lcc_back)")).alias("lcc_rt_lon_micro"),
        micro(F.expr("st_y(lcc_back)")).alias("lcc_rt_lat_micro"),
        (
            (micro(F.expr("st_x(lcc_origin)")) == F.lit(700_000_000_000))
            & (micro(F.expr("st_y(lcc_origin)")) == F.lit(6_600_000_000_000))
        ).alias("lcc_origin_ok"),
        micro(F.expr("st_x(laea_back)")).alias("laea_rt_lon_micro"),
        micro(F.expr("st_y(laea_back)")).alias("laea_rt_lat_micro"),
        (
            (micro(F.expr("st_x(laea_origin)")) == F.lit(4_321_000_000_000))
            & (micro(F.expr("st_y(laea_origin)")) == F.lit(3_210_000_000_000))
        ).alias("laea_origin_ok"),
        micro(F.expr("st_x(aea_back)")).alias("aea_rt_lon_micro"),
        micro(F.expr("st_y(aea_back)")).alias("aea_rt_lat_micro"),
        (
            (F.expr("st_x(aea_origin_us)") == F.lit(0.0))
            & (F.expr("st_y(aea_origin_us)") == F.lit(0.0))
            & (F.expr("st_x(aea_origin_au)") == F.lit(0.0))
            & (F.expr("st_y(aea_origin_au)") == F.lit(0.0))
        ).alias("aea_origin_ok"),
        micro(F.expr("st_x(ps_back)")).alias("ps_rt_lon_micro"),
        micro(F.expr("st_y(ps_back)")).alias("ps_rt_lat_micro"),
        (
            (F.expr("st_x(ps_pole_n)") == F.lit(0.0))
            & (F.expr("st_y(ps_pole_n)") == F.lit(0.0))
            & (F.expr("st_x(ps_pole_s)") == F.lit(0.0))
            & (F.expr("st_y(ps_pole_s)") == F.lit(0.0))
        ).alias("ps_pole_ok"),
        micro(F.expr("st_x(tm_back)")).alias("tm_rt_lon_micro"),
        micro(F.expr("st_y(tm_back)")).alias("tm_rt_lat_micro"),
        (
            (F.expr("st_x(tm_origin)") == F.lit(500_000.0))
            & (F.expr("st_y(tm_origin)") == F.lit(-5_300_000.0))
        ).alias("tm_origin_ok"),
        (
            (F.col("pd_anchor") == F.lit("POINT (1600000 10000000)"))
            & (F.col("pd_ca_anchor") == F.lit("POINT (0 -4000000)"))
            # polar LAEA (r16): the pole is the false origin, exactly
            & (
                F.expr(
                    "st_transform('POINT (77 90)', 4326,"
                    " '+proj=laea +lat_0=90 +lon_0=10 +ellps=WGS84')"
                )
                == F.lit("POINT (0 0)")
            )
        ).alias("pd_anchor_ok"),
        (
            (F.col("utm_pd") == F.col("utm"))
            & (F.col("pd_osgb") == F.col("pd_osgb_tbl"))
        ).alias("pd_eq_ok"),
        micro(F.expr("st_x(pd_back)")).alias("pd_rt_lon_micro"),
        micro(F.expr("st_y(pd_back)")).alias("pd_rt_lat_micro"),
        F.floor(F.expr("st_y(merc2)") * 1000 + F.lit(0.5)).cast("bigint").alias("m3395_y_mm"),
        (F.expr("st_x(merc2)") == F.expr("st_x(merc)")).alias("m3395_x_eq"),
        (F.expr("st_x(eqcp)") == F.expr("st_x(merc)")).alias("eqc_x_eq"),
    )


# ---------------------------------------------------------------------------
# q131: ST_Azimuth (micro-radian compare, NULL on coincident points)
# ---------------------------------------------------------------------------

_Q131_ORACLE = """
    WITH pts AS (
      SELECT c_custkey,
             ((c_custkey * 7919) % 36000) / 100.0 - 180.0 AS lon,
             ((c_custkey * 104729) % 17000) / 100.0 - 85.0 AS lat,
             CAST(c_custkey % 7 AS DOUBLE) - 3.0 AS dx,
             CAST(c_custkey % 5 AS DOUBLE) - 2.0 AS dy
      FROM customer WHERE c_custkey < 1000
    )
    SELECT c_custkey,
           CASE WHEN dx = 0 AND dy = 0 THEN NULL
                ELSE CAST(floor(
                  (CASE WHEN atan2(dx, dy) < 0
                        THEN atan2(dx, dy) + 2 * pi()
                        ELSE atan2(dx, dy) END) * 1000000 + 0.5) AS BIGINT)
           END AS az_micro
    FROM pts
"""


@query("q131_st_azimuth", oracle=_Q131_ORACLE)
def q131_st_azimuth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Azimuth driver row: bearing a→b where b = a + small integer
    deltas (35 distinct delta pairs, all four quadrants plus the axes);
    c_custkey ≡ 17 (mod 35) yields coincident points → NULL on both
    sides (the registry's NULL-never-crash convention vs PostGIS's
    error)."""
    from .spatial_ops import customer_points

    _ensure_udfs(spark)
    pts = customer_points(spark, sf_dir).filter(F.col("c_custkey") < 1000).select(
        "c_custkey",
        "lon",
        "lat",
        (F.col("c_custkey") % 7 - 3).cast("double").alias("dx"),
        (F.col("c_custkey") % 5 - 2).cast("double").alias("dy"),
    )
    az = F.expr("st_azimuth(st_point(lon, lat), st_point(lon + dx, lat + dy))")
    return pts.select(
        "c_custkey",
        F.floor(az * 1000000 + F.lit(0.5)).cast("bigint").alias("az_micro"),
    )


# ---------------------------------------------------------------------------
# q186: published worked-example pins (r17) — CRS + dims-codec constants
# ---------------------------------------------------------------------------
#
# Every family here is a CONSTANT published pin (an EPSG GN 7-2 / NEIEZ
# / swisstopo worked example, or the M/ZM codec code pack) evaluated
# per nation row. These lived on q130/q178 through r16-r17 and moved
# here (r17) for row-cost budgeting: 25 nation rows instead of q130's
# 250-customer fixture — the VERDICT r16 "land family growth on a
# different exposed row" rule. a carries the primary BIGINT pin,
# b the secondary pin as a STRING (or the WKT patch echo for the
# surface families).

_PIN = {
    # EPSG GN 7-2 UPS North variant A: 73N 44E (cm)
    "ups": ("st_transform('POINT (44 73)', 4326, '+proj=stere +lat_0=90"
            " +k=0.994 +x_0=2000000 +y_0=2000000 +ellps=WGS84')",
            100, 332041675, 63266843),
    # EPSG GN 7-2 Mercator variant A — Makassar / NEIEZ (Bessel, cm)
    "mks": ("st_transform('POINT (120 -3)', 4326, '+proj=merc +lon_0=110"
            " +k=0.997 +x_0=3900000 +y_0=900000 +ellps=bessel')",
            100, 500972658, 56915082),
    # swisstopo LV03 WGS84 test point (single-Helmert residue, cm)
    "ch": ("st_transform('POINT (8.730497222222223 46.044130555555554)',"
           " 4326, 21781)", 100, 70000002, 10000004),
    # EPSG GN 7-2 LCC 2SP — NAD27 / Texas South Central in ftUS (c-ftUS)
    "spcs": ("st_transform('POINT (-96 28.5)', 4326, '+proj=lcc"
             " +lat_1=28.383333333333333 +lat_2=30.283333333333333"
             " +lat_0=27.833333333333332 +lon_0=-99"
             " +x_0=609601.2192024384 +y_0=0 +ellps=clrk66"
             " +units=us-ft')", 100, 296350391, 25475980),
    # EPSG GN 7-2 Hotine oblique Mercator variant B — Timbalai RSO (cm)
    "rso": ("st_transform('POINT (115.80550544444444 5.387253583333334)',"
            " 4326, '+proj=omerc +lat_0=4 +lonc=115"
            " +alpha=53.31582047222222 +gamma=53.13010236111111"
            " +k=0.99984 +x_0=590476.87 +y_0=442857.65 +ellps=evrstSS')",
            100, 67924573, 59656278),
    # EPSG GN 7-2 oblique stereographic — Amersfoort / RD New (mm)
    "rd": ("st_transform('POINT (6 53)', 4326, '+proj=sterea"
           " +lat_0=52.15616055555556 +lon_0=5.387638888888889"
           " +k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel')",
           1000, 196105283, 557057739),
    # EPSG GN 7-2 Krovak — S-JTSK on the proj defaults (cm, East North
    # axes: negative on Czech territory)
    "kro": ("st_transform('POINT (16.849771944444445 50.209011555555556)',"
            " 4326, '+proj=krovak +ellps=bessel')",
            100, -56899100, -105053865),
    # Equidistant cylindrical EPSG:4087 class: E is the exact closed
    # form a·λrad (mm), N the meridian arc the tests integrate (mm)
    "eqc": ("st_transform('POINT (10 55)', 4326, '+proj=eqc +lat_ts=0"
            " +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84')",
            1000, 1113194908, 6097230313),
    # EPSG GN 7-2 Cassini-Soldner — Trinidad 1903 in Clarke's links
    # (centi-links, +to_meter=0.201166195164)
    "cass": ("st_transform('POINT (-62 10)', 4326, '+proj=cass"
             " +lat_0=10.441666666666666 +lon_0=-61.333333333333336"
             " +x_0=86501.46392052001 +y_0=65379.0134283"
             " +a=6378293.645208759 +b=6356617.987679838"
             " +to_meter=0.201166195164')", 100, 6664494, 8253622),
}

_SPCS_TM = (
    "st_transform('POINT (-96 28.5)', 4326, '+proj=lcc"
    " +lat_1=28.383333333333333 +lat_2=30.283333333333333"
    " +lat_0=27.833333333333332 +lon_0=-99 +x_0=609601.2192024384"
    " +y_0=0 +ellps=clrk66 +to_meter=0.3048006096012192')"
)
_NTF = (
    "'+proj=lcc +lat_1=45.89891888888889 +lat_2=47.69601444444444"
    " +lat_0=46.8 +lon_0={L} +x_0=600000 +y_0=2200000 +a=6378249.2"
    " +b=6356515 +towgs84=-168,-60,320,0,0,0,0{PM}'"
)
_KRO_D = "st_transform('POINT (16.849771944444445 50.209011555555556)', 4326, '+proj=krovak{X} +ellps=bessel')"

_Q186_ORACLE = f"""
    WITH keys AS (SELECT n_nationkey FROM nation)
    SELECT fam, n_nationkey AS key, a, b FROM keys, (
      VALUES {", ".join(f"('{k}', CAST({a} AS BIGINT), CAST('{b}' AS VARCHAR))" for k, (_e, _s, a, b) in _PIN.items())},
             ('unit', CAST(1 AS BIGINT), CAST('1' AS VARCHAR)),
             ('kroz', CAST(1 AS BIGINT), CAST('1' AS VARCHAR)),
             ('pm', CAST(1 AS BIGINT), CAST('1' AS VARCHAR))
    ) AS pins(fam, a, b)
    UNION ALL
    SELECT 'mtin' AS fam, n_nationkey AS key, {{MTIN}} AS a, {{TRIM}} AS b
    FROM ({{BOXES}}) boxes
    UNION ALL
    SELECT 'zmps' AS fam, n_nationkey AS key, {{ZMPS}} AS a, {{BZM}} AS b
    FROM ({{BOXES}}) boxes
    UNION ALL
    SELECT 'mwkb' AS fam, n_nationkey AS key, {{MWKB}} AS a, {{BZM}} AS b
    FROM ({{BOXES}}) boxes
"""


def _q186_oracle() -> str:
    from . import surface3d_ops as S3

    return _Q186_ORACLE.format(
        MTIN=S3._MTIN_CODE,
        ZMPS=S3._ZMPS_CODE,
        MWKB=S3._MWKB_CODE,
        TRIM=S3._B_TRI2_M,
        BZM=S3._B_BOTTOM_ZM,
        BOXES=NATION_BOXES_SQL,
    )


@query("q186_st_worked_examples", oracle=_q186_oracle())
def q186_st_worked_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Published worked-example pin battery (r17): the GN 7-2 /
    swisstopo CRS constants (module comment above) plus the M/ZM
    surface codec packs, on the 25-row nation fixture."""
    from . import surface3d_ops as S3
    from .spatial_ops import nation_boxes

    _ensure_udfs(spark)
    S3._ensure_udfs(spark)
    boxes = nation_boxes(spark, sf_dir)

    # r17 optimization: branch strings into one SQL UNION ALL
    # (_sql_fixtures.sql_union_rows) instead of a per-branch
    # unionByName fold — same rows/columns/branch order, one analysis,
    # one fixture scan.
    def fam(name: str, a_expr: str, b_expr: str) -> str:
        return (
            f"'{name}' AS fam, n_nationkey AS key, "
            f"CAST({a_expr} AS BIGINT) AS a, CAST({b_expr} AS STRING) AS b"
        )

    rows = []
    for name, (expr, scale, _a, _b) in _PIN.items():
        rows.append(fam(
            name,
            f"CAST(floor(st_x({expr}) * {scale} + 0.5) AS BIGINT)",
            f"CAST(CAST(floor(st_y({expr}) * {scale} + 0.5) AS BIGINT) AS STRING)",
        ))
    # unit: '+to_meter=' with the exact us-ft double matches the
    # '+units=us-ft' path BITWISE, and a pole through ellipsoidal
    # Mercator is loud-NULL (ADVICE r16)
    spcs = _PIN["spcs"][0]
    rows.append(
        fam(
            "unit",
            f"CASE WHEN {spcs} = {_SPCS_TM}"
            " AND st_transform('POINT (10 90)', 4326, 3395) IS NULL"
            " THEN 1 ELSE 0 END",
            "'1'",
        )
    )
    # kroz: '+czech' is the exact southing/westing axis swap
    kro = _KRO_D.format(X="")
    kro_cz = _KRO_D.format(X=" +czech")
    rows.append(
        fam(
            "kroz",
            f"CASE WHEN st_x({kro_cz}) = -st_y({kro})"
            f" AND st_y({kro_cz}) = -st_x({kro}) THEN 1 ELSE 0 END",
            "'1'",
        )
    )
    # pm: the legacy NTF Lambert II '+pm=paris' string equals the
    # explicit Greenwich-λ₀ spelling bitwise; the Ferro-referenced
    # Krovak λ₀ lands within float noise of the Greenwich default
    ntf_pm = _NTF.format(L="0", PM=" +pm=paris")
    ntf_gw = _NTF.format(L="2.337229166666667", PM="")
    kro_f = _KRO_D.format(X=" +lon_0=42.5 +pm=ferro")
    rows.append(
        fam(
            "pm",
            f"CASE WHEN st_transform('POINT (2.3522 48.8566)', 4326, {ntf_pm})"
            f" = st_transform('POINT (2.3522 48.8566)', 4326, {ntf_gw})"
            f" AND abs(st_x({kro_f}) - st_x({kro})) < 1e-5"
            f" AND abs(st_y({kro_f}) - st_y({kro})) < 1e-5"
            " THEN 1 ELSE 0 END",
            "'1'",
        )
    )
    # M / ZM surface codec (moved from q178, r17): M geometry runs at
    # z = 0, ZM volume uses the REAL z, WKB round-trips both (ISO
    # 2015/3015-class codes, pinned in tests/test_surface3d.py)
    rows.append(
        fam(
            "mtin",
            f"10 * st_3darea({S3._TIN_M}) + st_zmflag({S3._TIN_M})",
            f"st_patchn({S3._TIN_M}, 2)",
        )
    )
    rows.append(
        fam(
            "zmps",
            f"10 * st_volume({S3._BOX_ZM}) + st_zmflag({S3._BOX_ZM})",
            f"st_patchn({S3._BOX_ZM}, 1)",
        )
    )
    m_rt = f"st_geomfromwkb(st_asbinary({S3._TIN_M}))"
    zm_rt = f"st_geomfromwkb(st_asbinary({S3._BOX_ZM}))"
    rows.append(
        fam(
            "mwkb",
            f"1000 * st_ndims({zm_rt}) + 100 * st_zmflag({zm_rt})"
            f" + 10 * st_ndims({m_rt}) + st_zmflag({m_rt})",
            f"st_patchn({zm_rt}, 1)",
        )
    )
    return sql_union_rows(boxes, rows)
