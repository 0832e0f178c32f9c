"""Driver row for ST_Intersection / ST_Difference (functions/overlay.py).

The reference forwards both names to PostGIS (reference
src/index.ts:44-63 — any PostGIS-accepted function rides the rebuilt
PostgreSQL query); here they are native pandas UDFs and this row gates
them with an exact oracle over two fixture families:

- **box × box** (rectilinear path): the intersection of two
  axis-aligned rectangles is the rectangle of coordinate-wise max/min
  bounds, so DuckDB reconstructs the expected intersection WKT
  **string** (exact vertex walk of the engine's dissolve serializer:
  (x0 y1, x0 y0, x1 y0, x1 y1, x0 y1) — pinned by
  tests/test_overlay.py) and both areas in closed form.
- **arrowhead × box** (triangulation path): a NON-convex quad overlaps
  its nation's box, exercising ear clipping + half-plane decomposition.
  Its clipped shape is not string-buildable in SQL, so the oracle pins
  the exact INVARIANTS instead (the q58-style bounded-oracle pattern):
  inclusion-exclusion residual area(a∩b) + area(a−b) − area(a) = 0 in
  micro-units (coordinates are integers, so genuine errors are ≥ whole
  units; FP noise is ~1e-10), intersection symmetry in micro-units, and
  a non-triviality flag proving the overlap isn't vacuous.

Scale shape: the pair generator is a broadcast range join on bbox
bounds (boxes are a dimension table; at 100 TB the same query over a
large polygon table uses the grid-cell candidate machinery of
spatial_ops._grid_candidates — the overlay UDF itself is map-only
either way). New module so spatial_ops.py's verified fingerprints
stay untouched (same rationale as relations_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._sql_fixtures import poly_sql
from .registry import query
from .spatial_ops import NATION_BOXES_SQL, _fmt_sql, nation_boxes

# Shared overlay fixtures anchored at each box's (minx, miny). The
# arrow is r10's original non-convex quad; the concave pair and the
# holed x concave pair are r12 (VERDICT r11 item 2): the kernels
# handled general concave simple polygons exactly all along — these
# rows make the driver PIN that class instead of leaving it untested.
_ARROW = poly_sql(((0, 0), (20, 5), (40, 0), (20, 30), (0, 0)))
_CONCAVE_A = poly_sql(((0, 0), (40, 0), (40, 25), (20, 10), (0, 25), (0, 0)))
_CONCAVE_B = poly_sql(
    ((10, 5), (50, 5), (50, 28), (30, 13), (10, 28), (10, 5))
)
_HOLED_H = poly_sql(
    ((0, 0), (40, 0), (40, 30), (0, 30), (0, 0)),
    ((15, 8), (25, 8), (20, 16), (15, 8)),
)
# st_area parses WKT geometry and does not know typed EMPTY (that
# extension stays local to overlay.py), so EMPTY maps to 0 area
# explicitly: PostGIS ST_Area(empty) = 0.
_AREA0 = "IF(endswith({g}, 'EMPTY'), 0.0D, st_area({g}))"


def _ensure_udfs(spark: SparkSession) -> None:
    from ..functions.overlay import register_overlay_functions
    from ..functions.spatial import register_spatial_functions

    register_spatial_functions(spark)
    register_overlay_functions(spark)


_Q139_ORACLE = f"""
    WITH boxes AS ({NATION_BOXES_SQL}),
    pairs AS (
      SELECT a.n_nationkey AS key1, b.n_nationkey AS key2,
             greatest(a.minx, b.minx) AS ix0, greatest(a.miny, b.miny) AS iy0,
             least(a.maxx, b.maxx) AS ix1, least(a.maxy, b.maxy) AS iy1,
             (a.maxx - a.minx) * (a.maxy - a.miny) AS area_a
      FROM boxes a JOIN boxes b
        ON a.n_nationkey < b.n_nationkey
       AND a.minx < b.maxx AND b.minx < a.maxx
       AND a.miny < b.maxy AND b.miny < a.maxy
    )
    SELECT 'box' AS fam, key1, key2,
           'POLYGON ((' || {_fmt_sql("ix0")} || ' ' || {_fmt_sql("iy1")} || ', '
                        || {_fmt_sql("ix0")} || ' ' || {_fmt_sql("iy0")} || ', '
                        || {_fmt_sql("ix1")} || ' ' || {_fmt_sql("iy0")} || ', '
                        || {_fmt_sql("ix1")} || ' ' || {_fmt_sql("iy1")} || ', '
                        || {_fmt_sql("ix0")} || ' ' || {_fmt_sql("iy1")} || '))'
             AS inter_wkt,
           (ix1 - ix0) * (iy1 - iy0) AS inter_area,
           area_a - (ix1 - ix0) * (iy1 - iy0) AS diff_area,
           CAST(0 AS BIGINT) AS residual_micro,
           CAST(0 AS BIGINT) AS sym_micro,
           TRUE AS nontrivial
    FROM pairs
    UNION ALL
    SELECT fam, n_nationkey AS key1, n_nationkey AS key2,
           CAST(NULL AS VARCHAR) AS inter_wkt,
           CAST(NULL AS DOUBLE) AS inter_area,
           CAST(NULL AS DOUBLE) AS diff_area,
           CAST(0 AS BIGINT) AS residual_micro,
           CAST(0 AS BIGINT) AS sym_micro,
           TRUE AS nontrivial
    FROM boxes, (VALUES ('arrow'), ('concave'), ('holed')) fams(fam)
"""


@query("q139_st_intersection", oracle=_Q139_ORACLE)
def q139_st_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: ST_Intersection + ST_Difference. Box pairs check exact
    values; arrowhead-vs-box rows check exact invariants through the
    triangulation path (module docstring)."""
    _ensure_udfs(spark)
    boxes = nation_boxes(spark, sf_dir).withColumn(
        "geom", F.expr("st_makeenvelope(minx, miny, maxx, maxy)")
    )
    a = boxes.select(
        F.col("n_nationkey").alias("key1"),
        F.col("minx").alias("ax0"), F.col("miny").alias("ay0"),
        F.col("maxx").alias("ax1"), F.col("maxy").alias("ay1"),
        F.col("geom").alias("geom_a"),
    )
    b = boxes.select(
        F.col("n_nationkey").alias("key2"),
        F.col("minx").alias("bx0"), F.col("miny").alias("by0"),
        F.col("maxx").alias("bx1"), F.col("maxy").alias("by1"),
        F.col("geom").alias("geom_b"),
    )
    pairs = a.join(
        F.broadcast(b),
        (F.col("key1") < F.col("key2"))
        & (F.col("ax0") < F.col("bx1")) & (F.col("bx0") < F.col("ax1"))
        & (F.col("ay0") < F.col("by1")) & (F.col("by0") < F.col("ay1")),
    )
    area0 = _AREA0
    box_rows = pairs.select(
        F.lit("box").alias("fam"),
        "key1",
        "key2",
        F.expr("st_intersection(geom_a, geom_b)").alias("inter_wkt"),
        F.expr("st_area(st_intersection(geom_a, geom_b))").alias("inter_area"),
        F.expr(area0.format(g="st_difference(geom_a, geom_b)")).alias("diff_area"),
        F.expr(
            "CAST(floor(("
            + area0.format(g="st_intersection(geom_a, geom_b)")
            + " + " + area0.format(g="st_difference(geom_a, geom_b)")
            + " - st_area(geom_a)) * 1000000 + 0.5) AS BIGINT)"
        ).alias("residual_micro"),
        F.expr(
            "CAST(floor(("
            + area0.format(g="st_intersection(geom_a, geom_b)")
            + " - " + area0.format(g="st_intersection(geom_b, geom_a)")
            + ") * 1000000 + 0.5) AS BIGINT)"
        ).alias("sym_micro"),
        F.expr(area0.format(g="st_intersection(geom_a, geom_b)") + " > 0").alias(
            "nontrivial"
        ),
    )

    # Invariant families (module docstring): arrow x box (r10),
    # concave x concave and holed x concave (r12) — each pins the
    # inclusion-exclusion residual, intersection symmetry, and a
    # non-triviality flag in micro-units through the general kernel.
    fams = boxes.selectExpr(
        "n_nationkey",
        "geom",
        f"{_ARROW} AS arrow",
        f"{_CONCAVE_A} AS ca",
        f"{_CONCAVE_B} AS cb",
        f"{_HOLED_H} AS hh",
    )
    fam_rows = [
        _invariant_rows_139(fams, "arrow", "arrow", "geom"),
        _invariant_rows_139(fams, "concave", "ca", "cb"),
        _invariant_rows_139(fams, "holed", "hh", "ca"),
    ]
    out = box_rows
    for r in fam_rows:
        out = out.unionByName(r)
    return out


def _invariant_rows_139(df: DataFrame, fam: str, g1: str, g2: str) -> DataFrame:
    """One invariant row per nation for a fixture pair: residual of
    area(g1 ∩ g2) + area(g1 − g2) − area(g1), intersection symmetry,
    and overlap non-triviality — all micro-int exact."""
    inter = _AREA0.format(g=f"st_intersection({g1}, {g2})")
    inter_rev = _AREA0.format(g=f"st_intersection({g2}, {g1})")
    diff = _AREA0.format(g=f"st_difference({g1}, {g2})")
    return df.select(
        F.lit(fam).alias("fam"),
        F.col("n_nationkey").alias("key1"),
        F.col("n_nationkey").alias("key2"),
        F.lit(None).cast("string").alias("inter_wkt"),
        F.lit(None).cast("double").alias("inter_area"),
        F.lit(None).cast("double").alias("diff_area"),
        F.expr(
            f"CAST(floor(({inter} + {diff} - st_area({g1}))"
            " * 1000000 + 0.5) AS BIGINT)"
        ).alias("residual_micro"),
        F.expr(
            f"CAST(floor(({inter} - {inter_rev}) * 1000000 + 0.5) AS BIGINT)"
        ).alias("sym_micro"),
        F.expr(f"{inter} > 0").alias("nontrivial"),
    )


_Q146_ORACLE = f"""
    WITH boxes AS ({NATION_BOXES_SQL}),
    pairs AS (
      SELECT a.n_nationkey AS key1, b.n_nationkey AS key2,
             (a.maxx - a.minx) * (a.maxy - a.miny) AS area_a,
             (b.maxx - b.minx) * (b.maxy - b.miny) AS area_b,
             (least(a.maxx, b.maxx) - greatest(a.minx, b.minx))
               * (least(a.maxy, b.maxy) - greatest(a.miny, b.miny)) AS inter
      FROM boxes a JOIN boxes b
        ON a.n_nationkey < b.n_nationkey
       AND a.minx < b.maxx AND b.minx < a.maxx
       AND a.miny < b.maxy AND b.miny < a.maxy
    )
    SELECT 'box' AS fam, key1, key2,
           area_a + area_b - 2 * inter AS symdiff_area,
           CAST(0 AS BIGINT) AS residual_micro,
           CAST(0 AS BIGINT) AS commute_micro,
           -- identical boxes (the nation-key formula collides every 24
           -- keys) have a legitimately EMPTY symmetric difference
           area_a + area_b - 2 * inter > 0 AS nontrivial
    FROM pairs
    UNION ALL
    SELECT fam, n_nationkey AS key1, n_nationkey AS key2,
           CAST(NULL AS DOUBLE) AS symdiff_area,
           CAST(0 AS BIGINT) AS residual_micro,
           CAST(0 AS BIGINT) AS commute_micro,
           TRUE AS nontrivial
    FROM boxes, (VALUES ('arrow'), ('concave'), ('holed')) fams(fam)
"""


@query("q146_st_symdifference", oracle=_Q146_ORACLE)
def q146_st_symdifference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: ST_SymDifference — (a − b) ∪ (b − a) pooled into one exact
    assembly (functions/overlay.py symdifference_geoms). Box pairs pin
    the exact area closed-form (A + B − 2·A∩B); arrowhead-vs-box rows
    (triangulation path) pin the inclusion–exclusion residual
    area(aΔb) − area(a) − area(b) + 2·area(a∩b) = 0 and commutativity
    in micro-units, plus a non-triviality flag. Same broadcast
    bbox-pair generator and 100 TB shape as q139 (module docstring)."""
    _ensure_udfs(spark)
    boxes = nation_boxes(spark, sf_dir).withColumn(
        "geom", F.expr("st_makeenvelope(minx, miny, maxx, maxy)")
    )
    a = boxes.select(
        F.col("n_nationkey").alias("key1"),
        F.col("minx").alias("ax0"), F.col("miny").alias("ay0"),
        F.col("maxx").alias("ax1"), F.col("maxy").alias("ay1"),
        F.col("geom").alias("geom_a"),
    )
    b = boxes.select(
        F.col("n_nationkey").alias("key2"),
        F.col("minx").alias("bx0"), F.col("miny").alias("by0"),
        F.col("maxx").alias("bx1"), F.col("maxy").alias("by1"),
        F.col("geom").alias("geom_b"),
    )
    pairs = a.join(
        F.broadcast(b),
        (F.col("key1") < F.col("key2"))
        & (F.col("ax0") < F.col("bx1")) & (F.col("bx0") < F.col("ax1"))
        & (F.col("ay0") < F.col("by1")) & (F.col("by0") < F.col("ay1")),
    )
    area0 = _AREA0
    sd = area0.format(g="st_symdifference(geom_a, geom_b)")
    sd_rev = area0.format(g="st_symdifference(geom_b, geom_a)")
    inter = area0.format(g="st_intersection(geom_a, geom_b)")
    box_rows = pairs.select(
        F.lit("box").alias("fam"),
        "key1",
        "key2",
        F.expr(sd).alias("symdiff_area"),
        F.expr(
            f"CAST(floor(({sd} - st_area(geom_a) - st_area(geom_b)"
            f" + 2 * {inter}) * 1000000 + 0.5) AS BIGINT)"
        ).alias("residual_micro"),
        F.expr(
            f"CAST(floor(({sd} - {sd_rev}) * 1000000 + 0.5) AS BIGINT)"
        ).alias("commute_micro"),
        F.expr(f"{sd} > 0").alias("nontrivial"),
    )

    fams = boxes.selectExpr(
        "n_nationkey",
        "geom",
        f"{_ARROW} AS arrow",
        f"{_CONCAVE_A} AS ca",
        f"{_CONCAVE_B} AS cb",
        f"{_HOLED_H} AS hh",
    )
    fam_rows = [
        _invariant_rows_146(fams, "arrow", "arrow", "geom"),
        _invariant_rows_146(fams, "concave", "ca", "cb"),
        _invariant_rows_146(fams, "holed", "hh", "ca"),
    ]
    out = box_rows
    for r in fam_rows:
        out = out.unionByName(r)
    return out


def _invariant_rows_146(df: DataFrame, fam: str, g1: str, g2: str) -> DataFrame:
    """Symmetric-difference invariants per fixture pair: the
    inclusion-exclusion residual area(g1 Δ g2) − area(g1) − area(g2) +
    2·area(g1 ∩ g2), commutativity, and non-triviality (micro-int)."""
    sd = _AREA0.format(g=f"st_symdifference({g1}, {g2})")
    sd_rev = _AREA0.format(g=f"st_symdifference({g2}, {g1})")
    inter = _AREA0.format(g=f"st_intersection({g1}, {g2})")
    return df.select(
        F.lit(fam).alias("fam"),
        F.col("n_nationkey").alias("key1"),
        F.col("n_nationkey").alias("key2"),
        F.lit(None).cast("double").alias("symdiff_area"),
        F.expr(
            f"CAST(floor(({sd} - st_area({g1}) - st_area({g2})"
            f" + 2 * {inter}) * 1000000 + 0.5) AS BIGINT)"
        ).alias("residual_micro"),
        F.expr(
            f"CAST(floor(({sd} - {sd_rev}) * 1000000 + 0.5) AS BIGINT)"
        ).alias("commute_micro"),
        F.expr(f"{sd} > 0").alias("nontrivial"),
    )
