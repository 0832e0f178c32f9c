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

from .registry import query
from .spatial_ops import NATION_BOXES_SQL, _fmt_sql, nation_boxes


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
    SELECT 'arrow' AS fam, n_nationkey AS key1, n_nationkey AS key2,
           CAST(NULL AS VARCHAR) AS inter_wkt,
           CAST(NULL AS DOUBLE) AS inter_area,
           CAST(NULL AS DOUBLE) AS diff_area,
           CAST(0 AS BIGINT) AS residual_micro,
           CAST(0 AS BIGINT) AS sym_micro,
           TRUE AS nontrivial
    FROM boxes
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
    # st_area parses WKT geometry and does not know typed EMPTY (that
    # extension stays local to overlay.py — see its module docstring),
    # so EMPTY maps to 0 area explicitly: PostGIS ST_Area(empty) = 0.
    area0 = "IF(endswith({g}, 'EMPTY'), 0.0D, st_area({g}))"
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

    # Non-convex arrowhead anchored at its box's (minx, miny): spans
    # x0..x0+40, y0..y0+30 with a reflex dip at (x0+20, y0+5) — always
    # properly overlapping its box (boxes are >= 30 x 20).
    i = lambda c: F.col(c).cast("bigint").cast("string")  # noqa: E731
    arrow_wkt = F.concat(
        F.lit("POLYGON (("),
        i("minx"), F.lit(" "), i("miny"), F.lit(", "),
        (F.col("minx") + 20).cast("bigint").cast("string"), F.lit(" "),
        (F.col("miny") + 5).cast("bigint").cast("string"), F.lit(", "),
        (F.col("minx") + 40).cast("bigint").cast("string"), F.lit(" "),
        i("miny"), F.lit(", "),
        (F.col("minx") + 20).cast("bigint").cast("string"), F.lit(" "),
        (F.col("miny") + 30).cast("bigint").cast("string"), F.lit(", "),
        i("minx"), F.lit(" "), i("miny"), F.lit("))"),
    )
    arrows = boxes.withColumn("arrow", arrow_wkt)
    arrow_rows = arrows.select(
        F.lit("arrow").alias("fam"),
        F.col("n_nationkey").alias("key1"),
        F.col("n_nationkey").alias("key2"),
        F.lit(None).cast("string").alias("inter_wkt"),
        F.lit(None).cast("double").alias("inter_area"),
        F.lit(None).cast("double").alias("diff_area"),
        F.expr(
            "CAST(floor(("
            + area0.format(g="st_intersection(arrow, geom)")
            + " + " + area0.format(g="st_difference(arrow, geom)")
            + " - st_area(arrow)) * 1000000 + 0.5) AS BIGINT)"
        ).alias("residual_micro"),
        F.expr(
            "CAST(floor(("
            + area0.format(g="st_intersection(arrow, geom)")
            + " - " + area0.format(g="st_intersection(geom, arrow)")
            + ") * 1000000 + 0.5) AS BIGINT)"
        ).alias("sym_micro"),
        F.expr(area0.format(g="st_intersection(arrow, geom)") + " > 0").alias(
            "nontrivial"
        ),
    )
    return box_rows.unionByName(arrow_rows)


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
    SELECT 'arrow' AS fam, n_nationkey AS key1, n_nationkey AS key2,
           CAST(NULL AS DOUBLE) AS symdiff_area,
           CAST(0 AS BIGINT) AS residual_micro,
           CAST(0 AS BIGINT) AS commute_micro,
           TRUE AS nontrivial
    FROM boxes
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
    area0 = "IF(endswith({g}, 'EMPTY'), 0.0D, st_area({g}))"
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

    i = lambda c: F.col(c).cast("bigint").cast("string")  # noqa: E731
    arrow_wkt = F.concat(
        F.lit("POLYGON (("),
        i("minx"), F.lit(" "), i("miny"), F.lit(", "),
        (F.col("minx") + 20).cast("bigint").cast("string"), F.lit(" "),
        (F.col("miny") + 5).cast("bigint").cast("string"), F.lit(", "),
        (F.col("minx") + 40).cast("bigint").cast("string"), F.lit(" "),
        i("miny"), F.lit(", "),
        (F.col("minx") + 20).cast("bigint").cast("string"), F.lit(" "),
        (F.col("miny") + 30).cast("bigint").cast("string"), F.lit(", "),
        i("minx"), F.lit(" "), i("miny"), F.lit("))"),
    )
    arrows = boxes.withColumn("arrow", arrow_wkt)
    sda = area0.format(g="st_symdifference(arrow, geom)")
    sda_rev = area0.format(g="st_symdifference(geom, arrow)")
    inter_a = area0.format(g="st_intersection(arrow, geom)")
    arrow_rows = arrows.select(
        F.lit("arrow").alias("fam"),
        F.col("n_nationkey").alias("key1"),
        F.col("n_nationkey").alias("key2"),
        F.lit(None).cast("double").alias("symdiff_area"),
        F.expr(
            f"CAST(floor(({sda} - st_area(arrow) - st_area(geom)"
            f" + 2 * {inter_a}) * 1000000 + 0.5) AS BIGINT)"
        ).alias("residual_micro"),
        F.expr(
            f"CAST(floor(({sda} - {sda_rev}) * 1000000 + 0.5) AS BIGINT)"
        ).alias("commute_micro"),
        F.expr(f"{sda} > 0").alias("nontrivial"),
    )
    return box_rows.unionByName(arrow_rows)
