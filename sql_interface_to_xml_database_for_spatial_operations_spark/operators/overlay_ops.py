"""Driver row for ST_Intersection / ST_Difference (functions/overlay.py).

The reference forwards both names to PostGIS (reference
src/index.ts:44-63 — any PostGIS-accepted function rides the rebuilt
PostgreSQL query); here they are native pandas UDFs and this row gates
them with an exact closed-form oracle.

Fixture: the nation_boxes rectilinear polygons (integer-valued
coordinates, multiples of 5), self-joined on STRICT bbox overlap —
the intersection of two axis-aligned rectangles is the rectangle of
coordinate-wise max/min bounds, so DuckDB reconstructs the expected
intersection WKT **string** (exact vertex walk of the engine's
dissolve serializer: (x0 y1, x0 y0, x1 y0, x1 y1, x0 y1) — pinned by
tests/test_overlay.py) and both areas in closed form. diff_area checks
the complement identity area(a−b) = area(a) − area(a∩b), which holds
exactly because every quantity is integer-valued.

Scale shape: the pair generator is a broadcast range join on bbox
bounds (boxes are a dimension table; at 100 TB the same query over a
large polygon table uses the grid-cell candidate machinery of
spatial_ops._grid_candidates — the overlay UDF itself is map-only
either way). New module so spatial_ops.py's verified fingerprints
stay untouched (same rationale as relations_ops.py).

Separate module = separate staleness fingerprint; registration order
(operators/__init__.load_all) places q139 after the sketch rows.
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
    SELECT key1, key2,
           'POLYGON ((' || {_fmt_sql("ix0")} || ' ' || {_fmt_sql("iy1")} || ', '
                        || {_fmt_sql("ix0")} || ' ' || {_fmt_sql("iy0")} || ', '
                        || {_fmt_sql("ix1")} || ' ' || {_fmt_sql("iy0")} || ', '
                        || {_fmt_sql("ix1")} || ' ' || {_fmt_sql("iy1")} || ', '
                        || {_fmt_sql("ix0")} || ' ' || {_fmt_sql("iy1")} || '))'
             AS inter_wkt,
           (ix1 - ix0) * (iy1 - iy0) AS inter_area,
           area_a - (ix1 - ix0) * (iy1 - iy0) AS diff_area
    FROM pairs
"""


@query("q139_st_intersection", oracle=_Q139_ORACLE)
def q139_st_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: ST_Intersection + ST_Difference over overlapping box pairs.
    Strict-overlap pairs come from a broadcast theta join on bbox
    bounds; the overlay UDFs then run map-only per pair. diff_area
    exercises st_difference end-to-end (guillotine split + re-dissolve)
    against the closed-form complement."""
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
    # so the a ⊆ b case ('POLYGON EMPTY' difference) maps to 0 area
    # explicitly, matching PostGIS ST_Area(empty) = 0.
    return pairs.select(
        "key1",
        "key2",
        F.expr("st_intersection(geom_a, geom_b)").alias("inter_wkt"),
        F.expr("st_area(st_intersection(geom_a, geom_b))").alias("inter_area"),
        F.expr(
            "IF(endswith(st_difference(geom_a, geom_b), 'EMPTY'), "
            "0.0D, st_area(st_difference(geom_a, geom_b)))"
        ).alias("diff_area"),
    )
