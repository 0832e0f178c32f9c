"""Driver row for the WKB codec (functions/wkb.py).

Oracle design: WKB is deterministic little-endian bytes, so the SQL
oracle pins (a) exact encoded length — 21 bytes for a point
(1 + 4 + 2·8), 93 for a 5-vertex one-ring polygon (1 + 4 + 4 + 4 +
5·16) — (b) the 5-byte header hex ('01' NDR + uint32 type code), and
(c) the decode side via the WKT round-trip string, which proves the
coordinate doubles survive bit-exactly (IEEE754 encode/decode is
lossless, so any codec error surfaces as a WKT diff). DuckDB cannot
bit-cast a double to bytes portably, so the payload hex itself is
pinned by tests/test_wkb.py's struct ground truth instead.

Scale: both directions are map-only Arrow-vectorized UDFs; the two
fixture families union after per-family projection (no shuffle at all
— union is a plan concatenation).

Separate module so spatial_ops.py's verified fingerprints stay
untouched (same rationale as relations_ops.py / overlay_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query
from .spatial_ops import (
    CUSTOMER_POINTS_SQL,
    NATION_BOXES_SQL,
    _fmt_sql,
    customer_points,
    nation_boxes,
)


def _ensure_udfs(spark: SparkSession) -> None:
    from ..functions.spatial import register_spatial_functions
    from ..functions.wkb import register_wkb_functions

    register_spatial_functions(spark)
    register_wkb_functions(spark)


_Q140_ORACLE = f"""
    WITH pts AS ({CUSTOMER_POINTS_SQL}), boxes AS ({NATION_BOXES_SQL})
    SELECT 'pt' AS fam, c_custkey AS key,
           CAST(21 AS BIGINT) AS wkb_len,
           '0101000000' AS head_hex,
           'POINT (' || {_fmt_sql("lon")} || ' ' || {_fmt_sql("lat")} || ')' AS rt_wkt
    FROM pts
    UNION ALL
    SELECT 'box' AS fam, n_nationkey AS key,
           CAST(93 AS BIGINT) AS wkb_len,
           '0103000000' AS head_hex,
           'POLYGON ((' || {_fmt_sql("minx")} || ' ' || {_fmt_sql("miny")} || ', '
                        || {_fmt_sql("maxx")} || ' ' || {_fmt_sql("miny")} || ', '
                        || {_fmt_sql("maxx")} || ' ' || {_fmt_sql("maxy")} || ', '
                        || {_fmt_sql("minx")} || ' ' || {_fmt_sql("maxy")} || ', '
                        || {_fmt_sql("minx")} || ' ' || {_fmt_sql("miny")} || '))'
             AS rt_wkt
    FROM boxes
"""


@query("q140_wkb_roundtrip", oracle=_Q140_ORACLE)
def q140_wkb_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12/S-codec: ST_AsBinary → length/header checks → ST_GeomFromWKB
    round-trip, over both a point family (customers) and a polygon
    family (nation boxes)."""
    _ensure_udfs(spark)

    def fam(df: DataFrame, name: str, key: str, geom_sql: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("fam"),
            F.col(key).alias("key"),
            F.expr(f"st_asbinary({geom_sql})").alias("wkb"),
        ).select(
            "fam",
            "key",
            F.length("wkb").cast("bigint").alias("wkb_len"),
            F.lower(F.hex(F.expr("substring(wkb, 1, 5)"))).alias("head_hex"),
            F.expr("st_geomfromwkb(wkb)").alias("rt_wkt"),
        )

    pts = customer_points(spark, sf_dir).withColumn("geom", F.expr("st_point(lon, lat)"))
    boxes = nation_boxes(spark, sf_dir).withColumn(
        "geom", F.expr("st_makeenvelope(minx, miny, maxx, maxy)")
    )
    return fam(pts, "pt", "c_custkey", "geom").unionByName(
        fam(boxes, "box", "n_nationkey", "geom")
    )
