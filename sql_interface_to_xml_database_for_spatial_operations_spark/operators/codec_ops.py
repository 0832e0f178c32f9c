"""Driver row for the WKB codec (functions/wkb.py).

r15 adds the EWKB families: ``st_asewkb(g, srid)`` embeds the SRID
behind the 0x20000000 flag (header hex pinned byte for byte, length
+4 for the int32), ``st_geomfromewkb`` round-trips it, and
``st_sridfromewkb`` extracts it — while the PLAIN reader's rejection
of the flag stays pinned (``wkb_srid_rejected``). The Z-EWKB family
pins the dim-flag combination 0xA0000001.

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
           'POINT (' || {_fmt_sql("lon")} || ' ' || {_fmt_sql("lat")} || ')' AS rt_wkt,
           CAST(0 AS INT) AS srid
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
             AS rt_wkt,
           CAST(0 AS INT) AS srid
    FROM boxes
    UNION ALL
    SELECT 'ewkb_pt' AS fam, n_nationkey AS key,
           CAST(25 AS BIGINT) AS wkb_len,
           '0101000020' AS head_hex,
           'POINT (' || {_fmt_sql("minx")} || ' ' || {_fmt_sql("miny")} || ')' AS rt_wkt,
           CAST(4000 + n_nationkey % 100 AS INT) AS srid
    FROM boxes
    UNION ALL
    SELECT 'ewkb_z' AS fam, n_nationkey AS key,
           CAST(33 AS BIGINT) AS wkb_len,
           '01010000a0' AS head_hex,
           'POINT Z (' || {_fmt_sql("minx")} || ' ' || {_fmt_sql("miny")}
                       || ' ' || CAST(n_nationkey AS STRING) || ')' AS rt_wkt,
           CAST(4326 AS INT) AS srid
    FROM boxes
    UNION ALL
    SELECT 'wkb_srid_rejected' AS fam, n_nationkey AS key,
           CAST(25 AS BIGINT) AS wkb_len,
           '0101000020' AS head_hex,
           'NULL(srid-flag)' AS rt_wkt,
           CAST(4326 AS INT) AS srid
    FROM boxes
"""


@query("q140_wkb_roundtrip", oracle=_Q140_ORACLE)
def q140_wkb_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12/S-codec: ST_AsBinary → length/header checks → ST_GeomFromWKB
    round-trip, over both a point family (customers) and a polygon
    family (nation boxes)."""
    _ensure_udfs(spark)

    def fam(
        df: DataFrame,
        name: str,
        key: str,
        buf_sql: str,
        decode_sql: str = "st_geomfromwkb(wkb)",
    ) -> DataFrame:
        return df.select(
            F.lit(name).alias("fam"),
            F.col(key).alias("key"),
            F.expr(buf_sql).alias("wkb"),
        ).select(
            "fam",
            "key",
            F.length("wkb").cast("bigint").alias("wkb_len"),
            F.lower(F.hex(F.expr("substring(wkb, 1, 5)"))).alias("head_hex"),
            F.expr(decode_sql).alias("rt_wkt"),
            F.expr("st_sridfromewkb(wkb)").cast("int").alias("srid"),
        )

    pts = customer_points(spark, sf_dir).withColumn("geom", F.expr("st_point(lon, lat)"))
    boxes = nation_boxes(spark, sf_dir).withColumn(
        "geom", F.expr("st_makeenvelope(minx, miny, maxx, maxy)")
    )
    rows = fam(pts, "pt", "c_custkey", "st_asbinary(geom)").unionByName(
        fam(boxes, "box", "n_nationkey", "st_asbinary(geom)")
    )
    # EWKB (r15): SRID-flagged buffers round-trip through the ewkb
    # reader; the PLAIN reader's rejection of the flag stays pinned
    rows = rows.unionByName(
        fam(
            boxes,
            "ewkb_pt",
            "n_nationkey",
            "st_asewkb(st_point(minx, miny), 4000 + n_nationkey % 100)",
            "st_geomfromewkb(wkb)",
        )
    )
    rows = rows.unionByName(
        fam(
            boxes,
            "ewkb_z",
            "n_nationkey",
            "st_asewkb('POINT Z (' || CAST(CAST(minx AS BIGINT) AS STRING)"
            " || ' ' || CAST(CAST(miny AS BIGINT) AS STRING) || ' ' ||"
            " CAST(n_nationkey AS STRING) || ')', 4326)",
            "st_geomfromewkb(wkb)",
        )
    )
    rows = rows.unionByName(
        fam(
            boxes,
            "wkb_srid_rejected",
            "n_nationkey",
            "st_asewkb(st_point(minx, miny), 4326)",
            "COALESCE(st_geomfromwkb(wkb), 'NULL(srid-flag)')",
        )
    )
    return rows
