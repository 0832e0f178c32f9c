"""Spatially partitioned parquet storage: grid-cell layout + bbox
reads that PRUNE PARTITIONS (r16 — the storage-side spatial index).

At 100 TB a bbox query must not scan the world. The classic
cluster-native answer is a storage LAYOUT, not an index service:
write the table partitioned by coarse grid cell (``cx = floor(x /
cell)``, ``cy = floor(y / cell)``), and express bbox queries as range
predicates on the partition columns — Catalyst's partition pruning
then drops every non-overlapping cell at PLANNING time (visible as
``PartitionFilters`` in the scan node, plan-asserted in
tests/test_plans.py). The reference gets the same effect from its XML
databases' spatial indexes (BaseX ``create index``; the reference
queries them through the driver); a Spark-native engine gets it from
the file layout plus an exact residual filter.

Scale shape: the WRITE is one shuffle-free pass (partitionBy on
derived columns); the READ plans only the matching directories — a
100× data growth with fixed cell size grows per-cell file counts, not
the number of cells a query touches. Hot cells (cities) are the skew
class; the documented mitigation is an extra hash subpartition column
(``salt = pmod(hash(id), k)``) inside the hot cells, which composes
with the same pruning predicate. Cell size trades pruning selectivity
against small-file pressure — pick cells so the p95 cell is a few
parquet row groups (the q118 bucketed-join sizing stance).

Driver row ``q184_spatial_partition_pruning``: write the customer
point fixture partitioned at 45° cells into a scratch dir (the
q99/q182 generator stance — the write itself is the distributed
product path), read back ONLY the cells overlapping a bbox, apply the
exact residual filter, and return per-cell counts + key sums. The
DuckDB oracle recomputes the same cells and sums straight from the
customer fixture, so a pruning bug that drops or duplicates a
partition shows up as a wrong group row.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ingest import _scratch_dir
from .registry import query
from .spatial_ops import CUSTOMER_POINTS_SQL, customer_points

_CELL = 45.0  # degrees; 8×4 world grid for the fixture


def write_spatial_partitioned(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    cell: float = _CELL,
    order_by_geohash: bool = True,
    salt: int = 0,
    salt_col: str | None = None,
) -> None:
    """Write ``df`` as parquet partitioned by grid cell of ``cell``
    degrees. Adds BIGINT ``cx``/``cy`` partition columns.

    ``order_by_geohash`` sorts rows WITHIN each task by their geohash
    (a Z-order space-filling curve) before writing — the same
    technique as Delta's OPTIMIZE ZORDER: spatially nearby rows land in
    the same parquet row groups, so the row groups' lon/lat min/max
    statistics become tight and the reader's residual bbox predicate
    skips row groups INSIDE the surviving cells too (partition
    pruning drops cells; statistics pruning drops row groups). Costs
    one in-task sort at write time; no extra shuffle."""
    out = df.withColumn(
        "cx", F.floor(F.col(xcol) / F.lit(float(cell))).cast("bigint")
    ).withColumn(
        "cy", F.floor(F.col(ycol) / F.lit(float(cell))).cast("bigint")
    )
    if salt > 1:
        # hot-cell (skew) mitigation: an extra hash subpartition splits
        # a city-sized cell across `salt` directories; bbox reads
        # filter only cx/cy, so every salt shard of a surviving cell
        # is read and pruning is unaffected. The hash must be
        # ROW-unique, not coordinate-derived — the common skew class is
        # many rows at ONE hot location, and hash(x, y) would send all
        # of them to a single shard (ADVICE r16): hash ``salt_col``
        # (an id column) when given, else a row-unique surrogate id
        # (spread is uniform either way; only the id-column form is
        # stable across rewrites, which a storage salt does not need).
        shard_src = (
            F.col(salt_col) if salt_col is not None
            else F.monotonically_increasing_id()
        )
        out = out.withColumn("sp", F.pmod(F.hash(shard_src), F.lit(salt)))
    if order_by_geohash:
        # r17 optimization (guide §4.1): the sort key used to be the
        # st_geohash pandas UDF (a Python round trip per write task —
        # ~0.7 s of the q184 write at sf0.1). A geohash-9 string sorts
        # exactly like its 45-bit lon/lat bit-interleave (the base32
        # alphabet is value-ordered), so the key is now that Morton
        # integer computed with JVM expressions: lon bits at even
        # positions (23 bits), lat at odd (22) — order-checked against
        # encode_point(…, 9) on 35k probes incl. both test fixtures.
        # Caveat (ADVICE r17): floor((x+180)/360*2^23) can disagree
        # with the UDF's iterated-bisection bits for values within ~1
        # ulp of a cell boundary, which probes cannot rule out —
        # correctness relies on the key being ORDER-ONLY (it only
        # arranges rows within a partition file), never on exact
        # geohash equivalence. Pure sort key: row contents and the
        # read-back set are unchanged.
        ix = F.least(
            F.lit((1 << 23) - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(xcol) + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << 23))),
            ),
        ).cast("bigint")
        iy = F.least(
            F.lit((1 << 22) - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(ycol) + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << 22))),
            ),
        ).cast("bigint")
        out = (
            out.withColumn("_ix", ix)
            .withColumn("_iy", iy)
            .withColumn(
                "_gh",
                F.expr(
                    "aggregate(sequence(0, 22), 0L, (acc, i) -> acc"
                    " + shiftleft(shiftright(_ix, i) & 1, 2 * i)"
                    " + CASE WHEN i < 22 THEN"
                    "   shiftleft(shiftright(_iy, i) & 1, 2 * i + 1)"
                    "   ELSE 0L END)"
                ),
            )
            .sortWithinPartitions("cx", "cy", "_gh")
            .drop("_gh", "_ix", "_iy")
        )
    keys = ["cx", "cy"] + (["sp"] if salt > 1 else [])
    out.write.mode("overwrite").partitionBy(*keys).parquet(path)


def read_spatial_bbox(
    spark: SparkSession,
    path: str,
    xcol: str,
    ycol: str,
    minx: float,
    miny: float,
    maxx: float,
    maxy: float,
    cell: float = _CELL,
) -> DataFrame:
    """Rows inside the bbox, reading ONLY overlapping grid cells: the
    cx/cy range predicate lands in the scan's PartitionFilters (pruned
    at planning time); the exact x/y comparison is the residual."""
    cxmin, cxmax = int(minx // cell), int(maxx // cell)
    cymin, cymax = int(miny // cell), int(maxy // cell)
    df = spark.read.parquet(path)
    return df.filter(
        F.col("cx").between(cxmin, cxmax)
        & F.col("cy").between(cymin, cymax)
        & F.col(xcol).between(minx, maxx)
        & F.col(ycol).between(miny, maxy)
    )


# bbox chosen so it straddles cell boundaries on both axes (pruning
# must keep partial cells) and excludes most of the grid (pruning must
# drop the rest): x ∈ [-60, 60] covers cells -2..1 of -4..3, y ∈
# [-30, 30] covers cells -1..0 of -2..1 — 8 of 32 cells survive.
_BBOX = (-60.0, -30.0, 60.0, 30.0)

_Q184_ORACLE = f"""
    WITH pts AS ({CUSTOMER_POINTS_SQL})
    SELECT CAST(floor(lon / 45.0) AS BIGINT) AS cx,
           CAST(floor(lat / 45.0) AS BIGINT) AS cy,
           COUNT(*) AS n,
           CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM pts
    WHERE lon BETWEEN -60.0 AND 60.0 AND lat BETWEEN -30.0 AND 30.0
    GROUP BY 1, 2
"""


@query("q184_spatial_partition_pruning", oracle=_Q184_ORACLE)
def q184_spatial_partition_pruning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Grid-partitioned write → partition-pruned bbox read → per-cell
    aggregate (module docstring; pruning is plan-asserted in
    tests/test_plans.py)."""
    pts = customer_points(spark, sf_dir).select(
        "c_custkey", "lon", "lat"
    )
    path = os.path.join(_scratch_dir("q184_store", sf_dir), "pts")
    write_spatial_partitioned(pts, path, "lon", "lat")
    got = read_spatial_bbox(spark, path, "lon", "lat", *_BBOX)
    return got.groupBy("cx", "cy").agg(
        F.count("*").alias("n"),
        F.sum("c_custkey").alias("key_sum"),
    )
