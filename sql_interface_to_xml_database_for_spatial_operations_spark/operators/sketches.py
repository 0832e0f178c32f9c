"""Count-Min Sketch as a DataFrame: mergeable heavy-hitter counting.

The "novel sketch" slot next to q58's HLL and q117's GK quantiles: a
CMS over a key column, built ENTIRELY from JVM expressions — the sketch
IS a DataFrame of (seed, bucket, n) rows, so it inherits every Spark
property that matters at 100 TB for free:

- **Map-side combinable**: groupBy(seed, bucket).count() partially
  aggregates before the shuffle; the shuffle volume is bounded by
  depth·width per partition regardless of input rows.
- **Mergeable**: union two sketches and re-sum — the CMS merge
  operation is exactly a grouped sum, so cross-day/cross-source sketch
  merges are one-line DataFrame code.
- **No Python anywhere**: hashing is ``xxhash64(col, seed)`` (Spark's
  built-in 64-bit hash with a seed parameter), bucketing is ``pmod``.

Estimates carry the standard CMS guarantee: est ≥ true, and
est ≤ true + (e/width)·N with probability 1 − (1/e)^depth. With the
default 4×1024 geometry the overcount bound is ~0.27% of stream size
per 1 − 2·10⁻² failure odds — and for low-cardinality keys (≪ width)
collisions are absent and the estimate is exact, which is what the
driver-row oracle can hash-compare exactly (pending next rotation
window; tests/test_sketches.py meanwhile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_build(df: DataFrame, col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Build a CMS over ``df[col]`` → rows (seed, bucket, n). One
    explode by depth (cheap: depth ≤ 8) then one partially-aggregated
    groupBy; empty buckets are implicit zeros."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed")
    return (
        df.select(F.col(col).cast("string").alias("k"))
        .select("k", seeds)
        .select("seed", F.pmod(F.xxhash64("k", "seed"), F.lit(width)).alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches of identical geometry: grouped sum."""
    return a.unionByName(b).groupBy("seed", "bucket").agg(F.sum("n").alias("n"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate counts for ``items[col]`` → (item, est). Each item
    probes its depth buckets (broadcast-sized probe set joins the
    sketch rows); the estimate is the MIN over seeds, with missing
    buckets counting as zero — the standard CMS read. depth/width must
    match the build geometry."""
    probes = (
        items.select(F.col(col).cast("string").alias("item"))
        .distinct()
        .select("item", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed"))
        .select("item", "seed", F.pmod(F.xxhash64("item", "seed"), F.lit(width)).alias("bucket"))
    )
    return (
        probes.join(sketch, ["seed", "bucket"], "left")
        .fillna(0, subset=["n"])
        .groupBy("item")
        .agg(F.min("n").cast("bigint").alias("est"))
    )
