"""Bloom-filter semi-join pre-filter (q144) — beyond-reference.

The reference's only join strategy is a nested-loop XQuery (reference
extension/xml_extension.ts:712-954); a 100 TB fact-dim join's first
cost lever on Spark is NOT the join algorithm but how many fact rows
reach the shuffle at all. This module builds a Bloom filter over the
dimension keys (high-value orders), broadcasts it, and probes the fact
table (lineitem) map-side — rows failing any of the K=3 hash positions
never enter the join shuffle. The driver row reports, per return flag,
the bloom-pass count, the true-match count (exact semi join), and the
false-positive count, so the oracle pins both the filter's exactness
(no false NEGATIVES — every true match passes) and its deterministic
false-positive set.

Determinism across engines: hash positions are pure integer
arithmetic — ``((key % P) * A_j + B_j) % P % M`` with P = 2^31 − 1 and
A_j < 2^31, so every product stays under 2^62 and BIGINT arithmetic is
exact in both Spark and DuckDB (no md5-hex parsing, which DuckDB can't
do without casts Spark lacks). Spark's native
``functions.bloom_filter_agg`` is deliberately NOT used: its bit array
is engine-internal (xxhash64) and could not be oracle-checked.

Scale shape: the bit set is a DataFrame of distinct set positions
(≤ K·|dim| rows ≪ M), broadcast into K map-side semi joins — the fact
table is never shuffled for the probe; the per-flag count is the only
(bounded-key) shuffle. At 100 TB the same plan holds: the bloom side
is dimension-sized, the probe is embarrassingly parallel, and the
false-positive rate is tunable by M alone.

New module so the verified dedup/similarity fingerprints stay
untouched (same isolation rationale as overlay_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

P = 2147483647  # 2^31 - 1
M = 4096  # bits
HASHES = [(1103515245, 12345), (1588635695, 54321), (2027382931, 98765)]
THRESHOLD = 490000.0  # o_totalprice cut for the "high-value" dim side


def _pos_sql(key: str, a: int, b: int) -> str:
    return f"((({key} % {P}) * {a} + {b}) % {P}) % {M}"


_BLOOM_BITS_SQL = " UNION ".join(
    f"SELECT DISTINCT {_pos_sql('o_orderkey', a, b)} AS bit "
    f"FROM orders WHERE o_totalprice > {THRESHOLD}"
    for a, b in HASHES
)

_Q144_ORACLE = f"""
    WITH bits AS ({_BLOOM_BITS_SQL}),
    probe AS (
      SELECT l_orderkey, l_returnflag,
             {_pos_sql('l_orderkey', *HASHES[0])} AS p0,
             {_pos_sql('l_orderkey', *HASHES[1])} AS p1,
             {_pos_sql('l_orderkey', *HASHES[2])} AS p2
      FROM lineitem
    ),
    passed AS (
      SELECT l_orderkey, l_returnflag FROM probe
      WHERE p0 IN (SELECT bit FROM bits)
        AND p1 IN (SELECT bit FROM bits)
        AND p2 IN (SELECT bit FROM bits)
    ),
    truth AS (
      SELECT o_orderkey FROM orders WHERE o_totalprice > {THRESHOLD}
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS bloom_pass,
           CAST(count(*) FILTER (
             l_orderkey IN (SELECT o_orderkey FROM truth)
           ) AS BIGINT) AS true_match,
           CAST(count(*) FILTER (
             l_orderkey NOT IN (SELECT o_orderkey FROM truth)
           ) AS BIGINT) AS false_pos
    FROM passed
    GROUP BY l_returnflag
"""


@query("q144_bloom_semijoin", oracle=_Q144_ORACLE)
def q144_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-filter ahead of a fact-dim semi join: the bit
    set (distinct hash positions of high-value order keys) broadcasts
    into K map-side semi joins over lineitem; per return flag the row
    counts bloom-passes, exact matches, and false positives. Module
    docstring covers the cross-engine hash determinism and the 100 TB
    plan shape."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    dim = orders.filter(F.col("o_totalprice") > THRESHOLD).select("o_orderkey")
    # r18 (guide §2.4 duplicated subtrees): the bit set is ONE scan of
    # orders — the K positions explode from a single projection instead
    # of a K-branch UNION (same distinct result: union-distinct of the
    # K position sets == distinct of their concatenation). Each of the
    # K broadcast builds below still evaluates this subtree once, but
    # that is K scans instead of the old K×K (every broadcast re-ran
    # the whole K-branch union). A persist of the bit set was A/B'd and
    # rejected: the cache materialization barrier cost more than the
    # two saved 150k-row scans (med 0.60 vs 0.57 s over 7 interleaved
    # runs; the old shape med 0.70).
    pos_cols = [
        F.expr(_pos_sql("o_orderkey", a, b)) for a, b in HASHES
    ]
    bits = dim.select(F.explode(F.array(*pos_cols)).alias("bit")).distinct()

    probe = lineitem.select("l_orderkey", "l_returnflag")
    for j, (a, b) in enumerate(HASHES):
        probe = probe.withColumn(f"p{j}", F.expr(_pos_sql("l_orderkey", a, b)))
    # K broadcast LEFT SEMI joins: a probe row survives only if every
    # hash position is present in the bit set — the fact table itself
    # is never shuffled.
    for j in range(len(HASHES)):
        probe = probe.join(
            F.broadcast(bits.withColumnRenamed("bit", f"b{j}")),
            F.col(f"p{j}") == F.col(f"b{j}"),
            "left_semi",
        )
    truth = dim.withColumnRenamed("o_orderkey", "t_orderkey")
    flagged = probe.join(
        F.broadcast(truth),
        F.col("l_orderkey") == F.col("t_orderkey"),
        "left_outer",
    )
    return flagged.groupBy("l_returnflag").agg(
        F.count("*").alias("bloom_pass"),
        F.count("t_orderkey").alias("true_match"),
        F.sum(F.when(F.col("t_orderkey").isNull(), 1).otherwise(0)).alias(
            "false_pos"
        ),
    )
