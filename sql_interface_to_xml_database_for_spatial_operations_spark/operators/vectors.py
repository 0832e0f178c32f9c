"""Shared embedding-vector helpers: cosine folds and random-hyperplane
LSH bucketing.

Both the ANN family (``similarity``) and the embedding near-dup operator
(``dedup.q69``) block candidates on the same LSH bucket id, so the
signature computation lives here once — on the Spark side as JVM-only
expressions and on the oracle side as the equivalent DuckDB SQL.
Hyperplane weights are md5-parity-derived so both engines reproduce them
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

N_PLANES = 8
DIM = 64

# JVM-side cosine similarity over two array<double> columns: one zip_with
# fold for the dot product, one fold per norm — no Python in the pair loop.
COSINE_SQL_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x) "
    "/ (sqrt(aggregate({a}, 0D, (acc, x) -> acc + x * x)) "
    "* sqrt(aggregate({b}, 0D, (acc, x) -> acc + x * x)))"
)


def vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )


WEIGHTS_SQL = f"""
    SELECT h, j,
           CASE WHEN (strpos('0123456789abcdef',
                             substr(md5(CAST(h AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 1)) - 1) % 2 = 1
                THEN 1.0 ELSE -1.0 END AS w
    FROM (SELECT unnest(generate_series(0, {N_PLANES - 1})) AS h),
         (SELECT unnest(generate_series(0, {DIM - 1})) AS j)
"""

BUCKETS_SQL = f"""
    WITH weights AS ({WEIGHTS_SQL}),
    comp AS (
      SELECT vec_id, label, j - 1 AS j, v[j] AS x
      FROM (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
           LATERAL (SELECT unnest(generate_series(1, {DIM})) AS j)
    ),
    dots AS (
      SELECT vec_id, label, h, sum(x * w) AS dot
      FROM comp JOIN weights USING (j)
      GROUP BY vec_id, label, h
    )
    SELECT vec_id, label,
           CAST(sum(CASE WHEN dot > 0 THEN 1 << h ELSE 0 END) AS BIGINT) AS bucket
    FROM dots GROUP BY vec_id, label
"""


def lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane signatures: 8 md5-derived ±1 hyperplanes; the
    sign pattern of the 8 dot products is the bucket id."""
    e = vectors(spark, sf_dir)
    planes = spark.range(N_PLANES).select(F.col("id").cast("int").alias("h"))
    dims = spark.range(DIM).select(F.col("id").cast("int").alias("j"))
    parity = F.expr(
        "(instr('0123456789abcdef', "
        "substr(md5(concat(cast(h as string), '_', cast(j as string))), 1, 1)) - 1) % 2"
    )
    weights = planes.crossJoin(dims).select("h", "j", F.when(parity == 1, 1.0).otherwise(-1.0).alias("w"))
    comp = e.select("vec_id", "label", F.posexplode("v").alias("j", "x"))
    dots = (
        comp.join(F.broadcast(weights), "j")
        .groupBy("vec_id", "label", "h")
        .agg(F.sum(F.col("x") * F.col("w")).alias("dot"))
    )
    return dots.groupBy("vec_id", "label").agg(
        F.sum(F.when(F.col("dot") > 0, F.expr("shiftleft(1, h)")).otherwise(0))
        .cast("bigint")
        .alias("bucket")
    )
