"""K-means assignment + update step over the embeddings table (q143) —
beyond-reference.

One Lloyd iteration with deterministic seeds: the first K vectors (by
``vec_id``) are the centroids, every remaining vector is assigned to
its nearest centroid by squared L2 (JVM ``aggregate``/``zip_with``
fold — no Python in the distance loop), and the update step re-averages
each cluster. The driver row reports, per centroid: member count, the
exact micro-int sum of squared distances, and the updated centroid's
first coordinate —
i.e. both halves of the iteration are oracle-pinned.

Cross-engine comparison: distances and means are compared as micro-int
(``floor(x·1e6 + 0.5)``), the repo-standard tie-stable idiom — Spark's
sequential fold and DuckDB's ``list_sum`` may differ in FP summation
order by ~1e-12, far below the micro quantum. The argmin itself is
taken over the micro-int distance with centroid-id tiebreak, so the
assignment is identical in both engines by construction.

Scale shape: the centroid model is K rows — broadcast — so assignment
is map-only over an arbitrarily large vector table; the update is one
bounded-key shuffle (K groups) with map-side partial aggregation.
Iterating Lloyd at 100 TB is this same plan in a loop with the new
centroids re-broadcast each round; one step is what a driver row can
pin exactly. New module so the verified similarity/vectors fingerprints
stay untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query
from .vectors import vectors as _vectors

K = 10  # vec_id < K are the seed centroids

_DIST2 = (
    "aggregate(zip_with({v}, {c}, (x, y) -> (x - y) * (x - y)), "
    "0D, (acc, x) -> acc + x)"
)

_Q143_ORACLE = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {K}),
    pts AS (SELECT vec_id, v FROM e WHERE vec_id >= {K}),
    scored AS (
      SELECT vec_id,
             cid,
             CAST(floor(list_sum(list_transform(list_zip(v, cv),
                    x -> (x[1] - x[2]) * (x[1] - x[2]))) * 1000000 + 0.5)
                  AS BIGINT) AS d2_micro,
             v
      FROM pts CROSS JOIN cent
    ),
    assigned AS (
      SELECT vec_id, cid, d2_micro, v FROM (
        SELECT vec_id, cid, d2_micro, v,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2_micro ASC, cid ASC) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT cid,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(d2_micro) AS BIGINT) AS sum_d2_micro,
           CAST(floor(avg(v[1]) * 1000000 + 0.5) AS BIGINT)
             AS new_c0_micro
    FROM assigned
    GROUP BY cid
"""


@query("q143_kmeans_assign", oracle=_Q143_ORACLE)
def q143_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd step: broadcast the K seed centroids, assign every
    vector to the micro-int-nearest one (JVM fold distances), and
    re-aggregate each cluster's size, exact squared-distance sum, and
    updated first coordinate (module docstring)."""
    vecs = _vectors(spark, sf_dir)
    cent = vecs.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    pts = vecs.filter(F.col("vec_id") >= K).select("vec_id", "v")
    scored = pts.join(F.broadcast(cent)).withColumn(
        "d2_micro",
        F.expr(
            "CAST(floor("
            + _DIST2.format(v="v", c="cv")
            + " * 1000000 + 0.5) AS BIGINT)"
        ),
    )
    # Per-vector argmin as min(struct(d2, cid)) — map-side combinable
    # (a window sort would shuffle all K candidate rows unreduced; the
    # struct-min's partial aggregation cuts the shuffle to one row per
    # vector regardless of K). cid breaks micro-int ties, matching the
    # oracle's (d2_micro, cid) order.
    assigned = scored.groupBy("vec_id").agg(
        F.min(F.struct("d2_micro", "cid")).alias("m"),
        F.first("v").alias("v"),  # identical across the group
    ).select(
        "vec_id",
        F.col("m.cid").alias("cid"),
        F.col("m.d2_micro").alias("d2_micro"),
        "v",
    )
    # SUM of the integer micro-distances, not their floored average: an
    # average of already-quantized integers lands EXACTLY on half-micro
    # boundaries with probability ~1/n per cluster, where Spark's and
    # DuckDB's float summation order could round opposite ways (the
    # r6 round() lesson, systematic rather than measure-zero here).
    # The exact BIGINT sum plus n_members carries the same information.
    return assigned.groupBy("cid").agg(
        F.count("*").alias("n_members"),
        F.sum("d2_micro").alias("sum_d2_micro"),
        F.expr(
            "CAST(floor(avg(v[0]) * 1000000 + 0.5) AS BIGINT)"
        ).alias("new_c0_micro"),
    )
