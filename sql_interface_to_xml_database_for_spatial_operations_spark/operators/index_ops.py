"""Inverted-index build over the documents table (q145) —
beyond-reference.

A training-data pipeline's retrieval side starts from an inverted
index: term → posting statistics. This row builds the index with pure
JVM expressions (split/explode/group — the q60/q109 tokenizer family's
whitespace dialect, reproduced verbatim in the DuckDB oracle) and pins
per-term document frequency, total term frequency, and the argmax
posting (the document where the term occurs most, min doc_id on ties —
deterministic in both engines by construction).

Scale shape: explode is map-only; the per-(term, doc) tf and the
per-term rollup are both map-side-combinable aggregations over bounded
key spaces (vocabulary ≪ corpus). The top-25 head is
TakeOrderedAndProject, not a global sort. At 100 TB the same plan
holds — the only shuffle keys are (term, doc_id) then term, and a
posting-LIST materialization (collect_list per term) is deliberately
NOT part of the row: viral terms would make those rows unbounded; the
argmax posting is the bounded summary a driver row can pin.

New module so the verified text_ops fingerprints stay untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

TOP_N = 25

_Q145_ORACLE = f"""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
      FROM tokens WHERE term <> ''
      GROUP BY term, doc_id
    ),
    stats AS (
      SELECT term,
             CAST(count(*) AS BIGINT) AS df,
             CAST(sum(tf) AS BIGINT) AS total_tf,
             CAST(max(tf) AS BIGINT) AS max_tf
      FROM tf
      GROUP BY term
    ),
    top AS (
      SELECT t.term, CAST(min(t.doc_id) AS BIGINT) AS top_doc
      FROM tf t JOIN stats s ON t.term = s.term AND t.tf = s.max_tf
      GROUP BY t.term
    )
    SELECT s.term, s.df, s.total_tf, s.max_tf, top.top_doc
    FROM stats s JOIN top ON s.term = top.term
    ORDER BY s.df DESC, s.term ASC
    LIMIT {TOP_N}
"""


@query("q145_inverted_index", oracle=_Q145_ORACLE)
def q145_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index posting stats: per term, document frequency,
    total/max term frequency, and the argmax posting (min doc_id on
    tf ties); head = top-25 terms by df (module docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id",
        F.explode(F.split("text", " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = tokens.groupBy("term", "doc_id").agg(
        F.count("*").alias("tf")
    )
    # argmax posting via max(struct(tf, -doc_id)): map-side combinable,
    # ties on tf resolve to the SMALLEST doc_id (negation flips min to
    # max inside the struct order), matching the oracle's FILTER+min.
    stats = tf.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("total_tf"),
        F.max("tf").alias("max_tf"),
        (-F.max(F.struct(F.col("tf"), (-F.col("doc_id")).alias("nd"))).getField("nd")).alias("top_doc"),
    )
    return stats.orderBy(F.col("df").desc(), F.col("term").asc()).limit(TOP_N)
