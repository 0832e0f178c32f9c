"""Ranked retrieval and language-model scoring over the documents
table — the two text-pipeline operators a training-data curation stack
reaches for after TF-IDF (q109): Okapi BM25 search and bigram-LM
perplexity filtering (KenLM-style quality scoring).

Beyond the reference (its corpus search is the XML engines' own
full-text functions); first-class here like the rest of the
LLM-pipeline suite.

Determinism contract (cross-engine): every transcendental is quantized
to micro-ints PER TERM / PER BIGRAM first — floor(x·1e6 + 0.5) of a
closed-form DOUBLE expression both engines compute from exact integer
counts — and only the exact BIGINT sums aggregate across terms, so
float summation ORDER can never flake the comparison (the q109
tie-stability idiom, hardened: q109 quantizes after one product; here
sums of several libm values would be order-sensitive as DOUBLEs).

Scale shape (100 TB):

- q170 BM25: the word explode feeds ONE partial-aggregated groupBy per
  statistic; term frequencies are filtered to the query's terms BEFORE
  the aggregation (corpus-cardinality rows never carry non-query
  words); document lengths are a map-only size(split()); df and N are
  query-terms-sized / 1-row broadcasts. The per-doc score join is
  docs×|Q| rows against two broadcast sides; top-k is a
  TakeOrderedAndProject, never a full sort.
- q171 bigram LM: bigram counts and context counts are vocab²- /
  vocab-bounded after map-side combine; the per-occurrence model join
  keys on the bigram (shuffle join — at web scale a BPE vocab² model
  outgrows broadcast; AQE picks broadcast when it fits, as it does
  here); the final per-doc aggregation sums exact micro-ints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# Okapi BM25 constants (Robertson et al.; the Lucene/ES defaults)
_K1, _B = 1.2, 0.75
_QUERY_TERMS = ["spark", "join", "filter"]
_TERMS_SQL = "('spark', 'join', 'filter')"

_Q170_ORACLE = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
dl AS (
  SELECT doc_id, CAST(length(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         avg(CAST(length(string_split(text, ' ')) AS DOUBLE)) AS avgdl
  FROM documents
),
tf AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
  FROM words WHERE word IN {_TERMS_SQL} GROUP BY doc_id, word
),
df AS (
  SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM words WHERE word IN {_TERMS_SQL} GROUP BY word
),
term_scores AS (
  SELECT tf.doc_id,
         CAST(floor(
           ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
           * (tf * ({_K1} + 1.0))
           / (tf + {_K1} * (1.0 - {_B} + {_B} * dl / avgdl))
           * 1000000 + 0.5) AS BIGINT) AS s_micro
  FROM tf JOIN df USING (word) JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
)
SELECT doc_id, CAST(sum(s_micro) AS BIGINT) AS score_micro
FROM term_scores GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT 10
"""


@query("q170_bm25_search", oracle=_Q170_ORACLE)
def q170_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 retrieval for a fixed 3-term query
    (k1 = 1.2, b = 0.75, the Robertson +1 IDF): per-term scores
    micro-quantized then exactly summed (module docstring), ties broken
    by doc_id."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word").isin(_QUERY_TERMS))
    tf = words.groupBy("doc_id", "word").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    df = words.groupBy("word").agg(
        F.count_distinct("doc_id").cast("bigint").alias("df")
    )
    dl = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("dl")
    )
    stats = d.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.avg(F.size(F.split("text", " ")).cast("double")).alias("avgdl"),
    )
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df") + 0.5)
        / (F.col("df") + 0.5)
        + 1.0
    )
    denom = F.col("tf") + _K1 * (
        1.0 - _B + _B * F.col("dl") / F.col("avgdl")
    )
    term_scores = (
        tf.join(F.broadcast(df), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(
                idf * (F.col("tf") * (_K1 + 1.0)) / denom * 1000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("s_micro"),
        )
    )
    return (
        term_scores.groupBy("doc_id")
        .agg(F.sum("s_micro").cast("bigint").alias("score_micro"))
        .orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
        .limit(10)
    )


_Q171_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
bigrams AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1, CAST(length(w) AS BIGINT) - 1)) AS i
  )
  WHERE length(w) >= 2
),
bc AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bigrams GROUP BY w1, w2
),
cc AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bigrams GROUP BY w1
),
vocab AS (
  SELECT CAST(count(DISTINCT word) AS BIGINT) AS v
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
),
scored AS (
  SELECT doc_id,
         CAST(floor(-ln((CAST(c12 AS DOUBLE) + 1.0) / (c1 + v))
              * 1000000 + 0.5) AS BIGINT) AS nll_micro
  FROM bigrams JOIN bc USING (w1, w2) JOIN cc USING (w1) CROSS JOIN vocab
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(nll_micro) AS BIGINT) AS nll_sum_micro
FROM scored GROUP BY doc_id
"""


@query("q171_bigram_perplexity", oracle=_Q171_ORACLE)
def q171_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring (KenLM-style quality filter):
    add-one-smoothed corpus bigram model P(w2|w1) = (C(w1,w2)+1)/
    (C(w1)+V), every document scored by the exact sum of its bigrams'
    micro-quantized negative log-probs (module docstring)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("w"))
    bigrams = (
        toks.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.posexplode(F.slice("w", 1, F.size("w") - 1)).alias("i", "w1"),
            F.col("w").alias("w"),
        )
        .select(
            "doc_id", "w1", F.element_at("w", F.col("i") + 2).alias("w2")
        )
    )
    bc = bigrams.groupBy("w1", "w2").agg(
        F.count("*").cast("bigint").alias("c12")
    )
    cc = bigrams.groupBy("w1").agg(F.count("*").cast("bigint").alias("c1"))
    vocab = d.select(
        F.explode(F.split("text", " ")).alias("word")
    ).agg(F.count_distinct("word").cast("bigint").alias("v"))
    scored = (
        bigrams.join(bc, ["w1", "w2"])
        .join(cc, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.floor(
                -F.log(
                    (F.col("c12").cast("double") + 1.0)
                    / (F.col("c1") + F.col("v"))
                )
                * 1000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("nll_micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.sum("nll_micro").cast("bigint").alias("nll_sum_micro"),
    )
