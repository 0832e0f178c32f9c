"""Exact-substring deduplication (r15): the span-removal dedup of
Lee et al. 2021, *Deduplicating Training Data Makes Language Models
Better* (the ExactSubstr tool) — remove every token span that occurs
verbatim elsewhere in the corpus, keeping the rest of the document.
Distinct from the doc-level families (q64 exact hash, q65 Jaccard,
q66 MinHash-LSH): those drop whole documents; this surgically cuts
repeated passages (licenses, boilerplate, quoted headers) out of
otherwise-unique documents.

Map-reduce shape (the published suffix-array approach re-expressed as
the k-token rolling-window equivalent Spark can execute):

1. tokenize each document (whitespace);
2. emit every k-token window with its position — a flat explode, one
   row per (doc, pos), all JVM-side higher-order functions;
3. ONE shuffle: group windows globally, keep those occurring ≥ 2
   times (the duplicated-substring set);
4. join positions back, collect each document's duplicated-window
   start set (second, doc-keyed shuffle);
5. map-side span merge: token j is removed iff some duplicated
   window [p, p+k-1] covers it — an ``exists`` lambda over the
   per-doc start set, no Python in the loop.

At 100 TB: stage 3 shuffles hashes, not strings — pass
``hash_windows=True`` to exchange xxhash64(window) (8 bytes/row, the
paper's fingerprint variant; collisions over-remove at ~2⁻⁶⁴, the
documented trade). The driver row keeps the string form so the DuckDB
oracle can reproduce it verbatim. Window length k = 50 tokens in the
paper; the row uses k = 8 against the ~54-token synthetic documents.

Returns one row per input document: ``doc_id, n_tokens,
n_dup_windows, n_removed, cleaned``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query


def exact_substring_dedup(
    docs: DataFrame,
    k: int = 50,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_windows: bool = False,
) -> DataFrame:
    """Span-removal dedup over ``docs`` (module docstring). The
    returned plan has exactly two shuffles: the global window
    group-by and the doc-keyed position collect."""
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("t")
    )
    win_expr = (
        f"explode(transform(sequence(1, size(t) - {k} + 1), "
        f"i -> struct(i AS i, array_join(slice(t, i, {k}), ' ') AS w)))"
    )
    win = (
        base.filter(F.size("t") >= k)
        .select("doc_id", F.expr(win_expr).alias("x"))
        .select("doc_id", F.col("x.i").alias("i"), F.col("x.w").alias("w"))
    )
    if hash_windows:
        win = win.withColumn("w", F.xxhash64("w"))
    dupw = (
        win.groupBy("w")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_count)
        .select("w")
    )
    dups = (
        win.join(dupw, "w")
        .groupBy("doc_id")
        .agg(
            F.collect_set("i").alias("dups"),
            F.count("*").alias("n_dup_windows"),
        )
    )
    kept_expr = (
        f"filter(sequence(1, size(t)), "
        f"j -> NOT exists(dups, p -> p <= j AND j <= p + {k} - 1))"
    )
    return (
        base.join(dups, "doc_id", "left")
        .withColumn("dups", F.coalesce("dups", F.expr("CAST(array() AS array<int>)")))
        .withColumn("kept", F.expr(kept_expr))
        .select(
            "doc_id",
            F.size("t").cast("bigint").alias("n_tokens"),
            F.coalesce("n_dup_windows", F.lit(0)).cast("bigint").alias("n_dup_windows"),
            (F.size("t") - F.size("kept")).cast("bigint").alias("n_removed"),
            F.expr("array_join(transform(kept, j -> element_at(t, j)), ' ')").alias(
                "cleaned"
            ),
        )
    )


_K = 8

_Q179_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    win AS (
      SELECT doc_id, i, array_to_string(t[i : i + {_K - 1}], ' ') AS w
      FROM toks, unnest(range(1, len(t) - {_K} + 2)) AS r(i)
      WHERE len(t) >= {_K}
    ),
    dupw AS (
      SELECT w FROM win GROUP BY w HAVING count(*) > 1
    ),
    dpos AS (
      SELECT win.doc_id, win.i FROM win JOIN dupw USING (w)
    ),
    covd AS (
      SELECT DISTINCT doc_id, j
      FROM dpos, unnest(range(i, i + {_K})) AS rr(j)
    ),
    tokpos AS (
      SELECT doc_id, j, t[j] AS tok
      FROM toks, unnest(range(1, len(t) + 1)) AS r2(j)
    ),
    kept AS (
      SELECT tokpos.doc_id, tokpos.j, tokpos.tok
      FROM tokpos LEFT JOIN covd
        ON tokpos.doc_id = covd.doc_id AND tokpos.j = covd.j
      WHERE covd.j IS NULL
    ),
    keptagg AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(tok, ' ' ORDER BY j) AS cleaned
      FROM kept GROUP BY doc_id
    ),
    ndup AS (SELECT doc_id, count(*) AS n_dup FROM dpos GROUP BY doc_id)
    SELECT toks.doc_id,
           CAST(len(toks.t) AS BIGINT) AS n_tokens,
           CAST(coalesce(ndup.n_dup, 0) AS BIGINT) AS n_dup_windows,
           CAST(len(toks.t) - coalesce(keptagg.n_kept, 0) AS BIGINT) AS n_removed,
           coalesce(keptagg.cleaned, '') AS cleaned
    FROM toks
    LEFT JOIN ndup USING (doc_id)
    LEFT JOIN keptagg USING (doc_id)
"""


@query("q179_substring_dedup", oracle=_Q179_ORACLE)
def q179_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring (span-removal) dedup, Lee et al. 2021 shape:
    k = 8 token windows, global ≥2-occurrence set, per-doc span-merge
    removal — one row per document with the cleaned text."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return exact_substring_dedup(docs, k=_K)
