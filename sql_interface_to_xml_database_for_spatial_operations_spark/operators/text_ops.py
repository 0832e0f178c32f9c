"""Text-analysis operators over the ``documents`` table.

Beyond-reference surface (BASELINE.json north star): the text half of a
large-scale training-data pipeline — token counting, quality scoring,
language ID, document fingerprinting. Everything is expressed in built-in
JVM functions (split/explode/regexp/md5/aggregations) — no Python UDFs in
any hot path — so whole-stage codegen covers the entire plan and the only
shuffles are the final aggregations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


@query(
    "q60_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_re_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def q60_token_count(spark, sf_dir):
    """Token counting: whitespace tokens + a BPE-ish regex tokenizer
    ([a-z]+|[0-9]+ word pieces), all JVM-side."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda x: x != "")).cast("bigint").alias("n_ws_tokens"),
        F.regexp_count("text", F.lit("[a-z]+|[0-9]+")).cast("bigint").alias("n_re_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


@query(
    "q61_quality_score",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_words,
             CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS BIGINT) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars, n_words,
           CAST(floor(CAST(n_chars - n_words + 1 AS DOUBLE) / n_words * 1000000 + 0.5)
                AS BIGINT) AS avg_word_len_micro,
           CAST(floor(CAST(n_stop AS DOUBLE) / n_words * 1000000 + 0.5)
                AS BIGINT) AS stopword_ratio_micro,
           CASE WHEN n_words >= 30 AND CAST(n_stop AS DOUBLE) / n_words BETWEEN 0.02 AND 0.5
                THEN 'keep' ELSE 'drop' END AS quality_bucket
    FROM t
    """,
)
def q61_quality_score(spark, sf_dir):
    """Quality scoring: length/stopword heuristics → keep/drop bucket
    (the usual pre-training corpus filter shape)."""
    d = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda x: x != "")
    t = d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(words).cast("bigint").alias("n_words"),
        F.size(F.filter(F.split("text", " "), lambda x: x.isin("the", "a"))).cast("bigint").alias("n_stop"),
    )
    swr = F.col("n_stop").cast("double") / F.col("n_words")
    return t.select(
        "doc_id",
        "n_chars",
        "n_words",
        # micro-int, not round(x, 6): both ratios are integer ratios and
        # can tie exactly at the 6th decimal (VERDICT r6 / q113 class)
        F.floor((F.col("n_chars") - F.col("n_words") + 1).cast("double") / F.col("n_words") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("avg_word_len_micro"),
        F.floor(swr * 1000000 + F.lit(0.5)).cast("bigint").alias("stopword_ratio_micro"),
        F.when((F.col("n_words") >= 30) & swr.between(0.02, 0.5), "keep")
        .otherwise("drop")
        .alias("quality_bucket"),
    )


LEXICON = [
    ("en", "the"), ("en", "a"), ("en", "fast"), ("en", "slow"),
    ("de", "table"), ("de", "scan"), ("de", "row"),
    ("es", "data"), ("es", "query"), ("es", "value"),
    ("fr", "join"), ("fr", "merge"), ("fr", "sort"),
    ("zh", "batch"), ("zh", "stream"), ("zh", "window"),
]

_LEXICON_SQL = "VALUES " + ", ".join(f"('{lang}', '{w}')" for lang, w in LEXICON)


@query(
    "q62_language_id",
    oracle=f"""
    WITH lex(lang, word) AS ({_LEXICON_SQL}),
    hits AS (
      SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS score
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) w
      JOIN lex USING (word)
      GROUP BY doc_id, lang
    ),
    ranked AS (
      SELECT doc_id, lang, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
      FROM hits
    )
    SELECT doc_id, lang AS pred_lang, score FROM ranked WHERE rn = 1
    """,
)
def q62_language_id(spark, sf_dir):
    """Language ID via stopword-lexicon scoring, computed entirely
    IN-ROW: the lexicon is a small constant, so each language's
    occurrence count is size(filter(words, w ∈ lex_lang)) and the argmax
    (score DESC, lang ASC — the oracle's tie-break) is a comparator
    array_sort over the 5-element (score, lang) array. Zero shuffles —
    the explode + broadcast-join + groupBy + window formulation carried
    two shuffles for what is a per-document function. The lexicon is
    synthetic (the fixture corpus is an English word-salad) but the
    operator shape is the real n-gram/stopword classifier."""
    d = load_table(spark, sf_dir, "documents")
    by_lang: dict[str, list[str]] = {}
    for lang, w in LEXICON:
        by_lang.setdefault(lang, []).append(w)
    words = F.split("text", " ")
    entries = [
        F.struct(
            F.size(F.filter(words, lambda x: x.isin(*ws))).cast("bigint").alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in sorted(by_lang.items())
    ]
    cmp = lambda l, r: (  # noqa: E731 — score DESC, lang ASC
        F.when(l["score"] > r["score"], -1)
        .when(l["score"] < r["score"], 1)
        .when(l["lang"] < r["lang"], -1)
        .when(l["lang"] > r["lang"], 1)
        .otherwise(0)
    )
    best = F.array_sort(F.array(*entries), cmp)[0]
    return (
        d.select("doc_id", best.alias("best"))
        .filter(F.col("best.score") >= 1)  # oracle's inner join drops no-hit docs
        .select(
            "doc_id",
            F.col("best.lang").alias("pred_lang"),
            F.col("best.score").alias("score"),
        )
    )


@query(
    "q63_fingerprint",
    oracle="""
    WITH grams AS (
      SELECT doc_id, md5(substr(text, p, 4)) AS h
      FROM documents, LATERAL (SELECT unnest(generate_series(1, CAST(length(text) AS BIGINT) - 3)) AS p)
      WHERE length(text) >= 4
    )
    SELECT doc_id, min(h) AS fp_min, CAST(count(DISTINCT h) AS BIGINT) AS n_grams
    FROM grams GROUP BY doc_id
    """,
)
def q63_fingerprint(spark, sf_dir):
    """Document fingerprinting: rolling char-4-gram hashes, min-hash
    fingerprint + distinct-gram cardinality (winnowing-lite). Both stats
    are per-document functions of the gram array, so they compute IN-ROW
    (transform → array_min / array_distinct): no explode, no groupBy —
    the whole query is a single map-side projection with zero shuffles
    (the explode+groupBy formulation shuffled every gram hash by
    doc_id). Memory is one gram array per row, transient — the same
    volume the shuffle would have carried, minus the network."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 4)
    grams = F.transform(
        F.sequence(F.lit(1), F.length("text") - 3),
        lambda p: F.md5(F.col("text").substr(p, F.lit(4))),
    )
    return d.select("doc_id", grams.alias("g")).select(
        "doc_id",
        F.array_min("g").alias("fp_min"),
        F.size(F.array_distinct("g")).cast("bigint").alias("n_grams"),
    )


@query(
    "q109_tfidf_top_terms",
    oracle="""
    WITH words AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    tf AS (
      SELECT lang, word, CAST(count(*) AS BIGINT) AS tf
      FROM words WHERE word <> '' GROUP BY lang, word
    ),
    df AS (
      SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM words WHERE word <> '' GROUP BY word
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT lang, word, tf, df,
             CAST(floor(tf * ln(CAST(n_docs AS DOUBLE) / df) * 1000000 + 0.5)
                  AS BIGINT) AS tfidf_micro
      FROM tf JOIN df USING (word) CROSS JOIN n
    ),
    ranked AS (
      SELECT lang, word, tf, df, tfidf_micro,
             row_number() OVER (PARTITION BY lang ORDER BY tfidf_micro DESC, word ASC) AS rn
      FROM scored
    )
    SELECT lang, word, tf, df, tfidf_micro FROM ranked WHERE rn <= 5
    """,
)
def q109_tfidf_top_terms(spark, sf_dir):
    """TF-IDF keyword extraction: top-5 terms per language partition by
    tf·ln(N/df). Scale shape: the explode feeds two PARTIAL-aggregated
    groupBys whose outputs are vocabulary-sized (≪ corpus — map-side
    combine collapses each partition to its distinct words first), the
    tf⋈df join is vocab×vocab on the word key (plain shuffle join — at
    web scale the vocabulary is too big to broadcast), the doc count N
    is a 1-row broadcast, and the final window ranks the vocab-sized
    result only. No stage carries corpus-cardinality rows past the
    first aggregation."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("word")).filter(
        F.col("word") != ""
    )
    tf = words.groupBy("lang", "word").agg(F.count("*").cast("bigint").alias("tf"))
    df = words.groupBy("word").agg(F.count_distinct("doc_id").cast("bigint").alias("df"))
    n = d.agg(F.count("*").cast("bigint").alias("n_docs"))
    scored = (
        tf.join(df, "word")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "word",
            "tf",
            "df",
            # micro-int, not round(x, 6) — tie-stability (VERDICT r6)
            F.floor(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")) * 1000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("tfidf_micro"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.col("tfidf_micro").desc(), F.col("word").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "word", "tf", "df", "tfidf_micro")
    )


@query(
    "q110_repetition_metrics",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS words
      FROM documents
    ),
    m AS (
      SELECT doc_id, words,
             CAST(len(words) AS BIGINT) AS n_words,
             CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct,
             CAST(list_aggregate(
                 list_transform(list_distinct(words),
                                w -> len(list_filter(words, x -> x = w))),
                 'max') AS BIGINT) AS top_word_count,
             CAST(len(list_distinct(
                 list_transform(generate_series(1, len(words) - 1),
                                i -> words[i] || ' ' || words[i + 1])
             )) AS BIGINT) AS n_distinct_2grams
      FROM t WHERE len(words) >= 2
    )
    SELECT doc_id, n_words, n_distinct,
           CAST(floor(CAST(n_distinct AS DOUBLE) / n_words * 1000000 + 0.5)
                AS BIGINT) AS distinct_ratio_micro,
           CAST(floor(CAST(top_word_count AS DOUBLE) / n_words * 1000000 + 0.5)
                AS BIGINT) AS top_word_frac_micro,
           CAST(floor((1.0 - CAST(n_distinct_2grams AS DOUBLE) / (n_words - 1)) * 1000000 + 0.5)
                AS BIGINT) AS dup_2gram_frac_micro,
           CASE WHEN CAST(n_distinct AS DOUBLE) / n_words >= 0.4
                 AND CAST(top_word_count AS DOUBLE) / n_words <= 0.12
                THEN 'keep' ELSE 'drop' END AS rep_bucket
    FROM m
    """,
)
def q110_repetition_metrics(spark, sf_dir):
    """Gopher-style repetition filters: distinct-word ratio, most-common-
    word fraction, duplicate-2-gram fraction → keep/drop bucket. Every
    statistic is a per-document function of the word array, so the whole
    query is a single zero-shuffle map-side projection (same in-row
    pattern as q62/q63). The top-word count is an in-row
    O(|distinct|·|words|) transform — bounded by document length, not
    corpus size, so it scales linearly with data volume."""
    d = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda x: x != "")
    t = d.select("doc_id", words.alias("words")).filter(F.size("words") >= 2)
    dw = F.array_distinct("words")
    grams = F.transform(
        F.sequence(F.lit(1), F.size("words") - 1),
        lambda i: F.concat(
            F.element_at("words", i), F.lit(" "), F.element_at("words", i + 1)
        ),
    )
    m = t.select(
        "doc_id",
        F.size("words").cast("bigint").alias("n_words"),
        F.size(dw).cast("bigint").alias("n_distinct"),
        F.array_max(
            F.transform(dw, lambda w: F.size(F.filter(F.col("words"), lambda x: x == w)))
        )
        .cast("bigint")
        .alias("top_word_count"),
        F.size(F.array_distinct(grams)).cast("bigint").alias("n_distinct_2grams"),
    )
    distinct_ratio = F.col("n_distinct").cast("double") / F.col("n_words")
    top_word_frac = F.col("top_word_count").cast("double") / F.col("n_words")
    return m.select(
        "doc_id",
        "n_words",
        "n_distinct",
        # micro-int, not round(x, 6): integer ratios tie at the 6th
        # decimal, where round() is engine-dependent (VERDICT r6 / q113)
        F.floor(distinct_ratio * 1000000 + F.lit(0.5)).cast("bigint").alias("distinct_ratio_micro"),
        F.floor(top_word_frac * 1000000 + F.lit(0.5)).cast("bigint").alias("top_word_frac_micro"),
        F.floor(
            (F.lit(1.0) - F.col("n_distinct_2grams").cast("double") / (F.col("n_words") - 1))
            * 1000000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("dup_2gram_frac_micro"),
        F.when((distinct_ratio >= 0.4) & (top_word_frac <= 0.12), "keep")
        .otherwise("drop")
        .alias("rep_bucket"),
    )


@query(
    "q88_levenshtein_neardup",
    oracle="""
    SELECT a.doc_id AS doc1, b.doc_id AS doc2,
           CAST(levenshtein(substr(a.text, 1, 30), substr(b.text, 1, 30)) AS BIGINT) AS edit_dist
    FROM documents a JOIN documents b
      ON a.lang = b.lang
     AND CAST(floor(length(a.text) / 20) AS BIGINT) = CAST(floor(length(b.text) / 20) AS BIGINT)
     AND a.doc_id < b.doc_id
    WHERE levenshtein(substr(a.text, 1, 30), substr(b.text, 1, 30)) <= 5
    """,
)
def q88_levenshtein_neardup(spark, sf_dir):
    """Edit-distance near-dup on document prefixes with (lang,
    length-bucket) blocking — levenshtein is O(len²) per pair, so the
    equi-join block keys do the candidate pruning (1350 candidate pairs
    from 500 docs at sf0.01, not 125k) and the quadratic work runs
    JVM-side only on candidates. Same blocking idea as the MinHash bands
    (q66), with an edit-distance metric instead of Jaccard."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.substring("text", 1, 30).alias("prefix"),
        F.floor(F.length("text") / 20).cast("bigint").alias("len_bucket"),
    )
    a = d.select(
        F.col("doc_id").alias("doc1"), "lang", "len_bucket", F.col("prefix").alias("pa")
    )
    b = d.select(
        F.col("doc_id").alias("doc2"),
        F.col("lang").alias("lang2"),
        F.col("len_bucket").alias("lb2"),
        F.col("prefix").alias("pb"),
    )
    dist = F.levenshtein("pa", "pb")
    return (
        a.join(
            b,
            (a.lang == b.lang2) & (a.len_bucket == b.lb2) & (a.doc1 < b.doc2),
        )
        .filter(dist <= 5)
        .select("doc1", "doc2", dist.cast("bigint").alias("edit_dist"))
    )
