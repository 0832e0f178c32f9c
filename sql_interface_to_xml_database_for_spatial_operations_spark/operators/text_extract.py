"""Training-data text extraction stages: chunking, PII redaction, URLs.

Three pipeline stages every large-scale corpus build runs between raw
ingest and training (complementing text_ops.py's scoring/dedup family):

- **q125 document chunking**: sliding token windows (W=24, stride=16)
  — the context-window packing precursor. Pure JVM expressions:
  ``split`` → ``sequence``/``explode`` for the window index →
  ``slice``/``array_join`` per chunk. Map-only (no shuffle): each doc
  expands to its chunks in place, so the operator scales with input
  rows regardless of document length skew.
- **q126 PII redaction**: e-mail / US-phone / IPv4 detection counts and
  a redacted text hash, all via JVM ``regexp_count`` /
  ``regexp_replace``. The PII strings are synthesized onto the fixture
  text from ``doc_id`` arithmetic (both engines build the identical raw
  string, so what is under test is the extraction/replacement regexes,
  not the injection). Patterns stay in the RE2 ∩ java.util.regex
  common dialect (no backrefs, no lookaround) so the DuckDB oracle runs
  the very same pattern strings.
- **q127 URL domain stats**: extract every URL, group by domain —
  ``regexp_extract_all`` → ``explode`` → ``groupBy(domain)``. The one
  shuffle is by domain (bounded key space); counts are map-side
  partially aggregated.

New module rather than text_ops.py additions: staleness fingerprints
are module-granular (staleness.py), and text_ops carries six
driver-verified queries whose fingerprints would otherwise churn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

CHUNK_W = 24
CHUNK_S = 16

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\(\d{3}\) \d{3}-\d{4}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
URL_RE = r"https?://[A-Za-z0-9.-]+(?:/[A-Za-z0-9./_-]*)?"
DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"


def _raw_with_pii(d: DataFrame) -> DataFrame:
    """Deterministically embed PII + URLs into the document text (same
    arithmetic as the oracle's SQL; see module docstring)."""
    k = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    email = F.concat(F.lit("user"), s(k), F.lit("@mail"), s(k % 5), F.lit(".example.org"))
    phone = F.concat(
        F.lit("(555) "),
        F.lpad(s((k * 7) % 1000), 3, "0"),
        F.lit("-"),
        F.lpad(s((k * 13) % 10000), 4, "0"),
    )
    ip = F.concat(
        F.lit("10."), s(k % 256), F.lit("."), s((k * 3) % 256), F.lit("."), s((k * 7) % 256)
    )
    url1 = F.concat(F.lit("https://www.site"), s(k % 7), F.lit(".example.com/page/"), s(k))
    url2 = F.when(
        k % 2 == 1, F.concat(F.lit(" http://cdn.example.net/asset_"), s(k))
    ).otherwise(F.lit(""))
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact "), email,
            F.lit(" call "), phone,
            F.lit(" from "), ip,
            F.lit(" see "), url1,
            url2,
        ).alias("raw"),
    )


_RAW_SQL = """
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@mail' || CAST(doc_id % 5 AS VARCHAR) || '.example.org'
                || ' call (555) ' || lpad(CAST((doc_id * 7) % 1000 AS VARCHAR), 3, '0')
                || '-' || lpad(CAST((doc_id * 13) % 10000 AS VARCHAR), 4, '0')
                || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                || '.' || CAST((doc_id * 3) % 256 AS VARCHAR)
                || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                || ' see https://www.site' || CAST(doc_id % 7 AS VARCHAR)
                || '.example.com/page/' || CAST(doc_id AS VARCHAR)
                || CASE WHEN doc_id % 2 = 1
                        THEN ' http://cdn.example.net/asset_' || CAST(doc_id AS VARCHAR)
                        ELSE '' END AS raw
    FROM documents
"""


@query(
    "q125_document_chunking",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    c AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) <= {CHUNK_W} THEN 1
                  ELSE CAST(ceil((len(toks) - {CHUNK_W}) / {CHUNK_S}.0) AS INT) + 1
             END AS nc
      FROM t
    ),
    e AS (
      SELECT doc_id, toks, unnest(generate_series(0, nc - 1)) AS chunk_idx FROM c
    )
    SELECT doc_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(toks, chunk_idx * {CHUNK_S} + 1,
                               chunk_idx * {CHUNK_S} + {CHUNK_W})) AS BIGINT)
             AS n_chunk_tokens,
           md5(array_to_string(list_slice(toks, chunk_idx * {CHUNK_S} + 1,
                                          chunk_idx * {CHUNK_S} + {CHUNK_W}), ' '))
             AS chunk_hash
    FROM e
    """,
)
def q125_document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking (W=24, stride=16): every doc emits
    ceil((n-W)/S)+1 overlapping chunks covering all tokens. Map-only JVM
    plan — no UDFs, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size("toks")
    n_chunks = (
        F.when(n <= CHUNK_W, F.lit(1))
        .otherwise(F.ceil((n - F.lit(CHUNK_W)) / F.lit(float(CHUNK_S))) + 1)
        .cast("int")
    )
    chunk = F.slice("toks", F.col("chunk_idx") * CHUNK_S + 1, CHUNK_W)
    return (
        d.select("doc_id", toks.alias("toks"))
        .select("doc_id", "toks", F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
        )
    )


@query(
    "q126_pii_redaction",
    oracle=f"""
    WITH raw AS ({_RAW_SQL})
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '{EMAIL_RE}', 0)) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(raw, '{PHONE_RE}', 0)) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(raw, '{IP_RE}', 0)) AS BIGINT) AS n_ips,
           md5(regexp_replace(regexp_replace(regexp_replace(
               raw, '{EMAIL_RE}', '[EMAIL]', 'g'), '{PHONE_RE}', '[PHONE]', 'g'),
               '{IP_RE}', '[IP]', 'g')) AS redacted_hash
    FROM raw
    """,
)
def q126_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count and redact e-mails, US phones, IPv4s. All
    JVM regex (regexp_count / regexp_replace) — map-only, no Python."""
    d = load_table(spark, sf_dir, "documents")
    raw = _raw_with_pii(d)
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
        ),
        IP_RE,
        "[IP]",
    )
    return raw.select(
        "doc_id",
        F.regexp_count("raw", F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count("raw", F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
        F.regexp_count("raw", F.lit(IP_RE)).cast("bigint").alias("n_ips"),
        F.md5(red).alias("redacted_hash"),
    )


@query(
    "q127_url_domains",
    oracle=f"""
    WITH raw AS ({_RAW_SQL}),
    urls AS (
      SELECT doc_id, unnest(regexp_extract_all(raw, '{URL_RE}', 0)) AS url FROM raw
    )
    SELECT regexp_extract(url, '{DOMAIN_RE}', 1) AS domain,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM urls GROUP BY 1
    """,
)
def q127_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL extraction + per-domain stats: regexp_extract_all → explode →
    groupBy(domain). Single bounded-key shuffle with map-side partial
    counts; count(DISTINCT doc_id) expands to the standard two-phase
    distinct aggregate."""
    d = load_table(spark, sf_dir, "documents")
    raw = _raw_with_pii(d)
    urls = raw.select(
        "doc_id", F.explode(F.expr(f"regexp_extract_all(raw, '{URL_RE}', 0)")).alias("url")
    )
    return (
        urls.select("doc_id", F.regexp_extract("url", DOMAIN_RE, 1).alias("domain"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )
