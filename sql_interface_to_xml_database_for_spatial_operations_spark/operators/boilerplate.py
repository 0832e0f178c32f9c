"""Corpus-level boilerplate removal: cross-document repeated-chunk
detection and excision — the pretraining cleanup step between exact
dedup (whole-document, dedup.py) and near-dedup (shingle-level): nav
bars, cookie banners, and footers repeat across a site's pages while
the page bodies differ, so whole-document hashing never catches them.

Pipeline shape (the published CCNet/RefinedWeb-style paragraph-dedup
recipe, re-expressed in DataFrame ops):

1. block-chunk every document into non-overlapping W-token blocks
   (in-row ``sequence``/``slice`` — map-only JVM, like q125's sliding
   windows but stride = W so removal is well-defined);
2. hash each block and count DISTINCT documents per hash — one
   shuffle, map-side partial aggregation, key space bounded by the
   distinct-block count;
3. blocks seen in ≥ MIN_DF documents are boilerplate; the survivors
   reassemble per document in block order.

The boilerplate fixture is synthesized onto the corpus from the
``source`` column (two 12-token header blocks per source — same
injection idiom as text_extract._raw_with_pii: both engines build the
identical raw string, so what is under test is the detection/removal
machinery, not the injection). Natural exact-duplicate documents share
all their blocks too, but at document-duplication counts (2-3) far
below MIN_DF=8, so the flagged set is exactly the injected headers at
every SF (≥25 docs per source in all test fixtures).

100 TB: step 2's shuffle carries (hash, doc_id) pairs — never block
text; the boilerplate set is tiny by construction (df ≥ MIN_DF caps
its cardinality at n_blocks/MIN_DF) so step 3's flag join broadcasts.
The per-document regroup in step 3 shuffles (pos, block-hash, flag)
triples only — block TEXT never crosses the wire: ``cleaned_hash`` is
the hash of the kept blocks' hashes in block order (a deterministic
fingerprint of the cleaned document; a pipeline materializing cleaned
text would instead join the tiny flagged-position lists back to the
corpus and re-slice in-row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

BP_W = 12  # block width in tokens
MIN_DF = 8  # blocks in >= this many docs are boilerplate

# Two 12-token per-source header blocks (nav bar + footer line).
_HDR1 = "portal {s} home about contact login search help subscribe newsletter social share"
_HDR2 = "copyright {s} all rights reserved terms privacy cookies sitemap feedback support press"


def _raw_with_boilerplate(d: DataFrame) -> DataFrame:
    # F.concat, NOT concat_ws: the oracle's `||` propagates NULL (a
    # NULL text/source row vanishes from both sides identically),
    # whereas concat_ws would silently skip the NULL and diverge —
    # same idiom as text_extract._raw_with_pii (code-review r7).
    def hdr(tmpl: str):
        parts = []
        for w in tmpl.split(" "):
            if parts:
                parts.append(F.lit(" "))
            parts.append(F.col("source") if w == "{s}" else F.lit(w))
        return F.concat(*parts)

    return d.select(
        "doc_id",
        F.concat(hdr(_HDR1), F.lit(" "), hdr(_HDR2), F.lit(" "), F.col("text")).alias(
            "raw"
        ),
    )


def _hdr_sql(tmpl: str) -> str:
    return " || ' ' || ".join(
        "source" if w == "{s}" else f"'{w}'" for w in tmpl.split(" ")
    )


_RAW_SQL = f"""
    SELECT doc_id,
           {_hdr_sql(_HDR1)} || ' ' || {_hdr_sql(_HDR2)} || ' ' || text AS raw
    FROM documents
"""

_Q141_ORACLE = f"""
    WITH raw AS ({_RAW_SQL}),
    t AS (SELECT doc_id, string_split(raw, ' ') AS toks FROM raw),
    c AS (SELECT doc_id, toks, CAST(ceil(len(toks) / {BP_W}.0) AS INT) AS nb FROM t),
    e AS (SELECT doc_id, toks, unnest(generate_series(0, nb - 1)) AS pos FROM c),
    ch AS (
      SELECT doc_id, pos,
             array_to_string(list_slice(toks, pos * {BP_W} + 1,
                                        pos * {BP_W} + {BP_W}), ' ') AS chunk
      FROM e
    ),
    viral AS (
      SELECT md5(chunk) AS h FROM ch
      GROUP BY 1 HAVING count(DISTINCT doc_id) >= {MIN_DF}
    ),
    fl AS (
      SELECT doc_id, pos, md5(chunk) AS h,
             md5(chunk) IN (SELECT h FROM viral) AS is_bp
      FROM ch
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
           md5(string_agg(CASE WHEN NOT is_bp THEN h END, '' ORDER BY pos))
             AS cleaned_hash
    FROM fl GROUP BY doc_id
"""


@query("q141_boilerplate_removal", oracle=_Q141_ORACLE)
def q141_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-block removal (see module docstring).
    cleaned_hash = md5 over the kept blocks' md5 hex digests in block
    order; NULL iff every block was boilerplate (no such doc in the
    fixture — bodies are unique — but both engines agree on the
    convention)."""
    d = load_table(spark, sf_dir, "documents")
    raw = _raw_with_boilerplate(d)
    toks = F.split("raw", " ")
    nb = F.ceil(F.size("toks") / F.lit(float(BP_W))).cast("int")
    chunk = F.array_join(F.slice("toks", F.col("pos") * BP_W + 1, BP_W), " ")
    blocks = (
        raw.select("doc_id", toks.alias("toks"))
        .select("doc_id", "toks", F.explode(F.sequence(F.lit(0), nb - 1)).alias("pos"))
        .select("doc_id", "pos", F.md5(chunk).alias("h"))
    )
    viral = (
        blocks.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= MIN_DF)
        .select("h")
    )
    flagged = blocks.join(
        F.broadcast(viral.withColumn("is_bp", F.lit(True))), "h", "left"
    ).select("doc_id", "pos", "h", F.coalesce("is_bp", F.lit(False)).alias("is_bp"))
    kept = F.array_sort(
        F.collect_list(F.when(~F.col("is_bp"), F.struct("pos", "h")))
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.col("is_bp").cast("bigint")).alias("n_boilerplate"),
        F.when(
            F.size(kept) > 0,
            F.md5(F.array_join(F.transform(kept, lambda s: s["h"]), "")),
        ).alias("cleaned_hash"),
    )
