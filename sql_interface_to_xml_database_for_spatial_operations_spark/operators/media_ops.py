"""Driver rows for the r6 multimodal remainder (VERDICT r6 item 1):
WAV audio feature extraction (q132), SRAS raster resize (q133), and —
beyond the remainder — perceptual-dHash image dedup (q136).

The implementations live in ``multimodal.py`` (real RIFF-chunk and SRAS
header parses, integer nearest-neighbor resampling); this module adds
the oracle-gated queries. Fixtures are the synthetic assets derived from
``documents`` (format parameters and pixel values are closed-form
functions of doc_id and the text bytes), so DuckDB recomputes every
expected value exactly — what is under test is the REAL byte path:
encode → binary payload → chunk/header walk → pixel index mapping.

Scale shape: both stages are mapInPandas over scan partitions —
shuffle-free, embarrassingly parallel; the oracle-side aggregation
exists only to compress pixels into a checkable sum.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query

# ---------------------------------------------------------------------------
# q132: WAV audio features (channels/rate/bits/samples from real headers)
# ---------------------------------------------------------------------------

# synthetic_audio derivation (multimodal.py): ch = id%2+1,
# rate = (8000,16000,44100)[id%3], bits = (8,16)[id%2], body = utf-8
# text truncated to whole blocks of ch*(bits/8) bytes. Even ids →
# block 1, odd ids → block 4.
_Q132_ORACLE = """
    WITH params AS (
      SELECT doc_id,
             doc_id % 2 + 1 AS ch,
             CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS rate,
             CASE doc_id % 2 WHEN 0 THEN 8 ELSE 16 END AS bits,
             CASE doc_id % 2 WHEN 0 THEN 1 ELSE 4 END AS block,
             octet_length(encode(text)) AS len
      FROM documents
    )
    SELECT doc_id AS asset_id,
           CAST(ch AS BIGINT) AS channels,
           CAST(rate AS BIGINT) AS sample_rate,
           CAST(bits AS BIGINT) AS bits,
           CAST(len // block AS BIGINT) AS n_samples,
           CAST((len // block) * 1000000 // rate AS BIGINT) AS duration_us
    FROM params
"""


@query("q132_audio_features", oracle=_Q132_ORACLE)
def q132_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio metadata extraction end to end: encode real PCM WAV bytes
    (RIFF/fmt /data chunks) from document text, then read
    channels/rate/bits back out of the binary header and derive the
    exact sample count and duration — the audio analog of q81's
    encode→bytes→decode round trip (multimodal.py:parse_wav_header)."""
    from .multimodal import extract_audio_features, synthetic_audio

    return extract_audio_features(synthetic_audio(spark, sf_dir))


# ---------------------------------------------------------------------------
# q133: SRAS raster resize (integer nearest-neighbor index mapping)
# ---------------------------------------------------------------------------

_OUT_W, _OUT_H = 8, 6

# synthetic_rasters derivation: w = id%16+4, h = (id*3)%16+4,
# pixel(r, c) = (id + 31r + 7c) % 256. The nearest kernel maps output
# (r, c) to source (min(r*h//out_h, h-1), min(c*w//out_w, w-1)) in pure
# integer arithmetic — recomputed below cell by cell.
_Q133_ORACLE = f"""
    WITH src AS (
      SELECT doc_id, doc_id % 16 + 4 AS w, (doc_id * 3) % 16 + 4 AS h
      FROM documents
    ),
    grid AS (
      SELECT doc_id,
             LEAST((r * h) // {_OUT_H}, h - 1) AS sy,
             LEAST((c * w) // {_OUT_W}, w - 1) AS sx
      FROM src,
           LATERAL unnest(generate_series(0, {_OUT_H} - 1)) AS tr(r),
           LATERAL unnest(generate_series(0, {_OUT_W} - 1)) AS tc(c)
    )
    SELECT doc_id AS asset_id,
           CAST({_OUT_W} AS BIGINT) AS out_w,
           CAST({_OUT_H} AS BIGINT) AS out_h,
           CAST({_OUT_W} * {_OUT_H} + 12 AS BIGINT) AS n_bytes,
           CAST(sum((doc_id + 31 * sy + 7 * sx) % 256) AS BIGINT) AS pix_sum
    FROM grid
    GROUP BY doc_id
"""


@query("q133_resize_images", oracle=_Q133_ORACLE)
def q133_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster resize end to end: encode real SRAS pixel bytes, resize
    every payload to {out_w}×{out_h} with the integer nearest-neighbor
    kernel, then decode the RESIZED payload and checksum its pixels —
    the oracle recomputes the full index mapping per output cell, so a
    mis-mapped row or column (the classic off-by-one at exact-multiple
    boundaries) changes pix_sum."""
    from .multimodal import decode_raster, resize_images, synthetic_rasters

    resized = resize_images(synthetic_rasters(spark, sf_dir), _OUT_W, _OUT_H)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, p, nb in zip(pdf["asset_id"], pdf["payload"], pdf["n_bytes"]):
                w, h, body = decode_raster(p)
                rows.append((int(aid), w, h, int(nb), sum(body)))
            yield pd.DataFrame(
                rows, columns=["asset_id", "out_w", "out_h", "n_bytes", "pix_sum"]
            )

    return resized.mapInPandas(
        stats,
        "asset_id long, out_w long, out_h long, n_bytes long, pix_sum long",
    )


# ---------------------------------------------------------------------------
# q136: image near-dup via dHash (difference hash) on REAL pixels
# ---------------------------------------------------------------------------

# dHash (public perceptual-hash recipe): resize to 9×8, then bit(r, c) =
# [p(r, c+1) > p(r, c)] for c in 0..7 — 64 bits, gradient-direction
# signature invariant to scale and global brightness shifts. The image
# analog of q64's exact text dedup: map-side hash, one groupBy on the
# hash. Both halves of the pipeline are shared with q133: the SAME
# integer nearest-neighbor resize produces the 9×8 thumbnail, so the
# oracle can recompute every pixel (and therefore every bit) exactly.
_DH_W, _DH_H = 9, 8

_Q136_ORACLE = f"""
    WITH src AS (
      SELECT doc_id, doc_id % 16 + 4 AS w, (doc_id * 3) % 16 + 4 AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, r, c,
             (doc_id + 31 * LEAST((r * h) // {_DH_H}, h - 1)
                     + 7 * LEAST((c * w) // {_DH_W}, w - 1)) % 256 AS p
      FROM src,
           LATERAL unnest(generate_series(0, {_DH_H} - 1)) AS tr(r),
           LATERAL unnest(generate_series(0, {_DH_W} - 1)) AS tc(c)
    ),
    bits AS (
      SELECT a.doc_id, a.r * 8 + a.c AS idx,
             CASE WHEN b.p > a.p THEN 1 ELSE 0 END AS bit
      FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
      WHERE a.c < 8
    ),
    hashes AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN idx >= 32 THEN bit << (idx - 32) ELSE 0 END) AS BIGINT) AS dhash_hi,
             CAST(sum(CASE WHEN idx < 32 THEN bit << idx ELSE 0 END) AS BIGINT) AS dhash_lo
      FROM bits GROUP BY doc_id
    )
    SELECT dhash_hi, dhash_lo,
           CAST(count(*) AS BIGINT) AS n_images,
           CAST(min(doc_id) AS BIGINT) AS rep_asset
    FROM hashes
    GROUP BY dhash_hi, dhash_lo
"""


@query("q136_image_dhash_neardup", oracle=_Q136_ORACLE)
def q136_image_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dedup by perceptual dHash over REAL pixel bytes: every SRAS
    raster is resized to 9×8 with the integer nearest-neighbor kernel
    (the q133 path), the 64 gradient bits are packed into two BIGINT
    halves, and images group by hash — map-side hashing plus ONE
    bounded-cardinality shuffle, the exact-dedup scale shape (q64) on
    the image modality. Hamming-banded near-dup pairing over these
    hashes is the q68 simhash recipe verbatim. The oracle recomputes
    resize mapping, pixels, bits and packing in closed form, so a
    mis-mapped pixel or bit order diverges."""
    import numpy as np

    from .multimodal import decode_raster, resize_images, synthetic_rasters

    thumbs = resize_images(synthetic_rasters(spark, sf_dir), _DH_W, _DH_H)

    def dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                w, h, body = decode_raster(p)
                img = np.frombuffer(body, dtype=np.uint8).reshape(h, w).astype(np.int32)
                bits = (img[:, 1:] > img[:, :-1]).astype(np.int64).ravel()  # 64 bits
                # shift counts clamped to [0, 31] BEFORE shifting: numpy
                # evaluates both np.where branches eagerly, and << with a
                # negative or >=64 count is undefined (r7 self-review)
                idx = np.arange(64, dtype=np.int64)
                w_hi = np.where(idx >= 32, np.int64(1) << np.clip(idx - 32, 0, 31), 0)
                w_lo = np.where(idx < 32, np.int64(1) << np.clip(idx, 0, 31), 0)
                rows.append((int(aid), int((bits * w_hi).sum()), int((bits * w_lo).sum())))
            yield pd.DataFrame(rows, columns=["asset_id", "dhash_hi", "dhash_lo"])

    hashes = thumbs.mapInPandas(dhash, "asset_id long, dhash_hi long, dhash_lo long")
    return hashes.groupBy("dhash_hi", "dhash_lo").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.min("asset_id").alias("rep_asset"),
    )
