"""Driver row for the REAL baseline JPEG pixel codec
(operators/jpeg_codec.py) — VERDICT r10 missing item 3, the last
multimodal codec gate (PNG closed in r10 with the same shape; 4:4:4
YCbCr color added late r11).

Oracle design: every 5th document becomes a grayscale image whose 8×8
tiles are CONSTANT with value ``(doc_id·31 + k·7) % 256`` for tile
index k (row-major) — block-constant tiles have only a DC coefficient,
which round-trips BIT-EXACTLY through the all-ones-quantization
encoder, so the decoded pixel sum equals the closed form
``Σ_k tile(k)·64`` that DuckDB recomputes with generate_series. The
same document also becomes a tile-constant COLOR image: constant RGB
tiles have integer tile-constant YCbCr (the kernel rounds with
floor(x+0.5), which SQL can replicate term for term), those planes
survive the per-component DCT bit-exactly, and the decoded RGB is the
deterministic inverse-matrix closed form — ``rgb_sum`` pins the whole
color path (conversion, interleaved MCUs, per-component DC
predictors). The Spark side runs the full encode → real JFIF bytes →
Huffman/IDCT decode in mapInPandas and aggregates the DECODED bytes;
dimensions are read back from the SOF0 header, not echoed.

Scale shape: one mapInPandas stage (map-only, Arrow-batched), no
shuffle; per-row cost is bounded by the image's own block count
(≤ 24 blocks at the fixture dims).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..sources.tables import fan_out, load_table
from .registry import query

_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("px_sum", LongType(), True),
        StructField("rgb_sum", LongType(), True),
    ]
)


def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from .jpeg_codec import (
        decode_jpeg,
        decode_jpeg_gray,
        encode_jpeg_gray,
        encode_jpeg_rgb,
    )

    for pdf in batches:
        ids, ws, hs, sums, csums = [], [], [], [], []
        for i in pdf["doc_id"]:
            i = int(i)
            bw, bh = i % 6 + 1, (i * 7) % 4 + 1
            k = np.arange(bw * bh, dtype=np.int64)
            tiles = ((i * 31 + k * 7) % 256).astype(np.uint8).reshape(bh, bw)
            img = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))
            payload = encode_jpeg_gray(bw * 8, bh * 8, img.tobytes())
            w, h, raw = decode_jpeg_gray(payload)
            # color: tile-constant RGB at the same dims through the
            # 4:4:4 YCbCr path — decoded channel sums pin the color
            # conversion + per-component entropy coding end to end
            chan = np.stack(
                [
                    ((i * 53 + k * 11) % 256),
                    ((i * 29 + k * 3) % 256),
                    ((i * 17 + k * 13) % 256),
                ],
                axis=-1,
            ).astype(np.uint8).reshape(bh, bw, 3)
            rgb = np.repeat(np.repeat(chan, 8, axis=0), 8, axis=1)
            cpay = encode_jpeg_rgb(bw * 8, bh * 8, rgb.tobytes())
            cw, ch, nc, craw = decode_jpeg(cpay)
            if (cw, ch, nc) != (w, h, 3):
                raise ValueError("color JPEG header mismatch")
            ids.append(i)
            ws.append(w)
            hs.append(h)
            sums.append(int(np.frombuffer(raw, dtype=np.uint8).astype(np.int64).sum()))
            csums.append(
                int(np.frombuffer(craw, dtype=np.uint8).astype(np.int64).sum())
            )
        yield pd.DataFrame(
            {
                "asset_id": ids,
                "width": ws,
                "height": hs,
                "px_sum": sums,
                "rgb_sum": csums,
            }
        )


# the color closed form mirrors the kernel's JFIF matrices TERM FOR
# TERM in binary64 (every literal CAST to DOUBLE — DuckDB's bare
# decimals are DECIMAL-typed and round differently), with the kernel's
# floor(x + 0.5) rounding and post-round clip. Tile-constant YCbCr
# survives the DCT bit-exactly, so the decoded sums are exact.
_Q163_ORACLE = """
WITH t AS (
  SELECT doc_id, (doc_id % 6 + 1) AS bw, ((doc_id * 7) % 4 + 1) AS bh
  FROM documents WHERE doc_id % 5 = 0
), tiles AS (
  SELECT doc_id, bw, bh, unnest(generate_series(0, bw * bh - 1)) AS k
  FROM t
), rgb AS (
  SELECT doc_id, bw, bh, k,
         CAST((doc_id * 53 + k * 11) % 256 AS DOUBLE) AS r,
         CAST((doc_id * 29 + k * 3) % 256 AS DOUBLE) AS g,
         CAST((doc_id * 17 + k * 13) % 256 AS DOUBLE) AS b
  FROM tiles
), ycc AS (
  SELECT doc_id, bw, bh, k,
         LEAST(GREATEST(floor(CAST(0.299 AS DOUBLE) * r
             + CAST(0.587 AS DOUBLE) * g
             + CAST(0.114 AS DOUBLE) * b + 0.5), 0), 255) AS y,
         LEAST(GREATEST(floor(CAST(128 AS DOUBLE)
             - CAST(0.168736 AS DOUBLE) * r
             - CAST(0.331264 AS DOUBLE) * g
             + CAST(0.5 AS DOUBLE) * b + 0.5), 0), 255) AS cb,
         LEAST(GREATEST(floor(CAST(128 AS DOUBLE)
             + CAST(0.5 AS DOUBLE) * r
             - CAST(0.418688 AS DOUBLE) * g
             - CAST(0.081312 AS DOUBLE) * b + 0.5), 0), 255) AS cr
  FROM rgb
), back AS (
  SELECT doc_id, bw, bh, k,
         LEAST(GREATEST(floor(y
             + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5), 0), 255) AS rr,
         LEAST(GREATEST(floor(y
             - CAST(0.344136 AS DOUBLE) * (cb - 128)
             - CAST(0.714136 AS DOUBLE) * (cr - 128) + 0.5), 0), 255) AS gg,
         LEAST(GREATEST(floor(y
             + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5), 0), 255) AS bb
  FROM ycc
)
SELECT doc_id AS asset_id,
       CAST(bw * 8 AS BIGINT) AS width,
       CAST(bh * 8 AS BIGINT) AS height,
       CAST(SUM(((doc_id * 31 + k * 7) % 256) * 64) AS BIGINT) AS px_sum,
       CAST(SUM((rr + gg + bb) * 64) AS BIGINT) AS rgb_sum
FROM back
GROUP BY doc_id, bw, bh
"""


@query("q163_jpeg_pixels", oracle=_Q163_ORACLE)
def q163_jpeg_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real JPEG pixels end to end: block-constant grayscale tiles →
    baseline JFIF (DCT, all-ones quantization, Annex-K Huffman, byte
    stuffing) → full Huffman/IDCT decode → decoded-byte aggregation
    pinned to the DuckDB closed form (module docstring)."""
    d = fan_out(
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % 5 == 0)
    )
    return d.mapInPandas(_run, _SCHEMA)
