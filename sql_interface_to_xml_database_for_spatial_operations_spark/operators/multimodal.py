"""Multimodal column operators: opaque binary payloads + typed metadata.

Beyond-reference surface (BASELINE.json north star): image/audio/video
handled as ``binary`` columns with a metadata struct, processed by
Arrow-batched ``mapInPandas`` stages. The container has no image/audio
codecs, so the *decode* step is a deterministic fake (documented stub —
see ``decode_image_stub``); everything Spark-side — schema, partitioning,
UDF signatures, batch shapes — is real and tested.

The fixture tables carry no binary columns, so the queries materialize
payloads from ``documents.text`` (utf-8 bytes) — the plumbing under test
(binary handling, md5 over blobs, length accounting, mapInPandas batch
flow) is identical for real media bytes.
"""

from __future__ import annotations

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


def decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder (no codecs in this runtime): derives deterministic
    (width, height, n_frames) pseudo-dimensions from the payload bytes.
    Swap for PIL/libav in a real deployment — the surrounding Spark
    plumbing (batching, schema, partitioning) is unchanged."""
    if payload is None:
        raise NotImplementedError("real decode requires an image codec")
    n = len(payload)
    return (n % 640 + 1, (n * 7) % 480 + 1, n % 16 + 1)


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature-extraction stage: Arrow batches in, fixed
    FEATURE_SCHEMA out. Per-partition, no shuffle — at 100 TB this runs
    embarrassingly parallel over the scan partitions."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode_image_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                    # checksum: cheap byte-level reduction (stands in for a
                    # real feature vector) — first+last byte + length mix
                    "feat_checksum": [
                        (len(p) * 31 + (p[0] if len(p) else 0) + (p[-1] if len(p) else 0))
                        for p in pdf["payload"]
                    ],
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def documents_as_assets(spark, sf_dir: str) -> DataFrame:
    """Materialize a multimodal asset table from documents.text bytes."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return d.select(
        F.col("doc_id").alias("asset_id"),
        payload.alias("payload"),
        F.concat(F.lit("text/plain;src="), F.col("source")).alias("media_type"),
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
    )


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
    WITH a AS (
      SELECT doc_id AS asset_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n
      FROM documents
    )
    SELECT asset_id,
           CAST(n % 640 + 1 AS BIGINT) AS width,
           CAST((n * 7) % 480 + 1 AS BIGINT) AS height,
           CAST(n % 16 + 1 AS BIGINT) AS n_frames
    FROM a
    """,
)
def q81_multimodal_features(spark, sf_dir):
    """mapInPandas decode/feature-extract stage (stub decoder — the oracle
    reproduces its deterministic pseudo-dimensions; the Arrow batch flow
    and schema contract are the real thing under test)."""
    feats = extract_features(documents_as_assets(spark, sf_dir))
    return feats.select("asset_id", "width", "height", "n_frames")


@query(
    "q82_frame_sample",
    oracle="""
    WITH a AS (
      SELECT doc_id AS asset_id, CAST(octet_length(encode(text)) AS BIGINT) AS n
      FROM documents
    ),
    frames AS (
      SELECT asset_id, CAST(n % 16 + 1 AS BIGINT) AS n_frames, unnest(generate_series(0, n % 16)) AS frame_idx
      FROM a
    )
    SELECT asset_id, CAST(frame_idx AS BIGINT) AS frame_idx
    FROM frames WHERE frame_idx % 4 = 0
    """,
)
def q82_frame_sample(spark, sf_dir):
    """Frame sampling: explode decoded frame indices, keep every 4th —
    the video-keyframe-sampling plan shape (explode + filter; the filter
    prunes before any downstream decode work)."""
    feats = extract_features(documents_as_assets(spark, sf_dir))
    return (
        feats.select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % 4 == 0)
        .select("asset_id", F.col("frame_idx").cast("bigint").alias("frame_idx"))
    )
