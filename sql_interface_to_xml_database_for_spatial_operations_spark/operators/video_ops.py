"""Video frame extraction — a REAL AVI/MJPEG container walk feeding the
real baseline JPEG decoder (VERDICT r11 item 5: replaces the engine's
last ``NotImplementedError`` codec gate in multimodal.decode_meta).

The container is the published Microsoft AVI RIFF layout (fourcc
chunks, little-endian sizes, even alignment):

    RIFF <size> 'AVI '
      LIST <size> 'hdrl'
        'avih' 56  MainAVIHeader (µs/frame, ..., dwTotalFrames,
                   dwStreams, ..., dwWidth @32, dwHeight @36)
        LIST <size> 'strl'
          'strh' 56  fccType 'vids', fccHandler 'MJPG', dwScale/dwRate,
                     dwLength, rcFrame
          'strf' 40  BITMAPINFOHEADER (biCompression 'MJPG')
      LIST <size> 'movi'
        '00dc' <len> <full JFIF frame>   (padded to even)
      'idx1' 16·n  (ckid, AVIIF_KEYFRAME, offset, length)

MJPEG is exactly "every frame is a complete baseline JPEG", so the
frame payloads decode through ``operators/jpeg_codec.decode_jpeg_gray``
— real Huffman + dequantize + IDCT pixels, the same bit-exact DC-only
oracle class q163 pins. The walk is LOUD on malformed structure (bad
magics, sizes past the payload, truncated chunks, frame-count
mismatch, non-'dc' stream chunks): a fuzzed container must fail, never
decode garbage (the r11 JPEG truncation lesson).

Scale shape: encode and decode are both single ``mapInPandas`` stages —
map-only, Arrow-batched, no shuffle; per-row cost is the row's own
frame count × block count. At 100 TB the frame explosion is bounded by
the sampling step, and the output is a per-frame row set ready for the
image pipeline (dedup/dhash/resize) downstream.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..sources.tables import fan_out, load_table
from .registry import query

AVI_MEDIA_TYPE = "video/x-msvideo"


def _chunk(tag: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return tag + struct.pack("<I", len(data)) + data + pad


def _list(four: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", four + data)


def encode_avi_mjpeg(
    width: int, height: int, frames: list[bytes], fps: int = 25
) -> bytes:
    """Minimal valid AVI/MJPEG: one 'vids'/'MJPG' stream whose '00dc'
    chunks are complete baseline JPEGs, plus an idx1 index."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    maxb = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        maxb * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        len(frames),  # dwTotalFrames
        0,
        1,  # dwStreams
        maxb,
        width,
        height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IIIIIIIIII4H",
            0, 0, 0,  # dwFlags, wPriority|wLanguage, dwInitialFrames
            1,  # dwScale
            fps,  # dwRate
            0,  # dwStart
            len(frames),  # dwLength
            maxb,
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (varies per frame)
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    idx = b""
    for f in frames:
        # offset convention: from the 'movi' fourcc (the common one)
        idx += b"00dc" + struct.pack("<III", 0x10, len(movi_body), len(f))
        movi_body += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_body)
    idx1 = _chunk(b"idx1", idx)
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _walk_chunks(buf: bytes, start: int, end: int):
    """Yield (tag, data_start, data_len) for a RIFF chunk run; loud on
    truncation or sizes past the end."""
    off = start
    while off < end:
        if off + 8 > end:
            raise ValueError("AVI: truncated chunk header")
        tag = bytes(buf[off : off + 4])
        (ln,) = struct.unpack("<I", buf[off + 4 : off + 8])
        if off + 8 + ln > end:
            raise ValueError("AVI: chunk size past payload end")
        yield tag, off + 8, ln
        off += 8 + ln + (ln % 2)


def parse_avi_header(payload: bytes) -> tuple[int, int, int, int, int]:
    """(width, height, n_frames, movi_start, movi_end) from a strict
    AVI walk — the multimodal.decode_meta contract."""
    b = bytes(payload) if payload is not None else b""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    (riff_len,) = struct.unpack("<I", b[4:8])
    if 8 + riff_len > len(b):
        raise ValueError("AVI: RIFF size past payload end")
    end = 8 + riff_len
    dims = None
    n_frames = None
    movi = None
    seen_hdrl = False
    for tag, ds, ln in _walk_chunks(b, 12, end):
        if tag == b"LIST" and ln >= 4:
            four = bytes(b[ds : ds + 4])
            if four == b"hdrl":
                # A second hdrl/avih would let a crafted container carry a
                # lying header that overrides the first — refuse duplicates
                # like every other structural check here.
                if seen_hdrl:
                    raise ValueError("AVI: duplicate hdrl LIST")
                seen_hdrl = True
                for t2, ds2, ln2 in _walk_chunks(b, ds + 4, ds + ln):
                    if t2 == b"avih":
                        if ln2 < 40:
                            raise ValueError("AVI: avih too short")
                        if n_frames is not None:
                            raise ValueError("AVI: duplicate avih chunk")
                        n_frames = struct.unpack("<I", b[ds2 + 16 : ds2 + 20])[0]
                        dims = struct.unpack("<II", b[ds2 + 32 : ds2 + 40])
            elif four == b"movi":
                if movi is not None:
                    raise ValueError("AVI: duplicate movi LIST")
                movi = (ds + 4, ds + ln)
    if dims is None or n_frames is None:
        raise ValueError("AVI: missing hdrl/avih")
    if movi is None:
        raise ValueError("AVI: missing movi list")
    return dims[0], dims[1], n_frames, movi[0], movi[1]


def decode_avi_frames(payload: bytes) -> list[bytes]:
    """The MJPEG frame payloads, in stream order. Loud on non-video
    chunks and on a frame count disagreeing with the avih header."""
    b = bytes(payload)
    _w, _h, n_frames, ms, me = parse_avi_header(b)
    frames: list[bytes] = []
    for tag, ds, ln in _walk_chunks(b, ms, me):
        if tag[2:4] != b"dc":
            raise ValueError(f"AVI: unsupported movi chunk {tag!r} (MJPEG only)")
        frames.append(b[ds : ds + ln])
    if len(frames) != n_frames:
        raise ValueError(
            f"AVI: avih declares {n_frames} frames, movi carries {len(frames)}"
        )
    return frames


_FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("px_sum", LongType(), True),
    ]
)


def _run_q167(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from .jpeg_codec import decode_jpeg_gray, encode_jpeg_gray

    for pdf in batches:
        rows: dict[str, list[int]] = {k.name: [] for k in _FRAME_SCHEMA}
        for i in pdf["doc_id"]:
            i = int(i)
            bw, bh = i % 5 + 1, (i * 7) % 3 + 1
            nf = i % 3 + 2
            k = np.arange(bw * bh, dtype=np.int64)
            frames = []
            for f in range(nf):
                tiles = ((i * 31 + f * 97 + k * 7) % 256).astype(np.uint8)
                img = np.kron(
                    tiles.reshape(bh, bw), np.ones((8, 8), dtype=np.uint8)
                )
                frames.append(encode_jpeg_gray(bw * 8, bh * 8, img.tobytes()))
            payload = encode_avi_mjpeg(bw * 8, bh * 8, frames)
            # the real decode path: container walk -> per-frame JPEG
            got = decode_avi_frames(payload)
            for f in range(0, nf, 2):  # frame sampling: every 2nd
                w, h, raw = decode_jpeg_gray(got[f])
                rows["asset_id"].append(i)
                rows["frame_idx"].append(f)
                rows["n_frames"].append(nf)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["px_sum"].append(
                    int(np.frombuffer(raw, dtype=np.uint8).astype(np.int64).sum())
                )
        yield pd.DataFrame(rows)


# Closed form (q163 idiom): block-constant 8x8 tiles carry only a DC
# coefficient, so the decoded pixel sum per frame is exactly
# sum_k ((id*31 + f*97 + k*7) % 256) * 64.
_Q167_ORACLE = """
WITH t AS (
  SELECT doc_id, (doc_id % 5 + 1) AS bw, ((doc_id * 7) % 3 + 1) AS bh,
         (doc_id % 3 + 2) AS nf
  FROM documents WHERE doc_id % 7 = 0
), f AS (
  SELECT doc_id, bw, bh, nf, unnest(generate_series(0, nf - 1)) AS frame_idx
  FROM t
), sampled AS (
  SELECT * FROM f WHERE frame_idx % 2 = 0
), tiles AS (
  SELECT doc_id, bw, bh, nf, frame_idx,
         unnest(generate_series(0, bw * bh - 1)) AS k
  FROM sampled
)
SELECT doc_id AS asset_id, frame_idx, nf AS n_frames,
       CAST(max(bw) * 8 AS BIGINT) AS width,
       CAST(max(bh) * 8 AS BIGINT) AS height,
       CAST(sum(((doc_id * 31 + frame_idx * 97 + k * 7) % 256) * 64) AS BIGINT)
         AS px_sum
FROM tiles
GROUP BY doc_id, frame_idx, nf
"""


@query("q167_video_frames", oracle=_Q167_ORACLE)
def q167_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame extraction end to end: build AVI/MJPEG containers
    (every 7th document, 2-4 frames of tile-constant gray JPEG), walk
    the RIFF structure, sample every 2nd frame, Huffman/IDCT-decode it,
    and pin the decoded per-frame pixel sums against the DC-only closed
    form (module docstring)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 0)
        .select("doc_id")
    )
    return fan_out(docs).mapInPandas(_run_q167, schema=_FRAME_SCHEMA)
