"""YUV4MPEG2 (.y4m) container walk — the second real video format
(r14; VERDICT r13 item 6 named the non-AVI container gate the last
documented NotImplementedError).

The format is the published mjpegtools yuv4mpeg layout — a pure-text
stream header followed by raw planar frames:

    YUV4MPEG2 W<w> H<h> F<num>:<den> [I<p> A<n>:<d> C<chroma>]\\n
    FRAME[ <params>]\\n  <Y plane w·h bytes> [<U plane> <V plane>]
    FRAME\\n ...

Chroma tags supported here: ``C420``/``C420jpeg``/``C420mpeg2``
(U and V at (w/2)·(h/2) — w and h must be even) and ``Cmono`` (luma
only). No C tag defaults to C420jpeg per the spec. Anything else —
bad magic, missing/duplicate W/H/F tags, non-integer dimensions, odd
dimensions under 4:2:0, unknown tags, a truncated frame, trailing
garbage after the last frame — raises loudly (the r11 JPEG-truncation
lesson: a fuzzed container must fail, never decode garbage).

Unlike AVI/MJPEG the frames are UNCOMPRESSED, so the decoded luma is
the payload bytes themselves — the driver row builds gradient planes
whose per-frame pixel sums are exact integer closed forms, and the
oracle recomputes them with ``generate_series`` arithmetic.

Scale shape: encode and decode are one ``mapInPandas`` stage each —
map-only, Arrow-batched, no shuffle; per-row cost is the row's own
frame count × plane size. Same class as the AVI walk (video_ops.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..sources.tables import load_table
from .registry import query

Y4M_MEDIA_TYPE = "video/x-yuv4mpeg"

# chroma tag → number of (w/2)·(h/2) subsampled planes after the Y
# plane (drives _frame_size — review r14: a membership-only dict would
# let a future chroma pass validation yet silently mis-size frames)
_CHROMA_FACTORS = {
    "420": 2,
    "420jpeg": 2,
    "420mpeg2": 2,
    "mono": 0,
}


def encode_y4m(
    width: int, height: int, frames: list[bytes], chroma: str = "mono"
) -> bytes:
    """Build a strict y4m container. ``frames`` are full frame payloads
    (Y plane, plus U/V when not mono)."""
    if chroma not in _CHROMA_FACTORS:
        raise ValueError(f"unknown chroma {chroma!r}")
    head = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C{chroma}\n".encode()
    out = [head]
    fsize = _frame_size(width, height, chroma)
    for f in frames:
        if len(f) != fsize:
            raise ValueError(f"frame size {len(f)} != {fsize}")
        out.append(b"FRAME\n")
        out.append(f)
    return b"".join(out)


def _frame_size(width: int, height: int, chroma: str) -> int:
    planes = _CHROMA_FACTORS.get(chroma)
    if planes is None:  # module contract: loud ValueError, not KeyError
        raise ValueError(f"y4m: unsupported chroma {chroma!r}")
    if planes == 0:
        return width * height
    if width % 2 or height % 2:
        raise ValueError("subsampled chroma needs even dimensions")
    return width * height + planes * (width // 2) * (height // 2)


def _parse_header(
    payload: bytes,
) -> tuple[int, int, str, list[int], int]:
    """(width, height, chroma, frame_payload_offsets, payload_end)
    from a STRICT walk; the single source of truth for header AND
    frame-boundary parsing (review r14: decode used to re-derive the
    chroma — and then the frame boundaries — with weaker re-scans).
    Any structural lie — duplicate tags (C/I/A included: a fuzzed
    container must not be silently ambiguous about its own frame
    sizing), unknown tags, bad markers, truncation, trailing bytes —
    raises ValueError."""
    b = bytes(payload) if payload is not None else b""
    nl = b.find(b"\n")
    if nl < 0 or not b.startswith(b"YUV4MPEG2"):
        raise ValueError("not a y4m payload")
    tags = b[:nl].decode("ascii", errors="strict").split(" ")
    if tags[0] != "YUV4MPEG2":
        raise ValueError("not a y4m payload")
    w = h = fnum = fden = None
    chroma = None
    seen: set[str] = set()
    for tag in tags[1:]:
        if tag == "":
            raise ValueError("y4m: empty header tag (double space)")
        key, val = tag[0], tag[1:]
        if key in "WHFCIA":
            if key in seen:
                raise ValueError(f"y4m: duplicate {key} tag")
            seen.add(key)
        if key == "W":
            w = _pos_int(val, "W")
        elif key == "H":
            h = _pos_int(val, "H")
        elif key == "F":
            num, _, den = val.partition(":")
            fnum, fden = _pos_int(num, "F num"), _pos_int(den, "F den")
        elif key == "C":
            if val not in _CHROMA_FACTORS:
                raise ValueError(f"y4m: unsupported chroma {val!r}")
            chroma = val
        elif key in ("I", "A", "X"):
            pass  # interlacing / aspect / extensions: legal, unused
        else:
            raise ValueError(f"y4m: unknown header tag {tag!r}")
    if w is None or h is None or fnum is None:
        raise ValueError("y4m: missing required W/H/F tag")
    if chroma is None:
        chroma = "420jpeg"  # the spec default when no C tag is present
    fsize = _frame_size(w, h, chroma)
    pos = nl + 1
    offsets: list[int] = []
    while pos < len(b):
        fe = b.find(b"\n", pos)
        if fe < 0 or b[pos : pos + 5] != b"FRAME":
            raise ValueError("y4m: expected FRAME marker")
        if fe > pos + 5 and b[pos + 5 : pos + 6] != b" ":
            raise ValueError("y4m: malformed FRAME parameters")
        if fe + 1 + fsize > len(b):
            raise ValueError("y4m: truncated frame payload")
        offsets.append(fe + 1)
        pos = fe + 1 + fsize
    if not offsets:
        raise ValueError("y4m: no frames")
    if pos != len(b):
        raise ValueError("y4m: trailing bytes after last frame")
    return w, h, chroma, offsets, len(b)


def parse_y4m_header(payload: bytes) -> tuple[int, int, int, int, int]:
    """(width, height, n_frames, first_frame_off, payload_end) — same
    contract shape as video_ops.parse_avi_header."""
    w, h, _chroma, offsets, end = _parse_header(payload)
    return w, h, len(offsets), offsets[0], end


def _pos_int(s: str, what: str) -> int:
    if not s.isdigit():
        raise ValueError(f"y4m: non-integer {what} tag")
    v = int(s)
    if v <= 0:
        raise ValueError(f"y4m: non-positive {what} tag")
    return v


def decode_y4m_luma(payload: bytes) -> tuple[int, int, list[bytes]]:
    """(width, height, [Y plane per frame]) — chroma planes are walked
    (size-checked by the shared parse) but not returned; the luma IS
    the raw bytes. Frame slicing consumes _parse_header's validated
    offsets directly (review r14: no second marker walk)."""
    b = bytes(payload)
    w, h, _chroma, offsets, _end = _parse_header(b)
    return w, h, [b[off : off + w * h] for off in offsets]


# ---------------------------------------------------------------------------
# q173: end-to-end driver row
# ---------------------------------------------------------------------------

_FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("n_frames", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("px_sum", LongType()),
    ]
)


def _run_q173(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = {k.name: [] for k in _FRAME_SCHEMA.fields}
        for i in pdf["doc_id"].astype("int64"):
            i = int(i)
            w = (i % 4 + 1) * 4  # 4..16, even (4:2:0-safe)
            h = (i * 5 % 3 + 1) * 4  # 4..12
            nf = i % 3 + 2  # 2..4
            mono = i % 2 == 0
            chroma = "mono" if mono else "420"
            frames = []
            for f in range(nf):
                j = np.arange(w * h, dtype=np.int64)
                y = ((i * 31 + f * 97 + j * 7) % 256).astype(np.uint8)
                payload = y.tobytes()
                if not mono:
                    cw, ch = w // 2, h // 2
                    u = np.full(cw * ch, (i + f) % 256, dtype=np.uint8)
                    payload += u.tobytes() + u.tobytes()
                frames.append(payload)
            blob = encode_y4m(w, h, frames, chroma)
            gw, gh, lumas = decode_y4m_luma(blob)
            if (gw, gh) != (w, h) or len(lumas) != nf:
                raise ValueError(  # not assert: -O must not strip it
                    f"y4m round-trip drift: {(gw, gh, len(lumas))} != "
                    f"{(w, h, nf)}"
                )
            for f in range(0, nf, 2):  # sample every 2nd frame
                rows["asset_id"].append(i)
                rows["frame_idx"].append(f)
                rows["n_frames"].append(nf)
                rows["width"].append(gw)
                rows["height"].append(gh)
                rows["px_sum"].append(
                    int(
                        np.frombuffer(lumas[f], dtype=np.uint8)
                        .astype(np.int64)
                        .sum()
                    )
                )
        yield pd.DataFrame(rows)


_Q173_ORACLE = """
WITH t AS (
  SELECT doc_id, (doc_id % 4 + 1) * 4 AS w,
         ((doc_id * 5) % 3 + 1) * 4 AS h,
         (doc_id % 3 + 2) AS nf
  FROM documents WHERE doc_id % 11 = 3
), f AS (
  SELECT doc_id, w, h, nf, unnest(generate_series(0, nf - 1)) AS frame_idx
  FROM t
), sampled AS (
  SELECT * FROM f WHERE frame_idx % 2 = 0
), px AS (
  SELECT doc_id, w, h, nf, frame_idx,
         unnest(generate_series(0, w * h - 1)) AS j
  FROM sampled
)
SELECT doc_id AS asset_id, frame_idx, nf AS n_frames,
       CAST(max(w) AS BIGINT) AS width,
       CAST(max(h) AS BIGINT) AS height,
       CAST(sum((doc_id * 31 + frame_idx * 97 + j * 7) % 256) AS BIGINT)
         AS px_sum
FROM px
GROUP BY doc_id, frame_idx, nf
"""


@query("q173_y4m_frames", oracle=_Q173_ORACLE)
def q173_y4m_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YUV4MPEG2 end to end: build y4m containers (every 11th-ish
    document, 2-4 raw gradient frames, alternating mono / 4:2:0
    chroma), walk the strict header/FRAME structure, sample every 2nd
    frame, and pin the luma pixel sums against the integer closed form
    (raw planes: the decode IS the byte walk, so the oracle recomputes
    the gradient arithmetic exactly)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 11 == 3)
        .select("doc_id")
    )
    return docs.mapInPandas(_run_q173, schema=_FRAME_SCHEMA)
