"""AVI/MJPEG container walk (operators/video_ops.py, VERDICT r11 item
5): roundtrip through the real JPEG decoder, strict loud failures on
malformed structure (the r11 bit-stream lesson: fuzzed containers must
fail, never decode garbage), and the q167 driver row plumbing."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.operators.jpeg_codec import (
    decode_jpeg_gray,
    encode_jpeg_gray,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.operators.video_ops import (
    decode_avi_frames,
    encode_avi_mjpeg,
    parse_avi_header,
)


def _avi(n: int = 3, w: int = 16, h: int = 8) -> bytes:
    frames = [
        encode_jpeg_gray(w, h, bytes([(17 * k + 5) % 256]) * (w * h))
        for k in range(n)
    ]
    return encode_avi_mjpeg(w, h, frames)


class TestRoundtrip:
    def test_header_and_frames(self):
        avi = _avi(3)
        assert parse_avi_header(avi)[:3] == (16, 8, 3)
        frames = decode_avi_frames(avi)
        assert len(frames) == 3
        for k, f in enumerate(frames):
            w, h, raw = decode_jpeg_gray(f)
            assert (w, h) == (16, 8)
            assert raw == bytes([(17 * k + 5) % 256]) * 128

    def test_odd_length_frames_stay_aligned(self):
        # JPEG payload lengths vary; the even-pad walk must keep every
        # frame intact regardless of parity
        frames = [
            encode_jpeg_gray(8, 8, bytes(range(64))),
            encode_jpeg_gray(8, 8, bytes([255]) * 64),
        ]
        got = decode_avi_frames(encode_avi_mjpeg(8, 8, frames))
        assert [decode_jpeg_gray(f)[2] for f in got] == [
            bytes(range(64)),
            bytes([255]) * 64,
        ]

    def test_multimodal_dispatch(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.operators.multimodal import (
            decode_meta,
        )

        avi = _avi(2)
        w, h, nf, bs, be = decode_meta(avi, "video/x-msvideo")
        assert (w, h, nf) == (16, 8, 2) and 0 < bs < be <= len(avi)


class TestLoudFailures:
    def test_bad_magics(self):
        avi = bytearray(_avi())
        with pytest.raises(ValueError, match="not an AVI"):
            parse_avi_header(b"JUNK" + bytes(avi[4:]))
        notavi = bytearray(avi)
        notavi[8:12] = b"WAVE"
        with pytest.raises(ValueError, match="not an AVI"):
            parse_avi_header(bytes(notavi))

    def test_truncation_is_loud(self):
        avi = _avi()
        for cut in (10, 40, len(avi) // 2, len(avi) - 3):
            with pytest.raises(ValueError):
                decode_avi_frames(avi[:cut])

    def test_riff_size_past_end(self):
        avi = bytearray(_avi())
        avi[4:8] = struct.pack("<I", len(avi) + 100)
        with pytest.raises(ValueError, match="past payload end"):
            parse_avi_header(bytes(avi))

    def test_frame_count_mismatch_is_loud(self):
        avi = bytearray(_avi(3))
        i = avi.index(b"avih")
        # dwTotalFrames lives 16 bytes into the avih data
        avi[i + 8 + 16 : i + 8 + 20] = struct.pack("<I", 7)
        with pytest.raises(ValueError, match="declares 7 frames"):
            decode_avi_frames(bytes(avi))

    def test_non_video_movi_chunk_is_loud(self):
        avi = bytearray(_avi(2))
        i = avi.index(b"00dc")
        avi[i : i + 4] = b"01wb"  # audio chunk where video expected
        with pytest.raises(ValueError, match="MJPEG only"):
            decode_avi_frames(bytes(avi))

    def test_duplicate_headers_are_loud(self):
        # A second, lying avih/hdrl (or movi) must not silently win the
        # walk (ADVICE r12): duplicate structure is refused outright.
        avi = _avi(2)

        def dup_list(buf: bytes, four: bytes) -> bytes:
            off = 12
            while off < len(buf):
                tag = buf[off : off + 4]
                (ln,) = struct.unpack("<I", buf[off + 4 : off + 8])
                if tag == b"LIST" and buf[off + 8 : off + 12] == four:
                    piece = buf[off : off + 8 + ln + (ln % 2)]
                    out = bytearray(buf + piece)
                    out[4:8] = struct.pack("<I", len(out) - 8)
                    return bytes(out)
                off += 8 + ln + (ln % 2)
            raise AssertionError(f"LIST {four!r} not found")

        with pytest.raises(ValueError, match="duplicate hdrl"):
            parse_avi_header(dup_list(avi, b"hdrl"))
        with pytest.raises(ValueError, match="duplicate movi"):
            parse_avi_header(dup_list(avi, b"movi"))

    def test_duplicate_avih_inside_one_hdrl_is_loud(self):
        avi = _avi(2)
        i = avi.index(b"avih")
        (ln,) = struct.unpack("<I", avi[i + 4 : i + 8])
        piece = avi[i : i + 8 + ln + (ln % 2)]
        out = bytearray(avi[: i + 8 + ln + (ln % 2)] + piece + avi[i + 8 + ln + (ln % 2) :])
        # grow the RIFF, outer hdrl LIST sizes by the spliced chunk
        out[4:8] = struct.pack("<I", struct.unpack("<I", out[4:8])[0] + len(piece))
        j = out.index(b"hdrl") - 8
        out[j + 4 : j + 8] = struct.pack(
            "<I", struct.unpack("<I", out[j + 4 : j + 8])[0] + len(piece)
        )
        with pytest.raises(ValueError, match="duplicate avih"):
            parse_avi_header(bytes(out))

    def test_fabricated_frame_bytes_fail_in_jpeg_decoder(self):
        # container intact, frame body garbage: the JPEG layer must go
        # loud (r11 truncation/padding lesson)
        frames = [bytes([0xFF, 0xD8]) + bytes(50)]
        avi = encode_avi_mjpeg(8, 8, frames)
        got = decode_avi_frames(avi)
        with pytest.raises(ValueError):
            decode_jpeg_gray(got[0])


def test_q167_matches_closed_form(spark, oracle):
    import pandas as pd

    from sql_interface_to_xml_database_for_spatial_operations_spark.operators.registry import (
        QUERIES,
    )

    q = QUERIES["q167_video_frames"]
    s = q.fn(spark, "/root/testdata/sf0.001").toPandas()
    o = oracle.sql(q.oracle).df()
    key = ["asset_id", "frame_idx"]
    s = s.sort_values(key, ignore_index=True)[sorted(s.columns)]
    o = o.sort_values(key, ignore_index=True)[sorted(o.columns)]
    assert len(s) == len(o) > 0
    pd.testing.assert_frame_equal(
        s.astype("int64"), o.astype("int64"), check_dtype=False
    )
