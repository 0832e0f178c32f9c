"""YUV4MPEG2 container walk (operators/y4m_ops.py): round trips for
mono and 4:2:0, strict structural gates (the r11 fuzzed-container
lesson), and the multimodal.decode_meta dispatch."""

from __future__ import annotations

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.operators.y4m_ops import (
    decode_y4m_luma,
    encode_y4m,
    parse_y4m_header,
)


def _mono(w, h, seed=0):
    return bytes((seed + 7 * j) % 256 for j in range(w * h))


class TestRoundTrip:
    def test_mono(self):
        frames = [_mono(8, 4, s) for s in (0, 50, 100)]
        b = encode_y4m(8, 4, frames, "mono")
        assert parse_y4m_header(b) == (8, 4, 3, b.find(b"\n") + 7, len(b))
        w, h, lum = decode_y4m_luma(b)
        assert (w, h) == (8, 4) and lum == frames

    def test_420_luma_extraction(self):
        y = _mono(8, 4)
        u = bytes(4 * 2)
        frame = y + u + u
        b = encode_y4m(8, 4, [frame, frame], "420")
        assert parse_y4m_header(b)[:3] == (8, 4, 2)
        _w, _h, lum = decode_y4m_luma(b)
        assert lum == [y, y]

    def test_default_chroma_is_420jpeg(self):
        # a header with no C tag defaults to 4:2:0 frame sizing
        y = _mono(4, 4)
        u = bytes(2 * 2)
        body = b"FRAME\n" + y + u + u
        b = b"YUV4MPEG2 W4 H4 F25:1\n" + body
        assert parse_y4m_header(b)[:3] == (4, 4, 1)

    def test_frame_parameters_are_legal(self):
        y = _mono(4, 2)
        b = b"YUV4MPEG2 W4 H2 F25:1 Cmono\n" + b"FRAME Xsome=param\n" + y
        assert parse_y4m_header(b)[:3] == (4, 2, 1)


class TestStrictGates:
    def _good(self):
        return encode_y4m(8, 4, [_mono(8, 4)], "mono")

    @pytest.mark.parametrize(
        "mutate",
        [
            lambda b: b"JUNK" + b[4:],  # bad magic
            lambda b: b[:20],  # truncated header/frame
            lambda b: b + b"x",  # trailing garbage
            lambda b: b.replace(b"FRAME\n", b"FRAMF\n", 1),  # bad marker
            lambda b: b.replace(b"W8", b"W0", 1),  # non-positive dim
            lambda b: b.replace(b"W8", b"Wx", 1),  # non-integer dim
            lambda b: b.replace(b"W8", b"W8 W8", 1),  # duplicate tag
            lambda b: b.replace(b"Cmono", b"C999", 1),  # unknown chroma
            lambda b: b.replace(b"Cmono", b"Qmono", 1),  # unknown tag
            lambda b: b.replace(b"Cmono", b"C420 Cmono", 1),  # dup C (ambiguous sizing)
            lambda b: b.replace(b"Ip", b"Ip Ip", 1),  # dup I
            lambda b: b.replace(b" F25:1", b"", 1),  # missing F
            lambda b: b.replace(b"YUV4MPEG2 ", b"YUV4MPEG2  ", 1),  # double space
        ],
    )
    def test_structural_lies_raise(self, mutate):
        with pytest.raises(ValueError):
            parse_y4m_header(mutate(self._good()))

    def test_odd_dimensions_need_mono(self):
        with pytest.raises(ValueError):
            encode_y4m(7, 4, [bytes(7 * 4 + 2 * 8)], "420")
        b = encode_y4m(7, 3, [_mono(7, 3)], "mono")
        assert parse_y4m_header(b)[:3] == (7, 3, 1)

    def test_no_frames_is_loud(self):
        with pytest.raises(ValueError):
            parse_y4m_header(b"YUV4MPEG2 W4 H4 F25:1 Cmono\n")


def test_decode_meta_dispatch():
    from sql_interface_to_xml_database_for_spatial_operations_spark.operators.multimodal import (
        decode_meta,
    )

    b = encode_y4m(8, 4, [_mono(8, 4)] * 2, "mono")
    w, h, nf, _s, _e = decode_meta(b, "video/x-yuv4mpeg")
    assert (w, h, nf) == (8, 4, 2)
    with pytest.raises(ValueError):
        decode_meta(b"garbage", "video/x-yuv4mpeg")
    with pytest.raises(NotImplementedError):
        decode_meta(b"\x00\x00", "video/mp4")
