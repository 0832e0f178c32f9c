"""Real baseline JPEG codec (operators/jpeg_codec.py): exact
block-constant round-trips, lossy bound on arbitrary images, marker
edge cases, loud failures outside the supported class."""

from __future__ import annotations

import random

import numpy as np
import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.operators.jpeg_codec import (
    decode_jpeg_gray,
    encode_jpeg_gray,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.operators.multimodal import (
    gray_raster_of,
    parse_jpeg_header,
)


def _block_constant(w: int, h: int, seed: int) -> bytes:
    rng = random.Random(seed)
    tiles = np.array(
        [[rng.randrange(256) for _ in range(-(-w // 8))] for _ in range(-(-h // 8))],
        dtype=np.uint8,
    )
    return np.kron(tiles, np.ones((8, 8), dtype=np.uint8))[:h, :w].tobytes()


class TestJpegCodec:
    @pytest.mark.parametrize("seed", range(6))
    def test_block_constant_roundtrip_exact(self, seed):
        w, h = 8 * (seed % 5 + 1), 8 * (seed % 3 + 1)
        img = _block_constant(w, h, seed)
        assert decode_jpeg_gray(encode_jpeg_gray(w, h, img)) == (w, h, img)

    @pytest.mark.parametrize("seed", range(4))
    def test_arbitrary_image_within_rounding(self, seed):
        rng = random.Random(100 + seed)
        w, h = rng.randrange(9, 40), rng.randrange(9, 40)
        img = bytes(rng.randrange(256) for _ in range(w * h))
        ww, hh, out = decode_jpeg_gray(encode_jpeg_gray(w, h, img))
        assert (ww, hh) == (w, h)
        err = np.abs(
            np.frombuffer(out, np.uint8).astype(int)
            - np.frombuffer(img, np.uint8).astype(int)
        )
        assert err.max() <= 2  # all-ones quantization: float rounding only

    def test_byte_stuffing_all_white(self):
        img = bytes([255]) * (16 * 16)
        assert decode_jpeg_gray(encode_jpeg_gray(16, 16, img))[2] == img

    def test_header_interop_with_marker_walk(self):
        p = encode_jpeg_gray(24, 16, _block_constant(24, 16, 7))
        w, h, ncomp, _off = parse_jpeg_header(p)
        assert (w, h, ncomp) == (24, 16, 1)

    def test_gray_raster_of_dispatches_jpeg(self):
        img = _block_constant(16, 8, 9)
        assert gray_raster_of(encode_jpeg_gray(16, 8, img)) == (16, 8, img)

    def test_loud_failures(self):
        p = encode_jpeg_gray(16, 16, bytes(256))
        with pytest.raises(ValueError):
            decode_jpeg_gray(p[:40])  # truncated before SOS
        with pytest.raises(ValueError):
            decode_jpeg_gray(b"\x89PNG")  # wrong magic
        # multi-component SOF0: loud, never a wrong raster
        bad = bytearray(p)
        i = bad.index(b"\xff\xc0")
        bad[i + 9] = 3
        with pytest.raises(ValueError):
            decode_jpeg_gray(bytes(bad))
        # the legacy text-body fixtures (no DQT/DHT) must fail loudly
        from sql_interface_to_xml_database_for_spatial_operations_spark.operators.multimodal import (
            encode_jpeg,
        )

        with pytest.raises(ValueError):
            decode_jpeg_gray(encode_jpeg(10, 10, b"not entropy data"))

    def test_dc_category_extremes(self):
        # black->white checkerboard of tiles maxes the DC diffs
        tiles = np.array([[0, 255], [255, 0]], dtype=np.uint8)
        img = np.kron(tiles, np.ones((8, 8), dtype=np.uint8)).tobytes()
        assert decode_jpeg_gray(encode_jpeg_gray(16, 16, img))[2] == img

    def test_truncated_scan_is_loud_not_garbage(self):
        # code-review r11: all-zero fabricated bits decode as valid
        # Huffman symbols forever, so a stream cut mid-scan silently
        # produced a garbage raster
        img = _block_constant(48, 48, 21)
        p = encode_jpeg_gray(48, 48, img)
        i = p.index(b"\xff\xda")
        scan_len = len(p) - i - 2
        cut = p[: i + scan_len // 2]
        with pytest.raises(ValueError):
            decode_jpeg_gray(cut)

    def test_trailing_bytes_after_eoi_ok(self):
        # code-review r11: spec-valid files may carry padding after EOI
        img = _block_constant(16, 16, 22)
        p = encode_jpeg_gray(16, 16, img)
        assert decode_jpeg_gray(p + b"junk after eoi")[2] == img

    def test_fill_bytes_before_marker_ok(self):
        # T.81 B.1.1.2: repeated 0xFF fill before a marker is legal
        img = _block_constant(16, 8, 23)
        p = encode_jpeg_gray(16, 8, img)
        i = p.index(b"\xff\xdb")
        padded = p[:i] + b"\xff" + p[i:]
        assert decode_jpeg_gray(padded)[2] == img


class TestJpegColor:
    """4:4:4 YCbCr color path (late r11): interleaved MCUs, independent
    DC predictors, JFIF matrices with round-half-up."""

    def _tile_rgb(self, bw: int, bh: int, seed: int) -> np.ndarray:
        rng = np.random.RandomState(seed)
        tiles = rng.randint(0, 256, size=(bh, bw, 3), dtype=np.uint8)
        return np.ascontiguousarray(
            np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
        )

    def test_tile_constant_matches_conversion_closed_form(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.operators.jpeg_codec import (
            decode_jpeg,
            encode_jpeg_rgb,
            rgb_to_ycbcr,
            ycbcr_to_rgb,
        )

        for seed in range(6):
            bw, bh = seed % 3 + 1, seed % 2 + 1
            img = self._tile_rgb(bw, bh, seed)
            p = encode_jpeg_rgb(bw * 8, bh * 8, img.tobytes())
            w, h, nc, raw = decode_jpeg(p)
            assert (w, h, nc) == (bw * 8, bh * 8, 3)
            got = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
            # block-constant YCbCr survives the DCT bit-exactly, so the
            # decode equals the pure conversion round trip
            assert np.array_equal(got, ycbcr_to_rgb(rgb_to_ycbcr(img)))

    def test_arbitrary_image_round_trip_tolerance(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.operators.jpeg_codec import (
            decode_jpeg,
            encode_jpeg_rgb,
        )

        rng = np.random.RandomState(9)
        img = rng.randint(0, 256, size=(19, 26, 3), dtype=np.uint8)
        p = encode_jpeg_rgb(26, 19, img.tobytes())
        w, h, nc, raw = decode_jpeg(p)
        assert (w, h, nc) == (26, 19, 3)
        got = np.frombuffer(raw, dtype=np.uint8).reshape(19, 26, 3).astype(int)
        assert np.abs(got - img.astype(int)).max() <= 6

    def test_gray_decoder_rejects_color(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.operators.jpeg_codec import (
            encode_jpeg_rgb,
        )

        p = encode_jpeg_rgb(8, 8, bytes(8 * 8 * 3))
        with pytest.raises(ValueError, match="3-component"):
            decode_jpeg_gray(p)

    def test_color_truncation_is_loud(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.operators.jpeg_codec import (
            decode_jpeg,
            encode_jpeg_rgb,
        )

        img = self._tile_rgb(3, 2, 31)
        p = encode_jpeg_rgb(24, 16, img.tobytes())
        i = p.index(b"\xff\xda")
        with pytest.raises(ValueError):
            decode_jpeg(p[: i + (len(p) - i) // 2])

    def test_subsampled_stream_rejected(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.operators.jpeg_codec import (
            decode_jpeg,
            encode_jpeg_rgb,
        )

        p = bytearray(encode_jpeg_rgb(8, 8, bytes(8 * 8 * 3)))
        i = p.index(b"\xff\xc0")
        # component 1's sampling byte: SOF0 payload = len(2) P(1) H(2)
        # W(2) ncomp(1) then [id, sampling, tq] triplets
        p[i + 2 + 8 + 1] = 0x22  # pretend 2x2-sampled luma
        with pytest.raises(ValueError, match="subsampled"):
            decode_jpeg(bytes(p))

    def test_gray_raster_of_color_jpeg_reduces_by_luma(self):
        from sql_interface_to_xml_database_for_spatial_operations_spark.operators.jpeg_codec import (
            encode_jpeg_rgb,
            rgb_to_ycbcr,
            ycbcr_to_rgb,
        )
        from sql_interface_to_xml_database_for_spatial_operations_spark.operators.multimodal import (
            gray_raster_of,
        )

        img = self._tile_rgb(2, 1, 40)
        p = encode_jpeg_rgb(16, 8, img.tobytes())
        w, h, raw = gray_raster_of(p)
        assert (w, h) == (16, 8)
        rgbp = ycbcr_to_rgb(rgb_to_ycbcr(img)).reshape(-1, 3).astype(np.int64)
        want = ((rgbp @ np.array([299, 587, 114])) // 1000).astype(np.uint8)
        assert raw == want.tobytes()

    def test_inconsistent_component_ids_rejected(self):
        # code-review r11: duplicate or unknown SOS ids must be loud,
        # never a channel-swapped / predictor-shared raster
        from sql_interface_to_xml_database_for_spatial_operations_spark.operators.jpeg_codec import (
            decode_jpeg,
            encode_jpeg_rgb,
        )

        base = encode_jpeg_rgb(8, 8, bytes([10, 200, 50]) * 64)
        i = base.index(b"\xff\xda")
        # SOS payload: len(2) ns(1) then [id, tables] pairs: ids at
        # offsets i+5, i+7, i+9
        dup = bytearray(base)
        dup[i + 7] = 1  # component 2's id duplicated to 1
        with pytest.raises(ValueError, match="component ids"):
            decode_jpeg(bytes(dup))
        unk = bytearray(base)
        unk[i + 5] = 9  # id absent from SOF
        with pytest.raises(ValueError, match="component ids"):
            decode_jpeg(bytes(unk))


def test_trailing_zrl_past_index_63_is_loud():
    """ADVICE r11: ZRL runs that advance the AC index past 63 are
    malformed (a conforming encoder emits EOB instead) and must raise
    even though they write no coefficient."""
    import numpy as np
    import pytest

    from sql_interface_to_xml_database_for_spatial_operations_spark.operators.jpeg_codec import (
        _decode_block,
    )

    class _Reader:
        def take(self, n):
            return 0

    symbols = iter([0xF0] * 5)  # ZRL x5: k = 1 -> 17 -> 33 -> 49 -> 65
    with pytest.raises(ValueError, match="AC coefficient index overflow"):
        _decode_block(
            _Reader(),
            lambda r: 0,
            lambda r: next(symbols),
            np.ones(64, dtype=np.int64),
            0,
        )
