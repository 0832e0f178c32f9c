"""Synthetic-media codecs: SIMG (a real if tiny binary format) and JPEG
header parsing (marker-segment walk, no pixel decode), so the multimodal
decode stage parses actual bytes instead of faking dimensions
(VERDICT r1 'What's wrong' #4; JPEG headers per VERDICT r4 item 6)."""

from __future__ import annotations

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.operators.multimodal import (
    SIMG_HEADER_LEN,
    decode_image,
    decode_meta,
    decode_simg,
    encode_jpeg,
    encode_simg,
    extract_features,
    parse_jpeg_header,
    synthetic_images,
)

from conftest import SF_DIR


def test_simg_roundtrip():
    payload = encode_simg(640, 480, 12, b"framebytes")
    assert decode_simg(payload) == (640, 480, 12)
    assert payload[SIMG_HEADER_LEN:] == b"framebytes"


def test_simg_rejects_bad_magic():
    with pytest.raises(ValueError):
        decode_simg(b"JPEG" + b"\x00" * 20)
    with pytest.raises(ValueError):
        decode_simg(b"SIM")  # truncated
    with pytest.raises(ValueError):
        decode_simg(None)


def test_jpeg_header_roundtrip():
    payload = encode_jpeg(641, 479, b"entropy data here")
    w, h, ncomp, off = parse_jpeg_header(payload)
    assert (w, h, ncomp) == (641, 479, 1)
    # entropy offset lands exactly on the staged body; EOI trails it
    assert payload[off:-2] == b"entropy data here"
    assert payload[-2:] == b"\xff\xd9"


def test_jpeg_decode_meta_body_slice():
    payload = encode_jpeg(10, 20, b"abc")
    w, h, nf, start, end = decode_meta(payload, "image/jpeg")
    assert (w, h, nf) == (10, 20, 1)
    assert bytes(payload[start:end]) == b"abc"


def test_jpeg_progressive_sof2():
    # same stream with the frame marker flipped to SOF2 (progressive):
    # dimensions live at the same offsets per the public marker layout
    payload = bytearray(encode_jpeg(123, 456, b""))
    idx = bytes(payload).find(b"\xff\xc0")
    payload[idx + 1] = 0xC2
    w, h, ncomp, _ = parse_jpeg_header(bytes(payload))
    assert (w, h) == (123, 456)


def test_jpeg_rejects_malformed():
    with pytest.raises(ValueError):
        parse_jpeg_header(b"PNG\x00\x00\x00")  # no SOI
    with pytest.raises(ValueError):
        parse_jpeg_header(b"\xff\xd8\xff\xe0\xff\xff")  # truncated segment
    with pytest.raises(ValueError):
        # SOI then garbage where a marker should be
        parse_jpeg_header(b"\xff\xd8\x00\x00\x00\x00")
    with pytest.raises(ValueError):
        parse_jpeg_header(None)
    with pytest.raises(ValueError):
        # well-formed segments but no SOF before SOS
        parse_jpeg_header(
            b"\xff\xd8" + b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01\x01\x00\x00\x3f\x00"
        )


def test_real_codecs_are_gated_not_faked():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n", "image/png")


def test_extract_features_reads_real_headers(spark):
    feats = {
        r["asset_id"]: r
        for r in extract_features(synthetic_images(spark, SF_DIR)).collect()
    }
    assert feats
    jpegs = simgs = 0
    for aid, r in feats.items():
        assert r["width"] == aid % 640 + 1
        assert r["height"] == (aid * 7) % 480 + 1
        if aid % 3 == 0:
            assert r["media_type"] == "image/jpeg"
            assert r["n_frames"] == 1
            jpegs += 1
        else:
            assert r["media_type"] == "image/simg"
            assert r["n_frames"] == aid % 16 + 1
            simgs += 1
    # the fixture genuinely mixes containers
    assert jpegs > 0 and simgs > 0
