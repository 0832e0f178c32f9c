"""Geohash codec (functions/geohash.py): published anchors, PostGIS
auto-precision semantics, dyadic exactness, loud-NULL gates."""

from __future__ import annotations

import re

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import geohash as GH


def _xy(wkt: str) -> tuple[float, float]:
    x, y = re.findall(r"[-+\d.eE]+", wkt)
    return float(x), float(y)


# ---- published anchors ------------------------------------------------


def test_canonical_geohash_org_anchor():
    # the geohash.org reference example: (57.64911 N, 10.40744 E)
    assert GH.encode_point(10.40744, 57.64911, 11) == "u4pruydqqvj"


def test_wikipedia_ezs42_anchor():
    assert GH.geohash_wkt("POINT (-5.603027 42.605286)", 5) == "ezs42"
    lon_lo, lat_lo, lon_hi, lat_hi = GH.decode_bbox("ezs42")
    # the published ezs42 cell bounds (dyadic, exact)
    assert (lon_lo, lon_hi) == (-5.625, -5.5810546875)
    assert (lat_lo, lat_hi) == (42.5830078125, 42.626953125)


def test_prefix_property():
    full = GH.encode_point(10.40744, 57.64911, 20)
    for k in range(1, 20):
        assert GH.encode_point(10.40744, 57.64911, k) == full[:k]


# ---- st_geohash semantics ---------------------------------------------


def test_point_auto_precision_is_20_chars():
    h = GH.geohash_wkt("POINT (10 20)", 0)
    assert len(h) == 20
    assert h.startswith(GH.geohash_wkt("POINT (10 20)", 9))


def test_box_auto_precision_is_corner_common_prefix():
    box = "POLYGON ((10 20, 10.0001 20, 10.0001 20.0001, 10 20.0001, 10 20))"
    h = GH.geohash_wkt(box, 0)
    sw = GH.encode_point(10.0, 20.0, 20)
    ne = GH.encode_point(10.0001, 20.0001, 20)
    n = 0
    while n < 20 and sw[n] == ne[n]:
        n += 1
    assert h == sw[:n] and 0 < len(h) < 20


def test_straddling_box_auto_precision_is_empty_string():
    assert GH.geohash_wkt(
        "POLYGON ((-1 0, 1 0, 1 1, -1 1, -1 0))", 0
    ) == ""


def test_explicit_precision_encodes_bbox_center():
    box = "POLYGON ((-1 0, 1 0, 1 2, -1 2, -1 0))"
    assert GH.geohash_wkt(box, 8) == GH.encode_point(0.0, 1.0, 8)


def test_precision_caps_at_20():
    assert len(GH.geohash_wkt("POINT (10 20)", 99)) == 20


def test_out_of_range_is_loud_null():
    assert GH.geohash_wkt("POINT (190 0)", 5) is None
    assert GH.geohash_wkt("POINT (0 91)", 5) is None
    assert GH.geohash_wkt("POINT (-180.5 0)", 5) is None


def test_junk_empty_null_inputs():
    assert GH.geohash_wkt(None, 5) is None
    assert GH.geohash_wkt("POINT EMPTY", 5) is None
    assert GH.geohash_wkt("not wkt", 5) is None
    assert GH.geohash_wkt("POINT (nan 0)", 5) is None


# ---- decode directions -------------------------------------------------


def test_pointfromgeohash_center_is_exact_dyadic():
    assert (
        GH.pointfromgeohash_wkt("ezs42", None)
        == "POINT (-5.60302734375 42.60498046875)"
    )


def test_pointfromgeohash_precision_truncates():
    assert GH.pointfromgeohash_wkt("u4pruydqqvj", 3) == GH.pointfromgeohash_wkt(
        "u4p", 0
    )
    # <= 0 means the whole string
    assert GH.pointfromgeohash_wkt("u4p", -1) == GH.pointfromgeohash_wkt(
        "u4p", None
    )


def test_geomfromgeohash_is_ccw_cell_polygon():
    w = GH.geomfromgeohash_wkt("ezs42", 3)
    assert w == (
        "POLYGON ((-5.625 42.1875, -4.21875 42.1875, "
        "-4.21875 43.59375, -5.625 43.59375, -5.625 42.1875))"
    )


def test_invalid_base32_char_is_loud_null():
    # 'a', 'i', 'l', 'o' are not in the geohash alphabet
    for bad in ("eza42", "il0", "hello"):
        assert GH.pointfromgeohash_wkt(bad, None) is None
        assert GH.geomfromgeohash_wkt(bad, None) is None
    assert GH.pointfromgeohash_wkt("", None) is None
    assert GH.pointfromgeohash_wkt(None, None) is None


def test_uppercase_accepted():
    assert GH.pointfromgeohash_wkt("EZS42", None) == GH.pointfromgeohash_wkt(
        "ezs42", None
    )


def test_roundtrip_center_reencodes_to_same_cell():
    for h in ("u4pruydqqvj", "ezs42", "9q8yy", "s00000"):
        x, y = _xy(GH.pointfromgeohash_wkt(h, None))
        assert GH.encode_point(x, y, len(h)) == h


def test_cell_nesting_by_prefix():
    outer = GH.decode_bbox("u4p")
    inner = GH.decode_bbox("u4pru")
    assert outer[0] <= inner[0] and outer[1] <= inner[1]
    assert outer[2] >= inner[2] and outer[3] >= inner[3]
