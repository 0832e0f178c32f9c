"""Property-based tests (hypothesis) for the geometry kernel — the
invariants every spatial UDF leans on, checked over generated inputs
instead of hand-picked cases."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import geometry as G

# Physical coordinate magnitudes: zero or |v| ∈ [1e-9, 1e6]. Tinier
# values make squared terms underflow — a regime no real CRS reaches and
# one we deliberately don't chase (the kernel stays bit-identical to the
# DuckDB oracle's sqrt(dx²+dy²) formulation).
coord = st.one_of(
    st.just(0.0),
    st.floats(min_value=1e-9, max_value=1e6, allow_nan=False),
    st.floats(min_value=-1e6, max_value=-1e-9, allow_nan=False),
)


@st.composite
def boxes(draw):
    x0 = draw(coord)
    y0 = draw(coord)
    w = draw(st.floats(min_value=1e-3, max_value=1e6, allow_nan=False))
    h = draw(st.floats(min_value=1e-3, max_value=1e6, allow_nan=False))
    return G.Geometry.box(x0, y0, x0 + w, y0 + h)


def _scale(b) -> float:
    minx, miny, maxx, maxy = G.bbox(b)
    return max(1.0, abs(minx), abs(miny), abs(maxx), abs(maxy))


@settings(max_examples=200, deadline=None)
@given(coord, coord)
def test_point_wkt_roundtrip_exact(x, y):
    """WKT serialize∘parse must be the identity on coordinates — parity
    with the DuckDB oracle depends on this being bit-exact."""
    g = G.Geometry.point(x, y)
    g2 = G.parse_wkt(G.to_wkt(g))
    assert g2.coords == (x, y)


@settings(max_examples=100, deadline=None)
@given(boxes())
def test_box_wkt_roundtrip(b):
    b2 = G.parse_wkt(G.to_wkt(b))
    assert b2.kind == "Polygon"
    assert G.bbox(b2) == G.bbox(b)


@settings(max_examples=200, deadline=None)
@given(coord, coord, coord, coord)
def test_distance_metric_properties(x1, y1, x2, y2):
    p1, p2 = G.Geometry.point(x1, y1), G.Geometry.point(x2, y2)
    d = G.distance(p1, p2)
    assert d >= 0
    assert G.distance(p2, p1) == d  # symmetry
    assert G.distance(p1, p1) == 0.0  # identity
    # planar definition; the kernel keeps sqrt(dx²+dy²) bit-identical to
    # the DuckDB oracle expressions, so allow denormal underflow (the one
    # regime where math.dist's rescaling differs)
    assert math.isclose(d, math.dist((x1, y1), (x2, y2)), rel_tol=1e-12, abs_tol=1e-300)


@settings(max_examples=100, deadline=None)
@given(boxes(), coord, coord)
def test_within_implies_intersects_and_zero_distance(b, x, y):
    p = G.Geometry.point(x, y)
    if G.within(p, b):
        assert G.intersects(p, b)
        assert G.contains(b, p)
        assert G.distance(p, b) == 0.0


@settings(max_examples=100, deadline=None)
@given(boxes(), coord, coord)
def test_within_consistent_with_bbox(b, x, y):
    """A point inside the polygon must be inside its bbox — the invariant
    the bbox-prefilter spatial joins rely on (prefilter may only produce
    false positives, never false negatives)."""
    p = G.Geometry.point(x, y)
    if G.within(p, b):
        minx, miny, maxx, maxy = G.bbox(b)
        assert minx <= x <= maxx and miny <= y <= maxy


@settings(max_examples=100, deadline=None)
@given(boxes())
def test_box_area_centroid_dimension(b):
    minx, miny, maxx, maxy = G.bbox(b)
    # shoelace cancellation error scales with (coordinate magnitude)²
    area_tol = 64 * math.ulp(_scale(b) ** 2)
    assert abs(G.area(b) - (maxx - minx) * (maxy - miny)) <= max(
        area_tol, 1e-9 * abs(G.area(b))
    )
    cx, cy = G.centroid(b)
    # shoelace centroid of a thin box amplifies cancellation by scale/area;
    # 1 ppm of coordinate magnitude is the honest fp-noise envelope
    eps = 1e-6 * _scale(b)
    assert minx - eps <= cx <= maxx + eps and miny - eps <= cy <= maxy + eps
    assert G.dimension(b) == 2
    assert G.geometry_type(b) == "ST_Polygon"


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40))
def test_parse_wkt_never_raises_on_garbage(s):
    """Malformed WKT must degrade to None (→ SQL NULL), never raise —
    a 100 TB run cannot die on one bad row."""
    try:
        g = G.parse_wkt(s)
    except Exception as e:  # noqa: BLE001
        raise AssertionError(f"parse_wkt raised {e!r} on {s!r}") from e
    if g is not None:
        # anything accepted must re-serialize
        assert isinstance(G.to_wkt(g), str)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=60))
def test_xml_geometry_never_raises_on_garbage(s):
    try:
        g = G.from_xml_geometry(s)
    except Exception as e:  # noqa: BLE001
        raise AssertionError(f"from_xml_geometry raised {e!r} on {s!r}") from e
    if g is not None:
        assert isinstance(G.to_wkt(g), str)


@st.composite
def multi_geometries(draw):
    """Random multi-part geometries over integer-ish coords (exact WKT
    round-trips need exactly-representable numbers)."""
    ic = st.integers(min_value=-1000, max_value=1000).map(float)
    kind = draw(st.sampled_from(["MultiPoint", "MultiLineString", "MultiPolygon", "GeometryCollection"]))
    if kind == "MultiPoint":
        pts = draw(st.lists(st.tuples(ic, ic), min_size=1, max_size=5))
        return G.Geometry("MultiPoint", pts)
    if kind == "MultiLineString":
        lines = draw(
            st.lists(st.lists(st.tuples(ic, ic), min_size=2, max_size=4), min_size=1, max_size=3)
        )
        return G.Geometry("MultiLineString", lines)
    if kind == "MultiPolygon":
        polys = []
        for _ in range(draw(st.integers(min_value=1, max_value=3))):
            x0, y0 = draw(ic), draw(ic)
            w, h = draw(st.integers(min_value=1, max_value=50)), draw(st.integers(min_value=1, max_value=50))
            polys.append(G.Geometry.box(x0, y0, x0 + w, y0 + h).coords)
        return G.Geometry("MultiPolygon", polys)
    subs = [
        G.Geometry("Point", (draw(ic), draw(ic))),
        G.Geometry("LineString", [(draw(ic), draw(ic)), (draw(ic), draw(ic))]),
    ]
    return G.Geometry("GeometryCollection", subs)


@settings(max_examples=200, deadline=None)
@given(multi_geometries())
def test_multipart_wkt_roundtrip_property(g):
    parsed = G.parse_wkt(G.to_wkt(g))
    assert parsed is not None and parsed.kind == g.kind
    assert G.to_wkt(parsed) == G.to_wkt(g)
    # bbox / points survive the round trip
    assert G.bbox(parsed) == G.bbox(g)


@settings(max_examples=100, deadline=None)
@given(multi_geometries())
def test_multipart_geojson_roundtrip_property(g):
    import json as _json

    back = G.from_geojson(_json.loads(G.to_geojson(g)))
    assert back is not None and G.to_wkt(back) == G.to_wkt(g)


@settings(max_examples=500, deadline=None)
@given(st.text(max_size=60))
def test_parse_wkt_never_raises_on_junk(s):
    """parse_wkt is the floor under every null-safe UDF: arbitrary junk
    must yield None or a Geometry, never an exception."""
    g = G.parse_wkt(s)
    assert g is None or isinstance(g, G.Geometry)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="POLYGONLINESTRINGMULTI Y(),.0123456789-", max_size=80))
def test_parse_wkt_never_raises_on_wkt_shaped_junk(s):
    """Near-miss WKT (right alphabet, wrong structure) is the harder
    case: truncated rings, stray parens, half-numbers."""
    g = G.parse_wkt(s)
    assert g is None or isinstance(g, G.Geometry)
