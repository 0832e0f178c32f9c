"""Tessellations: ST_DelaunayTriangles and ST_VoronoiPolygons.

Reference parity: PostGIS names the reference forwards verbatim (F12,
src/index.ts:44-63). Both are per-geometry kernels over the geometry's
DISTINCT vertices, like GEOS.

- ``st_delaunaytriangles(g)`` — Bowyer-Watson incremental Delaunay
  triangulation (Bowyer 1981 / Watson 1981, the standard published
  method) with EXACT in-circumcircle and orientation predicates
  (``fractions.Fraction`` — coordinates convert exactly from binary64,
  so there is no epsilon anywhere). Points insert in sorted (x, y)
  order, which makes cocircular tie-breaks (the strict-inside test
  leaves the existing diagonal) a pure function of the input. Returns
  ``GEOMETRYCOLLECTION (POLYGON …)``; fewer than 3 distinct points or
  a fully collinear input → ``GEOMETRYCOLLECTION EMPTY`` (GEOS returns
  an empty collection for the degenerate classes too).

- ``st_voronoipolygons(g)`` — one convex cell per distinct vertex,
  built by half-plane clipping of the clip envelope against the
  perpendicular bisector of the site and EVERY other site
  (Sutherland–Hodgman over Fraction-exact lines; all-pairs rather than
  Delaunay-dual so collinear/cocircular sites — where no triangulation
  exists — still get their correct cells). Clip envelope convention
  (documented engine behavior; PostGIS extends "about 50%" with an
  ``extend_to`` override we don't take): the input envelope expanded on
  every side by ``max(width, height)``, or by 1.0 when the envelope is
  degenerate (≤1 distinct point or zero extent in both axes). Total
  cell area therefore always equals the clip-envelope area — the
  oracle invariant q165 checks.

Canonical output order (ours, stated because PostGIS's is arbitrary):
triangles sort by their canonicalized ring (each ring CCW, starting at
its lexicographically smallest vertex); Voronoi cells sort by their
site (x, y). This makes both functions pure functions of the WKT.

Scale shape: map-only Arrow-batched pandas UDFs, no shuffle, no driver
participation. Per-row cost: Delaunay O(n²) inserts × exact-arithmetic
incircle; Voronoi O(n² · cell size). These are per-ROW kernels over
row-sized vertex counts — at 100 TB the cost is linear in rows and
embarrassingly parallel, same class as buffer/makevalid.
"""

from __future__ import annotations

from fractions import Fraction

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ._register_once import once_per_session
from . import geometry as G
from . import overlay as _ov
from .geometry import Geometry, Point

FPoint = tuple[Fraction, Fraction]


# ---------------------------------------------------------------------------
# exact predicates
# ---------------------------------------------------------------------------


def _orient(a: FPoint, b: FPoint, c: FPoint) -> int:
    """Sign of the cross product (b-a) × (c-a): 1 CCW, -1 CW, 0 collinear."""
    v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
    return 1 if v > 0 else (-1 if v < 0 else 0)


def _in_circumcircle(a: FPoint, b: FPoint, c: FPoint, d: FPoint) -> bool:
    """True iff d lies STRICTLY inside the circumcircle of CCW (a,b,c).
    Exact 3×3 determinant over Fractions; on-circle (det == 0) is
    outside, which is what makes cocircular tie-breaks deterministic."""
    adx, ady = a[0] - d[0], a[1] - d[1]
    bdx, bdy = b[0] - d[0], b[1] - d[1]
    cdx, cdy = c[0] - d[0], c[1] - d[1]
    ad = adx * adx + ady * ady
    bd = bdx * bdx + bdy * bdy
    cd = cdx * cdx + cdy * cdy
    det = (
        adx * (bdy * cd - cdy * bd)
        - ady * (bdx * cd - cdx * bd)
        + ad * (bdx * cdy - cdx * bdy)
    )
    return det > 0


# ---------------------------------------------------------------------------
# Delaunay (Bowyer-Watson)
# ---------------------------------------------------------------------------


def _hull_area2(pts: list[FPoint]) -> Fraction:
    """Twice the convex-hull area of sorted distinct points — exact
    (Andrew monotone chain over Fractions)."""
    if len(pts) < 3:
        return Fraction(0)
    lower: list[FPoint] = []
    for p in pts:
        while len(lower) >= 2 and _orient(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[FPoint] = []
    for p in reversed(pts):
        while len(upper) >= 2 and _orient(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = lower[:-1] + upper[:-1]
    acc = Fraction(0)
    for i in range(len(hull)):
        x1, y1 = hull[i]
        x2, y2 = hull[(i + 1) % len(hull)]
        acc += x1 * y2 - x2 * y1
    return abs(acc)


def _bowyer_watson(
    pts: list[FPoint], m: Fraction
) -> list[tuple[FPoint, FPoint, FPoint]]:
    """One Bowyer-Watson pass with super-triangle margin ``m``."""
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    minx, maxx, miny, maxy = min(xs), max(xs), min(ys), max(ys)
    s1: FPoint = (minx - m, miny - m)
    s2: FPoint = (maxx + 3 * m, miny - m)
    s3: FPoint = (minx - m, maxy + 3 * m)
    supers = {s1, s2, s3}
    tris: list[tuple[FPoint, FPoint, FPoint]] = [(s1, s2, s3)]
    for p in pts:
        bad = [t for t in tris if _in_circumcircle(t[0], t[1], t[2], p)]
        # cavity boundary = edges of bad triangles not shared by two
        edge_count: dict[tuple[FPoint, FPoint], int] = {}
        for t in bad:
            for k in _tri_edges(t):
                edge_count[k] = edge_count.get(k, 0) + 1
        boundary = [e for e, n in edge_count.items() if n == 1]
        tris = [t for t in tris if t not in bad]
        for a, b in boundary:
            if _orient(a, b, p) > 0:
                tris.append((a, b, p))
            elif _orient(a, b, p) < 0:
                tris.append((b, a, p))
            # a collinear boundary edge is unreachable under exact
            # arithmetic (p on line ab strictly inside a circle through
            # a and b lies strictly inside the open chord, making BOTH
            # adjacent faces bad, so (a,b) is never a boundary edge);
            # if it ever fired the coverage check below would catch the
            # hole and retry/raise
    return [t for t in tris if not (set(t) & supers)]


# Work bound (VERDICT r13 item 7, the grids-family _MAX_CELLS idiom):
# both kernels are O(n²) in EXACT Fraction arithmetic per row — 400
# sites ≈ 16-28 s on this container. Loud ValueError (every UDF maps
# it to NULL) instead of a stalled executor; raise the constant if a
# deployment genuinely needs denser per-row tessellations.
_MAX_TESS_SITES = 256


def _site_gate(n: int) -> None:
    if n > _MAX_TESS_SITES:
        raise ValueError(
            f"tessellation site budget exceeded ({n} > {_MAX_TESS_SITES})"
        )


def _site_pregate(points: list) -> None:
    """Gate BEFORE any Fraction lifting (code-review r14: the exact
    dedup/sort of a multi-million-vertex row cost seconds before the
    post-dedup gate fired). Distinct floats == distinct Fractions
    (binary64 converts exactly; -0.0 and 0.0 collide in both), so the
    cheap float-set count is the same number the exact gate sees."""
    if len(points) > _MAX_TESS_SITES:
        _site_gate(len(set(points)))


def delaunay_triangles(points: list[Point]) -> list[tuple[FPoint, FPoint, FPoint]]:
    """Delaunay triangulation of the distinct input points as a list of
    CCW vertex triples. [] for <3 distinct or fully collinear input.
    Raises ValueError past the _MAX_TESS_SITES work bound.

    A FINITE super-triangle cannot be placed safely a priori: a thin
    (near-collinear) real triangle has an arbitrarily large circumcircle
    that can swallow the fake vertices, silently dropping the triangle
    from the result (found by the r11 review: a 1:200 sliver returned
    EMPTY). Instead of a magic margin, each pass is VERIFIED exactly —
    Σ 2·triangle areas must equal the hull's 2·area (both Fractions, so
    the check is exact: every real face that survives has an empty
    circumcircle w.r.t. the real sites, and full hull coverage means
    none was lost to a super) — and on failure the margin grows 1024×.
    Termination: the true Delaunay circumradii of a fixed input are
    finite, so some margin puts the supers outside all of them; the cap
    is a loud RuntimeError (NULL at the SQL surface), never a silently
    truncated triangulation."""
    _site_pregate(points)
    pts: list[FPoint] = sorted({(Fraction(x), Fraction(y)) for x, y in points})
    _site_gate(len(pts))
    if len(pts) < 3:
        return []
    if all(_orient(pts[0], pts[1], p) == 0 for p in pts[2:]):
        return []
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    m = max(max(xs) - min(xs), max(ys) - min(ys), Fraction(1)) * 16
    want = _hull_area2(pts)
    for _attempt in range(8):
        tris = _bowyer_watson(pts, m)
        got = Fraction(0)
        for a, b, c in tris:
            got += abs(
                (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            )
        if got == want:
            return tris
        m *= 1024
    raise RuntimeError("delaunay: super-triangle margin failed to converge")


def _canon_ring(tri: tuple[FPoint, FPoint, FPoint]) -> list[FPoint]:
    """CCW closed ring starting at the lexicographically smallest vertex."""
    a, b, c = tri
    v = [a, b, c] if _orient(a, b, c) > 0 else [a, c, b]
    i = v.index(min(v))
    v = v[i:] + v[:i]
    return v + [v[0]]


def _float_ring(ring: list[FPoint]) -> list[Point]:
    return [(float(x), float(y)) for x, y in ring]


def delaunay_geom(g: Geometry) -> Geometry | None:
    tris = delaunay_triangles(G._points(g))
    rings = sorted(_canon_ring(t) for t in tris)
    return Geometry(
        "GeometryCollection",
        [Geometry("Polygon", [_float_ring(r)]) for r in rings],
    )


# ---------------------------------------------------------------------------
# Voronoi (all-pairs half-plane clipping)
# ---------------------------------------------------------------------------


def _clip_halfplane(
    poly: list[FPoint], a: Fraction, b: Fraction, c: Fraction
) -> list[FPoint]:
    """Sutherland-Hodgman: keep the side a·x + b·y <= c of an OPEN
    convex ring (no repeated tail vertex). Exact over Fractions."""
    if not poly:
        return []
    out: list[FPoint] = []
    n = len(poly)
    for i in range(n):
        p, q = poly[i], poly[(i + 1) % n]
        fp = a * p[0] + b * p[1] - c
        fq = a * q[0] + b * q[1] - c
        if fp <= 0:
            out.append(p)
        if (fp < 0 < fq) or (fq < 0 < fp):
            t = fp / (fp - fq)
            out.append((p[0] + t * (q[0] - p[0]), p[1] + t * (q[1] - p[1])))
    # collapse exact duplicates the clip can introduce at vertices
    dedup: list[FPoint] = []
    for v in out:
        if not dedup or v != dedup[-1]:
            dedup.append(v)
    if dedup and dedup[0] == dedup[-1]:
        dedup.pop()
    return dedup


def voronoi_cells(points: list[Point]) -> list[tuple[FPoint, list[FPoint]]]:
    """(site, open CCW cell ring) per distinct site, sites sorted."""
    _site_pregate(points)
    pts: list[FPoint] = sorted({(Fraction(x), Fraction(y)) for x, y in points})
    _site_gate(len(pts))
    if not pts:
        return []
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    minx, maxx, miny, maxy = min(xs), max(xs), min(ys), max(ys)
    pad = max(maxx - minx, maxy - miny)
    if pad == 0:
        pad = Fraction(1)
    x0, x1 = minx - pad, maxx + pad
    y0, y1 = miny - pad, maxy + pad
    box: list[FPoint] = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]  # CCW
    cells = []
    for s in pts:
        cell = box
        for o in pts:
            if o == s:
                continue
            # |p-s|² <= |p-o|²  ⇔  2(o-s)·p <= |o|² - |s|²
            a = 2 * (o[0] - s[0])
            b = 2 * (o[1] - s[1])
            c = o[0] * o[0] + o[1] * o[1] - s[0] * s[0] - s[1] * s[1]
            cell = _clip_halfplane(cell, a, b, c)
            if not cell:
                break
        if len(cell) >= 3:
            cells.append((s, cell))
    return cells


def voronoi_geom(g: Geometry) -> Geometry | None:
    polys = []
    for _site, cell in voronoi_cells(G._points(g)):
        i = cell.index(min(cell))
        ring = cell[i:] + cell[:i]
        polys.append(Geometry("Polygon", [_float_ring(ring + [ring[0]])]))
    return Geometry("GeometryCollection", polys)


# ---------------------------------------------------------------------------
# concave hull (chi-shape erosion of the Delaunay triangulation)
# ---------------------------------------------------------------------------


def _elen2(a: FPoint, b: FPoint) -> Fraction:
    dx, dy = a[0] - b[0], a[1] - b[1]
    return dx * dx + dy * dy


def _tri_edges(t):
    """The triangle's three edges, endpoint-normalized (min, max)."""
    for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
        yield (min(e), max(e))


def _border_of(live) -> dict:
    """border edge → its unique live triangle."""
    edge_faces: dict[tuple[FPoint, FPoint], list] = {}
    for t in live:
        for e in _tri_edges(t):
            edge_faces.setdefault(e, []).append(t)
    return {e: fs[0] for e, fs in edge_faces.items() if len(fs) == 1}


def concave_hull_geom(
    g: Geometry, ratio: float, allow_holes: bool = False
) -> Geometry | None:
    """Chi-shape concave hull (Duckham et al. 2008, the algorithm GEOS's
    ConcaveHullOfPoints descends from): start from the Delaunay
    triangulation, repeatedly remove the border triangle whose border
    edge is the LONGEST above the length threshold, provided removal is
    REGULAR (the exposed vertex is not already on the boundary — which
    keeps the region simply connected and every input point on or
    inside the hull). Threshold = lmin + ratio·(lmax − lmin) over the
    Delaunay edge lengths, so ratio=1 is the convex hull and ratio=0
    erodes maximally. Degenerate inputs (<3 distinct points, collinear)
    echo their convex hull, as PostGIS does.

    PostGIS 3.3+ parameter mapping (VERDICT r13 item 5, pinned): our
    ``ratio`` IS ``param_pctconvex`` — PostGIS forwards it verbatim to
    GEOS ConcaveHullOfPoints' ``maxEdgeLengthRatio``, whose target edge
    length is the SAME ``lmin + ratio·(lmax − lmin)`` interpolation
    over the Delaunay edge lengths (JTS ConcaveHull, Martin Davis
    2022). Residual divergence is erosion tie-order on equal-length
    candidate edges (ours is the deterministic exact-Fraction sort
    below; GEOS's is priority-queue insertion order) — oracle fixtures
    keep the decisive candidate unique, the registry tie lesson. Thresholding compares
    squared lengths NORMALIZED by the exact maximum (a Fraction
    division, so astronomically large coordinates cannot overflow the
    float conversion — code-review r11); candidate order sorts the
    exact Fraction squared lengths, coordinates as the tie-break.

    ``allow_holes=True`` (PostGIS param_allow_holes, r12): erosion may
    also DIG — remove an interior triangle (no border edge) whose
    longest edge is above threshold when all three vertices are off
    every boundary, creating a hole whose border then erodes by the
    same regular rule; vertex-disjointness keeps the outer ring and
    the holes simple and mutually untouching. The remaining
    triangulation re-assembles through the exact boundary-dissolve
    kernel (functions/dissolve.py), so the holed output carries the
    same seam-free shape st_union produces."""
    if ratio is None or not (0.0 <= float(ratio) <= 1.0):
        return None
    tris = delaunay_triangles(G._points(g))
    if not tris:
        return G.convex_hull(g)
    edges_all = {e for t in tris for e in _tri_edges(t)}
    l2max = max(_elen2(a, b) for a, b in edges_all)
    l2min = min(_elen2(a, b) for a, b in edges_all)
    if float(ratio) >= 1.0:
        thr2n = 1.0  # exact: nothing exceeds the longest edge
    else:
        lmin_n = float(l2min / l2max) ** 0.5  # ∈ (0, 1]
        thrn = lmin_n + float(ratio) * (1.0 - lmin_n)
        thr2n = thrn * thrn

    def above(e) -> bool:
        l2 = _elen2(*e)
        return float(l2 / l2max) > thr2n if thr2n < 1.0 else l2 > l2max

    live = set(tris)
    while True:
        border = _border_of(live)
        bverts = {v for e in border for v in e}
        candidates = [
            (_elen2(*e), e, border[e], False) for e in border if above(e)
        ]
        if allow_holes:
            border_tris = set(border.values())
            for t in live:
                if t in border_tris:
                    continue
                e = max(_tri_edges(t), key=lambda e_: (_elen2(*e_), e_))
                if above(e):
                    candidates.append((_elen2(*e), e, t, True))
        # longest first (exact), coordinates as the deterministic tie-break
        candidates.sort(key=lambda x: (-x[0], x[1]))
        removed = False
        for _l2, e, t, digs in candidates:
            if digs:
                # digging a NEW hole: every vertex must be off every
                # boundary so rings stay simple and mutually disjoint
                if any(p in bverts for p in t):
                    continue
            else:
                (v,) = [p for p in t if p not in e]
                if v in bverts:
                    continue  # irregular: exposing v would pinch the region
            if len(live) == 1:
                break  # never erode the last triangle away
            live.discard(t)
            removed = True
            break
        if not removed:
            break
    if allow_holes:
        # re-assemble shell + holes through the exact boundary-dissolve
        # kernel: adjacent triangles share whole Delaunay edges, so the
        # seams cancel and the walk returns the holed chi-shape
        from . import dissolve as _dis

        polys = _dis.dissolve_polygons(
            [
                Geometry("Polygon", [_float_ring(_canon_ring(t))])
                for t in sorted(live)
            ]
        )
        if len(polys) == 1:
            return polys[0]
        return Geometry("MultiPolygon", [p.coords for p in polys])
    # boundary walk: border edges of the remaining triangulation form
    # one simple ring (regularity invariant)
    border_edges = list(_border_of(live))
    nbr: dict[FPoint, list[FPoint]] = {}
    for a, b in border_edges:
        nbr.setdefault(a, []).append(b)
        nbr.setdefault(b, []).append(a)
    start = min(nbr)
    ring = [start]
    prev = None
    cur = start
    while True:
        nxts = [p for p in nbr[cur] if p != prev]
        nxt = nxts[0] if nxts else prev
        if nxt == start:
            break
        ring.append(nxt)
        prev, cur = cur, nxt
    fring = _float_ring(ring)
    # orient CCW (shoelace) for a canonical polygon
    area2 = sum(
        fring[i][0] * fring[(i + 1) % len(fring)][1]
        - fring[(i + 1) % len(fring)][0] * fring[i][1]
        for i in range(len(fring))
    )
    if area2 < 0:
        fring = [fring[0]] + fring[1:][::-1]
    return Geometry("Polygon", [fring + [fring[0]]])


# ---------------------------------------------------------------------------
# vectorized SQL surface
# ---------------------------------------------------------------------------


def _is_empty_wkt(w) -> bool:
    return w is not None and bool(_ov._EMPTY_RE.match(str(w).strip().upper()))


def _gc_wkt(gc: Geometry | None) -> str | None:
    if gc is None:
        return None
    if not gc.coords:
        return "GEOMETRYCOLLECTION EMPTY"
    return G.to_wkt(gc)


@pandas_udf(StringType())
def st_delaunaytriangles(wkt: pd.Series) -> pd.Series:
    out = []
    for w in wkt:
        try:
            if _is_empty_wkt(w):
                out.append("GEOMETRYCOLLECTION EMPTY")
                continue
            g = G.parse_wkt_opt(w)
            out.append(None if g is None else _gc_wkt(delaunay_geom(g)))
        except Exception:
            out.append(None)
    return pd.Series(out, dtype=object)


@pandas_udf(StringType())
def st_voronoipolygons(wkt: pd.Series) -> pd.Series:
    out = []
    for w in wkt:
        try:
            if _is_empty_wkt(w):
                out.append("GEOMETRYCOLLECTION EMPTY")
                continue
            g = G.parse_wkt_opt(w)
            out.append(None if g is None else _gc_wkt(voronoi_geom(g)))
        except Exception:
            out.append(None)
    return pd.Series(out, dtype=object)


@pandas_udf(StringType())
def st_concavehull(wkt: pd.Series, ratio: pd.Series) -> pd.Series:
    import math as _math

    out = []
    for w, r in zip(wkt, ratio):
        try:
            # the ratio gate runs before the empty-geometry echo: an
            # out-of-range/NULL/NaN ratio is NULL for EVERY geometry
            # (code-review r11)
            if (
                r is None
                or (isinstance(r, float) and _math.isnan(r))
                or not (0.0 <= float(r) <= 1.0)
            ):
                out.append(None)
                continue
            if _is_empty_wkt(w):
                out.append("POLYGON EMPTY")
                continue
            g = G.parse_wkt_opt(w)
            h = concave_hull_geom(g, float(r)) if g is not None else None
            out.append(None if h is None else G.to_wkt(h))
        except Exception:
            out.append(None)
    return pd.Series(out, dtype=object)


@pandas_udf(StringType())
def st_concavehull_holes(wkt: pd.Series, ratio: pd.Series) -> pd.Series:
    """PostGIS ST_ConcaveHull(geom, ratio, param_allow_holes := true) —
    a separate name because UDFs cannot overload arity (the
    st_makepolygon_holes precedent)."""
    import math as _math

    out = []
    for w, r in zip(wkt, ratio):
        try:
            if (
                r is None
                or (isinstance(r, float) and _math.isnan(r))
                or not (0.0 <= float(r) <= 1.0)
            ):
                out.append(None)
                continue
            if _is_empty_wkt(w):
                out.append("POLYGON EMPTY")
                continue
            g = G.parse_wkt_opt(w)
            h = (
                concave_hull_geom(g, float(r), allow_holes=True)
                if g is not None
                else None
            )
            out.append(None if h is None else G.to_wkt(h))
        except Exception:
            out.append(None)
    return pd.Series(out, dtype=object)


ALL_TESSELLATE_FUNCTIONS = {
    "st_delaunaytriangles": st_delaunaytriangles,
    "st_voronoipolygons": st_voronoipolygons,
    "st_concavehull": st_concavehull,
    "st_concavehull_holes": st_concavehull_holes,
}


@once_per_session
def register_tessellate_functions(spark: SparkSession) -> None:
    for name, fn in ALL_TESSELLATE_FUNCTIONS.items():
        spark.udf.register(name, fn)
