"""Boundary-dissolved polygon union — the exact kernel behind
``st_union``'s PostGIS-shaped output (VERDICT r11 item 3).

The reference forwards ``ST_Union`` to PostGIS verbatim (reference
src/index.ts:44-63), whose GEOS union re-nodes overlapping boundaries
and returns ONE dissolved polygon per connected region. Until r11 the
engine's non-rectilinear union resolved overlap components into
point-set-exact but SEAMED pieces (disjoint decomposition parts whose
internal boundaries survive in the WKT). This module rebuilds the
dissolved shape exactly, on the same machinery ST_Polygonize proved
(functions/noding.py — exact rational noding, half-edge face walks):

1. **Arrangement faces.** All member rings (shells AND holes) go
   through ``noding.faces_frac``: the fully-noded arrangement's faces
   as Fraction rings, each walked interior-left (shell CCW, holes CW).
2. **Keep faces inside the union.** Each face takes one exact interior
   point (horizontal scanline strictly between vertex ordinates — no
   vertex or horizontal edge can sit on it, so every crossing is
   proper) and keeps the face iff the point is inside ≥1 member by the
   exact even-odd rule. A face interior never meets a member boundary
   (member boundaries are arrangement edges), so the test is never a
   boundary tie.
3. **Cancel interior seams.** Kept faces emit their rings as DIRECTED
   edges (interior-left). An arrangement edge between two kept faces
   appears once per direction and cancels; what survives is exactly
   the union's boundary, still oriented interior-left.
4. **Stitch rings.** The surviving directed edges are walked with the
   same CW-most-turn rule as the polygonize face walk (exact angle
   comparator, no atan2), so pinch points (regions touching at a
   single vertex) split into separate rings exactly as GEOS does.
   Positive rings are shells, negative rings attach as holes to the
   smallest strictly-containing shell.

The result: overlapping / edge-sharing simple polygons (holed members
included) dissolve into PostGIS's boundary shape — one polygon per
connected region, holes preserved, no internal seams — with every
coordinate an exact rational function of the inputs (float only at
serialization). Members with a self-intersecting ring are outside the
class and raise ``overlay._Unsupported``; ``union_ops`` keeps its
documented stacked-parts-with-RuntimeWarning fallback for those.

Scale shape: pure per-row kernel (called from the ``st_union`` pandas
UDFs); cost is quadratic in the component's own vertex count, a
property of the row set being unioned, not of the table.
"""

from __future__ import annotations

import math
from fractions import Fraction
from functools import cmp_to_key

from . import geometry as G
from . import overlay as _ov
from .geometry import Geometry
from .noding import _angle_cmp, assemble_shells_and_holes, faces_frac

FPt = tuple[Fraction, Fraction]


def _frac_rings(member: Geometry) -> list[list[FPt]]:
    """Member polygon's rings as closed Fraction rings. Raises
    ``overlay._Unsupported`` on non-finite coordinates — NaN passes the
    simplicity check (every comparison False) and inf survives bbox
    prescreens, so without this gate Fraction() would crash the whole
    UDF batch instead of falling back to the caller's stacked path
    (code-review r12)."""
    out = []
    for ring in member.coords:
        if not all(math.isfinite(x) and math.isfinite(y) for x, y in ring):
            raise _ov._Unsupported("dissolve: non-finite coordinate")
        c = [(Fraction(x), Fraction(y)) for x, y in ring]
        if c[0] != c[-1]:
            c.append(c[0])
        out.append(c)
    return out


def _point_in_rings(pt: FPt, rings: list[list[FPt]]) -> bool:
    """Exact even-odd containment of ``pt`` in the region bounded by
    ``rings`` (shell minus holes falls out of the parity). Uses the
    half-open crossing rule ``(y1 > py) != (y2 > py)``, which counts
    vertices on the ray once and skips horizontal edges — total and
    exact under Fractions. Callers guarantee ``pt`` is never ON a ring
    edge (face interior points can't be)."""
    px, py = pt
    cnt = 0
    for ring in rings:
        for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
            if (y1 > py) != (y2 > py):
                xc = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
                if xc > px:
                    cnt += 1
    return cnt % 2 == 1


def _interior_point(face: list[list[FPt]]) -> FPt:
    """One exact point strictly inside the face (shell minus holes).

    Scanline at a y strictly between two adjacent DISTINCT vertex
    ordinates of the face: no vertex and no horizontal edge can lie on
    it, so crossings with the face boundary are all proper and the
    midpoint of the first even-odd span is interior."""
    shell = face[0]
    ys_all = sorted({y for ring in face for _x, y in ring})
    sy_min = min(y for _x, y in shell)
    sy_max = max(y for _x, y in shell)
    for lo, hi in zip(ys_all, ys_all[1:]):
        if hi <= sy_min or lo >= sy_max:
            continue
        ystar = (lo + hi) / 2
        xs: list[Fraction] = []
        for ring in face:
            for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
                if (y1 > ystar) != (y2 > ystar):
                    xs.append(x1 + (ystar - y1) * (x2 - x1) / (y2 - y1))
        xs.sort()
        if len(xs) >= 2:
            return ((xs[0] + xs[1]) / 2, ystar)
    raise _ov._Unsupported("dissolve: face admits no interior scanline")


def _stitch_rings(dir_edges: set[tuple[FPt, FPt]]) -> list[list[FPt]]:
    """Closed interior-left rings from the surviving directed boundary
    edges: from edge (u, v), the next edge leaves v toward the CW-most
    direction from the reverse (v -> u) — the same tightest-left-turn
    rule as the polygonize face walk, so pinch points split rings the
    way GEOS does. Every directed edge is consumed exactly once."""
    out_map: dict[FPt, list[FPt]] = {}
    for a, b in dir_edges:
        out_map.setdefault(a, []).append(b)
    for v, outs in out_map.items():
        outs.sort(
            key=cmp_to_key(
                lambda p, q, v=v: _angle_cmp(
                    (p[0] - v[0], p[1] - v[1]), (q[0] - v[0], q[1] - v[1])
                )
            )
        )
    remaining = set(dir_edges)
    rings: list[list[FPt]] = []
    for start in sorted(dir_edges):
        if start not in remaining:
            continue
        ring = [start[0]]
        cur = start
        while True:
            remaining.discard(cur)
            u, v = cur
            ring.append(v)
            outs = [w for w in out_map[v] if (v, w) in remaining or (v, w) == start]
            if not outs:
                raise _ov._Unsupported("dissolve: boundary walk dead-ended")
            rev = (u[0] - v[0], u[1] - v[1])
            # first available direction strictly CW of rev: in the
            # CCW-sorted candidate list, the predecessor of rev's
            # angular slot
            idx = 0
            while idx < len(outs) and _angle_cmp(
                (outs[idx][0] - v[0], outs[idx][1] - v[1]), rev
            ) < 0:
                idx += 1
            cur = (v, outs[(idx - 1) % len(outs)])
            if cur == start:
                break
        rings.append(ring)
    return rings


def dissolve_polygons(members: list[Geometry]) -> list[Geometry]:
    """Boundary-dissolved union of Polygon members (simple rings; holed
    members fine). Returns the dissolved Polygon parts (shells CCW with
    their holes CW, exact coordinates floated at output). Raises
    ``overlay._Unsupported`` for members outside the class (any
    non-simple ring) — callers fall back to their documented stacked
    path."""
    member_rings: list[list[list[FPt]]] = []
    chains: list[list[FPt]] = []
    for m in members:
        if m.kind != "Polygon":
            raise _ov._Unsupported("dissolve: polygon members only")
        for ring in m.coords:
            closed = list(ring)
            if closed and closed[0] != closed[-1]:
                closed.append(closed[0])
            if len(closed) < 4 or not _ov._is_simple_ring(closed):
                raise _ov._Unsupported("dissolve: non-simple member ring")
        fr = _frac_rings(m)
        member_rings.append(fr)
        chains.extend(fr)

    faces = faces_frac(chains)
    kept = []
    for f in faces:
        pt = _interior_point(f)  # once per face, not per member
        if any(_point_in_rings(pt, mr) for mr in member_rings):
            kept.append(f)
    if not kept:
        raise _ov._Unsupported("dissolve: no face inside any member")

    dir_edges: set[tuple[FPt, FPt]] = set()
    for face in kept:
        for ring in face:
            for a, b in zip(ring, ring[1:]):
                if a == b:
                    continue
                if (b, a) in dir_edges:
                    dir_edges.remove((b, a))  # interior seam: cancels
                else:
                    dir_edges.add((a, b))
    rings = _stitch_rings(dir_edges)
    # shell/hole split + smallest-containing-shell attachment shared
    # with the polygonize assembly; strict: an unattachable hole is an
    # exact-or-NULL failure here, not an unbounded-ring artifact
    polys = assemble_shells_and_holes(rings, strict=True)
    return [
        Geometry(
            "Polygon", [[(float(x), float(y)) for x, y in r] for r in rings_]
        )
        for rings_ in polys
    ]


def frac_segments(g: Geometry) -> list[tuple[FPt, FPt]] | None:
    """Boundary segments as exact Fraction pairs, or None for
    non-finite coordinates (callers treat that as "cannot share
    linework" rather than crashing the batch — code-review r12).
    Compute ONCE per part and reuse across the O(n²) adjacency loop."""
    try:
        rings = _frac_rings(g)
    except _ov._Unsupported:
        return None
    return [
        (p, q) for ring in rings for p, q in zip(ring, ring[1:]) if p != q
    ]


def boundaries_share_linework(
    a: Geometry,
    b: Geometry,
    asegs: list[tuple[FPt, FPt]] | None = None,
    bsegs: list[tuple[FPt, FPt]] | None = None,
) -> bool:
    """True when two polygons' boundaries share a positive-length
    collinear span — PostGIS dissolves edge-adjacent polygons into one
    even when their interiors never overlap, so the union's overlap
    components must connect them (bbox-prescreened; exact collinear
    interval test shared with ST_SharedPaths). Pass precomputed
    ``frac_segments`` to amortize the Fraction conversion across an
    adjacency loop."""
    (ax0, ay0, ax1, ay1) = G.bbox(a)
    (bx0, by0, bx1, by1) = G.bbox(b)
    if not (ax0 <= bx1 and bx0 <= ax1 and ay0 <= by1 and by0 <= ay1):
        return False
    from .split import _linear_overlap

    if asegs is None:
        asegs = frac_segments(a)
    if bsegs is None:
        bsegs = frac_segments(b)
    if asegs is None or bsegs is None:
        return False
    return _linear_overlap(asegs, bsegs)
