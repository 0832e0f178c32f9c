"""Property fuzzes for the r8 accessor / linear-referencing / editor
families: randomized inputs checked against brute-force or invariant
truths (the same strategy as the overlay grid-truth fuzzes)."""

from __future__ import annotations

import math
import random

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    accessors as A,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    editors as ED,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    geometry as G,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    linearref as L,
)


def _random_multiline(rng: random.Random) -> tuple[str, list[list[tuple]]]:
    """Random integer MULTILINESTRING whose parts may share endpoints
    (small coordinate pool forces collisions)."""
    parts = []
    for _ in range(rng.randint(1, 6)):
        n = rng.randint(2, 5)
        seq = []
        while len(seq) < n:
            p = (rng.randint(0, 4), rng.randint(0, 4))
            if not seq or p != seq[-1]:
                seq.append(p)
        parts.append(seq)
    wkt = "MULTILINESTRING (" + ", ".join(
        "(" + ", ".join(f"{x} {y}" for x, y in seq) + ")" for seq in parts
    ) + ")"
    return wkt, parts


def test_boundary_mod2_matches_bruteforce_endpoint_parity():
    """SQL/MM: a point is on the boundary of a multiline iff it is an
    endpoint of an ODD number of the non-closed parts."""
    rng = random.Random(813)
    for _ in range(300):
        wkt, parts = _random_multiline(rng)
        counts: dict[tuple, int] = {}
        for seq in parts:
            if seq[0] == seq[-1]:
                continue  # closed parts have no boundary
            for p in (seq[0], seq[-1]):
                counts[p] = counts.get(p, 0) + 1
        expected = {p for p, c in counts.items() if c % 2 == 1}
        out = A.boundary_wkt(wkt)
        if not expected:
            assert out == "MULTIPOINT EMPTY", (wkt, out)
        else:
            g = G.parse_wkt(out)
            assert g.kind == "MultiPoint"
            assert {(int(x), int(y)) for x, y in g.coords} == expected, (wkt, out)


def test_geometryn_enumerates_every_part():
    rng = random.Random(47)
    for _ in range(100):
        wkt, parts = _random_multiline(rng)
        n = A.num_geometries(wkt)
        assert n == len(parts)
        for i, seq in enumerate(parts, 1):
            part_wkt = A.geometry_n(wkt, i)
            g = G.parse_wkt(part_wkt)
            assert g.kind == "LineString" and [
                (int(x), int(y)) for x, y in g.coords
            ] == seq
        assert A.geometry_n(wkt, n + 1) is None


def test_pointn_enumerates_every_vertex_both_directions():
    rng = random.Random(7)
    for _ in range(100):
        n = rng.randint(2, 8)
        seq = []
        while len(seq) < n:
            p = (rng.randint(-9, 9), rng.randint(-9, 9))
            if not seq or p != seq[-1]:
                seq.append(p)
        wkt = "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in seq) + ")"
        assert A.num_points(wkt) == n
        for i in range(1, n + 1):
            fwd = G.parse_wkt(A.point_n(wkt, i)).coords
            bwd = G.parse_wkt(A.point_n(wkt, i - n - 1)).coords
            assert (int(fwd[0]), int(fwd[1])) == seq[i - 1]
            assert fwd == bwd  # i and i-(n+1) address the same vertex


def _length(wkt: str) -> float:
    g = G.parse_wkt(wkt)
    seqs = [g.coords] if g.kind == "LineString" else g.coords
    return sum(
        math.dist(a, b) for seq in seqs for a, b in zip(seq, seq[1:])
    )


def test_segmentize_preserves_length_and_bounds_segments():
    rng = random.Random(99)
    for _ in range(200):
        n = rng.randint(2, 6)
        seq = []
        while len(seq) < n:
            p = (rng.randint(-20, 20), rng.randint(-20, 20))
            if not seq or p != seq[-1]:
                seq.append(p)
        wkt = "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in seq) + ")"
        mx = rng.choice([1.0, 2.5, 7.0, 100.0])
        out = ED.segmentize(wkt, mx)
        g = G.parse_wkt(out)
        assert all(
            math.dist(a, b) <= mx + 1e-9 for a, b in zip(g.coords, g.coords[1:])
        ), (wkt, mx, out)
        assert abs(_length(out) - _length(wkt)) < 1e-9 * max(1.0, _length(wkt))
        # original vertices survive, in order (subsequence check — an
        # interpolated point may coincide with an original vertex when
        # the line revisits a coordinate, so exact filtering over-counts)
        orig = G.parse_wkt(wkt).coords
        it = iter(g.coords)
        assert all(any(p == q for q in it) for p in orig), (wkt, mx, out)


def test_substring_concatenation_reconstructs_line():
    """line_substring(0,c) + line_substring(c,1) share the cut point and
    jointly cover the original vertex set."""
    rng = random.Random(5)
    for _ in range(150):
        n = rng.randint(2, 6)
        seq = []
        while len(seq) < n:
            p = (rng.randint(-15, 15), rng.randint(-15, 15))
            if not seq or p != seq[-1]:
                seq.append(p)
        wkt = "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in seq) + ")"
        c = rng.random()
        left = L.line_substring(wkt, 0.0, c)
        right = L.line_substring(wkt, c, 1.0)
        total = _length(wkt)
        gl = G.parse_wkt(left)
        gr = G.parse_wkt(right)
        lcoords = [gl.coords] if gl.kind == "Point" else gl.coords
        rcoords = [gr.coords] if gr.kind == "Point" else gr.coords
        assert lcoords[-1] == rcoords[0]  # shared cut point
        llen = 0.0 if gl.kind == "Point" else _length(left)
        rlen = 0.0 if gr.kind == "Point" else _length(right)
        assert abs(llen + rlen - total) < 1e-9 * max(1.0, total)
        assert abs(llen - c * total) < 1e-9 * max(1.0, total)


def test_closest_point_is_global_minimum():
    """closest_point beats dense sampling along the line."""
    rng = random.Random(21)
    for _ in range(100):
        n = rng.randint(2, 5)
        seq = []
        while len(seq) < n:
            p = (rng.randint(-10, 10), rng.randint(-10, 10))
            if not seq or p != seq[-1]:
                seq.append(p)
        wkt = "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in seq) + ")"
        q = (rng.uniform(-12, 12), rng.uniform(-12, 12))
        got = G.parse_wkt(L.closest_point(wkt, f"POINT ({q[0]} {q[1]})")).coords
        dgot = math.dist(got, q)
        for k in range(201):  # dense arc samples can only be >= the optimum
            s = G.parse_wkt(L.line_interpolate_point(wkt, k / 200)).coords
            assert dgot <= math.dist(s, q) + 1e-9


def test_constructor_accessor_roundtrips():
    """make_polygon and the accessors are mutual inverses on random
    integer rings; make_line glues what start/end accessors took apart."""
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
        constructors as C,
    )

    rng = random.Random(31)
    for _ in range(100):
        # random simple-enough closed ring: jittered convex-ish polygon
        cx, cy = rng.randint(-50, 50), rng.randint(-50, 50)
        k = rng.randint(3, 7)
        pts = []
        for i in range(k):
            ang = 2 * math.pi * i / k
            r = rng.randint(3, 9)
            pts.append((cx + round(r * math.cos(ang)), cy + round(r * math.sin(ang))))
        # dedupe consecutive duplicates introduced by rounding
        ring = [p for i, p in enumerate(pts) if i == 0 or p != pts[i - 1]]
        if len(ring) < 3:
            continue
        ring.append(ring[0])
        shell = "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in ring) + ")"
        poly = C.make_polygon(shell)
        assert poly is not None
        # exterior_ring inverts make_polygon
        assert A.exterior_ring(poly) == shell
        assert A.num_interior_rings(poly) == 0
        # boundary of the single-ring polygon is the shell again
        assert A.boundary_wkt(poly) == shell

    # make_line glues start/end back into the 2-point hull of a line
    for _ in range(50):
        a = (rng.randint(-9, 9), rng.randint(-9, 9))
        b = (rng.randint(-9, 9), rng.randint(-9, 9))
        if a == b:
            continue
        line = f"LINESTRING ({a[0]} {a[1]}, {b[0]} {b[1]})"
        sp, ep = A.start_point(line), A.end_point(line)
        assert C.make_line(sp, ep) == line
