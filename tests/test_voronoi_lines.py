"""ST_VoronoiLines — functions/voronoi_lines.py: shared cell edges as
a canonical MULTILINESTRING."""

from __future__ import annotations

from sql_interface_to_xml_database_for_spatial_operations_spark.functions.voronoi_lines import (
    voronoi_lines_wkt as vl,
)


def test_bisectors():
    # two sites: one perpendicular bisector across the padded box
    assert vl("MULTIPOINT ((0 0), (4 0))") == "MULTILINESTRING ((2 -4, 2 4))"
    # three collinear: two parallel bisectors (pad = extent = 8)
    assert vl("MULTIPOINT ((0 0), (4 0), (8 0))") == (
        "MULTILINESTRING ((2 -8, 2 8), (6 -8, 6 8))"
    )


def test_square_cross():
    out = vl("MULTIPOINT ((0 0), (4 0), (0 4), (4 4))")
    # four cells meet at (2,2): the internal boundary is the + cross
    assert out == (
        "MULTILINESTRING ((-4 2, 2 2), (2 -4, 2 2), (2 2, 2 8), (2 2, 8 2))"
    )


def test_consistency_with_cells():
    """Every emitted line must be an edge of exactly two Voronoi cells
    of the same input — the defining property."""
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions import geometry as G
    from sql_interface_to_xml_database_for_spatial_operations_spark.functions.tessellate import (
        voronoi_cells,
    )

    w = "MULTIPOINT ((0 0), (5 1), (2 6), (7 7), (9 3))"
    out = G.parse_wkt(vl(w))
    cells = voronoi_cells(G._points(G.parse_wkt(w)))
    edges = {}
    for _s, ring in cells:
        n = len(ring)
        for i in range(n):
            a, b = ring[i], ring[(i + 1) % n]
            k = (a, b) if a <= b else (b, a)
            edges[k] = edges.get(k, 0) + 1
    # compare in the serializer's own float space (the kernel emits
    # float(Fraction) endpoints)
    shared_float = {
        tuple(sorted(((float(a[0]), float(a[1])), (float(b[0]), float(b[1])))))
        for (a, b), c in edges.items()
        if c == 2
    }
    got = {tuple(sorted((tuple(p[0]), tuple(p[1])))) for p in out.coords}
    assert got == shared_float


def test_degenerate_and_loud():
    assert vl("POINT (1 1)") == "MULTILINESTRING EMPTY"
    assert vl("MULTIPOINT ((1 1), (1 1))") == "MULTILINESTRING EMPTY"
    assert vl("junk") is None
    assert vl(None) is None
