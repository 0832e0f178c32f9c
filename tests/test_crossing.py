"""ST_LineCrossingDirection — functions/crossing.py: the exact
topological crossing classifier, pinned to the published PostGIS doc
example pair and hand-derived closed forms."""

from __future__ import annotations

import random

from sql_interface_to_xml_database_for_spatial_operations_spark.functions.crossing import (
    crossing_direction as cd,
)

A = "LINESTRING (0 0, 10 0)"  # east-running baseline: LEFT is +y


class TestCodes:
    def test_postgis_doc_pair(self):
        a = "LINESTRING(25 169,89 114,40 70,86 43)"
        b = "LINESTRING(171 154,20 140,71 74,161 53)"
        assert cd(a, b) == 3
        assert cd(b, a) == -3

    def test_single_crossings(self):
        assert cd(A, "LINESTRING (5 -5, 5 5)") == -1  # upward → LEFT
        assert cd(A, "LINESTRING (5 5, 5 -5)") == 1  # downward → RIGHT
        assert cd(A, "LINESTRING (0 5, 10 5)") == 0  # parallel above

    def test_multicross(self):
        assert cd(A, "LINESTRING (2 -1, 2 1, 4 1, 4 -1)") == -3  # L,R first L
        assert cd(A, "LINESTRING (2 1, 2 -1, 4 -1, 4 1)") == 3  # R,L first R
        assert cd(A, "LINESTRING (2 -1, 2 1, 4 1, 4 -1, 6 -1, 6 1)") == -2
        assert cd(A, "LINESTRING (2 1, 2 -1, 4 -1, 4 1, 6 1, 6 -1)") == 2

    def test_through_a_vertex_and_touches(self):
        # crossing exactly THROUGH A's interior vertex
        assert cd("LINESTRING (0 0, 5 5, 10 0)", "LINESTRING (5 0, 5 10)") == -1
        # B vertex lands ON A and returns to the same side: no crossing
        assert cd(A, "LINESTRING (3 2, 5 0, 7 2)") == 0
        assert cd(A, "LINESTRING (3 -2, 5 0, 7 -2)") == 0

    def test_collinear_runs(self):
        # ride along A then exit the other side: ONE crossing
        assert cd(A, "LINESTRING (1 1, 3 0, 6 0, 8 -1)") == 1
        # ride and return to the same side: none
        assert cd(A, "LINESTRING (1 1, 3 0, 6 0, 8 1)") == 0

    def test_terminating_contacts(self):
        # B starts or ends on A — no crossing possible there
        assert cd(A, "LINESTRING (5 5, 5 0)") == 0
        assert cd(A, "LINESTRING (5 0, 5 5)") == 0
        # contact at A's terminus is not a crossing (around-the-end)
        assert cd(A, "LINESTRING (0 -5, 0 5)") == 0

    def test_rejections(self):
        assert cd("POINT (1 1)", A) is None
        assert cd(A, "POLYGON ((0 0, 1 0, 1 1, 0 0))") is None
        assert cd(None, A) is None
        assert cd("junk", A) is None

    def test_fuzz_alternating_zigzag(self):
        """A zigzag with n alternating crossings over the baseline must
        produce the closed-form code for any n (the lwgeom mapping:
        counts difference + first-cross tie-break)."""
        rng = random.Random(5)
        for _ in range(40):
            n = rng.randint(1, 9)
            start_above = rng.random() < 0.5
            pts, y = [], (1 if start_above else -1)
            for i in range(n + 1):
                x = 1 + i
                pts.append(f"{x} {y}")
                y = -y
            b = "LINESTRING (" + ", ".join(pts) + ")"
            got = cd(A, b)
            # each segment crosses once; direction alternates
            first = 1 if start_above else -1  # down first → RIGHT=+1
            left = sum(1 for i in range(n) if (first if i % 2 == 0 else -first) < 0)
            right = n - left
            if left == 0 and right == 1:
                want = 1
            elif left == 1 and right == 0:
                want = -1
            elif left - right == 1:
                want = -2
            elif right - left == 1:
                want = 2
            else:
                want = -3 if (first < 0) else 3
            assert got == want, (b, got, want)
