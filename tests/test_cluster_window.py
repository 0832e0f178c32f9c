"""Window-form clustering — functions/cluster_window.py:
st_clusterkmeans_all (deterministic first-k-distinct seeding) and
st_clusterdbscan_all (the q160 canonical conventions) over collected
point arrays."""

from __future__ import annotations

import random

from sql_interface_to_xml_database_for_spatial_operations_spark.functions import (
    cluster_window as C,
)


def _pts(coords):
    return [f"POINT ({x} {y})" for x, y in coords]


class TestKMeans:
    def test_two_clumps(self):
        pts = _pts([(0, 0), (1, 0), (40, 40), (41, 40)])
        assert C.cluster_kmeans_ids(pts, 2) == [0, 0, 1, 1]
        assert C.cluster_kmeans_ids(pts, 1) == [0, 0, 0, 0]

    def test_k_bounds_and_junk(self):
        pts = _pts([(0, 0), (1, 0)])
        assert C.cluster_kmeans_ids(pts, 3) is None  # k > n
        assert C.cluster_kmeans_ids(pts, 0) is None
        assert C.cluster_kmeans_ids(pts, 1.5) is None
        assert C.cluster_kmeans_ids(_pts([(0, 0), (0, 0)]), 2) is None  # 1 distinct
        assert C.cluster_kmeans_ids(["POINT (0 0)", "LINESTRING (0 0, 1 1)"], 1) is None
        assert C.cluster_kmeans_ids(["POINT (0 0)", None], 1) is None
        assert C.cluster_kmeans_ids([], 1) is None
        assert C.cluster_kmeans_ids(None, 1) is None

    def test_partition_of_n(self):
        # every point gets a label in [0, k); all k labels appear for
        # well-separated clumps
        rng = random.Random(3)
        coords = []
        for cx, cy in [(0, 0), (100, 0), (0, 100)]:
            coords += [(cx + rng.randint(-3, 3), cy + rng.randint(-3, 3)) for _ in range(7)]
        labels = C.cluster_kmeans_ids(_pts(coords), 3)
        assert len(labels) == 21 and set(labels) == {0, 1, 2}
        # clump-mates share labels
        assert len({tuple(labels[i * 7 : (i + 1) * 7]) for i in range(3)}) == 3
        for i in range(3):
            assert len(set(labels[i * 7 : (i + 1) * 7])) == 1


class TestDBSCAN:
    def test_core_border_noise(self):
        # chain 0-1-2 at spacing 1, eps 1, minpts 3: middle is core,
        # ends are border of cluster 1 (the min core POSITION)
        assert C.cluster_dbscan_ids(_pts([(0, 0), (1, 0), (2, 0)]), 1.0, 3) == [1, 1, 1]
        # clump + far noise
        assert C.cluster_dbscan_ids(
            _pts([(0, 0), (1, 0), (2, 0), (50, 0)]), 2.0, 3
        ) == [0, 0, 0, None]

    def test_two_components_min_position_labels(self):
        pts = _pts([(0, 0), (1, 0), (50, 0), (51, 0)])
        assert C.cluster_dbscan_ids(pts, 1.5, 2) == [0, 0, 2, 2]

    def test_minpts_one_everything_core(self):
        assert C.cluster_dbscan_ids(_pts([(0, 0), (9, 9)]), 1.0, 1) == [0, 1]

    def test_rejections(self):
        pts = _pts([(0, 0)])
        assert C.cluster_dbscan_ids(pts, -1, 2) is None
        assert C.cluster_dbscan_ids(pts, 1, 0) is None
        assert C.cluster_dbscan_ids(pts, 1, 1.5) is None
        assert C.cluster_dbscan_ids(pts, None, 2) is None
        assert C.cluster_dbscan_ids(["junk"], 1, 1) is None
        assert C.cluster_dbscan_ids(None, 1, 1) is None

    def test_fuzz_vs_brute_transitive_closure(self):
        """Random point sets: cluster labels must equal the brute
        transitive closure of core-core eps-adjacency with the min
        core position as the component label (the q160 oracle rule)."""
        rng = random.Random(11)
        for _ in range(30):
            n = rng.randint(3, 18)
            pts = [(rng.randint(0, 12), rng.randint(0, 12)) for _ in range(n)]
            eps = rng.choice([1.0, 1.5, 2.0, 3.0])
            minpts = rng.randint(1, 4)
            got = C.cluster_dbscan_ids(_pts(pts), eps, minpts)

            def d2(a, b):
                return (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2

            nb = [
                [j for j in range(n) if d2(pts[i], pts[j]) <= eps * eps]
                for i in range(n)
            ]
            core = [len(nb[i]) >= minpts for i in range(n)]
            # brute closure over cores
            label = [None] * n
            for i in range(n):
                if not core[i] or label[i] is not None:
                    continue
                comp, stack = {i}, [i]
                while stack:
                    a = stack.pop()
                    for b in nb[a]:
                        if core[b] and b not in comp:
                            comp.add(b)
                            stack.append(b)
                lab = min(comp)
                for c in comp:
                    label[c] = lab
            for i in range(n):
                if not core[i] and label[i] is None:
                    adj = [label[j] for j in nb[i] if core[j]]
                    if adj:
                        label[i] = min(adj)
            assert got == label, (pts, eps, minpts)
