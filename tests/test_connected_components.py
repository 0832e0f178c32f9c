"""connected_components unit tests: long-chain label propagation, the
batched sum-based convergence check, and the non-convergence guard
(ADVICE r1: silent truncation must not return wrong cluster ids)."""

from __future__ import annotations

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc1 long, doc2 long")


def test_path_graph_converges_to_min_label(spark):
    # a 9-node path: diameter 8, needs several propagation rounds
    pairs = _pairs(spark, [(i, i + 1) for i in range(10, 18)])
    labels = {r["id"]: r["label"] for r in connected_components(pairs).collect()}
    assert labels == {i: 10 for i in range(10, 19)}


def test_two_components_stay_separate(spark):
    pairs = _pairs(spark, [(1, 2), (2, 3), (7, 9)])
    labels = {r["id"]: r["label"] for r in connected_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_nonconvergence_raises(spark):
    # diameter 8 cannot converge within 2 rounds — must raise, never
    # return half-propagated labels
    pairs = _pairs(spark, [(i, i + 1) for i in range(10, 18)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iters=2)


def test_empty_graph(spark):
    pairs = _pairs(spark, [])
    assert connected_components(pairs).count() == 0


def test_string_ids_converge_correctly(spark):
    # ADVICE r2: string ids made the decimal-sum convergence check see
    # NULL == NULL and return half-propagated labels. The changed-row
    # fallback must fully propagate instead.
    pairs = spark.createDataFrame(
        [(f"d{i:02d}", f"d{i + 1:02d}") for i in range(10, 18)] + [("x1", "x2")],
        "doc1 string, doc2 string",
    )
    labels = {r["id"]: r["label"] for r in connected_components(pairs).collect()}
    assert labels == {f"d{i:02d}": "d10" for i in range(10, 19)} | {"x1": "x1", "x2": "x1"}


def test_string_ids_nonconvergence_raises(spark):
    pairs = spark.createDataFrame(
        [(f"d{i:02d}", f"d{i + 1:02d}") for i in range(10, 18)],
        "doc1 string, doc2 string",
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iters=2)


def test_star_matches_plain_on_chain_within_log_rounds(spark):
    """r11 star contraction: identical labels to min-label propagation
    on a 100-hop chain plus a separate component, converging inside an
    iteration budget that is impossible for O(diameter) propagation."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(100)] + [(200, 201), (201, 202)],
        ["a", "b"],
    )
    fast = connected_components_star(chain, max_iters=10)
    slow = connected_components(chain, max_iters=150)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))
    # min-label propagation CANNOT finish a 100-hop chain in 10 rounds
    with pytest.raises(RuntimeError):
        connected_components(chain, max_iters=10)


def test_star_random_graphs_match_plain(spark):
    """Cross-validate the two independent CC implementations on random
    graphs (the r10 lesson: consistency fuzz between independent kernels
    is the highest-yield test class)."""
    import random

    rng = random.Random(11)
    for trial in range(4):
        n = rng.randint(5, 60)
        m = rng.randint(1, 2 * n)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
        pairs = spark.createDataFrame(edges, "doc1 long, doc2 long")
        star = sorted(map(tuple, connected_components_star(pairs).collect()))
        plain = sorted(map(tuple, connected_components(pairs, max_iters=100).collect()))
        assert star == plain, f"trial {trial}: {star} != {plain}"


def test_star_string_ids(spark):
    # set-equality convergence has no numeric-id restriction: lexical
    # min becomes the component label
    pairs = spark.createDataFrame(
        [(f"d{i:02d}", f"d{i + 1:02d}") for i in range(10, 18)] + [("x1", "x2")],
        "doc1 string, doc2 string",
    )
    labels = {r["id"]: r["label"] for r in connected_components_star(pairs).collect()}
    assert labels == {f"d{i:02d}": "d10" for i in range(10, 19)} | {"x1": "x1", "x2": "x1"}


def test_star_empty_and_self_loops(spark):
    pairs = spark.createDataFrame([], "doc1 long, doc2 long")
    assert connected_components_star(pairs).count() == 0
    # self-loops carry no connectivity but their ids still get rows —
    # the same output contract as the plain loop (r11 review)
    loops = spark.createDataFrame([(5, 5), (7, 7), (7, 9)], "doc1 long, doc2 long")
    star = sorted(map(tuple, connected_components_star(loops).collect()))
    plain = sorted(map(tuple, connected_components(loops).collect()))
    assert star == plain == [(5, 5), (7, 7), (9, 7)]
