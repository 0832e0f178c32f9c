"""Exact-substring (span-removal) dedup — operators/substr_dedup_ops.py.
Hand-built corpora with known duplicated spans, the hash_windows scale
variant, and the two-shuffle plan shape."""

from __future__ import annotations

from sql_interface_to_xml_database_for_spatial_operations_spark.operators.substr_dedup_ops import (
    exact_substring_dedup,
)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = exact_substring_dedup(df, **kw).collect()
    return {r.doc_id: r for r in sorted(out, key=lambda r: r.doc_id)}


SPAN = "the quick brown fox jumps over the lazy dog"  # 9 tokens


class TestSpans:
    def test_shared_span_removed_from_both(self, spark):
        rows = [
            (1, f"alpha beta {SPAN} gamma delta"),
            (2, f"one two three {SPAN} four five"),
            (3, "entirely unique words nothing shared here at all ok"),
        ]
        got = _run(spark, rows, k=9)
        # the 9-token span occurs at one start in each of doc 1 and 2
        assert got[1].n_dup_windows == 1 and got[2].n_dup_windows == 1
        assert got[1].n_removed == 9 and got[2].n_removed == 9
        assert got[1].cleaned == "alpha beta gamma delta"
        assert got[2].cleaned == "one two three four five"
        assert got[3].n_removed == 0
        assert got[3].cleaned == rows[2][1]

    def test_overlapping_windows_merge(self, spark):
        # a 10-token shared run yields two overlapping 9-windows whose
        # union covers all 10 tokens — spans merge, not double-count
        run = SPAN + " again"
        rows = [(1, f"x {run} y"), (2, f"p q {run}")]
        got = _run(spark, rows, k=9)
        assert got[1].n_dup_windows == 2
        assert got[1].n_removed == 10
        assert got[1].cleaned == "x y"
        assert got[2].cleaned == "p q"

    def test_within_document_repeat(self, spark):
        # duplication inside ONE document counts too (the paper's
        # self-repetition case)
        rows = [(1, f"{SPAN} filler filler {SPAN}")]
        got = _run(spark, rows, k=9)
        assert got[1].n_dup_windows == 2
        assert got[1].n_removed == 18
        assert got[1].cleaned == "filler filler"

    def test_short_docs_pass_through(self, spark):
        rows = [(1, "too short"), (2, "too short")]
        got = _run(spark, rows, k=9)
        assert got[1].n_removed == 0 and got[1].cleaned == "too short"
        assert got[1].n_dup_windows == 0

    def test_fully_covered_doc_empties(self, spark):
        rows = [(1, SPAN), (2, SPAN)]
        got = _run(spark, rows, k=9)
        assert got[1].n_removed == 9
        assert got[1].cleaned == ""

    def test_hash_variant_matches_string_variant(self, spark):
        rows = [
            (1, f"alpha beta {SPAN} gamma delta"),
            (2, f"one two three {SPAN} four five"),
            (3, f"{SPAN} filler filler {SPAN}"),
            (4, "entirely unique words nothing shared here at all ok"),
        ]
        a = _run(spark, rows, k=9, hash_windows=False)
        b = _run(spark, rows, k=9, hash_windows=True)
        for d in a:
            assert (a[d].n_removed, a[d].cleaned, a[d].n_dup_windows) == (
                b[d].n_removed,
                b[d].cleaned,
                b[d].n_dup_windows,
            )


class TestPlanShape:
    def test_two_exchanges_and_no_python_udf(self, spark):
        df = spark.createDataFrame([(1, SPAN)], "doc_id int, text string")
        plan = (
            exact_substring_dedup(df, k=9)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
        # partial-agg group-by + doc-keyed collect + the left join back:
        # hash exchanges only, no cartesian/broadcast-nested-loop blowups
        assert "CartesianProduct" not in plan


def test_partition_invariance(spark):
    """The r7 lesson: results must be a function of the input SET.
    Window group-bys and per-doc collects are deterministic, but pin
    it: the same corpus under several repartitionings yields identical
    rows."""
    rows = [
        (1, f"alpha beta {SPAN} gamma delta"),
        (2, f"one two three {SPAN} four five"),
        (3, f"{SPAN} filler filler {SPAN}"),
        (4, "entirely unique words nothing shared here at all ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    base = {
        r.doc_id: (r.n_removed, r.cleaned, r.n_dup_windows)
        for r in exact_substring_dedup(df, k=9).collect()
    }
    for k in (1, 3, 7):
        got = {
            r.doc_id: (r.n_removed, r.cleaned, r.n_dup_windows)
            for r in exact_substring_dedup(df.repartition(k), k=9).collect()
        }
        assert got == base, k
