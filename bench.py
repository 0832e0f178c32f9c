"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q...": sec, ...}, "sf": <sf>}

Context (BASELINE.md): the reference's kinerja suite runs 5 684 ms for a
40k-row scan+filter and 321-533 s for 40k-row joins (string-built
nested-loop XQuery). Our fixture at sf0.1 is ~600k lineitem rows — 15×
larger — so any query finishing in single-digit seconds here beats the
reference's throughput by orders of magnitude.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family (scan/filter, agg, multiway join,
# window, spatial join, distance self-join, jaccard dedup, minhash LSH,
# simhash, ANN brute/IVF, as-of join, banded range join, tumbling window,
# sessionize).
HEADLINE = [
    "q01_filter_pushdown",
    "q16_join_multiway",
    "q23_agg_pricing_summary",
    "q31_window_rank",
    "q44_spatial_join_within",
    "q45_spatial_join_intersects",
    "q47_dwithin_pairs",
    "q64_dedup_exact",
    "q65_dedup_ngram_jaccard",
    "q66_minhash_lsh",
    "q67_simhash",
    "q70_ann_bruteforce_topk",
    "q73_ann_ivf_topk",
    "q75_tumbling_window",
    "q76_sliding_window",
    "q77_sessionize",
    "q83_asof_join",
    "q84_range_join_banded",
    "q91_training_pipeline",
    "q106_sequence_packing",
    "q107_decontamination",
    "q109_tfidf_top_terms",
    "q110_repetition_metrics",
    "q111_centroid_outliers",
    "q115_ann_quantized_topk",
]


def main() -> None:
    from sql_interface_to_xml_database_for_spatial_operations_spark import (
        get_spark,
        register_spatial_functions,
    )
    from sql_interface_to_xml_database_for_spatial_operations_spark import operators
    from sql_interface_to_xml_database_for_spatial_operations_spark.operators.registry import (
        QUERIES,
    )

    operators.load_all()
    spark = get_spark("bench")
    register_spatial_functions(spark)
    spark.sparkContext.setLogLevel("ERROR")

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = None

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name].fn
        fn(spark, SF_DIR).count()  # warm: plan + scan caches, JVM JIT
        spark.catalog.clearCache()
        # min of n>=3 timed runs + stddev (VERDICT r3 #7): single-run
        # numbers at sf0.1 carry ±10-25% scheduler/GC noise — 10 of 19
        # r03 carried-over queries "regressed" 15-26% in lockstep, which
        # was environmental; the stddev lets real regressions stand out.
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            runs.append(time.perf_counter() - t0)
            # drop persisted intermediates (shingle sets etc.) so queries
            # are timed independently, not competing for executor memory
            spark.catalog.clearCache()
        timings[name] = round(min(runs), 3)
        mean = sum(runs) / len(runs)
        spreads[name] = round((sum((r - mean) ** 2 for r in runs) / len(runs)) ** 0.5, 3)

    total = round(sum(timings.values()), 3)
    # Direct comparison against the reference's kinerja suite (BASELINE.md):
    # its shapes mapped to our equivalent operators, with the reference's
    # published end-to-end ms on ~40k rows (our sf0.1 lineitem is ~600k —
    # 15× their volume) for the fastest backend per row.
    kinerja = {
        "Q-D1_scan_filter": {"ours": "q01_filter_pushdown", "sec": timings["q01_filter_pushdown"], "reference_ms": 5684},
        "Q-D3_join": {"ours": "q16_join_multiway", "sec": timings["q16_join_multiway"], "reference_ms": 523905},
        "Q-D5_join_agg": {"ours": "q23_agg_pricing_summary", "sec": timings["q23_agg_pricing_summary"], "reference_ms": 204379},
    }
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "timing": f"per query: min of {n_runs} timed runs after 1 warm-up",
                "queries": timings,
                "query_stddev_sec": spreads,
                "sf": sf_num,
                "kinerja_analogs": kinerja,
            }
        )
    )


if __name__ == "__main__":
    main()
