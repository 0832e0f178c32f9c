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

# Headline set (VERDICT r6 item 8: every operator family the registry
# covers keeps a tracked number; refreshed r16 — the set has grown
# every round since r7's 40 rows). One row per family across five
# tiers:
#  - relational core: scan/filter, multiway join, join+agg, window
#  - spatial SQL: spatial joins, DE-9IM relations, overlay/union/
#    symdifference, buffer, makevalid, linework/node/polygonize/split,
#    subdivide/tessellate, accessors/boundary/editors/constructors,
#    linear referencing, measures, bounding, grids, geodesy, Z/3-D
#    surfaces, MVT tiles, WKB/EWKB codecs, transforms (incl. '+proj='
#    parameter strings), collect/dump, affine
#  - LLM-pipeline: exact/jaccard/minhash/simhash/embedding dedup,
#    substring-span dedup, fuzzy matching, ANN brute/IVF/quantized,
#    BM25, perplexity, BPE tokenize + train, TF-IDF, chunking,
#    PII/URL/boilerplate, training pipeline, packing, decontamination
#  - temporal/streaming batch analogs: tumbling/sliding/session
#    windows, as-of join, banded range join, rollup, CMS
#  - multimodal: audio features, image resize/dhash, JPEG pixels,
#    AVI/y4m frames; sources: bucketed storage, shapefile, GPX
# The per-query methodology (interleaved min-of-n + sentinel) is
# documented at the timing loop below.
HEADLINE = [
    "q01_filter_pushdown",
    "q16_join_multiway",
    "q23_agg_pricing_summary",
    "q31_window_rank",
    "q44_spatial_join_within",
    "q45_spatial_join_intersects",
    "q47_dwithin_pairs",
    "q122_st_relations",
    "q124_st_union_agg",
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
    "q118_bucketed_join",
    "q91_training_pipeline",
    "q106_sequence_packing",
    "q107_decontamination",
    "q109_tfidf_top_terms",
    "q110_repetition_metrics",
    "q125_document_chunking",
    "q111_centroid_outliers",
    "q115_ann_quantized_topk",
    "q126_pii_redaction",
    "q127_url_domains",
    "q130_st_transform",
    "q132_audio_features",
    "q133_resize_images",
    "q134_hypertable_rollup",
    "q135_cms_heavy_hitters",
    "q136_image_dhash_neardup",
    "q139_st_intersection",
    "q140_wkb_roundtrip",
    "q141_boilerplate_removal",
    # r8 families: one tracked number each
    "q143_kmeans_assign",
    "q144_bloom_semijoin",
    "q145_inverted_index",
    "q146_st_symdifference",
    "q148_st_affine",
    "q149_st_linework",
    "q150_st_accessors",
    # boundary's assembly path (mod-2 endpoint cancellation) is the
    # pricier accessor-family kernel — tracked separately (VERDICT r8 #8)
    "q151_st_boundary",
    "q152_st_linear_referencing",
    "q153_st_editors",
    "q154_st_constructors",
    # r10 families: one tracked number each — the line/polygon buffer
    # kernel (exact union of stadiums), the DE-9IM matrix + validity
    # assembly, and the even-odd makevalid rebuild
    "q155_st_buffer_lines_polys",
    "q156_st_relate_isvalid",
    "q157_st_makevalid",
    "q158_st_measures",
    "q159_st_bounding",
    # iterative clustering: large-star/small-star contraction, ~6
    # scheduling-bound shuffle rounds at sf0.1 (was ~25 min-label ones)
    "q160_cluster_dbscan",
    "q161_st_collect_dump",
    "q162_st_subdivide",
    "q163_jpeg_pixels",
    "q164_st_node_polygonize",
    "q165_st_tessellate",
    "q166_st_split",
    # r12 rows: AVI/MJPEG frame decode (map-only), and 6 rounds of
    # integer Lloyd (one bounded shuffle + bounded collect per round)
    "q167_video_frames",
    "q168_kmeans_converged",
    "q169_st_grids",
    "q170_bm25_search",
    "q171_bigram_perplexity",
    "q172_bpe_tokenize",
    "q173_y4m_frames",
    "q174_st_z",
    "q175_st_asmvt",
    "q176_bpe_train",
    "q177_st_geodesy",
    "q178_st_surface3d",
    "q179_substring_dedup",
    "q180_st_editors_x",
    "q181_fuzzy_match",
    "q182_shapefile_roundtrip",
    "q183_gpx_roundtrip",
    # r16: grid-partitioned write + partition-pruned bbox read — the
    # timing includes the WRITE (that is the product path)
    "q184_spatial_partition_pruning",
    # r17: the two rows the r17 build added get tracked numbers from
    # day one (ADDED entries only — no existing row was renamed or
    # removed, so BENCH_r16 comparisons stay key-for-key valid)
    "q185_st_inspection",
    "q186_st_worked_examples",
    # The streaming e2e rows (q123/q137/q138, and r8's q142/q147) are
    # deliberately NOT in the min-of-n headline total: each runs a real
    # Structured Streaming job (~13 s at sf0.1, dominated by
    # micro-batch scheduling, not data volume), so a timing would
    # measure the harness, not the operator. Their batch analogs
    # (q75-q77, q96) carry the family's tracked numbers. Since r16
    # (VERDICT r15 task 7) they DO get a wall-clock lane: one e2e run
    # each, recorded in stderr's detail as "streaming_sec" (excluded
    # from the stdout total so round-over-round comparisons stay
    # micro-batch-noise-free).
]

STREAMING = [
    "q123_stream_tumbling_e2e",
    "q137_stream_session_e2e",
    "q138_stream_interval_join_e2e",
    "q142_stream_dedup_e2e",
    "q147_stream_stateful_totals_e2e",
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

    def timed(name: str) -> float:
        fn = QUERIES[name].fn
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        elapsed = time.perf_counter() - t0
        # drop persisted intermediates (shingle sets etc.) so queries
        # are timed independently, not competing for executor memory
        spark.catalog.clearCache()
        return elapsed

    # Warm pass: plan + scan caches, JVM JIT — untimed.
    for name in HEADLINE:
        timed(name)

    # Timed as n>=3 INTERLEAVED passes over the whole headline list
    # (VERDICT r4 #2 "what's wrong"): with per-query consecutive runs,
    # bench position is fixed, so slow session drift (JVM/GC aging,
    # background load) lands entirely on the late-order queries — r4's
    # q106-q115 cluster "regressed" +16-26% in lockstep with small
    # within-query stddev, invisible to a per-query spread. Spreading
    # each query's runs across the whole session means drift inflates
    # some pass of every query equally and min-of-passes discards it.
    # min + stddev per query retained (VERDICT r3 #7).
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    sentinel: list[float] = []  # session-drift probe: cheapest stable query
    for _ in range(n_runs):
        sentinel.append(round(timed(HEADLINE[0]), 3))
        for name in HEADLINE:
            runs[name].append(timed(name))
    sentinel.append(round(timed(HEADLINE[0]), 3))

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name, rs in runs.items():
        timings[name] = round(min(rs), 3)
        mean = sum(rs) / len(rs)
        spreads[name] = round((sum((r - mean) ** 2 for r in rs) / len(rs)) ** 0.5, 3)

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
    # The driver captures only the LAST ~2000 chars of stdout and
    # parses the JSON line out of that tail — BENCH_r06/r07 came back
    # "parsed": null because the full-detail line outgrew the capture.
    # stdout gets a compact line (guaranteed under the limit: timings
    # only, trimmed to 2 decimals if needed); the full detail
    # (stddev, sentinel, methodology, kinerja analogs) goes to stderr.
    # Streaming lane (r16): one end-to-end run per streaming row —
    # wall clock includes micro-batch scheduling by design (that IS
    # the latency a streaming user sees). Off-total, stderr-only.
    streaming_sec: dict[str, float] = {}
    streaming_batches: dict[str, dict] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_STREAMING", "1") != "0":
        from sql_interface_to_xml_database_for_spatial_operations_spark.operators import (
            streaming_ops as _sops,
        )

        for name in STREAMING:
            try:
                streaming_sec[name] = round(timed(name), 3)
                # micro-batch attribution (r17, VERDICT r16 task 5):
                # batch count + per-trigger ms so an outlier row (q138)
                # is explainable as count vs per-batch cost. The
                # harness keys progress by the short row name ("q138").
                prog = _sops.LAST_RUN_PROGRESS.get(name.split("_")[0], [])
                trig = [p.get("triggerMs") for p in prog]
                streaming_batches[name] = {
                    "batches": len(prog),
                    "trigger_ms": trig,
                    "state_ops": max(
                        (p.get("stateOps", 0) for p in prog), default=0
                    ),
                }
            except Exception as ex:  # a broken streaming row must not
                streaming_sec[name] = -1.0  # kill the whole bench line
                print(f"bench: streaming row {name} failed: {ex}", file=sys.stderr)

    detail = {
        "query_sec": timings,  # full-precision copy (stdout may shed)
        "streaming_sec": streaming_sec,  # e2e micro-batch wall clock
        "streaming_batches": streaming_batches,  # count + trigger ms (r17)
        "timing": (
            f"per query: min over {n_runs} interleaved full passes "
            "after 1 warm pass; sentinel_sec = same cheap query timed "
            "at each pass boundary (rising values = session drift, "
            "not regressions)"
        ),
        "query_stddev_sec": spreads,
        "sentinel_query": HEADLINE[0],
        "sentinel_sec": sentinel,
        "kinerja_analogs": kinerja,
    }
    print(json.dumps(detail), file=sys.stderr)
    line = json.dumps(
        {
            "metric": "headline_query_wall_seconds",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf_num,
        }
    )
    if len(line) > 1800:  # headline list grew: shed precision, then
        # whitespace (compact separators), then another decimal — the
        # 63-row r11 list overflowed the 2-decimal default-separator
        # form at 1915 chars; r14's 70-row default form sits at 1895,
        # 5 chars under the capture, so the shed now triggers at 1800
        # to keep slow-run digit growth from flapping across the limit
        for kwargs in (
            {"ndigits": 2},
            {"ndigits": 2, "separators": (",", ":")},
            {"ndigits": 1, "separators": (",", ":")},
            # r15 (73 rows): the full names no longer fit at any
            # precision — shed to the unique qNNN prefixes (the full
            # names + full precision always live on stderr's detail)
            {"ndigits": 2, "separators": (",", ":"), "short": True},
        ):
            nd = kwargs.pop("ndigits")
            short = kwargs.pop("short", False)
            qd = {
                (k.split("_")[0] if short else k): round(v, nd)
                for k, v in timings.items()
            }
            line = json.dumps(
                {
                    "metric": "headline_query_wall_seconds",
                    "value": total,
                    "unit": "sec",
                    "queries": qd,
                    "sf": sf_num,
                },
                **kwargs,
            )
            if len(line) <= 1900:
                break
        if len(line) > 1900:
            # terminal guarantee: the driver's tail capture must always
            # get a parseable line — drop the per-query dict (it lives
            # in full on stderr via `detail`) rather than print oversize
            print("bench: per-query dict exceeded the stdout budget even "
                  "at 1 decimal; see stderr detail", file=sys.stderr)
            line = json.dumps(
                {
                    "metric": "headline_query_wall_seconds",
                    "value": total,
                    "unit": "sec",
                    "queries": {},
                    "sf": sf_num,
                },
                separators=(",", ":"),
            )
    print(line)


if __name__ == "__main__":
    main()
