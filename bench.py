"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Methodology: each query is fully materialized (noop sink — no driver
collect in the timing) twice and the MINIMUM is reported: steady-state
execution, excluding one-off JVM JIT/codegen compilation that would
otherwise dominate sub-second queries and make cross-round comparisons
noise-bound. Session bootstrap and input-table footer reads are warmed
before any timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "pricing_summary",
    "flagship_cross_level",
    "join_inner",
    "top1_per_group",
    "agg_having",
    "range_join_decode",
    "rowid_join",
    "case_coalesce_harmonize",
    "dedup_exact",
    "minhash_near_dup",
    "embedding_topk",
    "embedding_cosine_near_dup",
    "asof_join",
    "rollup_agg",
    "token_count",
    "winnowing_fingerprint",
    "tumbling_window",
    "cube_agg",
    "vocab_stats",
    "train_test_split",
    "dedup_components",
    "top_unshipped_orders",
    "gap_fill_hourly",
    "segment_window_counts",
    "decile_stats",
    "funnel_stages",
    "sequence_pack",
    "curation_pipeline",
    "curation_pipeline_v2",
    "embedding_centroids",
    "repetition_stats",
    "context_chunks",
    "token_budget_mix",
    "token_rarity_score",
    "semantic_dedup",
    "benchmark_decontaminate",
    "dedup_incremental",
    "zorder_key",
    "tfidf_topk",
    "bm25_search",
    "duplicate_spans",
    "importance_weights",
    "cohort_retention",
    "rollup_maintenance",
    "value_histogram",
    "moving_average_daily",
    "scd2_asof_lookup",
    "content_reconcile",
    "setsim_join_prefix",
    "word_entropy",
    "weighted_sample_langs",
    "pmi_collocations",
    "hybrid_search_rrf",
    "profile_orders_columns",
    "moment_stats",
    "term_drift_kl",
    "spearman_length_tokens",
    "dedup_incremental_bloom",
    "survey_update_check",
    "temperature_mix",
    "dup_rate_by_source",
    "interval_join_attribution",
    "range_frame_trailing",
    "wow_growth",
    "doc_perplexity",
    "bpe_pair_counts",
    "bpe_compression",
    "pca_embedding_reduce",
    "rich_inactive_customers_sql",
    "returned_orders_by_priority_sql",
    "dq_checks_orders",
    "stateful_session_paths",
    "streaming_window_counts",
    "audio_metadata",
    "video_metadata",
    "exact_substring_excise",
    "flac_metadata",
    "corpus_dataset_card",
    "span_dedup_report",
    "max_dup_span_stats",
    "cdc_chunks",
    "decontaminate_pairs",
    "minhash_calibration",
    "ann_calibration",
    "leakage_safe_split",
    "source_pagerank",
    "bpe_merge_calibration",
    "spectral_power_calibration",
    "kmeans_calibration",
    "featurize_calibration",
    "irls_stats_calibration",
    "pca_calibration",
    "embedding_quantization",
    "quality_classifier",
    "containment_pairs",
    "boilerplate_prune",
    "training_shuffle_order",
    "json_props_extract",
    "source_overlap_matrix",
    "pii_redact",
    "approx_distinct_calibration",
    "approx_quantile_calibration",
    "cms_calibration",
    # r12: the two new rows-only-residue calibration twins
    "bpe_encode_calibration",
    "pca_project_calibration",
    # r12: the five rotated-in window queries that were not yet headline
    # entries — every driver-graded query now carries bench + plan-audit
    # coverage
    "sliding_window",
    "stratified_sample_langs",
    "topk_per_group",
    "quantile_normalize",
    "regex_token_count",
    # r13: the three rotated-in window queries that were not yet headline
    # entries — every driver-graded query carries bench + plan-audit
    # coverage
    "frequent_terms_topk",
    "mode_per_group",
    "sample_k_per_group",
    # r14: the one rotated-in window query that was not yet a headline
    # entry
    "window_unique_users",
]

# r13 (VERDICT r12 ask #5): the real-streaming-engine drain queries are
# the suite's two most contention-sensitive cells — the r12 driver
# capture measured them at 20.5 s / 9.5 s where the same code idles at
# 4.3 s / 1.9 s. They always get a THIRD steady-state run (min-of-3, the
# decade-probe min-of-2 protocol applied to the bench's known swingers),
# and ANY query whose run spread exceeds 1.5x lands in the detail line's
# `spread` map, so a contended capture documents itself instead of
# masquerading as a code regression.
# r14 (VERDICT r13 ask #5): the min-of-N treatment extends to EVERY
# spread-flagged query, not just the two known swingers — a flagged
# query takes exactly SPREAD_EXTRA_RUNS more runs (once; the flag
# provably never clears as runs append, so re-checking it would be
# dead code); the reported time is the min over all runs and the
# full-capture spread ALWAYS lands in the map.
BENCH_MIN3 = {"stateful_session_paths", "streaming_window_counts"}
SPREAD_FLAG = 1.5
SPREAD_EXTRA_RUNS = 2


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    import __spark_entry__ as em
    from dhs_to_database_spark.session import get_spark

    spark = get_spark("bench")
    qs = em.queries()

    # Warm up JVM/codegen/parquet footer caches: touch every input table
    # once so measured times reflect steady-state execution, not first-read
    # footer parsing or JIT warmup.
    from dhs_to_database_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    qs["sort_limit"](spark, sf_dir).collect()

    missing = [n for n in BENCH_QUERIES if n not in qs]
    if missing:
        raise SystemExit(f"bench list names unregistered queries: {missing}")

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in BENCH_QUERIES:
        runs = []
        for _ in range(3 if name in BENCH_MIN3 else 2):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        # noise guard: if the steady-state runs disagree by >15% the box
        # was busy during one of them — take one more and keep the min
        if max(runs) - min(runs) > 0.15 * min(runs):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        # spread over the steady-state runs only (runs[1:]): runs[0] is
        # the query's first-ever execution and carries plan/codegen
        # warmup, which would record phantom contention on an idle box.
        # r14 (VERDICT r13 ask #5): a flagged query takes
        # SPREAD_EXTRA_RUNS more runs so a transient contention spike
        # doesn't inflate the reported min. The flag can never clear
        # once raised (max is non-decreasing, min non-increasing as runs
        # append), so a flagged query ALWAYS records its spread — the
        # ratio covers the FULL steady capture including the recovered
        # fast runs, i.e. it documents the worst contention observed,
        # not the post-recovery state.
        steady = runs[1:]
        if max(steady) > SPREAD_FLAG * min(steady):
            for _ in range(SPREAD_EXTRA_RUNS):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.time() - t0)
            steady = runs[1:]
            spreads[name] = round(max(steady) / min(steady), 2)
        timings[name] = round(min(runs), 3)

    # Machine-speed calibration: a fixed, code-independent JVM op (sum over
    # a 200M range — pure whole-stage-codegen arithmetic, no I/O, no code
    # from this repo). Its cost moves only with the box (CPU frequency,
    # noisy neighbors), so cross-round query totals can be normalized by
    # the calib ratio before being read as code regressions/improvements.
    calib_runs = []
    for _ in range(3):
        t0 = time.time()
        spark.range(200_000_000).selectExpr("sum(id)").write.format(
            "noop"
        ).mode("overwrite").save()
        calib_runs.append(time.time() - t0)
    calib = round(min(calib_runs), 3)

    total = round(sum(timings.values()), 3)
    # Full per-query detail on its own line (for humans / SCALING work) ...
    print(
        json.dumps(
            {
                "metric": "headline_queries_detail",
                "queries": timings,
                # per-query max/min run ratio where > SPREAD_FLAG: the
                # in-capture contention record (VERDICT r12 ask #5)
                "spread": spreads,
                "sf": sf,
            }
        )
    )
    sys.stdout.flush()
    # ... then a COMPACT summary as the FINAL stdout line. The driver's
    # output-tail capture is bounded; r4's single giant JSON line overflowed
    # it and the round recorded no headline number ("parsed": null). Keeping
    # the last line small guarantees the driver always retains a parseable
    # {"metric", "value", ...} headline.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "sf": sf,
                "calib_range_sum_sec": calib,
            }
        )
    )


if __name__ == "__main__":
    main()
