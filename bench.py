#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with ``df.count()`` after a warm-up of the
input file listing — we time the engine, not the JVM cold start.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    # relational core
    "agg_sum_groups",      # TPC-H-Q1-shaped flagship
    "join_bridge_2step",   # 3-way join
    "join_semi",
    "upsert_merge",        # CDC merge semantics
    "overwrite_by_key",
    "sync_pipeline_o2m",   # full §3.1 pipeline end-to-end
    "window_session",          # sessionization (window functions)
    "window_session_chunked",  # its hot-key dial (bit-identical)
    "window_tumbling",
    "topk_recent",
    # extension surface
    "dedup_exact",
    "dedup_minhash",       # LSH candidate generation
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding",
    "dedup_semantic",
    "ann_bruteforce",
    "ann_lsh",
    "ann_lsh_multiprobe",
    "ann_ivf",
    # ann_recall + ann_mrr each rebuilt the same 4 index plans; the
    # consolidated ann_eval computes both metrics from ONE persisted
    # set of scans (r7 verdict item 5) — the standalone keys stay
    # registered and oracle-checked, the sweep runs the cheap form
    "ann_eval",
    "lang_id",
    "quality_score",
    "token_count",
    "lm_score",
    "fuzzy_match",
    "join_asof",
    "distinct_sketch",
    "embedding_centroids",
    "ivf_train",
    "ivf_train2",
    "cms_topk",
    "window_time_range",
    "merge_cdc",
    "sample_stratified",
    "sample_weighted",
    "agg_cube",
    "dedup_minhash_capped",
    "dedup_minhash_est",
    "dedup_incremental",
    "decontam_fuzzy",
    "knn_graph",
    "knn_graph_ivf",
    "embedding_outliers",
    "split_assign",
    "tfidf_topk",
    "agg_pivot",
    "agg_unpivot",
    "join_range",
    "join_skew_salted",
    "ivf_train3",
    "quantile_sketch",
    "window_lag_delta",
    "set_except_intersect",
    "agg_ols_slope",
    "udtf_chunk_tokens",
    "graph_pagerank",
    "join_full_outer_nullsafe",
    "agg_incremental_totals",
    "repetition_score",
    "decontam_ngram",
    "pack_sequences",
    "pii_redact",
    "sample_temperature",
    "dedup_segments",
    "window_ntile",
    "agg_grouping_sets",
    "join_spatial_grid",
    "validate_domains",
    "join_temporal_validity",
    "agg_time_rollup",
    "window_first_last",
    "profile_stats",
    "corr_groups",
    "events_funnel",
    "events_dau_mau",
    "retention_cohort",
    "ngram_topk",
    "dedup_priority",
    "event_transitions",
    "group_topk",
    "activity_histogram",
    "shuffle_shards",
    "mix_interleave",
    "agg_filtered_multi",
    "embedding_quantize",
    "tpch_q1",
    "tpch_q2",
    "outlier_mad",
    "hhi_concentration",
    "embedding_pq",
    "ann_ivfpq",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q11",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "bm25_topk",
    "sync_metrics",
    "vocab_coverage",
    "dedup_containment",
    "dedup_containment_capped",
    "snapshot_diff",
    "resample_ffill",
    "ab_ttest",
    "agg_string_concat",
    "rolling_active",
    "inverted_index",
    "term_pmi",
    "skew_stats",
    "window_cumdistinct",
    "curation_pipeline",
    "join_bloom_pruned",
    "sample_token_budget",
    "quality_adaptive",
    "compact_plan",
    "burst_detect",
    "novelty_score",
    "sample_fixed_n",
    "sketch_merge",
    "group_sample_n",
    "bpe_pairs",
    "lang_confusion",
    "multimodal_resize",
    "window_gap_islands",
    "join_bucketed",
    "ts_decompose",
    "scan_partition_pruned",
    "corpus_summary",
    "tokenize_offsets",
    "rfm_segments",
    "hard_negatives",
    "graph_triangles",
    "graph_triangles_ivf",
    "ts_autocorr",
    "k_anonymity",
    "feature_hashing",
    "quantile_bucketize",
    "stream_cdc_apply",
    "window_rolling_median",
    "state_durations",
    "dedup_spans",
    "dedup_spans_intra",  # within-doc repeated spans (round 13)
    "dedup_spans_intra_cut",  # apply the within-doc cut (round 13)
    "dedup_embedding_incremental",
    "bpe_train",
    "bpe_segment",
    "tokenizer_fertility_bpe",  # trained-BPE fertility (round 11)
    "hybrid_search_rrf",
    "mmr_rerank",
    "mmr_rerank_dist",  # distributed greedy arm (round 11)
    "mmr_rerank_ivf",  # IVF-pool MMR composition (round 12)
    "prf_requery",  # PRF re-retrieval final pass (round 12)
    "decontam_embedding",  # embedding-arm decontamination (round 12)
    "context_pack",  # budgeted context assembly after MMR (round 12)
    "decontam_spans",  # span-level eval-leak decontamination (round 12)
    "decontam_spans_cut",  # apply the eval-leak cut (round 13)
    "decontam_report",  # composed drop/cut/keep decision table (round 13)
    "dsir_weights",
    "dsir_resample",
    "rocchio_classify",
    "fingerprint_winnow",
    "bootstrap_ci",
    "ab_cuped",
    # (ann_mrr folded into ann_eval above)
    "hybrid_mmr",
    "prf_expand",
    "dedup_spans_cut",
    "dedup_recall",
    "l_diversity",
    "ts_changepoint",
    "benford_digits",
    "ab_kstest",
    # round-6 additions
    "value_ecdf",
    "sketch_hll",
    "window_ewma",
    "skyline_pareto",
    "source_overlap_kmv",
    "ab_chisq",
    "seq_trigrams",
    "basket_pairs",
    "attribution_first_touch",
    "trend_theil_sen",
    "stream_hll",
    "trend_theil_sen_capped",
    "resample_interpolate",
    "group_percentiles",
    "join_nearest",
    "window_zscore_rolling",
    # round-7 additions
    "source_overlap_kmv_sketch",
    "winsorize_stats",
    "token_gini",
    "scan_jsonl_corrupt",
    "scan_csv_typed",
    "scan_schema_evolution",
    "scan_orc_roundtrip",
    # round-9 additions (sample_stratified already listed above)
    "mix_epochs",
    "hard_negatives_ivf",
    "ann_index_roundtrip",
    "tokenizer_fertility",
    "text_strip_markup",
    # round-14 additions: the measured auto-dial family (MMR pool,
    # containment, jaccard, knn-graph), the explicit jaccard capped
    # arm, and the revived rate-based stratified sampler
    "mmr_rerank_auto",
    "dedup_containment_auto",
    "sample_stratified_rates",
    "dedup_jaccard_capped",
    "dedup_jaccard_auto",
    "knn_graph_auto",
    "trend_theil_sen_auto",
    # round 15
    "dedup_embedding_auto",
]

#: ``--sf1-headline`` key set (round 12, r11 verdict item 7): the
#: top-20 most expensive keys of the r11 sf0.1 record, FROZEN so the
#: once-per-round sf1 record compares the same work across rounds.
#: Rationale: the TPC-H decade rows (SCALING.md) measured sf0.1 as
#: overhead-dominated (growth exponents 0.32-0.84), so a pure-sf0.1
#: bench can hide a data-bound regression behind the per-key floor;
#: one decade up, the expensive keys are data-bound enough to show it.
SF1_HEADLINE = [
    "ann_eval", "hybrid_mmr", "ann_index_roundtrip",
    "curation_pipeline", "dedup_containment", "prf_expand",
    "trend_theil_sen", "source_overlap_kmv", "ann_ivfpq",
    "graph_pagerank", "ivf_train3", "hard_negatives_ivf",
    "stream_hll", "dedup_incremental", "knn_graph_ivf",
    "ann_ivf", "ivf_train2", "fuzzy_match",
    "dedup_containment_capped", "dedup_simhash",
]

#: where the sf1 fixture lives / is generated (same generator and
#: location as SCALING.md's decade measurements and the sf1 parity
#: tests — tools/gen_sf.py is deterministic at a fixed seed)
SF1_DIR = "/tmp/sfgen/sf1"


def _ensure_sf1_fixture() -> str:
    """generate the sf1 fixture on demand (~15 s one-off; reused
    across runs — the generator is seed-deterministic)."""
    import subprocess

    root = os.path.dirname(os.path.abspath(__file__))
    if not os.path.exists(os.path.join(SF1_DIR, "embeddings.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(root, "tools", "gen_sf.py"),
             "--sf", "1.0", "--out", SF1_DIR],
            check=True, cwd=root,
        )
    return SF1_DIR


def main() -> None:
    sf1_mode = "--sf1-headline" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if sf1_mode:
        sf_dir = _ensure_sf1_fixture()

    from rsbsa_etl_spark.registry import QUERIES
    from rsbsa_etl_spark.session import get_spark

    spark = get_spark(app_name="rsbsa_bench")

    # warm-up: JVM + file listing + parquet footers + Python worker
    # pool (mapInPandas paths fork one worker per core on first use —
    # process spawn, not query work), none of which is engine time
    QUERIES["scan_project"](spark, sf_dir).count()
    spark.range(1024).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).count()

    # best-of-N per query: the host is shared and noisy, and a single
    # timing can be 30-50% off; the min over repeats estimates the
    # engine's actual cost (repeat 1 also warms each query's own scan)
    repeats = max(
        1,
        int(
            os.environ.get(
                "SPARK_GRAFT_BENCH_REPEATS", "2" if sf1_mode else "3"
            )
        ),
    )

    # host-noise calibration: the raw warm-scan floor of one fixture
    # table, best-of-3. Query code never touches this number — it
    # moves only with the environment (the r4 record was globally
    # ~1.5x slow purely from a degraded host window), so readers can
    # normalize cross-round comparisons: ratios should be judged
    # against the scan_floor ratio of the two records, not 1.0.
    floor = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
        floor = min(floor, time.perf_counter() - t0)
    scan_floor = round(floor, 3)
    # CPU-side twin of the scan floor: a fixed shuffling aggregate
    # over generated data (no IO at all). The two floors separate
    # "disk/page-cache window" from "CPU-contention window" — a
    # round whose query ratio tracks cpu_floor but not scan_floor is
    # a busy-host artifact, not an IO regression (observed: +10%
    # broad query drift with scan_floor unchanged).
    cfloor = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(20_000_000).selectExpr(
            "xxhash64(id) % 1024 AS k", "id AS v"
        ).groupBy("k").sum("v").count()
        cfloor = min(cfloor, time.perf_counter() - t0)
    cpu_floor = round(cfloor, 3)
    # third calibration axis: OS load average BEFORE this run's own
    # work — external tenant load on the shared host steals a roughly
    # proportional slice from every 32-thread stage while leaving the
    # IO-bound scan floor (and a short cpu probe) nearly untouched;
    # round 7 measured a broad ~10% query drift at BETTER floors that
    # matched a 3.9/32 background load exactly. Recorded so future
    # cross-round comparisons can see all three environment axes.
    load_1m, load_5m, _ = os.getloadavg()
    timings: dict[str, float] = {}
    for name in (SF1_HEADLINE if sf1_mode else HEADLINE):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        # several operators persist() intermediates (LSH bands, fuzzy
        # variants, PageRank edges); each bench call pins a fresh copy
        # and the accumulation evicts/GC-thrashes later queries —
        # measured 5x slowdowns late in the run. Clear between queries
        # so each is timed against an empty cache.
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    sf_val = float(sf) if sf else None

    # Full per-query map goes to a file — the driver's captured tail
    # truncates very long lines, which made r01/r02 BENCH unparseable.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH_SF1.json" if sf1_mode else "BENCH_FULL.json",
    )

    # Round-over-round comparison, machine-derived: before overwriting
    # the committed BENCH_FULL.json (the previous round's record),
    # compute the common-key-set total ratio — raw, and normalized by
    # the scan-floor ratio of the two windows, so "is this round
    # actually slower or was the host just busier" stops being a
    # hand-computed claim. Only comparable records compare: a prior
    # record at a DIFFERENT scale factor (e.g. a one-off sf0.01 run)
    # would make every ratio a bogus ~10x artifact, so the comparison
    # is emitted only when prev.sf == this run's sf.
    metric = "sf1_headline_total" if sf1_mode else "headline_queries_total"
    comparison: dict = {}
    try:
        with open(full_path) as fh:
            prev = json.load(fh)
    except (OSError, ValueError):
        prev = None
    if (
        prev
        and isinstance(prev.get("queries"), dict)
        and prev.get("sf") == sf_val
    ):
        common = [k for k in timings if k in prev["queries"]]
        prev_sum = sum(prev["queries"][k] for k in common)
        now_sum = sum(timings[k] for k in common)
        if common and prev_sum > 0:
            raw = now_sum / prev_sum
            pf = prev.get("scan_floor_sec")
            comparison = {
                "common_set_n": len(common),
                "common_set_prev_sec": round(prev_sum, 3),
                "common_set_now_sec": round(now_sum, 3),
                "common_set_ratio_raw": round(raw, 3),
                "prev_scan_floor_sec": pf,
            }
            if pf and scan_floor:
                comparison["common_set_ratio_normalized"] = round(
                    raw / (scan_floor / pf), 3
                )

    with open(full_path, "w") as fh:
        json.dump(
            {
                "metric": metric,
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "n_queries": len(timings),
                "scan_floor_sec": scan_floor,
                "cpu_floor_sec": cpu_floor,
                "load_avg_prerun": [round(load_1m, 2), round(load_5m, 2)],
                **comparison,
            },
            fh,
            indent=1,
        )

    # Final stdout line stays compact (slowest 10 only) so the tail
    # capture can always parse it.
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    print(
        json.dumps(
            {
                "metric": metric,
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "sf": sf_val,
                "n_queries": len(timings),
                "scan_floor_sec": scan_floor,
                "cpu_floor_sec": cpu_floor,
                "load_avg_prerun": [round(load_1m, 2), round(load_5m, 2)],
                **comparison,
                "full": os.path.basename(full_path),
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
