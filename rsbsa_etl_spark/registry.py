"""The driver contract: named queries, one per implemented operator
(SURVEY.md §2 keys + extension surface).

Every function takes ``(spark, sf_dir)`` and returns a DataFrame;
``oracles.ORACLES`` holds the matching DuckDB SQL built from the same
``params`` constants. Output discipline (SURVEY §7.3.4/§7.3.7):

- no raw timestamp columns — epochs (bigint) or formatted strings;
- money/double aggregates go through DECIMAL and come back as
  double, identically in the oracle;
- every computed column aliased the same on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from rsbsa_etl_spark import params as P
from rsbsa_etl_spark.functions import (
    curation,
    dedup,
    multimodal,
    similarity,
    textstats,
)
from rsbsa_etl_spark.functions.numeric import dec_round, fixed_sum
from rsbsa_etl_spark.functions.strings import apply_table_rules
from rsbsa_etl_spark.functions.temporal import duration_hms, format_manila
from rsbsa_etl_spark.functions.textparse import parse_log_lines, render_log_lines
from rsbsa_etl_spark.operators import aggregates, filters, joins, scans, sorts, sync
from rsbsa_etl_spark.operators.aggregates import decimal_sum
from rsbsa_etl_spark.sources.fixtures import load
from rsbsa_etl_spark.streaming import windows as win

QueryFn = Callable[[SparkSession, str], DataFrame]

from rsbsa_etl_spark.families.relational import *  # noqa: F401,F403
from rsbsa_etl_spark.families.dedup import *  # noqa: F401,F403
from rsbsa_etl_spark.families.ann import *  # noqa: F401,F403
from rsbsa_etl_spark.families.text import *  # noqa: F401,F403
from rsbsa_etl_spark.families.curation import *  # noqa: F401,F403
from rsbsa_etl_spark.families.streaming import *  # noqa: F401,F403
from rsbsa_etl_spark.families.analytics import *  # noqa: F401,F403

# ------------------------------------------------------------------ registry

QUERIES: dict[str, QueryFn] = {
    "scan_filter_in": scan_filter_in,
    "scan_project": scan_project,
    "scan_incremental": scan_incremental,
    "agg_count_filtered": agg_count_filtered,
    "filter_notnull": filter_notnull,
    "filter_split_valid": filter_split_valid,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_bridge_2step": join_bridge_2step,
    "join_dependent": join_dependent,
    "groupby_collect": groupby_collect,
    "distinct_keys": distinct_keys,
    "agg_sum_groups": agg_sum_groups,
    "sort_order": sort_order,
    "limit_offset": limit_offset,
    "topk_recent": topk_recent,
    "sort_zorder": sort_zorder,
    "scan_file_provenance": scan_file_provenance,
    "union_paths": union_paths,
    "set_except_intersect": set_except_intersect,
    "agg_incremental_totals": agg_incremental_totals,
    "window_lag_delta": window_lag_delta,
    "quantile_sketch": quantile_sketch,
    "agg_ols_slope": agg_ols_slope,
    "scd2_intervals": scd2_intervals,
    "upsert_merge": upsert_merge,
    "merge_cdc": merge_cdc,
    "overwrite_by_key": overwrite_by_key,
    "sync_pipeline_o2o": sync_pipeline_o2o,
    "sync_pipeline_o2m": sync_pipeline_o2m,
    "sync_metrics": sync_metrics,
    "string_upper_multi": string_upper_multi,
    "string_concat_split": string_concat_split,
    "cond_coalesce": cond_coalesce,
    "ts_format_tz": ts_format_tz,
    "math_duration": math_duration,
    "text_parse_log": text_parse_log,
    "json_roundtrip": json_roundtrip,
    "window_moving_avg": window_moving_avg,
    "window_time_range": window_time_range,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_percentiles": agg_percentiles,
    "agg_pivot": agg_pivot,
    "agg_unpivot": agg_unpivot,
    "json_map_extract": json_map_extract,
    "fuzzy_match": fuzzy_match,
    "embedding_centroids": embedding_centroids,
    "distinct_sketch": distinct_sketch,
    "lm_score": lm_score,
    "split_assign": split_assign,
    "join_asof": join_asof,
    "join_range": join_range,
    "join_full_outer_nullsafe": join_full_outer_nullsafe,
    "join_skew_salted": join_skew_salted,
    "join_bloom_pruned": join_bloom_pruned,
    "ivf_train": ivf_train,
    "ivf_train2": ivf_train2,
    "ivf_train3": ivf_train3,
    "window_tumbling": window_tumbling,
    "window_sliding": window_sliding,
    "window_session": window_session,
    "window_session_chunked": window_session_chunked,
    "stream_late_drop": stream_late_drop,
    "stream_dedup": stream_dedup,
    "stream_stateful_totals": stream_stateful_totals,
    "stream_join": stream_join,
    "stream_join_evicting": stream_join_evicting,
    "dedup_exact": dedup_exact,
    "dedup_minhash": dedup_minhash,
    "dedup_minhash_capped": dedup_minhash_capped,
    "dedup_minhash_est": dedup_minhash_est,
    "dedup_simhash": dedup_simhash,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_incremental": dedup_incremental,
    "decontam_embedding": decontam_embedding,
    "decontam_spans": decontam_spans,
    "decontam_spans_cut": decontam_spans_cut,
    "decontam_report": decontam_report,
    "decontam_fuzzy": decontam_fuzzy,
    "knn_graph": knn_graph,
    "knn_graph_ivf": knn_graph_ivf,
    "knn_graph_auto": knn_graph_auto,
    "ann_geometry": ann_geometry,
    "embedding_outliers": embedding_outliers,
    "dedup_embedding": dedup_embedding,
    "dedup_embedding_auto": dedup_embedding_auto,
    "dedup_semantic": dedup_semantic,
    "dedup_clusters": dedup_clusters,
    "graph_pagerank": graph_pagerank,
    "ann_bruteforce": ann_bruteforce,
    "ann_lsh": ann_lsh,
    "ann_ivf": ann_ivf,
    "ann_lsh_multiprobe": ann_lsh_multiprobe,
    "ann_recall": ann_recall,
    "lang_id": lang_id,
    "quality_score": quality_score,
    "token_count": token_count,
    "doc_fingerprint": doc_fingerprint,
    "term_topk": term_topk,
    "tfidf_topk": tfidf_topk,
    "bm25_topk": bm25_topk,
    "udtf_chunk_tokens": udtf_chunk_tokens,
    "cms_topk": cms_topk,
    "multimodal_meta": multimodal_meta,
    "multimodal_features": multimodal_features,
    "multimodal_chunks": multimodal_chunks,
    "repetition_score": repetition_score,
    "decontam_ngram": decontam_ngram,
    "pack_sequences": pack_sequences,
    "pii_redact": pii_redact,
    "sample_temperature": sample_temperature,
    "sample_token_budget": sample_token_budget,
    "quality_adaptive": quality_adaptive,
    "compact_plan": compact_plan,
    "burst_detect": burst_detect,
    "novelty_score": novelty_score,
    "stream_burst": stream_burst,
    "sketch_merge": sketch_merge,
    "stream_sample": stream_sample,
    "multimodal_resize": multimodal_resize,
    "window_gap_islands": window_gap_islands,
    "join_bucketed": join_bucketed,
    "ts_decompose": ts_decompose,
    "scan_partition_pruned": scan_partition_pruned,
    "corpus_summary": corpus_summary,
    "tokenize_offsets": tokenize_offsets,
    "group_sample_n": group_sample_n,
    "bpe_pairs": bpe_pairs,
    "lang_confusion": lang_confusion,
    "rfm_segments": rfm_segments,
    "hard_negatives": hard_negatives,
    "hard_negatives_ivf": hard_negatives_ivf,
    "ann_index_roundtrip": ann_index_roundtrip,
    "graph_triangles": graph_triangles,
    "graph_triangles_ivf": graph_triangles_ivf,
    "ts_autocorr": ts_autocorr,
    "k_anonymity": k_anonymity,
    "feature_hashing": feature_hashing,
    "quantile_bucketize": quantile_bucketize,
    "stream_cdc_apply": stream_cdc_apply,
    "window_rolling_median": window_rolling_median,
    "state_durations": state_durations,
    "sample_fixed_n": sample_fixed_n,
    "sample_weighted": sample_weighted,
    "sample_stratified": sample_stratified,
    "sample_stratified_rates": sample_stratified_rates,
    "mix_epochs": mix_epochs,
    "tokenizer_fertility": tokenizer_fertility,
    "tokenizer_fertility_bpe": tokenizer_fertility_bpe,
    "text_strip_markup": text_strip_markup,
    "dedup_segments": dedup_segments,
    "window_ntile": window_ntile,
    "window_first_last": window_first_last,
    "agg_grouping_sets": agg_grouping_sets,
    "join_spatial_grid": join_spatial_grid,
    "join_temporal_validity": join_temporal_validity,
    "agg_time_rollup": agg_time_rollup,
    "validate_domains": validate_domains,
    "profile_stats": profile_stats,
    "group_mode": group_mode,
    "outlier_zscore": outlier_zscore,
    "outlier_mad": outlier_mad,
    "hhi_concentration": hhi_concentration,
    "corr_groups": corr_groups,
    "events_funnel": events_funnel,
    "events_dau_mau": events_dau_mau,
    "retention_cohort": retention_cohort,
    "ngram_topk": ngram_topk,
    "dedup_priority": dedup_priority,
    "event_transitions": event_transitions,
    "group_topk": group_topk,
    "activity_histogram": activity_histogram,
    "shuffle_shards": shuffle_shards,
    "mix_interleave": mix_interleave,
    "tpch_q1": tpch_q1,
    "tpch_q2": tpch_q2,
    "tpch_q3": tpch_q3,
    "tpch_q4": tpch_q4,
    "tpch_q5": tpch_q5,
    "tpch_q6": tpch_q6,
    "tpch_q7": tpch_q7,
    "tpch_q8": tpch_q8,
    "tpch_q9": tpch_q9,
    "tpch_q10": tpch_q10,
    "tpch_q11": tpch_q11,
    "tpch_q12": tpch_q12,
    "tpch_q13": tpch_q13,
    "tpch_q14": tpch_q14,
    "tpch_q15": tpch_q15,
    "tpch_q16": tpch_q16,
    "tpch_q17": tpch_q17,
    "tpch_q18": tpch_q18,
    "tpch_q19": tpch_q19,
    "tpch_q20": tpch_q20,
    "tpch_q21": tpch_q21,
    "tpch_q22": tpch_q22,
    "vocab_coverage": vocab_coverage,
    "dedup_containment": dedup_containment,
    "dedup_containment_capped": dedup_containment_capped,
    "dedup_containment_auto": dedup_containment_auto,
    "dedup_jaccard_capped": dedup_jaccard_capped,
    "dedup_jaccard_auto": dedup_jaccard_auto,
    "dedup_spans": dedup_spans,
    "dedup_spans_intra": dedup_spans_intra,
    "dedup_spans_intra_cut": dedup_spans_intra_cut,
    "dedup_embedding_incremental": dedup_embedding_incremental,
    "bpe_train": bpe_train,
    "bpe_segment": bpe_segment,
    "hybrid_search_rrf": hybrid_search_rrf,
    "mmr_rerank": mmr_rerank,
    "mmr_rerank_dist": mmr_rerank_dist,
    "mmr_rerank_ivf": mmr_rerank_ivf,
    "mmr_rerank_auto": mmr_rerank_auto,
    "prf_requery": prf_requery,
    "context_pack": context_pack,
    "dsir_weights": dsir_weights,
    "dsir_resample": dsir_resample,
    "rocchio_classify": rocchio_classify,
    "fingerprint_winnow": fingerprint_winnow,
    "bootstrap_ci": bootstrap_ci,
    "ab_cuped": ab_cuped,
    "ann_mrr": ann_mrr,
    "ann_eval": ann_eval,
    "hybrid_mmr": hybrid_mmr,
    "prf_expand": prf_expand,
    "dedup_spans_cut": dedup_spans_cut,
    "dedup_recall": dedup_recall,
    "l_diversity": l_diversity,
    "ts_changepoint": ts_changepoint,
    "benford_digits": benford_digits,
    "ab_kstest": ab_kstest,
    "value_ecdf": value_ecdf,
    "sketch_hll": sketch_hll,
    "window_ewma": window_ewma,
    "skyline_pareto": skyline_pareto,
    "source_overlap_kmv": source_overlap_kmv,
    "source_overlap_kmv_sketch": source_overlap_kmv_sketch,
    "winsorize_stats": winsorize_stats,
    "token_gini": token_gini,
    "scan_jsonl_corrupt": scan_jsonl_corrupt,
    "scan_csv_typed": scan_csv_typed,
    "scan_schema_evolution": scan_schema_evolution,
    "scan_orc_roundtrip": scan_orc_roundtrip,
    "ab_chisq": ab_chisq,
    "seq_trigrams": seq_trigrams,
    "basket_pairs": basket_pairs,
    "attribution_first_touch": attribution_first_touch,
    "trend_theil_sen": trend_theil_sen,
    "stream_hll": stream_hll,
    "trend_theil_sen_capped": trend_theil_sen_capped,
    "trend_theil_sen_auto": trend_theil_sen_auto,
    "resample_interpolate": resample_interpolate,
    "group_percentiles": group_percentiles,
    "join_nearest": join_nearest,
    "window_zscore_rolling": window_zscore_rolling,
    "snapshot_diff": snapshot_diff,
    "resample_ffill": resample_ffill,
    "ab_ttest": ab_ttest,
    "agg_string_concat": agg_string_concat,
    "rolling_active": rolling_active,
    "inverted_index": inverted_index,
    "term_pmi": term_pmi,
    "skew_stats": skew_stats,
    "window_cumdistinct": window_cumdistinct,
    "curation_pipeline": curation_pipeline,
    "join_cross": join_cross,
    "agg_filtered_multi": agg_filtered_multi,
    "embedding_quantize": embedding_quantize,
    "embedding_pq": embedding_pq,
    "ann_ivfpq": ann_ivfpq,
    "stream_session": stream_session,
    "stream_tail": stream_tail,
}

#: exact-arm -> (scale-dial key, why) — keys whose headline form is
#: the full-recall/exact computation but whose cost grows
#: superlinearly on adversarial data; the dial is the shipped
#: sub-quadratic sibling with the SAME verified semantics on what it
#: emits. The CLI `explain` prints this pointer both ways so a future
#: operator picks the scale-safe arm by default (r7 verdict item 6);
#: SCALING.md carries the measured three-point growth for each.
SCALE_DIALS: dict[str, tuple[str, str]] = {
    "dedup_containment": (
        "dedup_containment_capped",
        "capped-LSH candidates -> exact verify: every emitted pair "
        "still exactly verified, recall ~0.9 at 2x+ less cost; the "
        "exact prefix arm's candidate volume grows with per-shingle "
        "posting density^2",
    ),
    "dedup_ngram_jaccard": (
        "dedup_minhash",
        "banded MinHash-LSH thresholds candidate volume by "
        "construction; the exact AllPairs prefix arm is the "
        "full-recall audit dial on template-heavy corpora",
    ),
    "trend_theil_sen": (
        "trend_theil_sen_capped",
        "deterministic hash-min sample of <=32 events/user bounds "
        "pairing at 496 pairs/user (exact agreement at or under the "
        "cap); the uncapped arm is quadratic per user",
    ),
    "source_overlap_kmv": (
        "source_overlap_kmv_sketch",
        "KMV estimate only — drops the vocabulary self-equi-join "
        "entirely (0 SMJ; sources x k rows after one deduped-vocab "
        "shuffle); the exact-Jaccard arm is the verification dial",
    ),
    "window_session": (
        "window_session_chunked",
        "two-level sessionize: level 1 within (user, 6h chunk) "
        "bounds per-task input for any activity rate, level 2 "
        "merges only boundary SESSIONS — bit-identical output "
        "(shares the flat key's oracle verbatim); the flat per-user "
        "window measured a 1.29x hot-key straggler at sf1 skew",
    ),
    "knn_graph": (
        "knn_graph_ivf",
        "√n-cell IVF coarse quantization: O(n^1.5·nprobe) instead of "
        "the exact tiled form's O(n²/tiles) FLOPs (round-8 measured "
        "exponent 1.4 at the top decade); recall misses concentrate "
        "on neighbors across unprobed cell boundaries",
    ),
    "graph_triangles": (
        "graph_triangles_ivf",
        "the triangles key's cost is the inherited EXACT graph build "
        "(round-8 exponent 1.11; the triangle join is node-linear) — "
        "the dial swaps in the knn_graph_ivf graph and keeps the "
        "identical triangle core, fully value-checked via the "
        "composed oracle",
    ),
    "ann_recall": (
        "ann_eval",
        "recall@k AND MRR@k from one persisted set of index scans "
        "(half the index builds when both metrics are wanted)",
    ),
    "ann_mrr": (
        "ann_eval",
        "recall@k AND MRR@k from one persisted set of index scans "
        "(half the index builds when both metrics are wanted)",
    ),
    "hard_negatives": (
        "hard_negatives_ivf",
        "the same top-k-by-different-label semantics within IVF "
        "probed cells — O(n^1.5*nprobe) instead of the exact tiled "
        "all-pairs sweep the label mask rides on; deterministic and "
        "value-checked like the parent graph",
    ),
    "dedup_embedding": (
        "dedup_embedding_auto",
        "r15: the measured crossover WIRED (SCALING.md 'embedding-"
        "dedup auto-dial') — one corpus count keeps the exact "
        "all-pairs join at n <= 8000 (the measured 5k->10k "
        "wall-clock gap) and takes the LINEAR SemDeDup "
        "member->exemplar prune above it (r9 second decade measured "
        "the exact arm's OUTPUT going quadratic: 5.0M pairs at 200k "
        "isotropic vectors, wall exponent 1.56 even with the "
        "bounded-chunk kernel); dedup_semantic stays the per-vector "
        "keep-flag form of the linear arm",
    ),
}

#: reverse view: dial key -> ALL the exact/audit arms it relieves
#: (a dial can serve several standalone keys — ann_eval consolidates
#: both ann_recall and ann_mrr; a plain dict comprehension would keep
#: only the last arm and silently drop the rest, r8 advisor)
SCALE_DIAL_OF: dict[str, list[str]] = {}
for _exact, (_dial, _why) in SCALE_DIALS.items():
    SCALE_DIAL_OF.setdefault(_dial, []).append(_exact)

# The driver's correctness sweep walks QUERIES in dict order and
# checks the first ~50 keys per round. The ordering rule below is
# data-driven and openly stated (it is also pinned by
# tests/test_sweep_rotation.py so it can't silently drift):
#
#   1. keys whose LATEST committed driver row is red come first, so a
#      fix is re-verified the very next round;
#   2. then keys with NO driver row in any committed
#      CORRECTNESS_r*.json, in the curated risk order of
#      _UNTESTED_PRIORITY (streaming/stateful first — the riskiest
#      surface — then curation, windows, extension joins, …);
#   3. keys already driver-green demote to the tail, ordered
#      (narrow-changed, closure-changed, AGE): greens whose own fn or
#      oracle was edited since their latest driver row first, then
#      greens whose transitive closure changed, then oldest committed
#      round first (registry order within a segment+round). Their
#      evidence stays on record, and every one of them is still
#      value-checked against its DuckDB oracle locally on every
#      pytest run (tests/test_oracle_parity.py covers ALL keys at
#      sf0.001, including result-type parity), so demotion never
#      removes correctness coverage. Once the backlog is drained
#      (round 6), this makes the sweep a rolling freshness check:
#      each round re-confirms the ~50 changed-or-stalest greens
#      against current code.
#
# Because the green set is parsed from the committed driver records at
# import time, the rotation is self-maintaining: when a round's
# CORRECTNESS file lands in the repo, its greens demote automatically
# and the next untested tranche surfaces.


#: keys whose DataFrame BUILD executes work (streaming replays,
#: write paths, iterative driver loops) — excluded from PLAN-ONLY
#: test passes (tests/test_plans.py's window allowlist), where
#: building must stay lazy. The `audit` CLI no longer excludes
#: anything (round 11): it executes every key via
#: plans.audit.audit_key, capturing streaming micro-batch plans.
AUDIT_EXCLUDE_PREFIXES = ("stream_", "sync_", "upsert_", "overwrite_")
AUDIT_EXCLUDE = frozenset({
    # per-round driver loops: building the DataFrame RUNS the loop
    "bpe_train", "bpe_segment", "tokenizer_fertility_bpe",
    "hybrid_search_rrf", "merge_cdc",
    # building the DataFrame runs the driver-arm greedy fold
    # eagerly (mmr_rerank/hybrid_mmr below MMR_DIST_MIN_QUERIES) or
    # eagerly materializes the retrieval pool for the distributed
    # cogrouped arm (mmr_rerank_dist; round 11)
    "mmr_rerank", "hybrid_mmr", "mmr_rerank_dist",
    # ingestion round-trips: building the DataFrame WRITES the
    # tempdir it then reads back (ann_index_roundtrip also collects
    # the centroid table driver-side to plant the partition filter)
    "scan_jsonl_corrupt", "scan_csv_typed",
    "scan_schema_evolution", "scan_orc_roundtrip",
    "ann_index_roundtrip",
    # building the DataFrame runs the one-pass √n cell-count sizing
    "knn_graph_ivf", "graph_triangles_ivf", "hard_negatives_ivf",
    # building the DataFrame eagerly materializes the persisted exact
    # ranking (one count() so the brute-force scan builds exactly
    # once — r9; see ann_eval's docstring)
    "ann_recall", "ann_mrr", "ann_eval",
})


def _driver_latest_rows_and_rounds() -> tuple[dict, dict]:
    """Latest committed driver-correctness row per key, plus the round
    number that row came from (the age tier's sort key).

    Reads the in-repo ``CORRECTNESS_r*.json`` records the external
    driver writes each round (sorted so later rounds override).
    """
    import json as _json
    import re as _re
    from pathlib import Path as _Path

    rows: dict = {}
    rounds: dict = {}
    root = _Path(__file__).resolve().parent.parent

    def _round_of(p: _Path) -> int:
        m = _re.search(r"r(\d+)", p.name)
        return int(m.group(1)) if m else 0

    # sort by the PARSED round number, not the filename: lexicographic
    # order breaks at r100 ('r100' < 'r99') and for unpadded rN, and
    # the later-round-overrides rule below depends on iteration order
    # (r7 advisor).
    for p in sorted(root.glob("CORRECTNESS_r*.json"), key=_round_of):
        try:
            data = _json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        rnd = _round_of(p)
        if isinstance(data, dict):
            for k, v in data.items():
                if isinstance(v, dict):
                    rows[k] = v
                    rounds[k] = rnd
    return rows, rounds


def _driver_latest_rows() -> dict:
    """Latest committed driver-correctness row per key (rows only)."""
    return _driver_latest_rows_and_rounds()[0]


def _is_green(row: dict) -> bool:
    # Rows-only keys (no oracle) record hash_match/schema_match as
    # null/absent — count them green on rows_match; an explicit
    # False on ANY of the driver's three flags stays red.
    return bool(
        row.get("rows_match")
        and row.get("err") is None
        and row.get("hash_match") is not False
        and row.get("schema_match") is not False
    )


def _dep_closure(fn) -> dict[str, str]:
    """Transitive, FUNCTION-granular dependency closure of a registry
    callable inside the ``rsbsa_etl_spark`` package: every function /
    class whose source the key's execution can reach (resolved
    statically — AST ``Name`` and ``module.attr`` references through
    each function's globals), plus the ``repr`` of every package
    constant it reads (so a ``params`` change flags exactly the keys
    that read that constant, not the whole registry).

    Returns ``{dep_id: source_or_repr}`` with stable ids
    (``module.qualname``) and deterministic values (sets are sorted
    before repr — PYTHONHASHSEED must not leak into the hash).

    Granularity rationale (r10, replacing a module-bytes prototype):
    whole-module hashing flagged 71 of 253 keys as changed after a
    routine round of edits — so coarse the change tier would crowd
    the age tier out of the driver's 50-key sweep head. Function
    granularity flags a key only when code it actually executes (or
    a constant it actually reads) changed.

    FUNCTION-LOCAL IMPORTS are resolved since round 12: the registry
    wrapper style is ``from rsbsa_etl_spark.x import y`` inside each
    wrapper body, and those names never reach ``__globals__`` — the
    globals-only walk left the entire implementation module OUT of
    ~150 keys' closures (discovered when a round of retrieval.py
    edits flagged zero keys). KEYHASHES was re-seeded from each
    key's driver-tested tree under the extended algorithm the same
    round. Remaining known blind spots, all covered by the full
    local oracle-parity pytest gate: dynamic dispatch through
    strings, and source reached only via data tables of callables.
    """
    import sys as _sys
    import types as _types

    out: dict[str, str] = {}
    seen: set[str] = set()

    def _det_repr(v) -> str:
        if isinstance(v, (set, frozenset)):
            return "{" + ", ".join(sorted(repr(x) for x in v)) + "}"
        if isinstance(v, dict):
            return (
                "{"
                + ", ".join(
                    f"{k!r}: {_det_repr(x)}"
                    for k, x in sorted(v.items(), key=lambda kv: repr(kv[0]))
                )
                + "}"
            )
        if isinstance(v, (list, tuple)):
            inner = ", ".join(_det_repr(x) for x in v)
            return f"[{inner}]" if isinstance(v, list) else f"({inner})"
        r = repr(v)
        # id-based reprs (functions, instances without __repr__) embed
        # process-specific addresses — substitute a stable stand-in so
        # a key is never flagged changed-forever by a memory address
        # (r10 advice item 5; mirrored in tools/snapshot_keyhashes.py)
        if " at 0x" in r:
            return (
                f"<{type(v).__module__}.{type(v).__qualname__}:"
                f"{getattr(v, '__qualname__', '')}>"
            )
        return r

    def _unwrap(obj):
        # pandas_udf / functools wrappers: hash the wrapped source
        inner = getattr(obj, "func", None) or getattr(obj, "__wrapped__", None)
        return inner if callable(inner) else obj

    def _node(obj, dep_id: str, mod: str):
        """Parse one dependency once per process: its source plus
        the AST-discovered direct children (callables to recurse
        into) and constants it reads. getsource + ast.parse dominate
        closure cost, so memoizing the node (keyed by dep_id — a
        function's source and globals are fixed within a process)
        turns the all-keys sweep from ~2s of re-parsing shared
        helpers 253× into one parse per function (r10 advice item 4).
        Const VALUES are kept by reference; their reprs are taken at
        walk time so semantics match the uncached form exactly (the
        tool's mirror stays uncached — byte-equal digests are pinned
        by tests/test_sweep_rotation.py)."""
        import ast as _ast
        import inspect as _inspect
        import textwrap as _textwrap

        cached = _DEP_NODE_CACHE.get(dep_id)
        if cached is not None:
            return cached
        try:
            src = _inspect.getsource(obj)
        except (OSError, TypeError):
            node = (dep_id, (), ())  # deterministic stand-in
            _DEP_NODE_CACHE[dep_id] = node
            return node
        children: list = []
        consts: list = []
        g = getattr(obj, "__globals__", None)
        if g is None:  # classes: resolve through their module
            g = getattr(_sys.modules.get(mod), "__dict__", {})
        try:
            tree = _ast.parse(_textwrap.dedent(src))
        except SyntaxError:
            tree = None
        refs: list = []
        # pass 1 (round 12): FUNCTION-LOCAL package imports. The
        # registry style is `from rsbsa_etl_spark.x import y` inside
        # each wrapper body — those names never reach the function's
        # __globals__, so the globals-only resolution below was blind
        # to the entire implementation module of ~150 keys (found in
        # round 12: editing functions/retrieval.py flagged NOTHING).
        # Resolve the imported objects directly; imported modules
        # join a local alias map consulted by the Attribute handler.
        local_mods: dict = {}
        if tree is not None:
            import importlib as _importlib

            for node in _ast.walk(tree):
                if isinstance(node, _ast.ImportFrom):
                    if node.level or not (node.module or "").startswith(
                        "rsbsa_etl_spark"
                    ):
                        continue
                    try:
                        m = _importlib.import_module(node.module)
                    except Exception:
                        continue
                    for a in node.names:
                        if a.name == "*":
                            continue
                        val = getattr(m, a.name, None)
                        if val is None:
                            # `from rsbsa_etl_spark.functions import
                            # spatial` style: the name is a SUBMODULE
                            # not yet imported anywhere, so it isn't
                            # an attribute of the package object —
                            # the r14 blind spot that left
                            # spatial.radius_pairs out of
                            # join_spatial_grid's closure
                            try:
                                val = _importlib.import_module(
                                    f"{node.module}.{a.name}"
                                )
                            except Exception:
                                pass
                        if isinstance(val, _types.ModuleType):
                            local_mods[a.asname or a.name] = val
                        else:
                            refs.append((a.name, val))
                elif isinstance(node, _ast.Import):
                    for a in node.names:
                        if a.name.startswith("rsbsa_etl_spark") and a.asname:
                            try:
                                local_mods[a.asname] = (
                                    _importlib.import_module(a.name)
                                )
                            except Exception:
                                pass
        if tree is not None:
            for node in _ast.walk(tree):
                if isinstance(node, _ast.Attribute) and isinstance(
                    node.value, _ast.Name
                ):
                    base = local_mods.get(node.value.id, g.get(node.value.id))
                    if isinstance(base, _types.ModuleType) and (
                        base.__name__.startswith("rsbsa_etl_spark")
                    ):
                        refs.append(
                            (f"{base.__name__}.{node.attr}",
                             getattr(base, node.attr, None))
                        )
                elif isinstance(node, _ast.Name):
                    refs.append((node.id, g.get(node.id)))
        for name, val in refs:
            if val is None or isinstance(val, _types.ModuleType):
                continue
            if callable(val):
                children.append(val)
                continue
            # a package CONSTANT the code reads (params thresholds,
            # rule tables, …) — include its value; constants imported
            # into a function's globals came from an rsbsa module by
            # definition of our import style, so include any
            # non-callable global that is not a dunder/builtin
            if name.startswith("__"):
                continue
            consts.append((f"const.{name}", val))
        node = (src, tuple(children), tuple(consts))
        _DEP_NODE_CACHE[dep_id] = node
        return node

    def _visit(obj):
        obj = _unwrap(obj)
        mod = getattr(obj, "__module__", "") or ""
        if not mod.startswith("rsbsa_etl_spark"):
            return
        if not isinstance(obj, (_types.FunctionType, type)):
            return
        dep_id = f"{mod}.{getattr(obj, '__qualname__', '?')}"
        if dep_id in seen:
            return
        seen.add(dep_id)
        entry, children, consts = _node(obj, dep_id, mod)
        out[dep_id] = entry
        for key, val in consts:
            if key not in out:
                try:
                    out[key] = _det_repr(val)
                except Exception:
                    out[key] = key[len("const."):]
        for child in children:
            _visit(child)

    _visit(fn)
    return out


#: per-process memo for ``_dep_closure`` nodes: dep_id → (source,
#: child callables, (const_key, value) pairs). Shared helpers are
#: parsed once instead of once per registry key.
_DEP_NODE_CACHE: dict = {}


def _key_code_hash(key: str, fn=None, oracle: str | None = None) -> str:
    """Content hash of what a key's driver-correctness row attests
    to: the registered function's transitive function-level source
    closure (``_dep_closure``) plus its DuckDB oracle string. Equal
    hash ⇒ the code the driver verified is byte-identical to the
    code that would run today; a mismatch sends the key back to the
    sweep head (``_changed_since_checked``). The algorithm is
    duplicated in ``tools/snapshot_keyhashes.py`` (which must run
    inside historical trees that predate this helper) — the two are
    pinned byte-equal by tests/test_sweep_rotation.py.
    """
    import hashlib as _hashlib

    if fn is None:
        fn = QUERIES[key]
    if oracle is None:
        from rsbsa_etl_spark.oracles import ORACLES as _O

        oracle = _O.get(key, "")
    closure = _dep_closure(fn)
    h = _hashlib.sha256()
    h.update((oracle or "").encode())
    for dep_id in sorted(closure):
        h.update(b"\x00")
        h.update(dep_id.encode())
        h.update(b"\x01")
        h.update(closure[dep_id].encode())
    return h.hexdigest()


def _key_narrow_hash(key: str, fn=None, oracle: str | None = None) -> str:
    """Narrow content hash: ONLY the key's registered function source
    plus its DuckDB oracle string — no transitive closure. The
    closure hash (``_key_code_hash``) is the sensitive tier but
    saturates under shared-helper churn (one ``load`` edit flags all
    253 keys — the r10 failure); this one cannot: a mismatch means
    the key ITSELF or its correctness contract was edited since its
    last driver row, the strongest possible re-sweep signal. The
    algorithm is duplicated in ``tools/snapshot_keyhashes.py``
    (which must run inside historical trees that predate this
    helper) — the two are pinned byte-equal by
    tests/test_sweep_rotation.py::test_tool_hash_matches_registry_hash.
    """
    import hashlib as _hashlib
    import inspect as _inspect

    if fn is None:
        fn = QUERIES[key]
    if oracle is None:
        from rsbsa_etl_spark.oracles import ORACLES as _O

        oracle = _O.get(key, "")
    inner = getattr(fn, "func", None) or getattr(fn, "__wrapped__", None)
    if callable(inner):
        fn = inner
    try:
        src = _inspect.getsource(fn)
    except (OSError, TypeError):
        src = (
            f"{getattr(fn, '__module__', '?')}."
            f"{getattr(fn, '__qualname__', '?')}"
        )
    h = _hashlib.sha256()
    h.update((oracle or "").encode())
    h.update(b"\x00")
    h.update(src.encode())
    return h.hexdigest()


def _recorded_key_hashes() -> dict:
    """KEYHASHES.json: per key, the code hash as of the key's latest
    committed driver row (``tools/snapshot_keyhashes.py`` maintains
    it — run at round start, when the new CORRECTNESS record lands
    and the tree still equals what the driver tested)."""
    import json as _json
    from pathlib import Path as _Path

    p = _Path(__file__).resolve().parent.parent / "KEYHASHES.json"
    try:
        data = _json.loads(p.read_text())
    except (OSError, ValueError):
        return {}
    return data if isinstance(data, dict) else {}


def _changed_since_checked(
    green: set, recorded: dict | None = None
) -> tuple[set, set]:
    """(narrow_changed, closure_changed): greens whose CURRENT code
    hash differs from the hash recorded at their latest driver row —
    their evidence verified a previous implementation, so age alone
    under-ranks them (the r9 ``sample_stratified`` lesson:
    reimplemented in r9, newest driver row r7, and the age tier
    could not see it).

    Two tiers (r11, after the r10 closure-only form saturated at
    253/253 flagged and degenerated into pure age order):

    * narrow — the key's OWN registered fn source or oracle string
      changed (``_key_narrow_hash``). Immune to shared-helper churn;
      the strongest re-sweep signal.
    * closure — anything in the key's transitive closure changed
      (``_key_code_hash``). Sensitive but saturating; ranked second.

    A green with NO recorded hash is treated as changed on both
    tiers (unknown provenance ⇒ re-check). Keys recorded green in a
    CORRECTNESS file but since removed/renamed from the registry are
    skipped — a stale driver row must not crash registry import
    (r10 advice item 4)."""
    if recorded is None:
        recorded = _recorded_key_hashes()
    narrow: set = set()
    closure: set = set()
    for k in green:
        if k not in QUERIES:
            continue
        rec = recorded.get(k)
        if not isinstance(rec, dict):
            narrow.add(k)
            closure.add(k)
            continue
        if rec.get("narrow") != _key_narrow_hash(k):
            narrow.add(k)
        if rec.get("hash") != _key_code_hash(k):
            closure.add(k)
    return narrow, closure


# Round-6 queue: zero reds; pending = the 32 round-5 leftovers plus
# the 16 round-6 additions (value_ecdf sketch_hll window_ewma
# skyline_pareto source_overlap_kmv ab_chisq seq_trigrams
# basket_pairs attribution_first_touch trend_theil_sen(_capped)
# stream_hll resample_interpolate group_percentiles join_nearest
# window_zscore_rolling) — 48 keys, within ONE sweep budget, every
# one replica-green at sf0.01 AND sf0.1 from /tmp
# (LOCAL_SWEEP_r06.md). After this sweep every registered key has a
# driver row. Key additions stop at 48 pending by design.
# (Historical note, round-5 head was the two r4 reds + 48 untested —
# all 50 drained green, see CORRECTNESS_r05.json.) The prior
# round-6 remainder comment listed the
# exact tail `rfm_segments hard_negatives graph_triangles
# ts_autocorr k_anonymity feature_hashing quantile_bucketize
# stream_cdc_apply window_rolling_median state_durations
# dedup_containment_capped dedup_spans dedup_embedding_incremental
# bpe_train bpe_segment hybrid_search_rrf mmr_rerank dsir_weights
# dsir_resample rocchio_classify fingerprint_winnow bootstrap_ci
# ab_cuped ann_mrr hybrid_mmr prf_expand dedup_spans_cut
# dedup_recall l_diversity ts_changepoint benford_digits ab_kstest`
# (now 32 keys)
# (every one replica-green at sf0.01 AND sf0.1 from /tmp), after
# which every registry key has a driver row and the rotation
# degenerates to a stable order. The drain stays optimal by
# construction — tests/test_sweep_rotation.py pins the
# work-conserving ordering and the 3-budget queue cap.
_UNTESTED_PRIORITY = [
    # streaming — checkpointed state, watermark eviction: riskiest
    "stream_late_drop", "stream_dedup", "stream_stateful_totals",
    "stream_join", "stream_join_evicting", "stream_session",
    "stream_tail",
    # pipeline metrics + multimodal plumbing
    "sync_metrics", "multimodal_meta", "multimodal_features",
    "multimodal_chunks",
    # curation family
    "curation_pipeline", "pii_redact", "decontam_ngram",
    "pack_sequences", "sample_temperature", "shuffle_shards",
    "mix_interleave",
    # window functions
    "window_tumbling", "window_sliding", "window_session",
    "window_ntile", "window_first_last", "window_cumdistinct",
    # extension joins
    "join_asof", "join_range", "join_full_outer_nullsafe",
    "join_skew_salted", "join_spatial_grid", "join_temporal_validity",
    "join_cross",
    # dedup/ANN remainder (incl. the round-4 bipartite additions)
    "dedup_minhash_est", "dedup_incremental", "decontam_fuzzy",
    "knn_graph", "embedding_outliers",
    "dedup_segments", "dedup_priority",
    "graph_pagerank", "ann_lsh_multiprobe",
    "ivf_train", "ivf_train2", "ivf_train3",
    "embedding_quantize", "embedding_pq",
    # provenance / UDTF / text tail
    "scan_file_provenance", "udtf_chunk_tokens",
    "repetition_score", "vocab_coverage",
    # --- round-5 tranche starts here (see comment above) ---
    "agg_time_rollup", "agg_grouping_sets", "term_topk", "bm25_topk",
    "ngram_topk", "inverted_index", "term_pmi", "cms_topk",
    "group_topk", "group_mode", "outlier_zscore", "outlier_mad",
    "hhi_concentration", "corr_groups", "events_funnel",
    "events_dau_mau", "retention_cohort", "event_transitions",
    "activity_histogram", "snapshot_diff", "resample_ffill",
    "ab_ttest", "agg_string_concat", "rolling_active", "skew_stats",
    "validate_domains", "profile_stats", "agg_filtered_multi",
    # round-4 late additions (no driver row yet — join the r5 tranche)
    "join_bloom_pruned", "sample_token_budget", "quality_adaptive",
    "compact_plan", "burst_detect", "novelty_score", "sample_fixed_n",
    "stream_burst", "sketch_merge", "group_sample_n", "bpe_pairs",
    "lang_confusion", "stream_sample", "multimodal_resize",
    "window_gap_islands", "join_bucketed", "ts_decompose",
    "scan_partition_pruned", "corpus_summary", "tokenize_offsets",
    "rfm_segments", "hard_negatives", "graph_triangles",
    "ts_autocorr", "k_anonymity", "feature_hashing",
    "quantile_bucketize", "stream_cdc_apply",
    "window_rolling_median", "state_durations",
    # round-5 additions (join the round-6 remainder)
    "dedup_containment_capped", "dedup_spans",
    "dedup_embedding_incremental", "bpe_train", "bpe_segment",
    "hybrid_search_rrf", "mmr_rerank", "dsir_weights",
    "dsir_resample", "rocchio_classify", "fingerprint_winnow",
    "bootstrap_ci", "ab_cuped", "ann_mrr", "hybrid_mmr",
    "prf_expand", "dedup_spans_cut", "dedup_recall", "l_diversity",
    "ts_changepoint", "benford_digits", "ab_kstest",
    # round-6 additions
    "value_ecdf", "sketch_hll", "window_ewma", "skyline_pareto",
    "source_overlap_kmv", "ab_chisq", "seq_trigrams", "basket_pairs",
    "attribution_first_touch", "trend_theil_sen", "stream_hll",
    "trend_theil_sen_capped", "resample_interpolate",
    "group_percentiles", "join_nearest", "window_zscore_rolling",
    # round-7 additions
    "source_overlap_kmv_sketch", "winsorize_stats", "token_gini",
    "scan_jsonl_corrupt", "scan_csv_typed",
    "scan_schema_evolution", "scan_orc_roundtrip",
    # round-9 additions
    "sample_stratified", "mix_epochs", "hard_negatives_ivf",
    "ann_index_roundtrip", "tokenizer_fertility", "text_strip_markup",
    # round-11 additions
    "tokenizer_fertility_bpe",
]

_rows, _row_rounds = _driver_latest_rows_and_rounds()
_red = [k for k in QUERIES if k in _rows and not _is_green(_rows[k])]
_green = {k for k, r in _rows.items() if _is_green(r)}
_untested = [k for k in _UNTESTED_PRIORITY if k in QUERIES and k not in _rows]
_rest = [
    k for k in QUERIES
    if k not in set(_red) and k not in set(_untested) and k not in _green
]
# Age tier (round 7) + change tiers (round 10, split in round 11):
# once every key is driver-green, the rotation would otherwise
# degenerate to a frozen order and the driver's 50-key sweep would
# re-confirm the same head forever. Instead, order the green tail:
#
#   1. NARROW-changed greens first — the key's own registered fn or
#      oracle string differs from what its latest driver row attested
#      (KEYHASHES.json): the evidence verified a previous
#      implementation, stale regardless of how recent the row is
#      (the r9 ``sample_stratified`` lesson: reimplemented in r9
#      while its newest driver row, r7, silently attested to the old
#      code). This tier is immune to shared-helper churn, so it
#      cannot saturate the way the r10 closure-only tier did
#      (253/253 flagged ⇒ pure age order ⇒ the motivating key missed
#      two consecutive sweeps).
#   2. then CLOSURE-changed greens — something in the key's
#      transitive dependency closure changed;
#   3. then by driver-row AGE — oldest committed round first (the
#      round also orders keys WITHIN each changed tier; registry
#      order breaks remaining ties, stable sort).
#
# Each round the driver re-confirms the ~50 stalest-or-changed greens
# against CURRENT code, so "green many rounds of churn ago" and
# "green for code that no longer exists" both convert into fresh
# evidence automatically as new CORRECTNESS files land.
_narrow_changed, _closure_changed = _changed_since_checked(_green)
_tail = sorted(
    (k for k in QUERIES if k in _green and k not in set(_red)),
    key=lambda k: (
        k not in _narrow_changed,
        k not in _closure_changed,
        _row_rounds.get(k, 0),
    ),
)
QUERIES = {k: QUERIES[k] for k in (*_red, *_untested, *_rest, *_tail)}
