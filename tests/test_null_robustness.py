"""Null-injection parity: the engines must agree on corpora with
NULL text / lang / value — the input class real crawls actually
contain and the fixtures never did.

A systemic audit (LOCAL_SWEEP_r05.md) found 22 keys diverging on
null-injected data through three root causes: the Arrow shingle
generator coerced NULL text to '' (emitting a superbucket shingle
the SQL oracles never saw), Spark and DuckDB default NULL *window
orderings* differ (ASC: Spark first, DuckDB last — shifting ranks,
top-k cuts, and cumulative counts), and per-column
``last(ignorenulls)`` in the as-of join stitched payload fields
from different rows. This module re-runs every previously-affected
key (plus the shared-kernel representatives) against its oracle on
a null-injected copy of sf0.001, so any regression in NULL
handling fails here instead of surfacing on real data.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from __spark_entry__ import oracle_sql, queries

from tests.conftest import SF_DIR

#: every key the audit found divergent, plus kernel representatives
AFFECTED = [
    "agg_ols_slope", "decontam_fuzzy", "decontam_ngram",
    "dedup_clusters", "dedup_containment", "dedup_incremental",
    "dedup_minhash", "dedup_minhash_est", "dedup_ngram_jaccard",
    "dedup_recall", "dedup_spans_cut", "graph_pagerank", "join_asof",
    "multimodal_chunks", "multimodal_features", "multimodal_meta",
    "novelty_score", "quantile_sketch", "rocchio_classify",
    "sample_token_budget", "sketch_merge", "sort_zorder",
    "window_ntile", "dsir_weights", "ab_kstest",
    # round-6 additions (ADVICE r5): NULL-value exclusion in the
    # bootstrap, NULL-ts day binning in the changepoint trace
    "bootstrap_ci", "ts_changepoint",
    # blocked-ECDF kernel consumers (shared blocked_cumsum)
    "value_ecdf",
    # round-6 operators over null-injected columns: EWMA reads
    # value+ts, the overlap matrix shingles NULL-able text
    "window_ewma", "source_overlap_kmv",
    # sequence/attribution ops read the null-injected ts column
    "seq_trigrams", "attribution_first_touch", "trend_theil_sen",
    "resample_interpolate",
    "join_nearest", "window_zscore_rolling",
    # round-7 operators over null-injected columns: the sketch-only
    # overlap shingles NULL-able text, token_gini tokenizes it,
    # winsorize reads the null-injected value column
    "source_overlap_kmv_sketch", "token_gini", "winsorize_stats",
]


@pytest.fixture(scope="module")
def null_sf(tmp_path_factory):
    """sf0.001 with NULLs injected into events.value, events.ts,
    documents.text and documents.lang; other tables pass through."""
    import shutil

    dst = tmp_path_factory.mktemp("sf_null")
    con = duckdb.connect()
    con.execute(f"""
        COPY (SELECT event_id,
                     CASE WHEN event_id % 31 = 0 THEN NULL
                          ELSE ts END AS ts,
                     user_id, event_type,
                     CASE WHEN event_id % 19 = 0 THEN NULL
                          ELSE value END AS value,
                     props
              FROM read_parquet('{SF_DIR}/events.parquet'))
        TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (SELECT doc_id,
                     CASE WHEN doc_id % 23 = 0 THEN NULL
                          ELSE text END AS text,
                     CASE WHEN doc_id % 29 = 0 THEN NULL
                          ELSE lang END AS lang,
                     source, n_chars
              FROM read_parquet('{SF_DIR}/documents.parquet'))
        TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings"]:
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{dst}/{t}.parquet")
    con.close()
    return str(dst)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype(float).round(9)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype(bool)
        else:
            df[c] = s.astype(str)
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(
        by=list(df.columns), kind="mergesort"
    ).reset_index(drop=True)


@pytest.mark.parametrize("key", AFFECTED)
def test_null_injected_parity(spark, null_sf, key):
    got = _canon(queries()[key](spark, null_sf).toPandas())
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{null_sf}/{t}.parquet'"
        )
    want = _canon(con.execute(oracle_sql()[key]).df())
    con.close()
    assert len(got) == len(want), f"{key}: rows {len(got)} vs {len(want)}"
    assert list(got.columns) == list(want.columns), key
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, rtol=0, atol=1e-9
    )


def test_decontam_embedding_zero_norm_is_not_contaminated(spark):
    """the coalesce path, pinned: a training vector whose every
    cosine is NULL (zero-norm embedding — safe_div's NULL-on-zero
    denominator) must land contaminated=FALSE with max_cos NULL,
    not NULL/crash — the oracle's COALESCE(max(cos) >= T, FALSE)
    twin. Eval side: ids < EVAL_DOC_MAX."""
    from rsbsa_etl_spark.functions.curation import decontam_embedding
    from rsbsa_etl_spark import params as P

    dims = 64
    unit = [1.0] + [0.0] * (dims - 1)
    emb = spark.createDataFrame(
        [(0, unit, 0),                       # eval vector
         (P.EVAL_DOC_MAX, [0.0] * dims, 0),  # zero-norm train vector
         (P.EVAL_DOC_MAX + 1, unit, 0)],     # exact-match train vector
        "vec_id long, embedding array<float>, label int",
    )
    rows = {r["doc_id"]: r for r in decontam_embedding(emb).collect()}
    z = rows[P.EVAL_DOC_MAX]
    assert z["max_cos"] is None and z["contaminated"] is False
    m = rows[P.EVAL_DOC_MAX + 1]
    assert m["max_cos"] == 1.0 and m["contaminated"] is True


def test_context_pack_null_text_counts_zero_tokens(spark):
    """NULL text in a picked document must count 0 tokens (not NULL,
    which would vanish from the running sum and desynchronize the
    budget cut between engines) — the CASE/when twin pinned on a
    synthetic corpus where the MMR picks include a NULL-text doc."""
    from rsbsa_etl_spark.functions.retrieval import context_pack

    dims = 64

    def vec(seed: float):
        v = [0.1] * dims
        v[0] = seed
        return v

    emb = spark.createDataFrame(
        [(i, vec(1.0 + 0.1 * i), 0) for i in range(6)],
        "vec_id long, embedding array<float>, label int",
    )
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma", "en", "s"),
         (1, None, "en", "s"),               # NULL text, still picked
         (2, "one two", "en", "s"),
         (3, "x y z w", "en", "s"),
         (4, "lorem ipsum dolor", "en", "s"),
         (5, "short", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    out = context_pack(docs, emb, query_ids=[0], budget=5)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert 1 in rows, "the NULL-text doc must still appear as a pick"
    assert rows[1]["n_tokens"] == 0
    # running sums are monotone and the budget cut matches them
    ordered = sorted(rows.values(), key=lambda r: r["pick_order"])
    cum = 0
    for r in ordered:
        cum += r["n_tokens"]
        assert r["cum_tokens"] == cum
        assert r["included"] == (cum <= 5)
