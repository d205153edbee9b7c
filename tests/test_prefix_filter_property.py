"""Property-based exactness for the prefix-filter dedup pipelines.

The round-3 advisor finding was precisely that a candidate stage can
*look* exact on one fixture while silently dropping pairs on other
data. These tests drive ``ngram_jaccard_pairs`` and
``containment_pairs`` with hypothesis-generated corpora (tiny vocab →
dense near-dup structure, adversarial subset pairs) and compare
against a trusted pure-Python all-pairs brute force — recall must be
exactly 1 on every generated input, not just the parquet fixtures.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from rsbsa_etl_spark.functions.dedup import (
    containment_pairs,
    ngram_jaccard_pairs,
)
from rsbsa_etl_spark.params import JACCARD_THRESHOLD, SHINGLE_K

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

doc_strategy = st.lists(
    st.sampled_from(VOCAB), min_size=1, max_size=14
).map(" ".join)

corpus_strategy = st.lists(doc_strategy, min_size=2, max_size=10)


def _shingle_set(text: str) -> frozenset:
    toks = text.split()
    if len(toks) >= SHINGLE_K:
        return frozenset(
            " ".join(toks[i : i + SHINGLE_K])
            for i in range(len(toks) - SHINGLE_K + 1)
        )
    return frozenset([" ".join(toks)])


def _brute_jaccard(texts):
    out = {}
    sets = [_shingle_set(t) for t in texts]
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            jac = inter / union
            if jac >= JACCARD_THRESHOLD:
                out[(i, j)] = math.floor(jac * 10**4 + 0.5) / 10**4
    return out


def _brute_containment(texts, threshold=0.8):
    out = {}
    sets = [_shingle_set(t) for t in texts]
    for i in range(len(texts)):
        for j in range(len(texts)):
            if i == j:
                continue
            c = len(sets[i] & sets[j]) / len(sets[i])
            if c >= threshold:
                out[(i, j)] = math.floor(c * 10**4 + 0.5) / 10**4
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus_strategy)
def test_ngram_jaccard_equals_brute_force(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs).collect()
    }
    assert got == _brute_jaccard(texts)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus_strategy)
def test_containment_equals_brute_force(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {
        (r.doc_contained, r.doc_container): r.containment
        for r in containment_pairs(docs).collect()
    }
    assert got == _brute_containment(texts)


def _brute_cross_jaccard(new_texts, old_texts, new_ids, old_ids):
    out = {}
    ns = [_shingle_set(t) for t in new_texts]
    os_ = [_shingle_set(t) for t in old_texts]
    for i, a in enumerate(ns):
        for j, b in enumerate(os_):
            inter = len(a & b)
            jac = inter / len(a | b)
            if jac >= JACCARD_THRESHOLD:
                out[(new_ids[i], old_ids[j])] = (
                    math.floor(jac * 10**4 + 0.5) / 10**4
                )
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus_strategy, corpus_strategy)
def test_incremental_dedup_equals_brute_force(spark, new_texts, old_texts):
    from rsbsa_etl_spark.functions.dedup import incremental_dedup_pairs

    new_ids = list(range(len(new_texts)))
    old_ids = [100 + i for i in range(len(old_texts))]
    new_docs = spark.createDataFrame(
        list(zip(new_ids, new_texts)), "doc_id bigint, text string"
    )
    old_docs = spark.createDataFrame(
        list(zip(old_ids, old_texts)), "doc_id bigint, text string"
    )
    got = {
        (r.new_doc_id, r.corpus_doc_id): r.jaccard
        for r in incremental_dedup_pairs(new_docs, old_docs).collect()
    }
    assert got == _brute_cross_jaccard(new_texts, old_texts, new_ids, old_ids)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus_strategy, corpus_strategy)
def test_decontam_fuzzy_equals_brute_force(spark, eval_texts, train_texts):
    from rsbsa_etl_spark.functions.curation import decontam_fuzzy
    from rsbsa_etl_spark.params import DECONTAM_FUZZY_THRESHOLD, EVAL_DOC_MAX

    # ids straddle the EVAL_DOC_MAX split the operator keys on
    eval_ids = list(range(min(len(eval_texts), EVAL_DOC_MAX)))
    eval_texts = eval_texts[: len(eval_ids)]
    train_ids = [EVAL_DOC_MAX + i for i in range(len(train_texts))]
    docs = spark.createDataFrame(
        list(zip(eval_ids, eval_texts)) + list(zip(train_ids, train_texts)),
        "doc_id bigint, text string",
    )
    got = {
        (r.eval_doc_id, r.train_doc_id): r.containment
        for r in decontam_fuzzy(docs).collect()
    }
    want = {}
    es = [_shingle_set(t) for t in eval_texts]
    ts = [_shingle_set(t) for t in train_texts]
    for i, a in enumerate(es):
        for j, b in enumerate(ts):
            c = len(a & b) / len(a)
            if c >= DECONTAM_FUZZY_THRESHOLD:
                want[(eval_ids[i], train_ids[j])] = (
                    math.floor(c * 10**4 + 0.5) / 10**4
                )
    assert got == want


# ---------------------------------------------------- bin-fill / islands


sizes_strategy = st.lists(
    st.integers(min_value=1, max_value=9000), min_size=1, max_size=24
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sizes=sizes_strategy)
def test_compaction_plan_matches_python_binfill(spark, sizes):
    """streaming bin-fill shard assignment vs a pure-Python fold —
    including files larger than the target (id gaps legal)."""
    from rsbsa_etl_spark.sources.sinks import compaction_plan

    target = 4096
    rows = [("s", i, sz) for i, sz in enumerate(sizes)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_chars long")
    got = {
        (r.doc_id, r.out_shard)
        for r in compaction_plan(df, target=target).collect()
    }
    cum = 0
    want = set()
    for i, sz in enumerate(sizes):
        want.add((i, cum // target))
        cum += sz
    assert got == want


days_strategy = st.lists(
    st.integers(min_value=0, max_value=40), min_size=1, max_size=30
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(days=days_strategy)
def test_gap_islands_matches_python_runs(spark, days):
    """islands over arbitrary (gappy, duplicated) day sets vs a
    pure-Python consecutive-run scan."""
    from rsbsa_etl_spark.operators.analytics import gap_islands

    rows = [(1, d * 86400 + 30) for d in days]  # one user, mid-day ts
    df = spark.createDataFrame(rows, "user_id long, epoch long").selectExpr(
        "user_id", "CAST(to_timestamp(epoch) AS timestamp) AS ts"
    )
    got = {
        (r.start_day, r.end_day, r.streak_days)
        for r in gap_islands(df).collect()
    }
    uniq = sorted(set(days))
    want = set()
    run = [uniq[0]]
    for d in uniq[1:]:
        if d == run[-1] + 1:
            run.append(d)
        else:
            want.add((run[0], run[-1], len(run)))
            run = [d]
    want.add((run[0], run[-1], len(run)))
    assert got == want
