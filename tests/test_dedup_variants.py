"""Scale-path variants must be result-identical to their reference
implementations (the 'same answer, better plan' contract):

- simhash banded (pigeonhole equi-join) == brute-force all-pairs
- Arrow-batched shingle generation == pure column-expression form
"""

from __future__ import annotations

from rsbsa_etl_spark.functions import dedup
from rsbsa_etl_spark.sources.fixtures import load

from tests.conftest import SF_DIR


def test_simhash_banded_equals_bruteforce(spark):
    docs = load(spark, SF_DIR, "documents")
    brute = set(map(tuple, dedup.simhash_pairs(docs).collect()))
    banded = set(map(tuple, dedup.simhash_pairs_banded(docs).collect()))
    assert banded == brute
    assert len(banded) > 0  # non-vacuous at sf0.001


def test_shingle_arrow_equals_expr(spark):
    docs = load(spark, SF_DIR, "documents")
    arrow = sorted(map(tuple, dedup.shingle_rows(docs).collect()))
    expr = sorted(map(tuple, dedup.shingle_rows_expr(docs).collect()))
    assert arrow == expr
    assert len(arrow) > 0


def test_cosine_pairs_tiling_invariant(spark):
    # the tiled block-matmul must produce the same pair set for any
    # tile count — catches diagonal/off-diagonal bookkeeping bugs
    # (double-emitted in-tile pairs, dropped cross-tile pairs)
    from rsbsa_etl_spark.functions import similarity

    emb = load(spark, SF_DIR, "embeddings")
    one = sorted(map(tuple, similarity.cosine_pairs(emb, n_tiles=1).collect()))
    eight = sorted(map(tuple, similarity.cosine_pairs(emb, n_tiles=8).collect()))
    five = sorted(map(tuple, similarity.cosine_pairs(emb, n_tiles=5).collect()))
    assert one == eight == five
    assert len(one) > 0
    assert all(a < b for a, b, _ in one)


def test_semantic_dedup_invariants(spark):
    from rsbsa_etl_spark.functions import similarity

    emb = load(spark, SF_DIR, "embeddings")
    out = similarity.semantic_dedup(emb).collect()
    assert len(out) == emb.count()  # every vector classified
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell_id, []).append(r)
    for cell, rows in by_cell.items():
        exemplars = {r.exemplar_id for r in rows}
        assert len(exemplars) == 1  # one exemplar per cell
        for r in rows:
            if r.vec_id == r.exemplar_id:
                assert r.keep  # exemplar always kept


def test_containment_auto_picks_bit_identical_arm(spark):
    """the r14 containment auto-dial (mirroring the r13 MMR pool
    auto-dial contract): on EACH side of the budget boundary the
    auto entry point's rows must be bit-identical to the explicit
    arm it delegates to — the dial only chooses, never changes
    results. Budget overrides force both sides on the same corpus;
    the default budget's data-driven picks at the fixture SFs are
    oracle-checked by the registered key."""
    docs = load(spark, SF_DIR, "documents")

    def rows(df):
        return sorted(map(tuple, df.collect()))

    exact = rows(dedup.containment_pairs(docs))
    capped = rows(
        dedup.containment_pairs(
            docs, candidates=dedup.minhash_capped_pairs(docs)
        )
    )
    # a huge budget keeps the full-recall exact arm
    assert rows(dedup.containment_pairs_auto(docs, max_pairs_per_doc=1 << 40)) == exact
    # a zero budget forces the capped-LSH arm
    assert rows(dedup.containment_pairs_auto(docs, max_pairs_per_doc=0)) == capped
    assert len(exact) > 0  # non-vacuous fixture


def test_jaccard_auto_picks_bit_identical_arm(spark):
    """r14 Jaccard auto-dial, same contract as the containment dial:
    budget overrides force each side of the boundary on one corpus
    and the auto rows must equal the explicit arm exactly."""
    docs = load(spark, SF_DIR, "documents")

    def rows(df):
        return sorted(map(tuple, df.collect()))

    exact = rows(dedup.ngram_jaccard_pairs(docs))
    capped = rows(
        dedup.ngram_jaccard_pairs(
            docs, candidates=dedup.minhash_capped_pairs(docs)
        )
    )
    assert rows(dedup.jaccard_pairs_auto(docs, max_pairs_per_doc=1 << 40)) == exact
    assert rows(dedup.jaccard_pairs_auto(docs, max_pairs_per_doc=0)) == capped
    assert len(exact) > 0
