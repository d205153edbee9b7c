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
