"""Multimodal plumbing: golden values for the stub decoder, feature
extraction, and chunk sampling (the registry's rows-only queries are
value-pinned HERE, as their docstrings promise)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from rsbsa_etl_spark.functions import multimodal


def test_decode_stub_golden():
    # deterministic: sha256-derived, dim values in [0, 1)
    v = multimodal.decode_stub(b"hello")
    assert len(v) == multimodal.FEATURE_DIM
    assert all(0.0 <= x < 1.0 for x in v)
    h = hashlib.sha256(b"hello").digest()
    assert v[0] == int.from_bytes(h[0:4], "big") / 2**32
    assert v == multimodal.decode_stub(b"hello")
    assert v != multimodal.decode_stub(b"hello!")


def test_extract_features_golden(spark):
    docs = spark.createDataFrame(
        [(1, "abc"), (2, "hello world")], "doc_id bigint, text string"
    )
    frames = multimodal.attach_binary(docs)
    rows = {
        r["doc_id"]: r for r in multimodal.extract_features(frames).collect()
    }
    assert rows[1]["byte_len"] == 3
    assert rows[1]["content_md5"] == hashlib.md5(b"abc").hexdigest()
    assert rows[1]["feature"] == multimodal.decode_stub(b"abc")
    assert rows[2]["content_md5"] == hashlib.md5(b"hello world").hexdigest()


def test_sample_chunks_golden(spark):
    text = "x" * 300  # 300 bytes -> offsets 0,128,256 at stride 128
    docs = spark.createDataFrame([(7, text)], "doc_id bigint, text string")
    frames = multimodal.attach_binary(docs)
    rows = sorted(
        map(tuple, multimodal.sample_chunks(frames, 64, 128).collect())
    )
    raw = text.encode()
    want = [
        (7, i, len(raw[o : o + 64]), hashlib.md5(raw[o : o + 64]).hexdigest())
        for i, o in enumerate([0, 128, 256])
    ]
    assert rows == sorted(want)
    # last chunk is the 300-256=44-byte tail
    assert rows[2][2] == 44


def test_meta_supports_predicate_pushdown(spark, tmp_path):
    # the claim in the module docstring: metadata predicates prune
    # BEFORE decode work — the meta column must be scannable without
    # touching payload bytes
    docs = spark.createDataFrame(
        [(1, "a" * 10), (2, "b" * 1000)], "doc_id bigint, text string"
    )
    path = str(tmp_path / "frames")
    multimodal.attach_binary(docs).write.parquet(path)
    small = spark.read.parquet(path).where(F.col("meta.byte_len") < 100)
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert (
        "PushedFilters: [IsNotNull(meta.byte_len), LessThan(meta.byte_len,100)]"
        in plan
    )
    assert small.count() == 1
