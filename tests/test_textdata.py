"""JSONL/CSV ingestion semantics (sources/textdata.py): corrupt
lines quarantine instead of killing the job or vanishing, FAILFAST
is available as the strict dial, and CSV arity/type errors are
captured the same way."""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from rsbsa_etl_spark.sources.textdata import (
    read_csv,
    read_jsonl,
    split_corrupt,
)

SCHEMA = StructType(
    [StructField("id", LongType()), StructField("name", StringType())]
)


def _write(tmp_path, name, lines):
    d = str(tmp_path / name)
    os.makedirs(d)
    with open(os.path.join(d, "part-0.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return d


def test_jsonl_quarantine_routes_bad_lines(spark, tmp_path):
    path = _write(
        tmp_path,
        "jl",
        [
            '{"id": 1, "name": "ok"}',
            '{"id": 2, "name": "truncated',   # invalid JSON
            "not json at all",
            '{"id": 3}',                      # missing field: still good
        ],
    )
    good, bad, parsed = split_corrupt(read_jsonl(spark, path, SCHEMA))
    g = {r["id"]: r["name"] for r in good.collect()}
    assert g == {1: "ok", 3: None}
    raws = set(r["raw_line"] for r in bad.collect())
    assert raws == {'{"id": 2, "name": "truncated', "not json at all"}
    # caller-owned release (split_corrupt's contract)
    assert parsed.is_cached
    parsed.unpersist()
    assert not parsed.is_cached


def test_jsonl_failfast_raises_on_corrupt(spark, tmp_path):
    path = _write(tmp_path, "jf", ['{"id": 1, "name": "ok"}', "broken{"])
    with pytest.raises(Exception):
        read_jsonl(spark, path, SCHEMA, mode="FAILFAST").collect()


def test_csv_quarantine_routes_untypeable_rows(spark, tmp_path):
    path = _write(
        tmp_path,
        "cv",
        ["id,name", "1,alpha", "zzz,beta", "3,gamma"],
    )
    good, bad, parsed = split_corrupt(read_csv(spark, path, SCHEMA))
    g = {r["id"]: r["name"] for r in good.collect()}
    assert g == {1: "alpha", 3: "gamma"}
    assert [r["raw_line"] for r in bad.collect()] == ["zzz,beta"]
    parsed.unpersist()
