"""tools/gen_sf.py is load-bearing now — SCALING.md's round-8 growth
exponents, the skew story, and the sf1 parity evidence all rest on
its output matching the driver fixtures' statistical shape. This
smoke pins the contract: schemas identical to the driver parquet
footers, planted near-copies inside the documented Jaccard band,
unit-norm embeddings, the fixed 30-day event window, and the
multi-file layout rule."""

from __future__ import annotations

import json
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

DRIVER = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gensf") / "sf0.02")
    subprocess.run(
        [sys.executable, "tools/gen_sf.py", "--sf", "0.02", "--out", out,
         "--skew"],
        check=True,
        capture_output=True,
        cwd="/root/repo",
    )
    return out


def _schema(path: str):
    f = pq.ParquetFile(path) if path.endswith(".parquet") and not _isdir(
        path
    ) else None
    if f is None:
        import glob

        path = sorted(glob.glob(f"{path}/*.parquet"))[0]
    return [
        (fld.name, str(fld.type)) for fld in pq.read_schema(path)
    ]


def _isdir(p: str) -> bool:
    import os

    return os.path.isdir(p)


def test_schemas_match_driver_fixtures(gen_dir):
    for t in TABLES:
        assert _schema(f"{gen_dir}/{t}.parquet") == _schema(
            f"{DRIVER}/{t}.parquet"
        ), t


def test_planted_pairs_in_documented_jaccard_band(gen_dir):
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{gen_dir}/documents.parquet'"
        if not _isdir(f"{gen_dir}/documents.parquet")
        else f"SELECT doc_id, text FROM '{gen_dir}/documents.parquet/*.parquet'"
    ).fetchall()

    def sh(t, k=3):
        w = t.split()
        return set(tuple(w[i : i + k]) for i in range(len(w) - k + 1))

    docs = {r[0]: sh(r[1]) for r in rows}
    planted = json.load(open(f"{gen_dir}/planted_pairs.json"))
    assert len(planted) == round(0.051 * len(rows))
    for a, b in planted:
        j = len(docs[a] & docs[b]) / len(docs[a] | docs[b])
        assert j >= 0.6, (a, b, j)  # above every dedup threshold


def test_embeddings_unit_norm_and_events_window(gen_dir):
    import duckdb

    con = duckdb.connect()
    emb = (
        f"{gen_dir}/embeddings.parquet/*.parquet"
        if _isdir(f"{gen_dir}/embeddings.parquet")
        else f"{gen_dir}/embeddings.parquet"
    )
    lo, hi = con.execute(
        "SELECT min(sqrt(list_sum(list_transform(embedding, x -> x*x)))),"
        "       max(sqrt(list_sum(list_transform(embedding, x -> x*x))))"
        f" FROM '{emb}'"
    ).fetchone()
    assert abs(lo - 1.0) < 1e-5 and abs(hi - 1.0) < 1e-5
    ev = (
        f"{gen_dir}/events.parquet/*.parquet"
        if _isdir(f"{gen_dir}/events.parquet")
        else f"{gen_dir}/events.parquet"
    )
    tmin, tmax = con.execute(
        f"SELECT min(ts), max(ts) FROM '{ev}'"
    ).fetchone()
    assert tmin.year == 2024 and tmin.month == 1
    assert tmax.month == 1 and tmax.day <= 30  # the FIXED 30-day window


def test_skew_variant_has_one_hot_key(gen_dir):
    import duckdb

    con = duckdb.connect()
    ev = (
        f"{gen_dir}/events_skew.parquet/*.parquet"
        if _isdir(f"{gen_dir}/events_skew.parquet")
        else f"{gen_dir}/events_skew.parquet"
    )
    top, total = con.execute(
        f"SELECT max(c), sum(c) FROM (SELECT count(*) c FROM '{ev}'"
        " GROUP BY user_id)"
    ).fetchone()
    assert 0.08 <= top / total <= 0.13  # ~10% on one key
