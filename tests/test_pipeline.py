"""End-to-end incremental sync (SURVEY §3.1 / FIXTURES.md §4).

Covers: change-log watermark + invalid-row routing, keyed re-fetch,
per-table transforms, upsert vs delete+insert semantics, the bridge
cascade, unknown-table skip, and idempotence of re-processing.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from rsbsa_etl_spark.plans.etl_pipeline import changed_keys, run_incremental_sync
from rsbsa_etl_spark.schemas import (
    CHANGELOG_SCHEMA,
    FARMER_PROFILE_SCHEMA,
    LIVELIHOOD_SCHEMA,
    PARCEL_OWNERSHIP_SCHEMA,
    PARCEL_SCHEMA,
)

TS = dt.datetime(2025, 5, 3, 10, 31)


def profile(rsbsa, first, sur, **kw):
    return (
        rsbsa,
        first,
        sur,
        kw.get("source", "FFRS"),
        kw.get("sex", 1),
        dt.date(1990, 1, 1),
        kw.get("brgy", "012"),
        Decimal(str(kw.get("income", "1000.50"))),
        TS,
    )


@pytest.fixture()
def world(spark):
    changelog = spark.createDataFrame(
        [
            (1, "R-1", "farmer_profile"),
            (2, "R-2", "farmer_profile"),
            (3, "R-2", "farmer_profile"),  # duplicate entry → dedup (A2/A3)
            (4, None, "farmer_profile"),  # invalid: null key (P4)
            (5, "R-3", None),  # invalid: null table (P4)
            (6, "R-9", "farmer_profile"),  # key with no source row
            (7, "R-1", "livelihood"),
            (8, "R-1", "parcel_ownership"),  # triggers bridge cascade
            (9, "R-4", "ghost_table"),  # unknown table → skipped
            (10, "R-5", "farmer_profile"),  # beyond watermark in wm test
        ],
        CHANGELOG_SCHEMA,
    )
    sources = {
        "farmer_profile": spark.createDataFrame(
            [
                profile("R-1", "juan", "dela cruz"),
                profile("R-2", "maria", "santos"),
                profile("R-5", "pedro", "reyes"),
            ],
            FARMER_PROFILE_SCHEMA,
        ),
        "livelihood": spark.createDataFrame(
            [
                (1, "R-1", "farmer", "rice", "1"),
                (2, "R-1", "fisherfolk", "tilapia", "1"),
            ],
            LIVELIHOOD_SCHEMA,
        ),
        "parcel_ownership": spark.createDataFrame(
            [
                (1, "P-1", "R-1", "owner", TS),
                (2, "P-2", "R-1", "tenant", TS),
                (3, "P-2", "R-2", "owner", TS),  # many-to-many
            ],
            PARCEL_OWNERSHIP_SCHEMA,
        ),
        "parcel": spark.createDataFrame(
            [
                ("P-1", "upper field", 14.5, 121.0, Decimal("1.2500"), "1", TS),
                ("P-2", "river lot", 14.6, 121.1, Decimal("0.7500"), "1", TS),
                ("P-3", "unrelated", 14.7, 121.2, Decimal("2.0000"), "1", TS),
            ],
            PARCEL_SCHEMA,
        ),
    }
    targets = {
        "farmer_profile": spark.createDataFrame(
            [profile("R-1", "OLD", "OLD"), profile("R-7", "UNTOUCHED", "ROW")],
            FARMER_PROFILE_SCHEMA,
        ),
        "livelihood": spark.createDataFrame(
            [
                (99, "R-1", "STALE", "STALE", "0"),  # must be deleted (K3)
                (98, "R-7", "KEEP", "KEEP", "1"),
            ],
            LIVELIHOOD_SCHEMA,
        ),
        "parcel_ownership": spark.createDataFrame([], PARCEL_OWNERSHIP_SCHEMA),
        "parcel": spark.createDataFrame([], PARCEL_SCHEMA),
    }
    return changelog, sources, targets


def test_changed_keys_filters_and_dedups(spark, world):
    changelog, _, _ = world
    keys = {(r["table"], r["rsbsa_no"]) for r in changed_keys(changelog, -1).collect()}
    assert ("farmer_profile", "R-2") in keys
    assert ("farmer_profile", None) not in keys
    assert (None, "R-3") not in keys
    # duplicate log rows collapse to one key
    assert sum(1 for t, k in keys if k == "R-2") == 1


def test_sync_upsert_and_overwrite_semantics(spark, world):
    changelog, sources, targets = world
    out = run_incremental_sync(changelog, sources, targets).targets

    prof = {r["rsbsa_no"]: r for r in out["farmer_profile"].collect()}
    # updated row: re-fetched from source + uppercased (F1)
    assert prof["R-1"]["first_name"] == "JUAN"
    assert prof["R-1"]["surname"] == "DELA CRUZ"
    # inserted row
    assert prof["R-2"]["first_name"] == "MARIA"
    # untouched target row survives upsert
    assert prof["R-7"]["first_name"] == "UNTOUCHED"
    # changed key with no source row: nothing arrives (skip path)
    assert "R-9" not in prof

    liv = out["livelihood"].collect()
    by_key = {}
    for r in liv:
        by_key.setdefault(r["rsbsa_no"], []).append(r)
    # K3: stale one-to-many rows for R-1 deleted, replaced by 2 fresh
    assert sorted(r["livelihood"] for r in by_key["R-1"]) == ["FARMER", "FISHERFOLK"]
    # other keys untouched
    assert by_key["R-7"][0]["livelihood"] == "KEEP"


def test_bridge_cascade(spark, world):
    changelog, sources, targets = world
    out = run_incremental_sync(changelog, sources, targets).targets
    # ownership synced for R-1 → parcels P-1, P-2 cascaded; P-3 not
    own = {(r["parcel_id"], r["rsbsa_no"]) for r in out["parcel_ownership"].collect()}
    assert own == {("P-1", "R-1"), ("P-2", "R-1")}
    parcels = {r["parcel_id"]: r for r in out["parcel"].collect()}
    assert set(parcels) == {"P-1", "P-2"}
    assert parcels["P-1"]["desc_location"] == "UPPER FIELD"  # transform applied


def test_watermark_skips_processed_rows(spark, world):
    changelog, sources, targets = world
    out = run_incremental_sync(changelog, sources, targets, since_log_id=9).targets
    prof = {r["rsbsa_no"]: r for r in out["farmer_profile"].collect()}
    # only log_id 10 (R-5) processed; R-1 keeps its stale target row
    assert prof["R-5"]["first_name"] == "PEDRO"
    assert prof["R-1"]["first_name"] == "OLD"


def test_sync_is_idempotent(spark, world):
    changelog, sources, targets = world
    once = run_incremental_sync(changelog, sources, targets).targets
    twice = run_incremental_sync(changelog, sources, once).targets
    for table in once:
        a = sorted(map(tuple, once[table].collect()))
        b = sorted(map(tuple, twice[table].collect()))
        assert a == b, f"{table} not idempotent"


def test_cli_list_and_run(spark):
    """the CLI control surface (reference §2.10): list enumerates the
    registry; run executes a query against a sf dir. Reuses the live
    session via main()'s getOrCreate, so no subprocess cost."""
    import io
    from contextlib import redirect_stdout

    from rsbsa_etl_spark.__main__ import main
    from rsbsa_etl_spark.registry import QUERIES

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["list"]) == 0
    assert set(buf.getvalue().split()) == set(QUERIES)

    assert main(["run", "nope"]) == 2


def test_cli_does_not_stop_shared_session(spark):
    from rsbsa_etl_spark.__main__ import main

    assert main(["run", "nope"]) == 2
    # the shared session must survive an embedded CLI call
    assert spark.range(1).count() == 1
