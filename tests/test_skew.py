"""Hot-key (skew) behavior — r7 verdict item 2.

The 100 TB claims assumed AQE + the shipped dials absorb skew;
nothing in tests/ actually created one. These tests build the skew
(one key holding ~10-50% of all rows) and assert the BOUND, not the
hope:

- a per-key cap really bounds per-user work no matter how power-law
  the activity distribution is (``trend_theil_sen_capped``);
- banded MinHash-LSH bucket sizes are governed by CONTENT
  duplication, never by a hot metadata key (``minhash_bands``), and
  the documented boilerplate-content risk is bounded by the
  exact-dedup pre-pass the curation pipeline runs first;
- the plain groupBy family map-side-combines, so reduce-side input
  is distinct-groups-per-partition, not rows (plan-pinned).

The wall-clock/straggler numbers for the generated skew fixtures
(tools/gen_sf.py --skew) live in SCALING.md's round-8 section; these
tests pin the structural invariants at pytest scale.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pyspark.sql.types as T

HOT, COLD_USERS, COLD_N = 0, 20, 10
HOT_N = 3000  # hot user holds ~93% of all rows — far past the 10% fixture


def _skewed_events(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(COLD_USERS + 1):
        n = HOT_N if u == HOT else COLD_N
        for i in range(n):
            rows.append(
                (eid, base + dt.timedelta(minutes=eid), u, "view",
                 float((eid * 37) % 500) / 10.0, "{}")
            )
            eid += 1
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    return spark.createDataFrame(rows, schema)


def test_theil_sen_cap_bounds_hot_user_and_agrees_on_cold(spark):
    """one user with 3000 events (9x the cap-squared work if
    uncapped: 4.5M pairs) must cost at most 496 pairs under the cap,
    while every at-or-under-cap user gets the EXACT uncapped answer
    — the two halves of the dial's contract at once."""
    from rsbsa_etl_spark.operators.analytics import (
        trend_theil_sen,
        trend_theil_sen_capped,
    )

    ev = _skewed_events(spark)
    capped = {r["user_id"]: r for r in trend_theil_sen_capped(ev).collect()}
    assert capped[HOT].n_pairs <= 496
    # uncapped on the cold users only (running it on the hot user is
    # exactly the blowup the cap exists to avoid)
    exact = {
        r["user_id"]: r
        for r in trend_theil_sen(
            ev.where(F.col("user_id") != HOT)
        ).collect()
    }
    for u in range(1, COLD_USERS + 1):
        assert capped[u].n_pairs == exact[u].n_pairs
        assert (
            capped[u].slope_cents_per_day == exact[u].slope_cents_per_day
        ), u


def test_minhash_buckets_track_content_not_metadata_skew(spark):
    """give ONE source 50% of all docs but keep content unique:
    band-bucket sizes (the LSH join's per-key input) must stay at
    singleton scale — a hot metadata key must not create a hot
    shuffle key. Then plant a 40-copy boilerplate class: the bucket
    size equals the duplicate class (the documented content risk),
    and the exact-dedup pre-pass collapses it back to one."""
    import random

    from rsbsa_etl_spark.functions.dedup import (
        minhash_bands,
        minhash_signature,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(5000)]

    def text():
        return " ".join(rng.choice(vocab) for _ in range(40))

    n = 400
    docs = [(i, text(), "en", "src0" if i % 2 == 0 else f"src{i % 7 + 1}",
             0) for i in range(n)]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sizes = (
        minhash_bands(minhash_signature(df))
        .groupBy("band", "band_hash")
        .count()
    )
    assert sizes.agg(F.max("count")).first()[0] <= 2  # content-unique

    boiler = text()
    hot = df.unionByName(
        spark.createDataFrame(
            [(10_000 + i, boiler, "en", "src0", 0) for i in range(40)],
            df.schema,
        )
    )
    hot_max = (
        minhash_bands(minhash_signature(hot))
        .groupBy("band", "band_hash")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert hot_max == 40  # bucket size == duplicate class, by design
    # the cure the pipeline composes FIRST: exact dedup collapses the
    # class before any LSH join sees it (exact_dedup returns the
    # fingerprint->keeper table; keep the surviving rows)
    from rsbsa_etl_spark.functions.dedup import exact_dedup

    keepers = exact_dedup(hot).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    deduped = hot.join(keepers, "doc_id")
    cured_max = (
        minhash_bands(minhash_signature(deduped))
        .groupBy("band", "band_hash")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert cured_max <= 2


def test_chunked_sessionize_is_bit_identical_to_flat(spark):
    """the window_session hot-key dial must reproduce the flat
    form's sessions EXACTLY — including session chains that straddle
    chunk boundaries (the merge case) and sessions that END within
    gap_s of a boundary but have no successor (the no-merge case).
    The skewed-events fixture plus hand-built boundary chains
    exercise both."""
    import datetime as dt2

    from rsbsa_etl_spark.params import SESSION_GAP_S
    from rsbsa_etl_spark.streaming.windows import (
        sessionize,
        sessionize_chunked,
    )

    ev = _skewed_events(spark)
    # hand-built chains around a 6h chunk boundary (21600s):
    # user 100 has events at boundary-10s and boundary+10s (one
    # session across chunks); user 101 at boundary-10s and
    # boundary + gap + 11s (two sessions) — plus a 3-chunk chain
    # for user 102 (transitive merge)
    b = dt2.datetime(2024, 1, 2, 6, 0, 0)  # epoch multiple of 21600
    extra = [
        (90001, b - dt2.timedelta(seconds=10), 100, "view", 1.0, "{}"),
        (90002, b + dt2.timedelta(seconds=10), 100, "view", 1.0, "{}"),
        (90003, b - dt2.timedelta(seconds=10), 101, "view", 1.0, "{}"),
        (90004, b + dt2.timedelta(seconds=SESSION_GAP_S + 11), 101,
         "view", 1.0, "{}"),
        (90005, b - dt2.timedelta(seconds=5), 102, "view", 1.0, "{}"),
        (90006, b + dt2.timedelta(seconds=21595), 102, "view", 1.0, "{}"),
        (90007, b + dt2.timedelta(seconds=21600 + 5), 102, "view", 1.0,
         "{}"),
    ]
    ev = ev.unionByName(spark.createDataFrame(extra, ev.schema))
    flat = sorted(map(tuple, sessionize(ev, SESSION_GAP_S).collect()))
    chunked = sorted(
        map(tuple, sessionize_chunked(ev, SESSION_GAP_S).collect())
    )
    assert flat == chunked
    # the boundary chains really exercised the merge paths
    flat_d = {(r[0], r[1]): r for r in flat}
    assert flat_d[(100, 1)][4] == 2          # merged across boundary
    assert (101, 2) in flat_d                # split stayed split
    u102 = [r for r in flat if r[0] == 102]
    # user 102: singleton at b-5 (gap 21600s > gap_s to the next),
    # then a pair merged ACROSS the next boundary (10s gap)
    assert len(u102) == 2
    assert flat_d[(102, 2)][4] == 2


def test_groupby_collect_partial_aggregates_before_shuffle(spark, tmp_path):
    """the hash-agg family's skew defense is map-side combine:
    reduce-side input is distinct-groups-per-partition, not rows.
    Pin the plan: a partial aggregate must sit below the exchange
    (if this regressed to a straight shuffle-then-agg, a hot group
    would ship every one of its rows to one task)."""
    from rsbsa_etl_spark.operators.aggregates import grouped_counts

    ev = _skewed_events(spark)
    p = tmp_path / "ev"
    ev.write.parquet(str(p))
    df = grouped_counts(
        spark.read.parquet(str(p)), "event_type", "user_id"
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    pre_exchange = plan.split("Exchange", 1)[1]
    assert "partial_count" in pre_exchange or "partial" in pre_exchange
