"""Join family (SURVEY §2.3).

The reference never emits SQL JOINs — every join is an
application-level key-list join: collect keys from one side, push an
IN-list to the other (``services/etlService.js:20-32,59-67``). That
is a hand-rolled broadcast hash join; here each becomes a declarative
join and Catalyst/AQE picks broadcast vs sort-merge vs shuffled-hash
by actual size (with explicit ``F.broadcast`` hints where one side is
known-small, e.g. a change-batch key set against a 100 TB fact
table).

- J1 two-step bridge join  — ``etlService.js:20-32``
  (keys → farmparcelownership → farmparcel)
- J2 semi-join (updates)   — ``etlService.js:60-66``
- J3 anti-join (inserts)   — ``etlService.js:67``
- J4 dependent follow-up   — ``etlService.js:642-654``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def semi_join(df: DataFrame, other: DataFrame, on) -> DataFrame:
    """J2: rows of ``df`` whose key exists in ``other`` (the
    reference's JS ``Set``-membership probe, ``etlService.js:64-66``).
    left-semi never duplicates rows and only ships the key column of
    ``other`` — exactly the Set semantics, shuffle-free when the key
    side broadcasts."""
    return df.join(other, on, "left_semi")


def anti_join(df: DataFrame, other: DataFrame, on) -> DataFrame:
    """J3: rows of ``df`` whose key is absent from ``other``
    (``etlService.js:67``)."""
    return df.join(other, on, "left_anti")


def bridge_join(
    fact: DataFrame,
    bridge: DataFrame,
    dim: DataFrame,
    fact_bridge_key: str,
    bridge_dim_key: str,
) -> DataFrame:
    """J1: resolve a many-to-many relationship through a bridge table.

    Reference shape: farmer keys → ``farmparcelownership`` (bridge)
    → ``farmparcel`` rows (``etlService.js:20-32``), done as two
    sequential SQL round-trips with a driver-collected parcel_id
    list. Here it is one declared 3-way equi-join; Catalyst reorders
    and broadcasts as sizes allow, and the intermediate key list
    never touches the driver.
    """
    return fact.join(bridge, fact_bridge_key).join(dim, bridge_dim_key)


def dependent_join(bridge: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """J4: follow-up fetch of dim rows referenced by a loaded bridge
    batch (``etlService.js:642-654``). ``distinct()`` on the key
    before the join mirrors the reference's Set-dedup of parcel_ids
    (``etlService.js:99``) and shrinks the build side.
    """
    keys = bridge.select(key).distinct()
    return dim.join(F.broadcast(keys), key, "left_semi")


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """equi-join hardened against extreme key skew.

    AQE's skew-join splitting handles moderate skew; when one key
    carries a double-digit percentage of a 100 TB fact table, a
    single post-split partition is still a straggler. The classic
    fix: append a salt ∈ [0, n) to the skewed side's key (random —
    the join result is salt-independent), replicate the dim side
    once per salt value, and join on (key, salt) so the hot key
    spreads over n tasks. Replication multiplies the dim shuffle by
    n — use only for genuinely-skewed joins, and keep the dim side
    the small one.

    The result is verified equal to the plain join in tests.
    """
    salted = skewed.withColumn(
        "_salt", (F.rand(seed) * n_salts).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    dim_rep = dim.select("*", salts)
    out = salted.join(dim_rep, [key, "_salt"])
    return out.drop("_salt")


def full_outer_null_safe(
    left: DataFrame, right: DataFrame, key: str
) -> DataFrame:
    """FULL OUTER join under null-safe equality (``<=>`` / SQL
    ``IS NOT DISTINCT FROM``): NULL keys match each other (one
    group), and unmatched rows of BOTH sides survive with nulls —
    the reconciliation-report join (which keys exist where?).
    Null-safe equality is still hash-partitionable (NULL hashes to a
    bucket like any value), so this stays an equi hash join, not a
    nested loop."""
    lk, rk = F.col(f"l.{key}"), F.col(f"r.{key}")
    out = left.alias("l").join(right.alias("r"), lk.eqNullSafe(rk), "full_outer")
    other = [c for c in left.columns if c != key] + [
        c for c in right.columns if c != key
    ]
    return out.select(F.coalesce(lk, rk).alias(key), *other)


def range_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_w: float = 16.0,
) -> DataFrame:
    """interval/range join (``lo <= value < hi``) as a bin-bucketed
    EQUI join. SURVEY §2.3 lists range joins as absent from the
    reference; vanilla Spark planizes a pure range predicate as
    BroadcastNestedLoopJoin — O(|fact|·|bands|) comparisons, which is
    fine for 5 bands but fatal when the band table is a million
    tariff rows. The standard fix: quantize values into width-W bins,
    explode each band to every bin it overlaps, hash-join on the bin,
    then re-check the exact predicate. Comparisons drop to
    O(|fact| · avg bands per bin).

    Bands ship exploded (rows × ceil(width/W)) and broadcast; the
    fact side computes its bin in codegen — no shuffle of fact rows
    at all when bands broadcast.
    """
    binned = bands.withColumn(
        "_bin_b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_w).cast("long"),
                F.floor(F.col(hi_col) / bin_w).cast("long"),
            )
        ),
    )
    fact_b = fact.withColumn("_bin", F.floor(F.col(value_col) / bin_w).cast("long"))
    v = F.col(value_col)
    out = fact_b.join(
        F.broadcast(binned),
        (F.col("_bin") == F.col("_bin_b")) & (v >= F.col(lo_col)) & (v < F.col(hi_col)),
    )
    return out.drop("_bin", "_bin_b")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """as-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` for the same key (left-outer: unmatched
    left rows keep nulls). SURVEY §2.3 lists as-of as absent from
    both the reference and vanilla Spark — this is the custom-operator
    path, built from a union + running ``last(ignorenulls)`` window
    rather than a range join.

    Scale: the naive formulation (range join + per-left-row max)
    explodes to |L|·|R| per key before aggregating. The union-window
    form is one shuffle on ``key`` and one partition-local sort over
    |L|+|R| rows — the same plan shape whether right has 10 rows or
    10 billion. Right rows sort before left rows at equal (key, ts),
    giving the inclusive <= bound. Right-side ties on (key, ts)
    resolve DETERMINISTICALLY to the maximum payload struct (the
    window orders tied right rows by ``_p`` ascending, so the
    running ``last`` sees the max last) — field order in ``payload``
    is therefore the tiebreak order, at zero extra shuffle cost.
    Oracles state the same convention as a max() pre-aggregation per
    (key, ts), since SQL ASOF's own tie pick is unspecified.

    The carried state is ONE struct per right row (non-null whenever
    a right row exists), not per-column ``last(ignorenulls)`` — the
    per-column form would skip a latest row's legitimately-NULL
    payload field and stitch together values from DIFFERENT right
    rows; the struct keeps "the latest right ROW's payload" exact,
    NULL fields included.
    """
    from pyspark.sql import Window

    lcols = left.columns
    l2 = left.withColumn("_side", F.lit(1))
    # NULL never matches (ANSI ASOF semantics): a right row with a
    # NULL key or NULL ts can be "as of" nothing, so it is dropped
    # before the union; a left row with NULL ts sorts first within
    # its key (Spark nulls-first) and therefore sees no prior right
    # state — it survives with NULL payload, the left-outer contract.
    right = right.where(
        F.col(key).isNotNull() & F.col(ts).isNotNull()
    )
    r2 = right.select(
        F.col(key),
        F.col(ts),
        F.struct(*[F.col(c).alias(c + suffix) for c in payload]).alias(
            "_p"
        ),
    ).withColumn("_side", F.lit(0))
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side", "_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *lcols,
        "_side",
        F.last("_p", ignorenulls=True).over(w).alias("_p"),
    )
    return filled.where(F.col("_side") == 1).select(
        *lcols,
        *[F.col(f"_p.{c}{suffix}").alias(c + suffix) for c in payload],
    )


def cross_pairs(region: DataFrame, nation: DataFrame) -> DataFrame:
    """explicit Cartesian product (the one join family the reference
    never emits — SURVEY §2.3 notes its absence): every
    (region, nation) pair with a derived co-membership flag.

    Compiles to BroadcastNestedLoopJoin with the small side
    broadcast; a cross join is only sane when one side is tiny, which
    is exactly the shape here (dimension × dimension). At 100 TB,
    cross joins against big tables are a plan smell — Catalyst
    requires the explicit crossJoin call, which keeps the blast
    radius visible in code review.
    """
    return (
        region.select(F.col("r_regionkey").alias("regionkey"), "r_name")
        .crossJoin(nation.select("n_nationkey", "n_name", "n_regionkey"))
        .select(
            "regionkey",
            "r_name",
            "n_nationkey",
            "n_name",
            (F.col("n_regionkey") == F.col("regionkey"))
            .cast("int")
            .alias("is_member"),
        )
    )


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_buckets: int = 1 << 17,
) -> DataFrame:
    """inner equi-join with an explicit runtime membership filter:
    prune the fact side BEFORE its shuffle using a broadcast digest
    of the dim side's keys.

    The scale problem: joining a 100 TB fact table against a dim
    subset that matches only a few percent of fact rows still
    shuffles the FULL fact table when the planner picks sort-merge
    (dim too big to broadcast whole rows, or the join is one stage
    past where a broadcast hint reaches). Engines solve this with
    runtime filters — Spark's own runtime row-level filtering
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects a
    bloom filter under the same conditions; this operator is the
    explicit, always-on form for when the heuristics don't fire.

    Construction: hash each dim key into one of ``n_buckets`` slots
    and keep the DISTINCT slot ids — a one-hash bloom filter
    materialized as a ≤``n_buckets``-row table (a 2^17-slot digest is
    ~1 MB as a broadcast list, independent of dim's row count). The
    fact side semi-joins on its own slot id: a broadcast hash
    semi-join that ships ZERO fact rows and keeps only rows whose
    slot is occupied. False positives (hash collisions) survive the
    prune and are removed by the exact join that follows, so the
    result is bit-identical to ``fact JOIN dim USING (key)`` — the
    digest affects cost, never semantics.

    Sizing: with d distinct dim keys, the false-positive rate is
    ~d/n_buckets; pick n_buckets ≳ 20·d to prune ≳95 % of
    non-matching fact rows. The digest build is one map-side-partial
    aggregate over dim (cheap), and the prune runs inside the fact
    scan's stage — predicate-shaped work, no extra shuffle anywhere.

    Both sides must carry the SAME data type for ``key``:
    ``xxhash64`` is type-sensitive (int 5, bigint 5 and '5' hash
    differently) while the exact join coerces — mismatched types
    would silently drop matches in the prune, so they are rejected
    here instead. Cast explicitly before calling.
    """
    ftype = dict(fact.dtypes).get(key)
    dtype = dict(dim.dtypes).get(key)
    if ftype != dtype:
        raise TypeError(
            f"bloom_pruned_join: key '{key}' types differ "
            f"(fact={ftype}, dim={dtype}); xxhash64 is type-sensitive "
            "— cast both sides to a common type first"
        )
    slot = lambda c: F.pmod(F.xxhash64(F.col(c)), F.lit(n_buckets))  # noqa: E731
    digest = dim.select(slot(key).alias("_rf_slot")).distinct()
    pruned = fact.join(
        F.broadcast(digest), slot(key) == F.col("_rf_slot"), "left_semi"
    )
    return pruned.join(dim, key)
