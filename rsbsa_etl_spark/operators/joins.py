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
