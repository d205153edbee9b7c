"""Write-path semantics: upsert, keyed overwrite, union recombination
(SURVEY §2.1 K2/K3, §2.6 E1).

The reference's two load paths:
- K2 upsert  — ``INSERT … ON DUPLICATE KEY UPDATE`` for one-to-one
  tables (``services/etlService.js:117-130``), fed by a semi/anti
  split of the batch (``etlService.js:60-67``).
- K3 delete-then-insert — keyed overwrite for one-to-many tables
  (``etlService.js:85-115``).

Spark has no in-place mutation; both become *last-write-wins merge
plans* over (target, updates) that produce the post-write table
state. Against real storage the same plan feeds Delta/Iceberg
``MERGE INTO`` or a dynamic-partition overwrite (SURVEY §7.3.1);
expressing the semantics as a pure DataFrame transform keeps them
storage-agnostic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def upsert_merge(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """K2: last-write-wins merge keyed on ``key``.

    Result = updates ∪ (target rows whose key has no update) — the
    exact post-state of ``ON DUPLICATE KEY UPDATE``
    (``etlService.js:120-127``). The anti-join broadcasts the update
    key set when small (the common CDC shape: small batch vs huge
    target), so the target is never shuffled.
    """
    untouched = target.join(updates.select(key), key, "left_anti")
    return updates.unionByName(untouched)


def overwrite_by_key(target: DataFrame, incoming: DataFrame, key: str) -> DataFrame:
    """K3: delete-then-insert per key (``etlService.js:90-106``).

    All target rows whose key appears in the incoming batch are
    replaced by the batch (one-to-many: the new row *set* for the
    key wins, old rows for that key vanish). Identical plan shape to
    upsert — the semantic difference is that ``incoming`` may carry
    multiple rows per key and target rows are deleted even when the
    batch has fewer rows. On Delta this is ``replaceWhere``/MERGE
    with DELETE; at scale, partition the target by key-bucket so the
    overwrite touches only affected partitions.
    """
    untouched = target.join(incoming.select(key).distinct(), key, "left_anti")
    return incoming.unionByName(untouched)


def split_update_insert(
    batch: DataFrame, target: DataFrame, key: str
) -> tuple[DataFrame, DataFrame]:
    """P5/J2/J3: partition a batch into (updates, inserts) by target
    key existence (``etlService.js:60-67``)."""
    existing_keys = target.select(key).distinct()
    updates = batch.join(F.broadcast(existing_keys), key, "left_semi")
    inserts = batch.join(F.broadcast(existing_keys), key, "left_anti")
    return updates, inserts


def union_paths(updates: DataFrame, inserts: DataFrame, path_col: str = "path") -> DataFrame:
    """E1: recombine the two write paths, tagged by provenance
    (``etlService.js:66-74``). ``unionByName`` keeps the plan
    column-order-safe."""
    return updates.withColumn(path_col, F.lit("update")).unionByName(
        inserts.withColumn(path_col, F.lit("insert"))
    )


def merge_group_totals(
    old: DataFrame, delta: DataFrame, key: str
) -> DataFrame:
    """incremental aggregation maintenance: fold a change batch's
    per-key partial totals into the stored totals WITHOUT rescanning
    the base table — the aggregate analog of ``upsert_merge``. At
    100 TB the base aggregate is a small keyed table and each sync
    touches only the delta; correctness rests on the totals being
    scaled-integer sums (exact, associative — ``functions/numeric``),
    so incremental == full recompute bit-for-bit, which is what the
    oracle asserts.

    Both inputs carry (key, n_rows, total); outputs their
    full-outer-coalesced sum."""
    j = old.alias("o").join(delta.alias("d"), key, "full_outer")
    zero = F.lit(0).cast("long")

    def both(col: str) -> F.Column:
        return F.coalesce(F.col(f"o.{col}"), zero) + F.coalesce(
            F.col(f"d.{col}"), zero
        )

    return j.select(
        F.col(key),
        both("n_rows").alias("n_rows"),
        both("total_cents").alias("total_cents"),
    )


def set_compare(a: DataFrame, b: DataFrame, tag_col: str = "membership") -> DataFrame:
    """E2/E3: INTERSECT and EXCEPT in one tagged pass — the set-level
    diff of two row sets (which rows are shared, which are only in
    ``a``). Both compile to the same shuffle-on-all-columns as
    DISTINCT; at scale prefer diffing on a key column (semi/anti
    join) so the shuffle carries keys, not whole rows — this operator
    is the whole-row form for when no key exists."""
    both = a.intersect(b).withColumn(tag_col, F.lit("both"))
    only_a = a.subtract(b).withColumn(tag_col, F.lit("a_only"))
    return both.unionByName(only_a)


def merge_cdc(
    target: DataFrame, changes: DataFrame, key: str, op_col: str = "op"
) -> DataFrame:
    """Three-action CDC merge — the full Delta/Iceberg ``MERGE INTO``
    shape the reference's two sinks (K2 upsert + K3 delete-insert,
    ``etlService.js:85-130``) only approximate pairwise:

      WHEN MATCHED AND op = 'D'  THEN DELETE
      WHEN MATCHED               THEN UPDATE SET *
      WHEN NOT MATCHED AND op <> 'D' THEN INSERT *

    ``changes`` carries one compacted row per key (CDC batches are
    key-deduplicated upstream; last-write-wins compaction is
    ``topk_recent``'s rn=1 pattern). Result = non-delete changes ∪
    target rows whose key is untouched. Plan shape matches upsert:
    one anti-join that broadcasts the (small) change key set — the
    100 TB target is never shuffled, and on a partitioned/bucketed
    sink only buckets containing change keys rewrite.
    """
    upserts = changes.where(F.col(op_col) != "D").drop(op_col)
    touched = changes.select(key).distinct()
    untouched = target.join(F.broadcast(touched), key, "left_anti")
    return upserts.unionByName(untouched)


def snapshot_diff(orders: DataFrame) -> DataFrame:
    """change-data-feed between two table snapshots: full-outer join
    on the key with row-fingerprint comparison classifies every key
    as added / removed / changed — the diff a data-versioning layer
    (Delta CDF, Iceberg changelog) emits, computable on plain
    parquet snapshots.

    Snapshots are derived deterministically from the fixture: v1
    drops keys ≡0 (mod 11), v2 drops keys ≡0 (mod 13) and bumps
    totalprice on keys ≡0 (mod 5) — so all three change classes
    exist. The fingerprint is an md5 over the canonicalized row
    (fixed-point price), so "changed" means value-changed, not
    row-object-identity.

    Scale: one shuffle per side on the join key (or zero with
    bucketed snapshots — see test_sinks bucketing); the fingerprint
    collapses row width to 32 bytes before the join, so the exchange
    carries (key, hash), never full rows.
    """
    price_r = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    base = orders.select(
        "o_orderkey",
        F.md5(
            F.concat_ws(
                "|",
                F.col("o_orderstatus"),
                price_r.cast("string"),
                F.col("o_orderpriority"),
            )
        ).alias("fp"),
        "o_totalprice",
        "o_orderstatus",
        "o_orderpriority",
    )
    v1 = base.where(F.pmod("o_orderkey", F.lit(11)) != 0).select(
        F.col("o_orderkey").alias("k1"), F.col("fp").alias("fp1")
    )
    v2src = base.where(F.pmod("o_orderkey", F.lit(13)) != 0)
    bumped = F.floor((F.col("o_totalprice") + F.lit(1.0)) * 100 + F.lit(0.5)).cast(
        "long"
    )
    v2 = v2src.select(
        F.col("o_orderkey").alias("k2"),
        F.when(
            F.pmod("o_orderkey", F.lit(5)) == 0,
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("o_orderstatus"),
                    bumped.cast("string"),
                    F.col("o_orderpriority"),
                )
            ),
        )
        .otherwise(F.col("fp"))
        .alias("fp2"),
    )
    joined = v1.join(v2, v1.k1 == v2.k2, "full_outer")
    return (
        joined.select(
            F.coalesce("k1", "k2").alias("o_orderkey"),
            F.when(F.col("k1").isNull(), F.lit("added"))
            .when(F.col("k2").isNull(), F.lit("removed"))
            .when(F.col("fp1") != F.col("fp2"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("change_type"),
        )
        .where(F.col("change_type") != "unchanged")
    )
