"""Custom stateful streaming operators (SURVEY §2.9 U2/U3 streaming
twin; extension surface).

The reference keeps run-level state in module globals
(``isEtlRunning``/``totalProcessed`` — ``index.js:24-28``,
``services/etlService.js:723-725``). The engine-side equivalent is
explicit keyed state in the state store: ``applyInPandasWithState``
gives a per-key Arrow-batched hook with fault-tolerant state — the
Spark-native form for operators the built-in aggregations can't
express.

Operators:

- ``running_user_totals`` — per-user cumulative (n_events, total)
  emitted on every micro-batch (A5 running totals as keyed state
  rather than a driver-side fold). Values are quantized to integer
  cents *inside the state* so accumulation order can never drift the
  double sum — the same fixed-point discipline as
  ``functions.numeric``.
- ``streaming_first_seen`` — streaming exact dedup: the first row
  per key ever seen is emitted, later duplicates (same batch or any
  later batch) are dropped. State is one flag per key; at 100 TB a
  GroupStateTimeout bounds it — kept eternal here for determinism.

``run_totals_replay`` drives the totals operator through two
checkpointed AvailableNow phases and reduces the update stream to
the final per-user state, which equals one grouped aggregation —
making a *custom stateful streaming operator* oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rsbsa_etl_spark.streaming.plan_capture import finish
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

TOTALS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

TOTALS_STATE = StructType(
    [StructField("n", LongType()), StructField("cents", LongType())]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """streaming: per-user running (count, fixed-point sum) via keyed
    state; each micro-batch emits the updated cumulative row for
    every user present in that batch.

    The state function is defined *nested* on purpose: cloudpickle
    serializes module-level functions by reference (workers would
    need this package importable), nested ones by value — so the
    operator works regardless of the workers' sys.path.
    """

    def totals_fn(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(np.floor(pdf["value"].to_numpy() * 100.0 + 0.5).sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            totals_fn,
            outputStructType=TOTALS_OUTPUT,
            stateStructType=TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


FIRST_SEEN_OUTPUT = StructType(
    [
        StructField("dedup_key", LongType()),
        StructField("event_id", LongType()),
    ]
)

FIRST_SEEN_STATE = StructType([StructField("seen", LongType())])


def streaming_first_seen(events: DataFrame, key_col: str = "dedup_key") -> DataFrame:
    """streaming exact dedup: emit the first (lowest event_id) row
    per key; every later occurrence is dropped via one state entry
    per key. (Nested state fn: see ``running_user_totals``.)"""

    def first_seen_fn(key, pdfs, state: GroupState):
        import pandas as pd

        first_id = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["event_id"].min())
                first_id = m if first_id is None else min(first_id, m)
        if state.exists or first_id is None:
            return  # duplicate from a later batch (or empty group): drop
        state.update((1,))
        yield pd.DataFrame({"dedup_key": [key[0]], "event_id": [first_id]})

    return events.groupBy(key_col).applyInPandasWithState(
        first_seen_fn,
        outputStructType=FIRST_SEEN_OUTPUT,
        stateStructType=FIRST_SEEN_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_totals_replay(events: DataFrame) -> DataFrame:
    """drive ``running_user_totals`` through two checkpointed
    AvailableNow phases (split by event_id parity, so both phases
    touch most users and state genuinely carries across batches),
    then reduce the update stream to the final per-user state.

    n_events and total_value are monotone per user, so the final
    state is ``max`` over the emitted updates — and equals the plain
    batch aggregation, which is the DuckDB oracle.
    """
    import os
    import tempfile

    spark = events.sparkSession
    base = tempfile.mkdtemp(prefix="rsbsa_stateful_")
    src, ckpt, out = f"{base}/src", f"{base}/ckpt", f"{base}/out"
    os.makedirs(src)
    os.makedirs(out)

    proj = events.select("event_id", "user_id", "value")
    schema = "event_id bigint, user_id bigint, value double"

    def dump(df: DataFrame, name: str) -> None:
        from rsbsa_etl_spark.streaming.windows import dump_single_file

        dump_single_file(df, base, src, name)

    def run_phase() -> None:
        stream = spark.readStream.schema(schema).parquet(src)

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("append").parquet(out)

        q = (
            running_user_totals(stream)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        finish(q, "stateful.run_phase")

    dump(proj.where(F.col("event_id") % 2 == 0), "f1.parquet")
    run_phase()
    dump(proj.where(F.col("event_id") % 2 != 0), "f2.parquet")
    run_phase()
    updates = spark.read.parquet(out)
    return updates.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_value").alias("total_value"),
    )


def dedup_replay(events: DataFrame, redeliver_mod: int = 6) -> DataFrame:
    """streaming exactly-once dedup via the built-in
    ``dropDuplicatesWithinWatermark`` across two checkpointed
    AvailableNow phases with simulated at-least-once redelivery:
    phase 1 streams the even event_ids; phase 2 streams the odd ones
    PLUS a re-delivery of every ``redeliver_mod``-th phase-1 row.
    The dedup state recovered from the checkpoint drops every
    redelivered row, so the emitted set is exactly one row per
    event_id — the whole table, which is the DuckDB oracle.

    This is the Kafka-consumer-restart shape: upstream replays a
    suffix after a crash, the engine absorbs it. State is bounded by
    the watermark delay (keys expire ``delay`` after first arrival)
    — at 100 TB/day state holds one key per event inside the
    horizon, not per event ever seen; the delay is sized to the
    redelivery window, not the stream's lifetime.
    """
    import os
    import tempfile

    from rsbsa_etl_spark.functions.numeric import dec_round

    spark = events.sparkSession
    base = tempfile.mkdtemp(prefix="rsbsa_sdedup_")
    src, ckpt, out = f"{base}/src", f"{base}/ckpt", f"{base}/out"
    os.makedirs(src)

    proj = events.select(
        "event_id", "ts", "event_type", dec_round(F.col("value"), 2).alias("value")
    )
    schema = "event_id bigint, ts timestamp, event_type string, value double"

    def dump(df: DataFrame, name: str) -> None:
        from rsbsa_etl_spark.streaming.windows import dump_single_file

        dump_single_file(df, base, src, name)

    def run_phase() -> None:
        stream = spark.readStream.schema(schema).parquet(src)
        deduped = stream.withWatermark("ts", "45 days").dropDuplicatesWithinWatermark(
            ["event_id"]
        )
        q = (
            deduped.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        finish(q, "stateful.run_phase")

    even = F.col("event_id") % 2 == 0
    dump(proj.where(even), "f1.parquet")
    run_phase()
    dump(
        proj.where(~even).unionByName(
            proj.where(even & (F.col("event_id") % redeliver_mod == 0))
        ),
        "f2.parquet",
    )
    run_phase()
    return spark.read.parquet(out).select("event_id", "event_type", "value")


def sample_stream_replay(docs: DataFrame, n: int | None = None) -> DataFrame:
    """streaming exactly-N reservoir: each micro-batch's smallest
    salted doc_id hashes merge with the persisted reservoir, keeping
    the global N smallest — the streaming twin of
    ``curation.fixed_n_sample``, and a third stream/batch
    equivalence pin (after ``stream_burst`` and the sync stream).

    Hash-min reservoirs are MERGEABLE: any doc in the true global
    top-N is in its own batch's top-N (fewer than N better hashes
    exist anywhere), so per-batch top-N → merge → top-N loses
    nothing — the same pigeonhole as KMV merge and the two-level
    group sample. The final state therefore equals the batch sample
    EXACTLY, and the oracle is the batch SQL verbatim. State is N
    rows, constant forever — the property that makes a forever-
    running "keep me a uniform sample of everything seen" job
    feasible.

    Mechanics: file-source stream, ``maxFilesPerTrigger=1`` so the
    two dumped files arrive as separate micro-batches in one
    AvailableNow run; ``foreachBatch`` merges into a parquet state
    dir (write-new-then-swap, since a job cannot overwrite its own
    input).
    """
    import os
    import shutil
    import tempfile

    from rsbsa_etl_spark import params as P

    n_keep = P.SAMPLE_N if n is None else n
    spark = docs.sparkSession
    base = tempfile.mkdtemp(prefix="rsbsa_res_")
    src, ckpt, state = f"{base}/src", f"{base}/ckpt", f"{base}/state"
    os.makedirs(src)

    from rsbsa_etl_spark.functions.numeric import salted_pri

    pri = salted_pri("fx1", F.col("doc_id"))
    proj = docs.select("doc_id")

    def dump(df: DataFrame, name: str) -> None:
        from rsbsa_etl_spark.streaming.windows import dump_single_file

        dump_single_file(df, base, src, name)

    dump(proj.where(F.col("doc_id") % 2 == 0), "f0.parquet")
    dump(proj.where(F.col("doc_id") % 2 == 1), "f1.parquet")

    def merge(batch: DataFrame, batch_id: int) -> None:
        # hash-min reservoirs are content-idempotent under batch
        # redelivery, but the swap still needs the crash-safe
        # protocol: the old delete-then-rename ordering could lose
        # the whole accumulated reservoir to a crash between the two
        recover_state_dir(base)
        b = batch.select("doc_id", pri.alias("pri"))
        if os.path.isdir(state):
            b = spark.read.parquet(state).unionByName(b)
        merged = b.orderBy("pri", "doc_id").limit(n_keep)
        merged.write.mode("overwrite").parquet(f"{base}/state_new")
        swap_state_dir(base)

    q = (
        spark.readStream.schema("doc_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    finish(q, "stateful.q")
    return spark.read.parquet(state)


def recover_state_dir(base: str) -> None:
    """crash recovery for the write-new-then-swap state protocol: a
    failure between ``swap_state_dir``'s two renames leaves the
    previous state parked at ``state_old`` — restore it; a failure
    after rename-in but before delete-old leaves a stale superseded
    copy — drop it so the next swap's rename-aside has a clear
    destination."""
    import os
    import shutil

    state = os.path.join(base, "state")
    state_old = os.path.join(base, "state_old")
    if not os.path.isdir(state) and os.path.isdir(state_old):
        os.rename(state_old, state)
    elif os.path.isdir(state) and os.path.isdir(state_old):
        shutil.rmtree(state_old)


def swap_state_dir(base: str) -> None:
    """swap ``base``/state_new into place: rename-aside → rename-in
    → delete-old. Each rename is atomic, so no crash point leaves
    BOTH the old and new state missing (the naive
    delete-old-then-rename ordering has a window where a crash
    destroys the accumulated state and a redelivered micro-batch
    silently rebuilds it from scratch — the data-loss class
    ``recover_state_dir`` + this protocol close for EVERY
    foreachBatch state swap in this module)."""
    import os
    import shutil

    state = os.path.join(base, "state")
    state_old = os.path.join(base, "state_old")
    if os.path.isdir(state):
        os.rename(state, state_old)
    os.rename(os.path.join(base, "state_new"), state)
    if os.path.isdir(state_old):
        shutil.rmtree(state_old)


def merge_cdc_batch(
    spark, base: str, batch: DataFrame, batch_id: int
) -> None:
    """idempotent ``foreachBatch`` merge for the CDC apply: fold the
    batch's per-key partial (additive count + argmax record) into
    the parquet state dir at ``base``/state, write-new-then-swap.

    Idempotence: the argmax component is re-merge-safe, but the
    additive ``n`` count is NOT — a micro-batch re-delivered after a
    failure would double-count. The standard foreachBatch guard
    applies: the last-applied ``batch_id`` is persisted INSIDE the
    state dir (``_last_batch_id`` — underscore-prefixed files are
    invisible to parquet reads), so the high-water mark travels with
    the state it describes, and any batch at or below it is skipped.

    Crash safety: the swap is rename-aside → rename-in → delete-old.
    Each rename is atomic, so no crash point leaves BOTH the old and
    new state missing; a crash between the renames leaves the old
    state parked at ``state_old``, which the next invocation (or a
    reader via this module) restores before proceeding. The earlier
    delete-then-rename ordering had a window where a crash destroyed
    the accumulated state AND its marker, and the retry would have
    silently rebuilt state from the one re-delivered batch.
    Module-level (not a closure) because foreachBatch functions run
    on the driver — no worker pickling — and this way the retry and
    recovery paths are unit-testable.
    """
    import os
    import shutil

    state = os.path.join(base, "state")
    recover_state_dir(base)
    marker = os.path.join(state, "_last_batch_id")
    if os.path.isfile(marker):
        with open(marker) as fh:
            if batch_id <= int(fh.read().strip()):
                return  # re-delivered batch: already folded in

    def fold(df: DataFrame) -> DataFrame:
        last = F.max(
            F.struct(F.col("ts_us"), F.col("event_id"), F.col("value"))
        ).alias("last")
        return df.groupBy("user_id").agg(
            F.sum("n").cast("long").alias("n"),
            last,
        ).select(
            "user_id",
            "n",
            F.col("last.ts_us").alias("ts_us"),
            F.col("last.event_id").alias("event_id"),
            F.col("last.value").alias("value"),
        )

    b = batch.withColumn("n", F.lit(1).cast("long"))
    cols = ["user_id", "n", "ts_us", "event_id", "value"]
    if os.path.isdir(state):
        b = spark.read.parquet(state).unionByName(b.select(*cols))
    else:
        b = b.select(*cols)
    # per-user state rows are few — single state file per batch
    # (guide §6; the next micro-batch re-reads this directory)
    fold(b).coalesce(1).write.mode("overwrite").parquet(f"{base}/state_new")
    with open(f"{base}/state_new/_last_batch_id", "w") as fh:
        fh.write(str(batch_id))
    swap_state_dir(base)


def cdc_apply_replay(events: DataFrame) -> DataFrame:
    """streaming CDC apply: a keyed change stream folded into a
    last-write-wins state table — the streaming twin of the K2
    ``upsert_merge`` batch sink, and a fourth stream/batch
    equivalence pin.

    The per-key state row is (n_updates, argmax-by-(ts, event_id)
    record), and BOTH components are mergeable: counts add, and the
    lexicographic max of (ts_us, event_id, value) structs commutes
    across any batch arrival order — so out-of-order CDC delivery
    cannot change the final table, and the final state equals the
    batch last-write-wins aggregate EXACTLY (the oracle is that
    batch SQL). State is one row per live key — the bound that lets
    the apply job run forever.

    Mechanics follow the reservoir replay: file-source stream with
    ``maxFilesPerTrigger=1`` so the two dumped files arrive as
    separate micro-batches of one AvailableNow run; ``foreachBatch``
    delegates to ``merge_cdc_batch`` (write-new-then-swap, with the
    last-applied batch_id persisted alongside the state so retried /
    re-delivered micro-batches are skipped instead of double-counting
    the additive ``n_updates`` component).
    """
    import os
    import tempfile

    spark = events.sparkSession
    base = tempfile.mkdtemp(prefix="rsbsa_cdc_")
    src, ckpt, state = f"{base}/src", f"{base}/ckpt", f"{base}/state"
    os.makedirs(src)

    proj = events.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "value",
    )

    def dump(df: DataFrame, name: str) -> None:
        from rsbsa_etl_spark.streaming.windows import dump_single_file

        dump_single_file(df, base, src, name)

    # split by event id parity: both "arrival orders" interleave keys
    dump(proj.where(F.col("event_id") % 2 == 0), "f0.parquet")
    dump(proj.where(F.col("event_id") % 2 == 1), "f1.parquet")

    def merge(batch: DataFrame, batch_id: int) -> None:
        merge_cdc_batch(spark, base, batch, batch_id)

    q = (
        spark.readStream.schema(
            "event_id bigint, user_id bigint, ts_us bigint, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    finish(q, "stateful.q")
    from rsbsa_etl_spark.functions.numeric import dec_round

    return spark.read.parquet(state).select(
        "user_id",
        F.col("n").alias("n_updates"),
        F.col("ts_us").alias("last_ts_us"),
        dec_round(F.col("value"), 4).alias("last_value"),
    )


def hll_stream_replay(events: DataFrame) -> DataFrame:
    """streaming HyperLogLog: per-micro-batch register tables folded
    into persistent state by REGISTER MAX — the fifth stream/batch
    equivalence pin, and the one that demonstrates why sketches are
    the native streaming aggregate: the merge is idempotent AND
    commutative (max of maxes), so out-of-order or re-delivered
    micro-batches cannot change the registers, no batch-id fencing
    needed (contrast ``cdc_apply_replay``, whose additive count
    component requires it).

    Final state == the batch ``hll_sketch`` output EXACTLY (the
    oracle is that batch SQL verbatim). State is groups × 64
    register rows, constant forever at any event rate.

    Mechanics follow the reservoir replay: file-source stream split
    into two micro-batches (event-id parity interleaves users and
    types across batches), ``foreachBatch`` merges registers through
    the crash-safe write-new-then-swap protocol, AvailableNow run.
    """
    import os
    import tempfile

    spark = events.sparkSession
    base = tempfile.mkdtemp(prefix="rsbsa_shll_")
    src, ckpt, state = f"{base}/src", f"{base}/ckpt", f"{base}/state"
    os.makedirs(src)

    proj = events.select("event_id", "user_id", "event_type")

    def dump(df: DataFrame, name: str) -> None:
        from rsbsa_etl_spark.streaming.windows import dump_single_file

        dump_single_file(df, base, src, name)

    dump(proj.where(F.col("event_id") % 2 == 0), "f0.parquet")
    dump(proj.where(F.col("event_id") % 2 == 1), "f1.parquet")

    def merge(batch: DataFrame, batch_id: int) -> None:
        from rsbsa_etl_spark.operators.analytics import _hll_registers

        recover_state_dir(base)
        regs = _hll_registers(batch)
        if os.path.isdir(state):
            regs = spark.read.parquet(state).unionByName(regs)
        merged = regs.groupBy("event_type", "bucket").agg(
            F.max("reg").alias("reg")
        )
        # state is groups × 64 rows — one file per micro-batch, not
        # one per shuffle partition (guide §6: the NEXT batch re-reads
        # this directory, so tiny-file fan-out is paid twice)
        merged.coalesce(1).write.mode("overwrite").parquet(f"{base}/state_new")
        swap_state_dir(base)

    q = (
        spark.readStream.schema("event_id bigint, user_id bigint, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    finish(q, "stateful.q")

    # fold the final registers through the SAME tail the batch
    # operator uses — shared _hll_fold, so a constant fix cannot
    # break the stream/batch equivalence pin
    from rsbsa_etl_spark.operators.analytics import _hll_fold

    return _hll_fold(spark.read.parquet(state))
