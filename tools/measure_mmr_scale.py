#!/usr/bin/env python
"""Query-set scaling measurement for the two MMR greedy-fold arms
(round 11: the distributed cogrouped fold that retired the r9/r10
verdicts' linear-in-query-set watch item).

The driver arm collects the pool/pairs tables and folds serially in
one Python thread; the distributed arm cogroups by ``query_id`` and
folds every query in parallel on executors. Both are CONSTANT in
corpus size (the pool is queries × pool_k rows), so the only axis
that separates them is the NUMBER OF QUERIES — exactly the axis a
serving deployment scales on. This harness measures that axis:

1. Build the pool/pairs inputs ONCE per query-set size N via the
   same internals as ``mmr_rerank`` (brute-force cosine retrieval,
   top-``MMR_POOL_K`` pool, pairwise sims), persist + materialize —
   so the timed region is the FOLD, not the retrieval both arms
   share;
2. Time each arm over the identical persisted inputs (best of
   ``--reps``, result row counts asserted equal and the actual
   pick sets asserted identical — a timing harness that silently
   diverges is worthless);
3. Emit one JSON line per (N, arm) with wall seconds, plus a
   fitted driver-arm growth exponent across the N series.

Usage:
    python tools/measure_mmr_scale.py [--sf-dir /root/testdata/sf0.1]
        [--sizes 25,100,400,1600] [--reps 2] [--out /tmp/mmr_scale.json]

Findings land in SCALING.md (round 11, "MMR fold arms vs query-set
size").
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_inputs(spark, sf_dir: str, n_queries: int):
    """the mmr_rerank retrieval internals with an N-sized query set:
    returns (slim, pairs) persisted + materialized, and the query
    ids used. Query ids are the first N vec_ids — deterministic and
    sf-independent. The pool plan is the SHARED ``_mmr_pool`` helper
    — the same construction mmr_rerank ships — so a change to the
    shipped pool logic is automatically what this harness measures
    (r11 advice item 4: an earlier copy-pasted twin could silently
    drift and keep timing a different workload)."""
    from rsbsa_etl_spark.functions.retrieval import _mmr_pool, _pairwise_sims
    from rsbsa_etl_spark.params import MMR_POOL_K

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qset = [r[0] for r in
            emb.select("vec_id").orderBy("vec_id").limit(n_queries).collect()]
    pool = _mmr_pool(emb, qset, MMR_POOL_K).persist()
    pool.count()
    pairs = _pairwise_sims(pool).persist()
    pairs.count()
    slim = pool.select("query_id", "doc_id", "rel_i").persist()
    slim.count()
    return pool, slim, pairs, qset


def build_synthetic_inputs(spark, n_queries: int):
    """pool/pairs with the EXACT shape the fold consumes — queries ×
    MMR_POOL_K slim rows, queries × pool_k·(pool_k−1) directional
    pairs — built by pure ``spark.range`` arithmetic instead of the
    brute-force retrieval. The greedy fold's cost is pool-SHAPE
    bounded (k picks × pool_k candidates × |selected| sim lookups
    per query; data values only steer which candidate wins), so a
    synthetic pool measures the same stage at a build cost linear in
    the pool instead of corpus × queries — which is what makes the
    10k+-query decade point affordable (the real ``_mmr_pool`` build
    at sf1 is 20 000 × 12 800 cosine folds of setup for a ~30 s
    timed region). The arm-vs-arm pick-equality assertion is
    unchanged — both arms run the same kernel over these inputs.
    Values are deterministic functions of (query, slot): rel_i
    descends with slot (distinct per query), sim_i varies by
    (a, b) slot pair with a NULL row per query (exercising the
    NULLS-LAST path), matching the kernel-fixture patterns."""
    from pyspark.sql import functions as F

    from rsbsa_etl_spark.params import MMR_POOL_K

    pk = MMR_POOL_K
    slim = (
        spark.range(n_queries * pk)
        .select(
            (F.col("id") / pk).cast("long").alias("query_id"),
            F.pmod(F.col("id"), F.lit(pk)).alias("slot"),
        )
        .select(
            "query_id",
            (F.col("query_id") * 1000 + F.col("slot")).alias("doc_id"),
            (F.lit(1_000_000) - F.col("slot") * 1000
             - F.pmod(F.col("query_id") * 7919 + F.col("slot") * 104729,
                      F.lit(997))).alias("rel_i"),
        )
        .persist()
    )
    slim.count()
    a = slim.select("query_id", F.col("doc_id").alias("a_id"),
                    F.col("rel_i").alias("ra"))
    b = slim.select("query_id", F.col("doc_id").alias("b_id"),
                    F.col("rel_i").alias("rb"))
    pairs = (
        a.join(b, "query_id")
        .where(F.col("a_id") != F.col("b_id"))
        .select(
            "query_id", "a_id", "b_id",
            F.when(
                F.pmod(F.col("a_id") + F.col("b_id"), F.lit(37)) == 0,
                F.lit(None).cast("long"),
            ).otherwise(
                F.pmod(F.col("a_id") * 31 + F.col("b_id") * 17,
                       F.lit(900_000))
            ).alias("sim_i"),
        )
        .persist()
    )
    pairs.count()
    return slim, pairs


def time_arm(slim, pairs, k: int, distributed: bool, reps: int):
    from rsbsa_etl_spark.functions.retrieval import _greedy_mmr

    best, picks = float("inf"), None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = _greedy_mmr(slim, pairs, k, distributed=distributed)
        rows = out.collect()  # the arm's full result, driver-visible
        best = min(best, time.perf_counter() - t0)
        picks = sorted(
            (r["query_id"], r["pick_order"], r["doc_id"], r["mmr_i"])
            for r in rows
        )
    return best, picks


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--sizes", default="25,100,400,1600")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="/tmp/mmr_scale.json")
    ap.add_argument(
        "--synthetic", action="store_true",
        help="build pool/pairs by range arithmetic instead of the "
        "shipped retrieval — same fold workload shape, corpus-free "
        "setup; for decade-scale query counts (see "
        "build_synthetic_inputs)",
    )
    args = ap.parse_args()

    from rsbsa_etl_spark.params import MMR_SELECT_K
    from rsbsa_etl_spark.session import get_spark

    spark = get_spark(app_name="measure_mmr_scale")
    # warm the Python workers once so the distributed arm's numbers
    # price the steady state (a serving process), not worker fork
    spark.range(1000).groupBy((F.col("id") % 8).alias("g")).cogroup(
        spark.range(1000).groupBy((F.col("id") % 8).alias("g"))
    ).applyInPandas(lambda l, r: l, "id long").count()

    sizes = [int(s) for s in args.sizes.split(",")]
    rows = []
    for n in sizes:
        if args.synthetic:
            slim, pairs = build_synthetic_inputs(spark, n)
            pool = slim  # one shared handle to release below
        else:
            pool, slim, pairs, qset = build_inputs(spark, args.sf_dir, n)
        try:
            t_drv, picks_drv = time_arm(
                slim, pairs, MMR_SELECT_K, False, args.reps
            )
            t_dist, picks_dist = time_arm(
                slim, pairs, MMR_SELECT_K, True, args.reps
            )
        finally:
            pool.unpersist(), slim.unpersist(), pairs.unpersist()
        assert picks_drv == picks_dist, (
            f"arms diverged at N={n}: the timing is void"
        )
        rows.append(
            {
                "synthetic": bool(args.synthetic),
                "n_queries": n,
                "driver_sec": round(t_drv, 3),
                "distributed_sec": round(t_dist, 3),
                "picks": len(picks_drv),
            }
        )
        print(json.dumps(rows[-1]))

    # driver-arm growth exponent across the decade-ish series
    if len(rows) >= 2:
        a, b = rows[0], rows[-1]
        exp_drv = math.log(b["driver_sec"] / a["driver_sec"]) / math.log(
            b["n_queries"] / a["n_queries"]
        )
        exp_dist = math.log(
            b["distributed_sec"] / a["distributed_sec"]
        ) / math.log(b["n_queries"] / a["n_queries"])
        summary = {
            "driver_growth_exponent": round(exp_drv, 3),
            "distributed_growth_exponent": round(exp_dist, 3),
            "sf_dir": args.sf_dir,
            "reps": args.reps,
        }
        print(json.dumps(summary))
        rows.append(summary)
    with open(args.out, "w") as fh:
        json.dump(rows, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
