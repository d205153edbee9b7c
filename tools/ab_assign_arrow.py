#!/usr/bin/env python
"""A/B an Arrow-kernel dial vs its in-plan fold arm (default:
the r15 assignment kernel; --env SPARK_GRAFT_SCORE_ARROW A/Bs the
r16 scoring kernels):
bit-identity (sorted-row compare) + interleaved best-of-N timing per
key, both arms in ONE process so window drift hits both equally.

Usage: python tools/ab_assign_arrow.py [--repeats N] [--env VAR] key1 key2 ...
"""
from __future__ import annotations

import os
import sys
import time


def main() -> None:
    args = sys.argv[1:]
    repeats = 3
    env_var = "SPARK_GRAFT_ASSIGN_ARROW"
    while args and args[0] in ("--repeats", "--env"):
        if args[0] == "--repeats":
            repeats = int(args[1])
        else:
            env_var = args[1]
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    from rsbsa_etl_spark.registry import QUERIES
    from rsbsa_etl_spark.session import get_spark

    spark = get_spark(app_name="ab_assign")
    QUERIES["scan_project"](spark, sf_dir).count()
    spark.range(1024).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).count()

    print(f"{'key':26s} {'fold':>8s} {'arrow':>8s} {'speedup':>8s}  rows_equal")
    for key in args:
        t = {"0": float("inf"), "1": float("inf")}
        rows = {}
        for r in range(repeats):
            for arm in ("0", "1"):
                os.environ[env_var] = arm
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"ab:{key}:arm{arm}")
                t0 = time.perf_counter()
                df = QUERIES[key](spark, sf_dir)
                df.count()
                t[arm] = min(t[arm], time.perf_counter() - t0)
                if r == 0:
                    rows[arm] = sorted(
                        tuple(x) for x in df.collect()
                    )
        eq = rows["0"] == rows["1"]
        print(
            f"{key:26s} {t['0']:8.3f} {t['1']:8.3f} "
            f"{t['0'] / t['1']:8.2f}  {eq}",
            flush=True,
        )
        if not eq:
            a, b = rows["0"], rows["1"]
            print(f"  n0={len(a)} n1={len(b)}")
            diff = [x for x in a if x not in b][:3]
            print(f"  only-in-fold: {diff}")
    os.environ.pop(env_var, None)
    spark.stop()


if __name__ == "__main__":
    main()
