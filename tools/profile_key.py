#!/usr/bin/env python
"""Per-key cost breakdown: DataFrame construction (Python/py4j),
Catalyst planning (explain), and execution (noop sink, guide §1.4),
each best-of-N — separates driver-side plan cost from engine time so
optimization effort lands where the seconds are.

Usage: python tools/profile_key.py [--repeats N] key1 key2 ...
"""
from __future__ import annotations

import os
import sys
import time


def main() -> None:
    args = sys.argv[1:]
    repeats = 3
    if args and args[0] == "--repeats":
        repeats = int(args[1])
        args = args[2:]
    keys = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    from rsbsa_etl_spark.registry import QUERIES
    from rsbsa_etl_spark.session import get_spark

    spark = get_spark(app_name="profile_key")
    # same warmup as bench.py
    QUERIES["scan_project"](spark, sf_dir).count()
    spark.range(1024).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).count()

    print(f"{'key':32s} {'build':>7s} {'plan':>7s} {'noop':>7s} {'count':>7s} {'total':>7s}")
    for key in keys:
        b = p = x = c = float("inf")
        for _ in range(repeats):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"profile:{key}")
            t0 = time.perf_counter()
            df = QUERIES[key](spark, sf_dir)
            t1 = time.perf_counter()
            # force analysis+optimization+physical planning only
            df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "simple"
            )
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            df.count()
            t4 = time.perf_counter()
            b = min(b, t1 - t0)
            p = min(p, t2 - t1)
            x = min(x, t3 - t2)
            c = min(c, t4 - t3)
        print(
            f"{key:32s} {b:7.3f} {p:7.3f} {x:7.3f} {c:7.3f} {b+p+x:7.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
