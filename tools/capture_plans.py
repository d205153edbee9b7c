#!/usr/bin/env python
"""Dump .explain("formatted") per registry key to plans/r15/<key>_<tag>.txt.

Usage: python tools/capture_plans.py <tag> key1 key2 ...
Data dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
Each key is built against an empty cache (audit discipline) so
persisted fragments from earlier keys don't rewrite later plans.
"""
from __future__ import annotations

import os
import sys


def main() -> None:
    tag = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(root, "plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r16"))
    os.makedirs(out_dir, exist_ok=True)
    sys.path.insert(0, root)
    from rsbsa_etl_spark.registry import QUERIES
    from rsbsa_etl_spark.session import get_spark

    spark = get_spark(app_name="plan_capture")
    for key in keys:
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"plan_capture:{key}")
        df = QUERIES[key](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{key}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
