#!/usr/bin/env python
"""Hot-key wall-clock measurement over the --skew fixtures (round 8).

tools/gen_sf.py --skew writes events_skew.parquet /
documents_skew.parquet next to the uniform tables (ONE user / ONE
source holds ~10% of all rows). Registry keys load fixed table
names, so this script materializes a "skew view" directory per SF —
symlinks for every table, with events/documents pointing at the
skewed variants — and times each watch key on (uniform, skewed) at
the same SF. The delta IS the straggler cost; the capped keys'
contract is that it stays near 1.0x.

Usage: python tools/measure_skew.py [--out /tmp/skew_r8.json]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "embeddings",
]
KEYS = [
    "groupby_collect",         # hash agg with collect_list state
    "trend_theil_sen_capped",  # the capped dial under real skew
    "dedup_minhash",           # banding under source skew
    "window_session",          # per-user sessionize (semantic hot task)
    "token_gini",              # doc-keyed aggs under source skew
]
SFS = [("sf0.1", "/tmp/sfgen/sf0.1"), ("sf1", "/tmp/sfgen/sf1")]


def make_skew_view(src: str) -> str:
    view = src.rstrip("/") + "_skewview"
    os.makedirs(view, exist_ok=True)
    for t in TABLES:
        dst = os.path.join(view, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(src, f"{t}.parquet"), dst)
    for t, skewed in (("events", "events_skew"), ("documents", "documents_skew")):
        dst = os.path.join(view, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(src, f"{skewed}.parquet"), dst)
    return view


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/skew_r8.json")
    args = ap.parse_args()

    from rsbsa_etl_spark.registry import QUERIES
    from rsbsa_etl_spark.session import get_spark

    spark = get_spark(app_name="rsbsa_skew_r8")
    QUERIES["scan_project"](spark, SFS[0][1]).count()
    spark.range(1024).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).count()

    load_1m, load_5m, _ = os.getloadavg()
    results: dict[str, dict] = {}
    for key in KEYS:
        fn = QUERIES[key]
        row: dict = {}
        for label, d in SFS:
            for variant, vd in (("uniform", d), ("skew", make_skew_view(d))):
                reps = 2 if label == "sf1" else 3
                best = float("inf")
                nrows = None
                for _ in range(reps):
                    t0 = time.perf_counter()
                    nrows = fn(spark, vd).count()
                    best = min(best, time.perf_counter() - t0)
                    spark.catalog.clearCache()
                row[f"{label}_{variant}_wall"] = round(best, 3)
                row[f"{label}_{variant}_rows"] = nrows
            row[f"{label}_skew_ratio"] = round(
                row[f"{label}_skew_wall"] / row[f"{label}_uniform_wall"], 3
            )
        results[key] = row
        print(key, json.dumps(row), flush=True)

    with open(args.out, "w") as fh:
        json.dump(
            {"load_avg_prerun": [round(load_1m, 2), round(load_5m, 2)],
             "keys": results},
            fh,
            indent=1,
        )
    print("wrote", args.out)
    spark.stop()


if __name__ == "__main__":
    main()
