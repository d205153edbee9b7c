#!/usr/bin/env python
"""Three-point growth measurement for the scale-watch keys (round 8).

The r7 verdict's top item: every 100 TB claim so far rests on plan
shape plus a two-point (sf0.01 -> sf0.1) growth row, and two points
cannot distinguish linear from quadratic-with-small-constant. This
harness times the watch keys over the tools/gen_sf.py series
(sf0.01 / sf0.1 / sf1 — all from the SAME generator so the series is
apples-to-apples) and fits the growth exponent over the top decade:

    exponent = log10(wall_sf1 / wall_sf0.1)

(1.0 = linear in sf, 2.0 = quadratic; sub-linear values mean fixed
overhead still dominates.) The driver's read-only sf0.1 fixture is
also timed as a cross-check column so the generated series can be
tied back to every number already in SCALING.md.

Result-row counts are recorded per (key, sf) too: a key whose OUTPUT
grows 10x per decade while wall grows ~linearly is behaving; a key
whose intermediate explodes shows up as a wall exponent >> its
output exponent.

Usage:
    python tools/gen_sf.py --sf 0.01 --out /tmp/sfgen/sf0.01
    python tools/gen_sf.py --sf 0.1  --out /tmp/sfgen/sf0.1 --skew
    python tools/gen_sf.py --sf 1.0  --out /tmp/sfgen/sf1   --skew
    python tools/measure_scaling.py [--keys k1,k2] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the scale-watch list from the r7 verdict (exact arm + shipped
# scale dial side by side), plus cheap linear controls
WATCH_KEYS = [
    # exact arm vs capped/sketch dial
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_containment_capped",
    "dedup_minhash",
    "trend_theil_sen",
    "trend_theil_sen_capped",
    "source_overlap_kmv",
    "source_overlap_kmv_sketch",
    # graph / ANN
    "graph_pagerank",
    "knn_graph",
    "ann_mrr",
    "ann_recall",
    "ann_eval",  # consolidated form: should beat ann_mrr+ann_recall summed
    # posting-list substring dedup
    "dedup_spans",
    "fingerprint_winnow",
    # linear controls (should sit near exponent 1.0 or below)
    "dedup_exact",
    "token_gini",
    "dsir_weights",
    "limit_offset",
]

SF_DIRS = [
    ("sf0.01", "/tmp/sfgen/sf0.01", 0.01),
    ("sf0.1", "/tmp/sfgen/sf0.1", 0.1),
    ("sf1", "/tmp/sfgen/sf1", 1.0),
]
DRIVER_SF01 = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", default=",".join(WATCH_KEYS))
    ap.add_argument("--out", default="/tmp/scaling_r8.json")
    ap.add_argument("--skip-driver-check", action="store_true")
    ap.add_argument(
        "--dirs", default=None,
        help="override the fixture series: comma list of label=path "
        "(exponent fits the LAST TWO entries, assumed a decade apart)",
    )
    args = ap.parse_args()
    keys = [k for k in args.keys.split(",") if k]
    global SF_DIRS
    if args.dirs:
        SF_DIRS = [
            (lbl, path, None)
            for lbl, path in (e.split("=", 1) for e in args.dirs.split(","))
        ]

    from rsbsa_etl_spark.registry import QUERIES
    from rsbsa_etl_spark.session import get_spark

    spark = get_spark(app_name="rsbsa_scaling_r8")
    # warm-up mirrors bench.py: JVM, file listing, Python worker pool
    QUERIES["scan_project"](spark, SF_DIRS[0][1]).count()
    spark.range(1024).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).count()

    load_1m, load_5m, _ = os.getloadavg()
    results: dict[str, dict] = {}
    for key in keys:
        fn = QUERIES[key]
        row: dict = {"walls": {}, "rows": {}}
        for label, d, sf in SF_DIRS:
            reps = 2 if (sf is None or sf >= 1.0) else 3
            best = float("inf")
            nrows = None
            for _ in range(reps):
                t0 = time.perf_counter()
                nrows = fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            row["walls"][label] = round(best, 3)
            row["rows"][label] = nrows
            print(f"  {key} @ {label}: {best:.3f}s rows={nrows}", flush=True)
        if not args.skip_driver_check:
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, DRIVER_SF01).count()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            row["driver_sf0.1_wall"] = round(best, 3)
        labels = [lbl for lbl, _d, _sf in SF_DIRS]
        w01, w1 = row["walls"][labels[-2]], row["walls"][labels[-1]]
        row["exponent_top_decade"] = round(math.log10(w1 / w01), 3)
        r01, r1 = row["rows"][labels[-2]], row["rows"][labels[-1]]
        if r01 and r1:
            row["rows_exponent_top_decade"] = round(math.log10(r1 / r01), 3)
        results[key] = row
        print(
            f"{key}: exponent={row['exponent_top_decade']} "
            f"walls={row['walls']}",
            flush=True,
        )

    out = {
        "load_avg_prerun": [round(load_1m, 2), round(load_5m, 2)],
        "keys": results,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", args.out)
    spark.stop()


if __name__ == "__main__":
    main()
