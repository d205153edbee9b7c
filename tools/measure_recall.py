#!/usr/bin/env python
"""IVF recall measurement across embedding GEOMETRIES (round 9).

The r8 verdict's top item: the knn_graph_ivf recall dial
(SCALING.md: 0.19 → 0.66 at nprobe 4 → 32) was measured ONLY on
isotropic random vectors — the honest adversarial floor, but also
the one regime where the default nprobe looks weak — and the claim
"real clustered corpora sit far above this floor" was stated, not
measured. This harness measures it: the same recall table on BOTH
geometries (gen_sf.py isotropic vs --emb-clusters Zipf-mixture),
for the graph form (knn_graph_ivf vs exact knn_graph) and the
query-set form (ivf_topk vs brute_force_topk), so the default
nprobe is picked from a curve instead of an assertion.

Recall@k definitions (both against the ENGINE's exact arm, so what
is measured is exactly what the approximation loses, not generator
noise):

  graph:  |ivf edge set ∩ exact edge set| / |exact edge set|
          over (vec_id, neighbor_id) pairs, k per node;
  query:  same, restricted to the ann query set (ANN_QUERY_IDS).

Usage:
    python tools/gen_sf.py --sf 1.0 --out /tmp/recgen/iso --seed 42
    python tools/gen_sf.py --sf 1.0 --out /tmp/recgen/clu --seed 42 \
        --emb-clusters 200
    python tools/measure_recall.py \
        --dirs iso=/tmp/recgen/iso,clustered=/tmp/recgen/clu \
        --out /tmp/recall_r9.json

(Only embeddings.parquet is read; pass pre-generated dirs so the
fixture and the measurement stay decoupled and re-runnable.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NPROBES = [4, 8, 16, 32]
K = 10


def edge_set(df) -> set[tuple[int, int]]:
    return {
        (r["vec_id"], r["neighbor_id"])
        for r in df.select("vec_id", "neighbor_id").collect()
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--dirs", required=True,
        help="comma list of label=path fixture dirs (embeddings.parquet)",
    )
    ap.add_argument("--out", default="/tmp/recall_r9.json")
    ap.add_argument("--k", type=int, default=K)
    ap.add_argument("--nprobes", default=",".join(map(str, NPROBES)))
    ap.add_argument(
        "--query-only", action="store_true",
        help="skip the exact GRAPH truth (O(n²) — infeasible past "
        "~50k vectors) and measure query-set recall only: "
        "ivf_topk vs brute_force_topk over ANN_QUERY_IDS, one "
        "corpus pass each — the scale point for the recall curve",
    )
    args = ap.parse_args()
    dirs = [e.split("=", 1) for e in args.dirs.split(",")]
    nprobes = [int(x) for x in args.nprobes.split(",") if x]

    from rsbsa_etl_spark.functions.similarity import (
        ANN_QUERY_IDS,
        brute_force_topk,
        ivf_topk,
        knn_graph,
        knn_graph_ivf,
    )
    from rsbsa_etl_spark.session import get_spark

    spark = get_spark(app_name="rsbsa_recall_r9")
    qset = set(ANN_QUERY_IDS)
    results: dict[str, dict] = {}
    for label, d in dirs:
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        n = emb.count()
        t0 = time.perf_counter()
        if args.query_only:
            truth = {
                (r["query_id"], r["neighbor_id"])
                for r in brute_force_topk(emb, k=args.k).collect()
            }
            truth_q = truth
        else:
            truth = edge_set(knn_graph(emb, args.k))
            truth_q = {e for e in truth if e[0] in qset}
        exact_wall = round(time.perf_counter() - t0, 1)
        row: dict = {
            "n": n,
            "k": args.k,
            "query_only": bool(args.query_only),
            "exact_wall_s": exact_wall,
            "nprobe": {},
        }
        for np_ in nprobes:
            t0 = time.perf_counter()
            if args.query_only:
                got = {
                    (r["query_id"], r["neighbor_id"])
                    for r in ivf_topk(
                        emb,
                        k=args.k,
                        n_centroids=max(16, int(n**0.5)),
                        nprobe=np_,
                    ).collect()
                }
                got_q = got
                cell = {"query_recall": round(len(got_q & truth_q) / max(len(truth_q), 1), 4)}
            else:
                got = edge_set(knn_graph_ivf(emb, args.k, nprobe=np_))
                got_q = {e for e in got if e[0] in qset}
                cell = {
                    "graph_recall": round(len(got & truth) / len(truth), 4),
                    "query_recall": round(
                        len(got_q & truth_q) / max(len(truth_q), 1), 4
                    ),
                }
            cell["wall_s"] = round(time.perf_counter() - t0, 1)
            row["nprobe"][np_] = cell
            spark.catalog.clearCache()
            print(f"[{label}] nprobe={np_}: {cell}", flush=True)
        results[label] = row

    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=2)
    # markdown table, ready for SCALING.md
    print("\n| geometry | n | " + " | ".join(
        f"recall@{args.k} np={p}" for p in nprobes) + " |")
    print("|" + "---|" * (2 + len(nprobes)))
    for label, row in results.items():
        cells = " | ".join(
            str(
                row["nprobe"][p].get(
                    "graph_recall", row["nprobe"][p].get("query_recall")
                )
            )
            for p in nprobes
        )
        print(f"| {label} | {row['n']} | {cells} |")
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
