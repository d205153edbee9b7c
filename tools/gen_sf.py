"""Deterministic fixture generator for scale measurements beyond sf0.1.

The driver ships read-only fixtures at /root/testdata/sf{0.001,0.01,
0.1} (TESTDATA.md). Growth-exponent measurement needs a third point
(sf1 — 10x sf0.1), and the r7 verdict's top item asks for exactly
that; this script regenerates the SAME statistical shape at any sf,
seeded, so sf0.01 -> sf0.1 -> sf1 is a comparable series. Shape
parameters below are MEASURED from the driver fixtures (see
SCALING.md round-8 section for the inventory):

- documents: n = 50_000*sf docs, token count ~ U(10, 100) over the
  30-word uniform vocab; lang ~ {en .41, de/zh/fr/es ~.1475 each};
  source = src{doc_id %% 20}; ~0.051 planted near-copy pairs per doc
  (random earlier partner, one token replaced by the out-of-vocab
  'dup' marker) -- matches the measured 25 pairs @ sf0.01 /
  256 @ sf0.1 with 3-gram Jaccard 0.95-0.99.
- embeddings: n = 20_000*sf (floor 500 — matches the driver's
  500/500/2000 at sf0.001/0.01/0.1), 64-dim unit-normalized
  gaussian, label ~ U{0..9}.
- events: n = 1_000_000*sf over a FIXED 30-day window (2024-01);
  user domain 15_000*sf (per-user rate constant ~67);
  event_type ~ U{view,click,purchase,signup,error};
  value ~ round(Exp(mean=50), 2); props = '{"k": U(0,99)}'.
- TPC-H-ish star: orders 1_500_000*sf (customer 150_000*sf, 10
  orders each), lineitem ~4.07 lines/order (U(1,7)), part
  200_000*sf, supplier 10_000*sf; key ranges, value ranges, flag
  domains and date windows match the sf0.1 footers; region/nation
  are copied verbatim from the driver's sf0.1 (they are
  sf-invariant).

The output feeds ONLY this repo's scaling measurements (bench.py
--sf-dir and tools/measure_scaling.py); driver correctness always
runs against the read-only /root/testdata fixtures.

Usage: python tools/gen_sf.py --sf 1.0 --out /tmp/sfgen/sf1 [--skew]

--skew additionally emits events_skew.parquet / documents_skew.parquet
where ONE user / ONE source holds ~10% of all rows (hot-key fixture
for the AQE/salting story; everything else unchanged).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
ETYPES = ["view", "click", "purchase", "signup", "error"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
PADJ = ["large", "hot", "blue", "red", "green", "small", "dim", "shiny"]
PNOUN = ["ring", "bolt", "washer", "screw", "nut", "plate", "rod", "cap"]

EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us")
DAY_US = 86_400_000_000


_PARTS = 1  # set per-sf in main(): max(1, round(32*sf))


def _write(out: str, name: str, table: pa.Table) -> None:
    """write <name>.parquet as a DIRECTORY of _PARTS part files
    (Spark reads it transparently). A single small file is ONE scan
    split no matter how many cores exist — the dedup_spans lesson in
    SCALING.md — and real 100 TB inputs are many-file; growing the
    file count with sf keeps the series' scan parallelism honest."""
    n = table.num_rows
    if _PARTS <= 1:
        pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    else:
        d = os.path.join(out, f"{name}.parquet")
        os.makedirs(d, exist_ok=True)
        step = (n + _PARTS - 1) // _PARTS
        for i in range(_PARTS):
            sl = table.slice(i * step, step)
            if sl.num_rows:
                pq.write_table(sl, os.path.join(d, f"part-{i:05d}.parquet"))
    print(f"  {name}: {n} rows ({max(1, _PARTS)} files)")


def gen_documents(
    rng: np.random.Generator, n: int, vocab_size: int | None = None
) -> tuple[list, pa.Table]:
    """``vocab_size=None`` reproduces the driver fixture's 30-word
    uniform vocabulary (pathologically dense: at sf1 nearly every
    4-gram is df≥2 — the adversarial case for posting-list dedup).
    A positive ``vocab_size`` draws tokens from a Zipf(1.0)
    distribution over that many words instead — the realistic text
    regime where gram density stays low and the dedup exponents
    measure what real corpora would see."""
    lens = rng.integers(10, 101, size=n)
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    if vocab_size:
        vocab = np.array([f"w{i}" for i in range(vocab_size)])
        p = 1.0 / np.arange(1, vocab_size + 1)
        p /= p.sum()
    else:
        vocab, p = np.array(VOCAB), None
    texts: list[str] = []
    for i in range(n):
        toks = rng.choice(vocab, size=lens[i], p=p)
        texts.append(" ".join(toks))
    # plant near-copies: ~0.051 pairs per doc, partner earlier, one
    # token swapped for the out-of-vocab marker (measured Jaccard
    # 0.95-0.99 band)
    n_pairs = int(round(0.051 * n))
    target_set = set(
        int(t)
        for t in rng.choice(np.arange(n // 10, n), size=n_pairs, replace=False)
    )
    # sources: never a target (a later overwrite would break an
    # earlier pair) and long enough that a one-token edit stays in
    # the measured 0.94-0.99 Jaccard band (1 - ~6/len for 3-grams)
    eligible = [
        i for i in range(n) if i not in target_set and lens[i] >= 30
    ]
    pairs = []
    for t in sorted(target_set):
        src = int(eligible[int(rng.integers(0, len(eligible)))])
        toks = texts[src].split()
        toks[int(rng.integers(0, len(toks)))] = "dup"
        texts[t] = " ".join(toks)
        pairs.append((src, t))
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    return pairs, tbl


def gen_embeddings(
    rng: np.random.Generator,
    n: int,
    clusters: int | None = None,
    tau: float = 1.0,
) -> pa.Table:
    """``clusters=None`` reproduces the driver fixture: isotropic
    unit-norm gaussians — the ADVERSARIAL geometry for coarse
    quantization (no cluster structure for IVF cells to capture; the
    r8 recall floor was measured here). A positive ``clusters`` draws
    a mixture instead — the shape real embedding corpora have:

    - cluster weights ~ Zipf(1.0) over ``clusters`` topics (topic
      frequency follows a power law in every published topic-model /
      web-corpus study — a handful of head topics, a long tail);
    - centers isotropic on the unit sphere;
    - point = normalize(center + tau·u), u unit-norm gaussian, so
      E[cos(point, center)] ≈ 1/sqrt(1+tau²). The default tau=1.0
      puts intra-cluster cosine ~0.71 — the intra-topic band
      (~0.6-0.8) that public sentence-embedding corpora (STS /
      paraphrase suites) report, vs inter-topic ~0.0-0.3;
    - label = cluster_id mod 10 (labels correlate with topics, as
      real class labels do — keeps hard_negatives meaningful).

    The isotropic branch draws in the EXACT order of the original
    generator so previously published fixtures (sf1 series,
    SCALING.md) regenerate bit-identically.
    """
    if clusters:
        centers = rng.standard_normal((clusters, 64)).astype(np.float32)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        p = 1.0 / np.arange(1, clusters + 1)
        p /= p.sum()
        cid = rng.choice(clusters, size=n, p=p)
        u = rng.standard_normal((n, 64)).astype(np.float32)
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        m = centers[cid] + np.float32(tau) * u
        labels = (cid % 10).astype(np.int64)
    else:
        m = rng.standard_normal((n, 64)).astype(np.float32)
        labels = rng.integers(0, 10, size=n)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.ravel(), pa.float32()), 64
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )


def gen_events(
    rng: np.random.Generator, n: int, n_users: int, hot_user: bool = False
) -> pa.Table:
    us = rng.integers(0, max(n_users, 1), size=n)
    if hot_user:
        # ONE hot key holds ~10% of all rows (skew fixture)
        hot = rng.random(n) < 0.10
        us = np.where(hot, 0, us)
    ts_us = rng.integers(0, 30 * DAY_US, size=n)
    ts = EPOCH_2024 + ts_us.astype("timedelta64[us]")
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(us, pa.int64()),
            "event_type": pa.array(rng.choice(ETYPES, size=n), pa.string()),
            "value": pa.array(
                np.round(rng.exponential(50.0, size=n), 2), pa.float64()
            ),
            "props": pa.array(
                [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, size=n)],
                pa.string(),
            ),
        }
    )


def gen_star(rng: np.random.Generator, sf: float, out: str) -> None:
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_ord = int(1_500_000 * sf)

    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(
            rng.integers(0, 25, size=n_cust), pa.int32()
        ),
        "c_acctbal": pa.array(
            np.round(rng.uniform(-1000, 10000, size=n_cust), 2), pa.float64()
        ),
        "c_mktsegment": pa.array(rng.choice(SEGMENTS, size=n_cust)),
    }))
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, size=n_supp), pa.int32()),
        "s_acctbal": pa.array(
            np.round(rng.uniform(-1000, 10000, size=n_supp), 2), pa.float64()
        ),
    }))
    retail = np.round(rng.uniform(900, 1000, size=n_part), 2)
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array([
            f"{PADJ[i % 8]} {PNOUN[(i // 8) % 8]}" for i in range(n_part)
        ]),
        "p_brand": pa.array([f"Brand#{int(b)}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(rng.choice(PTYPES, size=n_part)),
        "p_size": pa.array(rng.integers(1, 51, size=n_part), pa.int32()),
        "p_retailprice": pa.array(retail, pa.float64()),
    }))

    odate_days = rng.integers(0, 2404, size=n_ord)  # 1995-01-01..2001-08-01
    odate = np.datetime64("1995-01-01", "us") + (odate_days * DAY_US).astype(
        "timedelta64[us]"
    )
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, size=n_ord), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "P", "F"], size=n_ord)),
        "o_totalprice": pa.array(
            np.round(rng.uniform(1000, 500000, size=n_ord), 2), pa.float64()
        ),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(rng.choice(PRIORITIES, size=n_ord)),
    }))

    nlines = rng.integers(1, 8, size=n_ord)
    l_ord = np.repeat(np.arange(n_ord), nlines)
    n_li = int(l_ord.shape[0])
    l_no = np.concatenate([np.arange(1, k + 1) for k in nlines])
    qty = rng.integers(1, 51, size=n_li).astype(np.float64)
    pk = rng.integers(0, n_part, size=n_li)
    ship = np.repeat(odate_days, nlines) + rng.integers(1, 96, size=n_li)
    shipdate = np.datetime64("1995-01-01", "us") + (ship * DAY_US).astype(
        "timedelta64[us]"
    )
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(l_ord, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, size=n_li), pa.int64()),
        "l_linenumber": pa.array(l_no, pa.int32()),
        "l_quantity": pa.array(qty, pa.float64()),
        "l_extendedprice": pa.array(
            np.round(qty * retail[pk] * rng.uniform(1.0, 2.1, n_li), 2),
            pa.float64(),
        ),
        "l_discount": pa.array(
            np.round(rng.integers(0, 11, n_li) / 100.0, 2), pa.float64()
        ),
        "l_tax": pa.array(
            np.round(rng.integers(0, 9, n_li) / 100.0, 2), pa.float64()
        ),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], size=n_li)),
        "l_linestatus": pa.array(rng.choice(["F", "O"], size=n_li)),
        "l_shipdate": pa.array(shipdate, pa.timestamp("us")),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--skew", action="store_true")
    ap.add_argument(
        "--vocab-size", type=int, default=None,
        help="documents vocabulary: None = the driver fixture's "
        "30-word uniform vocab; N = Zipf(1.0) over N words "
        "(realistic gram density)",
    )
    ap.add_argument(
        "--emb-clusters", type=int, default=None,
        help="embeddings geometry: None = the driver fixture's "
        "isotropic gaussians (IVF-adversarial); N = Zipf-weighted "
        "mixture of N gaussian clusters on the sphere (realistic)",
    )
    ap.add_argument(
        "--emb-tau", type=float, default=1.0,
        help="clustered-embedding noise scale: intra-cluster cosine "
        "≈ 1/sqrt(1+tau²) (default 1.0 → ~0.71)",
    )
    ap.add_argument(
        "--ref", default="/root/testdata/sf0.1",
        help="source of the sf-invariant region/nation tables",
    )
    ap.add_argument(
        "--only", default=None,
        help="comma list of tables to emit (e.g. 'embeddings' for the "
        "recall-geometry fixtures); default = the full set",
    )
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    global _PARTS
    _PARTS = max(1, round(32 * args.sf))

    if only is not None:
        # NOTE: draw ORDER matches the full run (documents first,
        # then embeddings, then the star schema), but reproducibility
        # vs a full run holds only when every preceding table is
        # included too: with `--only embeddings` alone the documents
        # draws are skipped, so the RNG stream — and the emitted
        # embeddings — differ from what a full run at the same seed
        # would produce. Tables emitted under --only are
        # self-consistent and reproducible across --only runs with
        # the same list+seed.
        supported = {"documents", "embeddings", "star"}
        unknown = only - supported
        if unknown:
            # the star schema draws one RNG chain (lineitem reuses
            # orders' dates and part's prices), so it only comes as
            # the whole group; events likewise has no solo path yet
            raise SystemExit(
                f"--only: unsupported table(s) {sorted(unknown)}; "
                f"supported: {sorted(supported)} ('star' = customer/"
                "supplier/part/orders/lineitem as one group)"
            )
        if "documents" in only:
            pairs, docs = gen_documents(
                rng, int(50_000 * args.sf), args.vocab_size
            )
            _write(args.out, "documents", docs)
            with open(os.path.join(args.out, "planted_pairs.json"), "w") as fh:
                json.dump(pairs, fh)
        if "embeddings" in only:
            _write(
                args.out,
                "embeddings",
                gen_embeddings(
                    rng,
                    max(500, int(20_000 * args.sf)),
                    clusters=args.emb_clusters,
                    tau=args.emb_tau,
                ),
            )
        if "star" in only:
            for t in ("region", "nation"):
                shutil.copyfile(
                    os.path.join(args.ref, f"{t}.parquet"),
                    os.path.join(args.out, f"{t}.parquet"),
                )
            gen_star(rng, args.sf, args.out)
        print("done (only:", ",".join(sorted(only)), "):", args.out)
        return

    for t in ("region", "nation"):
        shutil.copyfile(
            os.path.join(args.ref, f"{t}.parquet"),
            os.path.join(args.out, f"{t}.parquet"),
        )
        print(f"  {t}: copied from {args.ref}")

    pairs, docs = gen_documents(rng, int(50_000 * args.sf), args.vocab_size)
    _write(args.out, "documents", docs)
    with open(os.path.join(args.out, "planted_pairs.json"), "w") as fh:
        json.dump(pairs, fh)
    _write(
        args.out,
        "embeddings",
        gen_embeddings(
            rng,
            max(500, int(20_000 * args.sf)),
            clusters=args.emb_clusters,
            tau=args.emb_tau,
        ),
    )
    n_ev = int(1_000_000 * args.sf)
    n_users = int(15_000 * args.sf)
    _write(args.out, "events", gen_events(rng, n_ev, n_users))
    gen_star(rng, args.sf, args.out)

    if args.skew:
        _write(args.out, "events_skew", gen_events(rng, n_ev, n_users, hot_user=True))
        # skewed documents: ONE source holds ~10% of docs
        d = docs.to_pydict()
        hot = rng.random(len(d["doc_id"])) < 0.10
        d["source"] = [
            "src0" if h else s for h, s in zip(hot, d["source"])
        ]
        _write(args.out, "documents_skew", pa.table(d))
    print("done:", args.out)


if __name__ == "__main__":
    main()
