#!/usr/bin/env python
"""Measure the STATISTICAL error of trend_theil_sen_capped's ≤cap
sample vs the exact estimator (r14 verdict item 7): the capped arm's
slope is oracle-replicated (deterministic), but its ACCURACY vs the
exact all-pairs estimator was an assumption — the same gap the WAV
codecs closed with physics-pinning. This script synthesizes noisy
linear trends, replicates the engine kernel's exact math in numpy
(cents quantization, ms timestamps, slope = Δcents·86 400 000/Δms
quantized at 1e-6, LOWER median — operators/analytics.py:2044), and
reports, per (noise model, cap):

* rmse_vs_truth   — slope RMSE against the generating slope, for the
  capped estimator AND the exact estimator on the same users;
* rmse_introduced — RMSE of (capped − exact) on the SAME data: the
  error the dial itself introduces on top of estimation noise.

The hash-min sample (salted_pri order) is modeled as a uniform
random subset: the md5-salted rank is independent of (x, y) by
construction, so sample membership is exchangeable — exactly the
assumption the engine's docstring makes.

Noise models:
* gauss  — y = m·t + N(0, σ)            (the benign case)
* outlier — gauss + 5% wild points ±50σ (the case Theil–Sen exists
  for: 29.3% breakdown — Sen 1968)

Usage: python tools/measure_tsen_error.py [--reps 200] [--n 2000]
Writes a markdown table to stdout (paste into SCALING.md).
"""

from __future__ import annotations

import argparse

import numpy as np

DAY_MS = 86_400_000
WINDOW_DAYS = 30
SIGMA_CENTS = 500.0  # noise sd in cents (~5 units on Exp(50) values)
TRUE_SLOPE = 25.0  # cents/day


def ts_slope(x_ms: np.ndarray, y_cents: np.ndarray) -> float | None:
    """the engine kernel's math, verbatim: all pairwise slopes in
    cents/day = (Δcents · 86 400 000) / Δms, quantized at 1e-6,
    LOWER median (element at ceil(n/2) in slope order)."""
    n = len(x_ms)
    iu = np.triu_indices(n, 1)
    dx = x_ms[iu[1]] - x_ms[iu[0]]
    dy = y_cents[iu[1]] - y_cents[iu[0]]
    keep = dx != 0
    if not keep.any():
        return None
    s = (dy[keep].astype(np.float64) * DAY_MS) / dx[keep]
    s = np.floor(s * 1e6 + 0.5) / 1e6
    s.sort()
    m = len(s)
    return float(s[(m + 1) // 2 - 1])


def synth_user(rng: np.random.Generator, n: int, model: str):
    x_ms = np.sort(
        rng.integers(0, WINDOW_DAYS * DAY_MS, size=n, dtype=np.int64)
    )
    t_days = x_ms / DAY_MS
    y = TRUE_SLOPE * t_days + rng.normal(0.0, SIGMA_CENTS, size=n)
    if model == "outlier":
        wild = rng.random(n) < 0.05
        y = np.where(
            wild, y + rng.choice([-1.0, 1.0], n) * 50 * SIGMA_CENTS, y
        )
    # the engine quantizes value to cents before pairing
    y_cents = np.floor(y + 0.5).astype(np.int64)
    return x_ms, y_cents


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--n", type=int, default=2000,
                    help="points per user for the exact arm")
    ap.add_argument("--caps", default="8,16,32,64,128")
    ap.add_argument("--seed", type=int, default=20260817)
    args = ap.parse_args()
    caps = [int(c) for c in args.caps.split(",")]

    rng = np.random.default_rng(args.seed)
    print(f"n={args.n} points/user, reps={args.reps}, "
          f"true slope {TRUE_SLOPE} cents/day, sigma {SIGMA_CENTS} cents")
    print()
    print("| noise | cap | rmse vs truth | rmse introduced vs exact | "
          "exact rmse vs truth |")
    print("|---|---|---|---|---|")
    for model in ("gauss", "outlier"):
        users = [synth_user(rng, args.n, model) for _ in range(args.reps)]
        exact = np.array([ts_slope(x, y) for x, y in users])
        exact_rmse = float(np.sqrt(np.mean((exact - TRUE_SLOPE) ** 2)))
        for cap in caps:
            est = []
            for x, y in users:
                idx = np.sort(rng.choice(len(x), size=cap, replace=False))
                est.append(ts_slope(x[idx], y[idx]))
            est = np.array(est)
            rmse_t = float(np.sqrt(np.mean((est - TRUE_SLOPE) ** 2)))
            rmse_i = float(np.sqrt(np.mean((est - exact) ** 2)))
            print(f"| {model} | {cap} | {rmse_t:.2f} | {rmse_i:.2f} | "
                  f"{exact_rmse:.2f} |")


if __name__ == "__main__":
    main()
