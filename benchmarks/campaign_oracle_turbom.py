"""Full-budget TuRBO-m oracle campaign (VERDICT r3 task 1): run the f64
numpy reference-algorithm TuRBO-m (oracle/numpy_turbo.run_turbom_oracle) at
the exact config-5 budget on rover60/lunar60 and record per-seed results.

This anchors the flagship config's quality claim against the reference
*algorithm* at matched budget — the one oracle round 3 never built. The
oracle's trainer is the isotropic grid (the build's ``fit_optimizer="grid"``
lane; an ARD fit is computationally out of reach in 1-core numpy), so the
matched-trainer comparison row is the build's isotropic-grid variant
(rover median 16.9, BASELINE.md round-3 ARD campaign) and the shipped ARD
default (9.52) is the build's lever on top.

Each seed takes tens of minutes of 1-core numpy (the same O(n^3) chols the
reference stack pays); results append to the JSON after EVERY seed so a
partial campaign is still usable.

Usage:
    python benchmarks/campaign_oracle_turbom.py --benchmark rover60 \
        --seeds 0 1 2 3 4 --out benchmarks/results_oracle_turbom_rover.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # CLAUDE.md backend gotcha

import numpy as np

from oracle.numpy_turbo import run_turbom_oracle
from turbojax import benchmarks as B


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--benchmark", default="rover60")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2, 3, 4])
    ap.add_argument("--max-evals", type=int, default=2000)
    ap.add_argument("--m", type=int, default=5)
    ap.add_argument("--n-init", type=int, default=40)
    ap.add_argument("--batch-size", type=int, default=10)
    ap.add_argument("--n-candidates", type=int, default=5000)
    ap.add_argument("--ts-chunk", type=int, default=1000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or f"benchmarks/results_oracle_turbom_{args.benchmark}.json"

    bench = B.get_benchmark(args.benchmark)
    fn_j = jax.jit(bench.fn)

    def fn(x):  # objective shared with the build; the ALGORITHM is numpy
        return np.asarray(fn_j(np.asarray(x, np.float64)))

    results = {
        "benchmark": args.benchmark,
        "config": {
            "m": args.m, "n_init": args.n_init, "max_evals": args.max_evals,
            "batch_size": args.batch_size, "n_candidates": args.n_candidates,
            "ts_chunk": args.ts_chunk, "trainer": "grid (isotropic, f64)",
        },
        "seeds": {},
    }
    if os.path.exists(out):
        with open(out) as f:
            prev = json.load(f)
        if prev.get("config") == results["config"]:
            results["seeds"] = prev.get("seeds", {})

    for seed in args.seeds:
        if str(seed) in results["seeds"]:
            print(f"seed {seed}: already done, skipping", flush=True)
            continue
        t0 = time.time()
        last = [t0]

        def progress(it, n_evals, best):
            now = time.time()
            if now - last[0] > 60:
                last[0] = now
                print(
                    f"  seed {seed} batch {it}: n={n_evals} best={best:.4f} "
                    f"({now - t0:.0f}s)", flush=True,
                )

        _, best, trace = run_turbom_oracle(
            fn, bench.lb, bench.ub, m=args.m, n_init=args.n_init,
            max_evals=args.max_evals, batch_size=args.batch_size,
            n_candidates=args.n_candidates, ts_chunk=args.ts_chunk,
            seed=seed, progress=progress,
        )
        wall = time.time() - t0
        results["seeds"][str(seed)] = {
            "best": float(best),
            "wall_s": round(wall, 1),
            "trace_every_10": [float(v) for v in trace[::10]] + [float(trace[-1])],
        }
        bests = [r["best"] for r in results["seeds"].values()]
        results["summary"] = {
            "n_seeds": len(bests),
            "median": float(np.median(bests)),
            "mean": float(np.mean(bests)),
            "min": float(np.min(bests)),
            "max": float(np.max(bests)),
        }
        with open(out + ".tmp", "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")
        os.replace(out + ".tmp", out)
        print(
            f"seed {seed}: best={best:.4f} wall={wall:.0f}s -> {out}",
            flush=True,
        )
    print("SUMMARY " + json.dumps(results.get("summary", {})), flush=True)


if __name__ == "__main__":
    main()
