"""Plain-BO high-d hyperprior probe (fit_prior in its published regime).

The rover A/B (BASELINE.md round-3 dimscaled-hyperprior section) measured
``fit_prior="dimscaled"`` quality-negative under TuRBO's local models. The
prior's published claim (Hvarfner et al. 2024, arXiv:2402.02229) is about
VANILLA BO with a single global GP at high d — this probe tests exactly
that regime: ``method="bo"``, global EI over unit-cube candidates,
ackley20 (d=20), 300 evaluations.

Lanes (paired seeds):
  default   — prior-free baseline, reference lengthscale clamp l<=2
              (fit_optimizer is pinned to grid+adam across ALL lanes — not
              the shipped lbfgs default for method="bo" — so the A/B
              isolates the prior/clamp axis)
  clamp     — prior-free, clamp raised to the prior's d=20 median (~18.4 -> 20)
  prior     — dimscaled MAP prior + raised clamp (the published recipe)

Separating ``clamp`` from ``prior`` attributes any delta to the prior
itself rather than to the wider feasible box.

Usage:
    python benchmarks/probe_bo_prior.py --seeds 5 \
        --out benchmarks/results_bo_prior_ackley20.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from turbojax import benchmarks as B
from turbojax.api import optimize
from turbojax.config import GPConfig


def lane_config(lane: str) -> GPConfig:
    gp = GPConfig(fit_optimizer="grid+adam")  # ARD fits (the d=20 regime
    # is exactly where isotropic grids flatten the geometry); held constant
    # across all three lanes — the "default" lane is the prior-free
    # baseline, not the shipped method="bo" default (which is lbfgs)
    if lane == "default":
        return gp
    gp = dataclasses.replace(gp, lengthscale_bounds=(0.005, 20.0))
    if lane == "clamp":
        return gp
    assert lane == "prior"
    return dataclasses.replace(gp, fit_prior="dimscaled")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--benchmark", default="ackley20")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--max-evals", type=int, default=300)
    ap.add_argument("--batch-size", type=int, default=5)
    ap.add_argument("--n-init", type=int, default=20)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    b = B.get_benchmark(args.benchmark)
    lanes = {}
    for lane in ("default", "clamp", "prior"):
        gp = lane_config(lane)
        bests, walls = [], []
        for s in range(args.seeds):
            t0 = time.perf_counter()
            r = optimize(
                b.fn, b.lb, b.ub, max_evals=args.max_evals, method="bo",
                acq="ei", n_init=args.n_init, batch_size=args.batch_size,
                seed=s, gp_config=gp,
            )
            wall = time.perf_counter() - t0
            best = float(np.asarray(r.best_y))
            bests.append(best)
            walls.append(wall)
            print(json.dumps({"lane": lane, "seed": s,
                              "best": round(best, 4),
                              "wall_s": round(wall, 1)}), flush=True)
        lanes[lane] = {
            "bests": [round(v, 4) for v in bests],
            "median": round(float(np.median(bests)), 4),
            "mean": round(float(np.mean(bests)), 4),
            "wall_per_run_s": round(float(np.mean(walls[1:] or walls)), 1),
        }
    summary = {
        "benchmark": args.benchmark,
        "method": "bo", "acq": "ei",
        "max_evals": args.max_evals,
        "batch_size": args.batch_size,
        "n_init": args.n_init,
        "fit_optimizer": "grid+adam",
        "seeds": args.seeds,
        "lanes": lanes,
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
