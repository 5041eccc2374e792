"""Matched-budget external-optimizer baselines for the quality claims.

TuRBO's value proposition (Eriksson et al. 2019) is sample-efficiency at
small evaluation budgets in moderate-to-high dimension. The config-4/5
regret numbers in BASELINE.md are compared against the framework's own
oracle and best-known calibrations; this script anchors them EXTERNALLY:
standard scipy global optimizers run at the SAME evaluation budget on the
same objectives, so "median 9–11 on rover60" can be read against what a
user would get from off-the-shelf tools.

Every optimizer sees exactly ``budget`` objective evaluations (a counting
recorder truncates the trace, so best-seen is computed over the first
``budget`` evaluations regardless of optimizer bookkeeping).

Optimizers:
  random  — uniform random search (the floor)
  de      — scipy differential_evolution, population sized so
            (maxiter+1)·popsize·d ≈ budget, polish off
  da      — scipy dual_annealing, maxfun=budget
  lbfgs   — multistart L-BFGS-B with finite-difference gradients
            (each gradient costs d+1 evals — the honest black-box cost)

Usage:
    python benchmarks/baseline_optimizers.py --out benchmarks/results_external_baselines.json

CPU-only (objectives are jnp; jax is pinned to the CPU backend before any
op per CLAUDE.md). Wall is minutes; run with the TPU idle (1-core box).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from scipy.optimize import differential_evolution, dual_annealing, minimize

from turbojax.benchmarks import get_benchmark


class Recorder:
    """Counts evaluations and tracks best-within-budget."""

    def __init__(self, fn, budget: int):
        self._fn = fn
        self.budget = budget
        self.n = 0
        self.best = np.inf

    def __call__(self, x):
        y = float(np.asarray(self._fn(np.asarray(x)[None, :]))[0])
        self.n += 1
        if self.n <= self.budget and y < self.best:
            self.best = y
        return y


def run_random(fn, dim, lb, ub, budget, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(lb, ub, size=(budget, dim))
    y = np.asarray(fn(x))
    return float(np.min(y))


def run_de(rec, dim, lb, ub, seed):
    # total evals ≈ (maxiter+1) * popsize_mult * dim  (init + per-gen)
    pop_mult = max(2, min(15, rec.budget // (10 * dim)))
    maxiter = max(1, rec.budget // (pop_mult * dim) - 1)
    differential_evolution(
        rec, bounds=list(zip(lb, ub)), popsize=pop_mult, maxiter=maxiter,
        seed=seed, polish=False, tol=0.0, init="sobol",
    )
    return rec.best


def run_da(rec, dim, lb, ub, seed):
    dual_annealing(rec, bounds=list(zip(lb, ub)), maxfun=rec.budget,
                   seed=seed)
    return rec.best


def run_lbfgs(rec, dim, lb, ub, seed):
    rng = np.random.default_rng(seed)
    per_start = max((dim + 1) * 6, rec.budget // 4)
    while rec.n < rec.budget:
        x0 = rng.uniform(lb, ub, size=dim)
        cap = min(per_start, rec.budget - rec.n)
        if cap < dim + 2:
            rec(x0)
            continue
        minimize(rec, x0, method="L-BFGS-B", bounds=list(zip(lb, ub)),
                 options={"maxfun": cap})
    return rec.best


RUNNERS = {"random": run_random, "de": run_de, "da": run_da, "lbfgs": run_lbfgs}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problems", nargs="+",
                    default=["rover60:2000", "lunar60:2000", "ackley10:1000"])
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--optimizers", nargs="+", default=list(RUNNERS))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    results = {}
    for spec in args.problems:
        name, budget = spec.split(":")
        budget = int(budget)
        bench = get_benchmark(name)
        fn = jax.jit(bench.fn)
        fn(np.zeros((2, bench.dim)))  # compile outside timing
        lb = np.asarray(bench.lb, dtype=float) * np.ones(bench.dim)
        ub = np.asarray(bench.ub, dtype=float) * np.ones(bench.dim)
        results[spec] = {}
        for opt in args.optimizers:
            bests, t0 = [], time.time()
            for seed in range(args.seeds):
                if opt == "random":
                    bests.append(run_random(fn, bench.dim, lb, ub, budget, seed))
                else:
                    rec = Recorder(fn, budget)
                    bests.append(float(RUNNERS[opt](rec, bench.dim, lb, ub, seed)))
            row = {
                "bests": [round(b, 4) for b in bests],
                "median": round(float(np.median(bests)), 4),
                "mean": round(float(np.mean(bests)), 4),
                "wall_s": round(time.time() - t0, 1),
            }
            results[spec][opt] = row
            print(json.dumps({"problem": spec, "optimizer": opt, **row}),
                  flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
