"""Regret-curve harness (SURVEY.md §6, BASELINE.md regret-parity rows).

Runs any of the five BASELINE configs [B:7–B:11] at full or reduced budget,
across seeds, and writes simple-regret curves (incumbent − known optimum)
as JSON for comparison with the CPU oracle BO loop (regret parity) and for
the golden-curve tests.

Usage:
  python benchmarks/regret_harness.py --config branin_ei --seeds 3
  python benchmarks/regret_harness.py --config turbo1_ackley10 --max-evals 200
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import json
import time

import numpy as np


def run_config(name: str, seed: int, max_evals: int | None = None, m: int | None = None,
               n_candidates: int | None = None, n_init: int | None = None):
    import dataclasses

    import jax

    from configs import get_config
    from turbojax import benchmarks as B
    from turbojax import gp as G
    from turbojax.bo import run_bo
    from turbojax.trust_region import run_turbo1
    from turbojax.turbo_m import run_turbom

    cfg = get_config(name)
    if max_evals is not None:
        if cfg.bo is not None:
            cfg = dataclasses.replace(cfg, bo=dataclasses.replace(cfg.bo, max_evals=max_evals))
        if cfg.turbo is not None:
            cfg = dataclasses.replace(cfg, turbo=dataclasses.replace(cfg.turbo, max_evals=max_evals))
    if n_candidates is not None:  # reduced-budget golden runs on the CPU lane
        if cfg.bo is not None:
            cfg = dataclasses.replace(cfg, bo=dataclasses.replace(cfg.bo, n_candidates=n_candidates))
        if cfg.turbo is not None:
            cfg = dataclasses.replace(
                cfg, turbo=dataclasses.replace(cfg.turbo, n_candidates=n_candidates)
            )
    if n_init is not None:  # golden lane: shrink the init design so the
        # reduced-budget curve is SEARCH-dominated (fits + TS allocation),
        # not just the algorithm-independent init stream — keep it a
        # multiple of batch_size (the init stream force-selects q per batch)
        if cfg.bo is not None:
            cfg = dataclasses.replace(cfg, bo=dataclasses.replace(cfg.bo, n_init=n_init))
        if cfg.turbo is not None:
            cfg = dataclasses.replace(
                cfg, turbo=dataclasses.replace(cfg.turbo, n_init=n_init)
            )
    b = B.get_benchmark(cfg.benchmark)
    key = jax.random.key(seed)
    t0 = time.perf_counter()
    if cfg.method == "bo":
        kwargs = {}
        if cfg.bo.fit_every == 0:
            kwargs["fixed_params"] = G.default_params(b.dim, cfg.gp)
        # L-BFGS refits over many iterations make the monolithic scan
        # program too large for the compiler — drive from the host instead
        if cfg.bo.fit_every > 0 and cfg.bo.n_iters > 40:
            kwargs["host_loop"] = True
        res = run_bo(key, b.fn, b.lb, b.ub, cfg.bo, cfg.gp, **kwargs)
        trace, best = np.asarray(res.incumbent_trace), float(res.best_y)
    elif cfg.method == "turbo1":
        carry, tr = run_turbo1(key, b.fn, b.lb, b.ub, cfg.turbo, cfg.gp)
        trace, best = np.asarray(tr), float(carry.best_y)
    elif cfg.method == "turbom":
        # host_loop: one jitted step + host driver — the monolithic
        # multi-hundred-iteration scan at (m=5, N=2000, n_cand=5000)
        # overwhelms the compiler (docs/DESIGN.md); identical math.
        carries, tr = run_turbom(
            key, b.fn, b.lb, b.ub, cfg.turbo, cfg.gp, m=m or cfg.m, host_loop=True
        )
        trace, best = np.asarray(tr), float(np.asarray(carries.best_y).min())
    else:
        raise ValueError(f"config {name} has no regret loop (method={cfg.method})")
    wall = time.perf_counter() - t0
    return {
        "config": name,
        "seed": seed,
        "benchmark": cfg.benchmark,
        "optimum": b.optimum,
        "best": best,
        "simple_regret": best - b.optimum,
        "regret_curve": (trace - b.optimum).tolist(),
        "wall_s": round(wall, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--max-evals", type=int, default=None)
    ap.add_argument("--m", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    runs = [run_config(args.config, s, args.max_evals, args.m) for s in range(args.seeds)]
    regrets = [r["simple_regret"] for r in runs]
    summary = {
        "config": args.config,
        "seeds": args.seeds,
        "regret_mean": float(np.mean(regrets)),
        "regret_std": float(np.std(regrets)),
        "wall_mean_s": float(np.mean([r["wall_s"] for r in runs])),
        "runs": runs,
    }
    print(
        json.dumps(
            {k: v for k, v in summary.items() if k != "runs"}, indent=None
        )
    )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
