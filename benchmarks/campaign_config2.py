"""Config-2 trainer study (VERDICT r2 task 9): measure L-BFGS (the named
reference parity [B:8]) against the grid and grid+adam trainers on
Hartmann-6 — full 112-eval budget, per-iteration refit — regret + wall.

Usage:
    python benchmarks/campaign_config2.py --seeds 10 --out /tmp/c2_study.json
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--max-evals", type=int, default=None,
                    help="reduced budget (smoke runs)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu or os.environ.get("TURBOJAX_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from configs import get_config
    from turbojax import benchmarks as B
    from turbojax.bo import run_bo
    from turbojax.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = get_config("hartmann6_lbfgs")
    b = B.get_benchmark(cfg.benchmark)
    bo = cfg.bo
    if args.max_evals:
        bo = dataclasses.replace(bo, max_evals=args.max_evals)

    results = {}
    for trainer in ("lbfgs", "grid", "grid+adam"):
        gp = dataclasses.replace(cfg.gp, fit_optimizer=trainer)
        regrets, walls = [], []
        for s in range(args.seeds):
            t0 = time.perf_counter()
            res = run_bo(
                jax.random.key(s), b.fn, b.lb, b.ub, bo, gp,
                host_loop=bo.n_iters > 40,
            )
            walls.append(time.perf_counter() - t0)
            regrets.append(float(res.best_y) - b.optimum)
        results[trainer] = {
            "regrets": [round(r, 4) for r in regrets],
            "median_regret": round(float(np.median(regrets)), 4),
            "mean_regret": round(float(np.mean(regrets)), 4),
            "wall_warm_s": round(float(np.median(walls[1:] or walls)), 2),
        }
        print(json.dumps({trainer: results[trainer]}), flush=True)

    summary = {"config": "hartmann6_lbfgs", "backend": jax.default_backend(),
               "seeds": args.seeds, "trainers": results}
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
