"""Config-4 (TuRBO-1 Ackley-10D, 1000 evals) regret campaign across the
round-3 quality variants (VERDICT r2 tasks 1 and 2).

Variants:
  base      — config 4 as registered (includes the round-3 robust TS
              error-floor ladder, which is default-on)
  f64ts     — + ts_dtype="float64": exact-law Thompson sampling
  ard       — + fit_optimizer="grid+adam": ARD lengthscales unlock in the
              Adam polish, so the TR geometry weights w = ℓ/mean(ℓ) vary
  ard_f64ts — both

Usage (one TPU process at a time; ~1–2 min/seed for f64ts):
    python benchmarks/campaign_config4.py --variant base --seeds 10 \
        --out /tmp/c4_base.json
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


def apply_variant(cfg, variant: str):
    gp, turbo = cfg.gp, cfg.turbo
    if "ard" in variant:
        gp = dataclasses.replace(gp, fit_optimizer="grid+adam")
    if "f64ts" in variant:
        turbo = dataclasses.replace(turbo, ts_dtype="float64")
    return dataclasses.replace(cfg, gp=gp, turbo=turbo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="base",
                    choices=["base", "f64ts", "ard", "ard_f64ts"])
    ap.add_argument("--ts-sampler", default=None,
                    choices=["exact", "rff", "pathwise"],
                    help="override TurboConfig.ts_sampler (pathwise = "
                         "decoupled Matheron sampler, acq.pathwise_paths)")
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--seed-start", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--max-evals", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu or os.environ.get("TURBOJAX_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if "f64ts" in args.variant:
        jax.config.update("jax_enable_x64", True)

    from configs import get_config
    from turbojax import benchmarks as B
    from turbojax.compile_cache import enable_persistent_cache
    from turbojax.trust_region import run_turbo1

    enable_persistent_cache()
    cfg = apply_variant(get_config("turbo1_ackley10"), args.variant)
    if args.ts_sampler is not None:
        cfg = dataclasses.replace(
            cfg, turbo=dataclasses.replace(cfg.turbo, ts_sampler=args.ts_sampler)
        )
    if args.max_evals:
        cfg = dataclasses.replace(
            cfg, turbo=dataclasses.replace(cfg.turbo, max_evals=args.max_evals)
        )
    b = B.get_benchmark(cfg.benchmark)

    regrets, walls = [], []
    for s in range(args.seed_start, args.seed_start + args.seeds):
        t0 = time.perf_counter()
        carry, trace = run_turbo1(jax.random.key(s), b.fn, b.lb, b.ub, cfg.turbo, cfg.gp)
        best = float(np.asarray(carry.best_y))
        wall = time.perf_counter() - t0
        regrets.append(best - b.optimum)
        walls.append(wall)
        print(
            json.dumps({"seed": s, "regret": round(best - b.optimum, 4),
                        "wall_s": round(wall, 2)}),
            flush=True,
        )
    summary = {
        "variant": args.variant,
        "backend": jax.default_backend(),
        "seeds": list(range(args.seed_start, args.seed_start + args.seeds)),
        "regrets": [round(r, 4) for r in regrets],
        "median": round(float(np.median(regrets)), 4),
        "mean": round(float(np.mean(regrets)), 4),
        "min": round(float(np.min(regrets)), 4),
        "max": round(float(np.max(regrets)), 4),
        "wall_per_run_s": round(float(np.mean(walls[1:] or walls)), 2),
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
