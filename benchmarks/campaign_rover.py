"""Config-5 (TuRBO-m m=5, rover60, 2000 evals) quality campaign
(VERDICT r2 tasks 2 and 8).

Variants:
  base      — config 5 as registered (robust TS ladder default-on)
  ard       — fit_optimizer="grid+adam" (ARD trust-region geometry)
  f64ts     — ts_dtype="float64" (exact-law TS; slow at m=5 × cap 2048 —
              measure wall before committing to it)
  ard_f64ts — both

Chaos probe (VERDICT r2 weak #4 / task 8): --fixed-cap runs with
full-capacity buffers from iteration 0 (no bucket ladder) — identical
mathematics to the bucketed run; any result difference is 1-ulp
reduction-order sensitivity, quantified per seed.

Usage:
    python benchmarks/campaign_rover.py --variant base --seeds 10 \
        --out /tmp/rover_base.json
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
                    choices=["base", "ard", "f64ts", "ard_f64ts"])
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--seed-start", type=int, default=0)
    ap.add_argument("--m", type=int, default=None)
    ap.add_argument("--benchmark", default=None,
                    help="override the objective (e.g. lunar60)")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--max-evals", type=int, default=None)
    ap.add_argument("--n-init", type=int, default=None)
    ap.add_argument("--n-cand", type=int, default=None,
                    help="TR candidate-set size (default min(100d, 5000) [R])")
    ap.add_argument("--local-frac", type=float, default=None)
    ap.add_argument("--y-warp", default=None, choices=["none", "bilog"],
                    help="GPConfig.y_warp override (heavy-tail lever)")
    ap.add_argument("--kernel", default=None,
                    choices=["rbf", "matern12", "matern32", "matern52"],
                    help="GPConfig.kernel override (reference default matern52)")
    ap.add_argument("--alloc-cap", type=int, default=None,
                    help="TurboConfig.alloc_cap override: per-TR slot cap "
                         "per batch in the global TS allocation (None = "
                         "reference-parity unconstrained argmin)")
    ap.add_argument("--polish-both", action="store_true",
                    help="GPConfig.grid_polish_both: polish warm AND fresh "
                         "grid rows, keep the better MLL (chain + escape hatch)")
    ap.add_argument("--grid-warm", default=None, choices=["on", "off"],
                    help="GPConfig.grid_warm_start override: chain the ARD "
                         "polish across refits (warm row in the grid) vs "
                         "re-polish from the isotropic grid argmax each refit")
    ap.add_argument("--polish-steps", type=int, default=None,
                    help="GPConfig.fit_maxiter_warm override: Adam polish "
                         "depth for the grid+adam ARD trainer (config-5 "
                         "registry default applies when unset)")
    ap.add_argument("--fail-tol", type=int, default=None,
                    help="TRConfig.fail_tol override: consecutive failed "
                         "batches before the TR halves (default "
                         "ceil(max(4,d)/q) = 6 at d=60, q=10 [R])")
    ap.add_argument("--succ-tol", type=int, default=None,
                    help="TRConfig.succ_tol override: consecutive improved "
                         "batches before the TR doubles (default 3 [R])")
    ap.add_argument("--stagnation-tol", type=int, default=None,
                    help="TRConfig.stagnation_tol (round-4 opt-in lever): "
                         "restart a TR after this many consecutive "
                         "improvement-free search batches (incl. batches "
                         "the global allocation starved it of) even while "
                         "length > length_min — the flagship budget "
                         "produces zero natural restarts")
    ap.add_argument("--fit-every", type=int, default=None,
                    help="TurboConfig.fit_every override: refit cadence in "
                         "accepted batches per TR (default 1 = every batch "
                         "[R]; the remaining wall lever on the dominant TR)")
    ap.add_argument("--fit-optimizer", default=None,
                    choices=["grid", "grid+adam", "adam", "lbfgs"],
                    help="GPConfig.fit_optimizer override (e.g. the plain "
                         "isotropic grid lane for matched-trainer oracle "
                         "comparisons)")
    ap.add_argument("--prior", default=None, choices=["none", "dimscaled"],
                    help="GPConfig.fit_prior override: MAP fit objective "
                         "(dimscaled = Hvarfner 2024 LogNormal lengthscale "
                         "prior, the published high-d fit regularizer)")
    ap.add_argument("--ls-hi", type=float, default=None,
                    help="upper lengthscale bound override (the reference "
                         "unit-cube clamp is 2.0; the dimscaled prior's "
                         "median at d=60 is ~11 — widen to let the MAP "
                         "express it)")
    ap.add_argument("--fit-ftol", type=float, default=None,
                    help="GPConfig.fit_ftol override: adam-polish early-stop per-step loss-"
                         "improvement tolerance (0 = fixed-depth default; the "
                         "warm-chain wall lever)")
    ap.add_argument("--fixed-cap", action="store_true",
                    help="full-capacity buffers from iter 0 (chaos probe)")
    ap.add_argument("--no-split-fit", action="store_true",
                    help="disable the split-capacity fit (docs/DESIGN.md "
                         "§4c): every TR lane fits at the shared bucket "
                         "capacity (the pre-split uniform program)")
    ap.add_argument("--sobol-scramble", default=None, choices=["shift", "lms"],
                    help="TurboConfig.sobol_scramble override: candidate "
                         "stream randomization (shift = digital-shift RQMC "
                         "default; lms = Matousek LMS+shift, the scipy/"
                         "reference-stack class — round-5 lunar-residual "
                         "discriminating axis)")
    ap.add_argument("--ts-sampler", default=None,
                    choices=["exact", "rff", "pathwise"],
                    help="Thompson sampler (acq module): exact chunked "
                         "joint chol (default) | weight-space rff | "
                         "decoupled pathwise (Matheron update)")
    ap.add_argument("--cpu", action="store_true")
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
    from turbojax.turbo_m import run_turbom

    enable_persistent_cache()
    cfg = apply_variant(get_config("turbom5_rover60"), args.variant)
    turbo = cfg.turbo
    if args.max_evals:
        turbo = dataclasses.replace(turbo, max_evals=args.max_evals)
    if args.batch_size:
        turbo = dataclasses.replace(turbo, batch_size=args.batch_size)
    if args.n_init:
        turbo = dataclasses.replace(turbo, n_init=args.n_init)
    if args.n_cand:
        turbo = dataclasses.replace(turbo, n_candidates=args.n_cand)
    if args.local_frac is not None:
        turbo = dataclasses.replace(turbo, local_frac=args.local_frac)
    if args.alloc_cap is not None:
        turbo = dataclasses.replace(turbo, alloc_cap=args.alloc_cap)
    if args.ts_sampler is not None:
        turbo = dataclasses.replace(turbo, ts_sampler=args.ts_sampler)
    if args.sobol_scramble is not None:
        turbo = dataclasses.replace(turbo, sobol_scramble=args.sobol_scramble)
    if args.fit_every is not None:
        turbo = dataclasses.replace(turbo, fit_every=args.fit_every)
    if (args.fail_tol is not None or args.succ_tol is not None
            or args.stagnation_tol is not None):
        tr = turbo.tr
        if args.fail_tol is not None:
            tr = dataclasses.replace(tr, fail_tol=args.fail_tol)
        if args.succ_tol is not None:
            tr = dataclasses.replace(tr, succ_tol=args.succ_tol)
        if args.stagnation_tol is not None:
            tr = dataclasses.replace(tr, stagnation_tol=args.stagnation_tol)
        turbo = dataclasses.replace(turbo, tr=tr)
    gp_cfg = cfg.gp
    if args.fit_optimizer is not None:
        gp_cfg = dataclasses.replace(gp_cfg, fit_optimizer=args.fit_optimizer)
    if args.y_warp is not None:
        gp_cfg = dataclasses.replace(gp_cfg, y_warp=args.y_warp)
    if args.polish_steps is not None:
        gp_cfg = dataclasses.replace(gp_cfg, fit_maxiter_warm=args.polish_steps)
    if args.grid_warm is not None:
        gp_cfg = dataclasses.replace(gp_cfg, grid_warm_start=args.grid_warm == "on")
    if args.kernel is not None:
        gp_cfg = dataclasses.replace(gp_cfg, kernel=args.kernel)
    if args.polish_both:
        gp_cfg = dataclasses.replace(gp_cfg, grid_polish_both=True)
    if args.fit_ftol is not None:
        gp_cfg = dataclasses.replace(gp_cfg, fit_ftol=args.fit_ftol)
    if args.prior is not None:
        gp_cfg = dataclasses.replace(gp_cfg, fit_prior=args.prior)
    if args.ls_hi is not None:
        gp_cfg = dataclasses.replace(
            gp_cfg, lengthscale_bounds=(gp_cfg.lengthscale_bounds[0], args.ls_hi)
        )
    b = B.get_benchmark(args.benchmark or cfg.benchmark)
    m = args.m or cfg.m
    n_loc = turbo.n_init + turbo.n_iters * turbo.batch_size if args.fixed_cap else None

    bests, walls, restarts = [], [], []
    for s in range(args.seed_start, args.seed_start + args.seeds):
        t0 = time.perf_counter()
        carries, trace = run_turbom(
            jax.random.key(s), b.fn, b.lb, b.ub, turbo, gp_cfg, m=m,
            n_loc=n_loc, host_loop=True, split_fit=not args.no_split_fit,
        )
        best = float(np.asarray(carries.best_y).min())
        wall = time.perf_counter() - t0
        n_restarts = np.asarray(carries.tr.restarts).tolist()  # per-TR
        bests.append(best)
        walls.append(wall)
        restarts.append(n_restarts)
        print(json.dumps({"seed": s, "best": round(best, 4), "wall_s": round(wall, 1),
                          "tr_restarts": n_restarts,
                          "final_cap": int(carries.x_buf.shape[1]),
                          "tr_n": np.asarray(carries.n).tolist()}),
              flush=True)
    summary = {
        "variant": args.variant + ("_fixedcap" if args.fixed_cap else ""),
        "benchmark": args.benchmark or cfg.benchmark,
        "backend": jax.default_backend(),
        "m": m,
        "max_evals": turbo.max_evals,  # budget-variant artifacts must be
        "n_iters": turbo.n_iters,      # self-describing (ADVICE r4)
        "batch_size": turbo.batch_size,
        "n_init": turbo.n_init,
        "n_candidates": turbo.n_candidates,  # None = min(100d, 5000)
        "local_frac": turbo.local_frac,
        "fail_tol": turbo.tr.fail_tol,  # None = ceil(max(4,d)/q)
        "succ_tol": turbo.tr.succ_tol,
        "kernel": gp_cfg.kernel,
        "y_warp": gp_cfg.y_warp,
        "fit_optimizer": gp_cfg.fit_optimizer,
        "fit_prior": gp_cfg.fit_prior,
        "fit_ftol": gp_cfg.fit_ftol,
        "lengthscale_bounds": list(gp_cfg.lengthscale_bounds),
        "fit_maxiter_warm": gp_cfg.fit_maxiter_warm,
        "grid_warm_start": gp_cfg.grid_warm_start,
        "grid_polish_both": gp_cfg.grid_polish_both,
        "alloc_cap": turbo.alloc_cap,
        "fit_every": turbo.fit_every,
        "ts_sampler": turbo.ts_sampler,
        "ts_dtype": turbo.ts_dtype,
        "sobol_scramble": turbo.sobol_scramble,
        "stagnation_tol": turbo.tr.stagnation_tol,
        "split_fit": not args.no_split_fit,
        "seeds": list(range(args.seed_start, args.seed_start + args.seeds)),
        "bests": [round(v, 4) for v in bests],
        "median": round(float(np.median(bests)), 4),
        "mean": round(float(np.mean(bests)), 4),
        "min": round(float(np.min(bests)), 4),
        "max": round(float(np.max(bests)), 4),
        "wall_per_run_s": round(float(np.mean(walls[1:] or walls)), 1),
        "tr_restarts": restarts,  # per seed, per TR — init-budget diagnostic
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
