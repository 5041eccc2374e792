"""Fit-path profiling + staged cost breakdown (VERDICT r4 task 7).

Two lanes, run on the real TPU:

  lbfgs  — the 0.94 s refit-gate program (L-BFGS 15 iters x 4 vmapped
           restarts at N=2000): one perfetto trace via runlog.profile, plus
           a staged breakdown timing the separable sub-programs
           (kernel+chol forward, MLL value+grad, one full _fit_one lane)
           so the gate's budget has a measured decomposition.
  grid   — the config-5 grid+adam trainer at the flagship bucket cap
           (N=2048, d=60): grid stage (15 vmapped chol) vs the Adam-polish
           stage (fit_maxiter_warm=40 value+grad steps), the warm
           iteration's dominant cost (BASELINE.md wall forensics).

Per-rep-blocked median of --reps (default 5). The perfetto dump lands in
--trace-dir (inspect with xprof/TensorBoard); through the axon remote
tunnel the device timeline may be host-side only — the staged breakdown is
the load-bearing decomposition either way.

Usage (idle box):
    python benchmarks/profile_fit.py --out benchmarks/results_fit_profile.json
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


def timed_ms(fn, reps):
    import jax

    jax.block_until_ready(fn())  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return round(float(np.median(ts)) * 1e3, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--trace-dir", default="/tmp/turbojax-fit-trace")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from turbojax import gp as G
    from turbojax import linalg as L
    from turbojax import runlog as RL
    from turbojax.compile_cache import enable_persistent_cache
    from turbojax.config import GPConfig

    enable_persistent_cache()
    report = {"backend": jax.default_backend(), "reps": args.reps}

    # ---- lane 1: the refit-gate program (L-BFGS 15 x 4, N=2000, d=10) ----
    n, n_max, d = 2000, 2048, 10
    rng = np.random.RandomState(0)
    config = GPConfig(kernel="matern52", fit_optimizer="lbfgs",
                      fit_maxiter=15, fit_restarts=4)
    x_buf = jnp.zeros((n_max, d), jnp.float32).at[:n].set(
        jnp.asarray(rng.rand(n, d), jnp.float32))
    y_buf = jnp.zeros((n_max,), jnp.float32).at[:n].set(
        jnp.asarray(np.sin(3 * rng.rand(n)) + 0.1 * rng.randn(n), jnp.float32))
    mask = L.row_mask(n_max, n)

    fit = jax.jit(lambda k: G.fit_gp(k, x_buf, y_buf, mask, config))
    key = jax.random.key(0)
    report["lbfgs_full_fit_ms"] = timed_ms(lambda: fit(key), args.reps)

    # staged sub-programs of the same fit
    from turbojax import transforms as T

    y_std, _, _ = T.standardize(y_buf, mask)
    raw = G.default_params(d, config)
    mll_vg = jax.jit(jax.value_and_grad(
        lambda r: -G.mll(r, x_buf, y_std, mask, config)))
    report["mll_value_and_grad_ms"] = timed_ms(lambda: mll_vg(raw), args.reps)
    state_build = jax.jit(lambda: G.make_gp_state(x_buf, y_buf, mask, raw, config))
    report["kernel_chol_alpha_ms"] = timed_ms(state_build, args.reps)
    one_lane = jax.jit(lambda r: G._fit_one(r, x_buf, y_std, mask, config))
    report["fit_one_restart_ms"] = timed_ms(lambda: one_lane(raw), args.reps)
    # implied: linesearch probe count per L-BFGS iter =
    #   full_fit / (maxiter * mll_vg) roughly, restarts vmapped (~free)
    report["implied_vg_equivalents_per_fit"] = round(
        report["lbfgs_full_fit_ms"] / max(report["mll_value_and_grad_ms"], 1e-9), 1)

    # one perfetto trace of the full fit
    os.makedirs(args.trace_dir, exist_ok=True)
    with RL.profile(args.trace_dir):
        with RL.annotate("refit_lbfgs15x4"):
            jax.block_until_ready(fit(jax.random.key(1)))
    report["trace_dir"] = args.trace_dir
    report["trace_files"] = sum(len(fs) for _, _, fs in os.walk(args.trace_dir))

    # ---- lane 2: config-5 grid+adam at the flagship cap (d=60) ----------
    n5, cap, d5 = 1800, 2048, 60
    cfg5 = GPConfig(kernel="matern52", fit_optimizer="grid+adam",
                    fit_maxiter=50, fit_maxiter_warm=40, fit_restarts=2)
    x5 = jnp.zeros((cap, d5), jnp.float32).at[:n5].set(
        jnp.asarray(rng.rand(n5, d5), jnp.float32))
    y5 = jnp.zeros((cap,), jnp.float32).at[:n5].set(
        jnp.asarray(rng.randn(n5), jnp.float32))
    m5 = L.row_mask(cap, n5)

    full5 = jax.jit(lambda k: G.fit_gp(k, x5, y5, m5, cfg5))
    report["grid_adam_full_fit_ms"] = timed_ms(lambda: full5(key), args.reps)
    grid_only = jax.jit(lambda k: G.fit_gp(
        k, x5, y5, m5, dataclasses.replace(cfg5, fit_optimizer="grid")))
    report["grid_stage_ms"] = timed_ms(lambda: grid_only(key), args.reps)
    y5_std, _, _ = T.standardize(y5, m5)
    raw5 = G.default_params(d5, cfg5)
    vg5 = jax.jit(jax.value_and_grad(
        lambda r: -G.mll(r, x5, y5_std, m5, cfg5)))
    report["mll_vg_d60_ms"] = timed_ms(lambda: vg5(raw5), args.reps)
    report["polish_stage_ms"] = round(
        report["grid_adam_full_fit_ms"] - report["grid_stage_ms"], 2)
    report["implied_polish_steps_cost"] = round(
        report["polish_stage_ms"] / max(report["mll_vg_d60_ms"], 1e-9), 1)

    with RL.profile(args.trace_dir):
        with RL.annotate("config5_grid_adam_refit"):
            jax.block_until_ready(full5(jax.random.key(2)))

    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
