"""Large-N single-chip scaling bench (dense exact-GP path, real TPU).

Measures where the dense masked path actually tops out on one chip —
the regime between the BO-sized benches (N<=2000, BENCH_components.json)
and the row-sharded distributed path (tested on the 8-virtual-device CPU
mesh at N=4096, `tests/test_distributed_linalg.py`). Rows per N:

  state_build   kernel build + jittered Cholesky + alpha (gp.make_gp_state)
  posterior_5k  fused mean/variance over 5000 candidates (gp.gp_posterior,
                chunk 1000 like the product loops; the UNCHUNKED call OOMs
                at N=16384: XLA materializes ~20.9 GiB of (N, 5000) temps
                vs 15.75 GiB HBM — measured 2026-08-19)
  ts_q10_5k     batched Thompson select, q=10, chunk 1000 (acq.thompson_select)
  adam_fit_5    5 Adam MLL steps at full N (the distributed trainer's dense
                twin; the 15-way vmapped grid fit is also probed and reported
                as OOM when the 15x N^2 working set exceeds HBM — that
                boundary is the measured justification for the grid->adam
                trainer switch at large N)

Timing: median of per-rep-blocked wall times (axon dispatches are async;
a single trailing block once under-read a ~1 s fit as 0.6 ms — see the
refit-gate correction in BASELINE.md "Round-3 x64-promotion find").

Usage: python benchmarks/bench_large_n.py [--ns 4096 8192 16384] [--json out]
Run alone on the box (CLAUDE.md: one TPU process at a time).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from turbojax import acq as A
from turbojax import gp as G
from turbojax import linalg as L
from turbojax.config import GPConfig
from turbojax.distributed_linalg import DENSE_BUDGET_BYTES, should_distribute


def timed(f, reps=5):
    """Median of per-rep-blocked wall times; one warmup (compile) rep."""
    jax.block_until_ready(f())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def try_timed(row, name, f, reps):
    """One row OOMing (HBM boundary — a result, not a failure) must not
    kill the sweep; record the exception class instead."""
    try:
        row[f"{name}_s"] = timed(f, reps)
    except Exception as e:
        row[f"{name}_s"] = None
        row[f"{name}_error"] = type(e).__name__
        msg = str(e)
        marker = "Ran out of memory"
        row[f"{name}_error_msg"] = (
            msg[msg.index(marker):][:120] if marker in msg else msg[:120]
        )


def bench_n(n: int, d: int, n_cand: int, q: int, reps: int):
    config = GPConfig(kernel="matern52")
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.uniform(k1, (n, d), jnp.float32)
    y = jnp.sin(3.0 * x[:, 0]) + 0.1 * jax.random.normal(k2, (n,), jnp.float32)
    mask = L.row_mask(n, jnp.asarray(n))
    cands = jax.random.uniform(k3, (n_cand, d), jnp.float32)
    raw = G.default_params(d, config)

    row = {"n": n, "d": d}

    build = jax.jit(lambda xb, yb: G.make_gp_state(xb, yb, mask, raw, config))
    try_timed(row, "state_build", lambda: build(x, y), reps)
    state = build(x, y)

    post = jax.jit(lambda s, c: G.gp_posterior(s, c, config, chunk_size=1000))
    try_timed(row, "posterior_5k", lambda: post(state, cands), reps)

    # chunk_size=None: gp_posterior auto-chunks once the cross-matrix
    # exceeds _POSTERIOR_AUTO_CHUNK_BYTES (the unchunked 16384x5000 program
    # OOMed pre-fix; this lane proves the default-arg path stays in-HBM)
    post_auto = jax.jit(lambda s, c: G.gp_posterior(s, c, config, chunk_size=None))
    try_timed(row, "posterior_5k_auto", lambda: post_auto(state, cands), reps)

    ts_sel = jax.jit(
        lambda k, s, c: A.thompson_select(k, s, c, q, config, chunk_size=1000)
    )
    try_timed(row, "ts_q10_5k", lambda: ts_sel(k4, state, cands), reps)

    adam_cfg = dataclasses.replace(
        config, fit_optimizer="adam", fit_maxiter=5, fit_restarts=1
    )
    fit = jax.jit(lambda k, xb, yb: G.fit_gp(k, xb, yb, mask, adam_cfg))
    try_timed(row, "adam_fit5", lambda: fit(k4, x, y), max(2, reps // 2))

    # the 15-way vmapped grid fit: working set ~15 N^2 f32 — probe, don't assume
    grid_cfg = dataclasses.replace(config, fit_optimizer="grid")
    gfit = jax.jit(lambda k, xb, yb: G.fit_gp(k, xb, yb, mask, grid_cfg))
    try_timed(row, "grid_fit", lambda: gfit(k4, x, y), max(2, reps // 2))

    row["auto_routes_distributed_1chip"] = bool(
        should_distribute(n, None, jnp.float32, DENSE_BUDGET_BYTES)
    )
    row["k_matrix_gib"] = round(n * n * 4 / 2**30, 3)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="+", default=[4096, 8192, 16384])
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--n-cand", type=int, default=5000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    print(f"backend: {jax.devices()[0].platform} {jax.devices()[0]}")
    rows = []
    for n in args.ns:
        row = bench_n(n, args.d, args.n_cand, 10, args.reps)
        rows.append(row)
        print(json.dumps(row))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
