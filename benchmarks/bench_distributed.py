"""Distributed-path scaling bench on the virtual CPU mesh (VERDICT r3
missing #4 / ROADMAP 4 "benchmark the crossover").

Per-op walls for the row-block-sharded DistributedGP at
N ∈ {4096, 8192, 16384} × n_dev ∈ {2, 4, 8}, against the dense masked lane
on the SAME (CPU) backend at the same N. Rows:

  dist_chol        in-shard kernel build + blocked Cholesky + alpha
                   (distributed_kernel_chol + distributed_cho_solve)
  dist_mll_grad    one distributed-MLL value+grad (the fit step's cost;
                   custom-VJP closed form, O(N²/D) memory)
  dist_posterior   mean/variance over 5k candidates
  dist_pathwise    q=10 decoupled pathwise draw over 5k candidates (the
                   only TS route at N ≫ chip)
  dense_chol / dense_mll_grad / dense_posterior — the single-"device"
                   masked lane (gp.make_gp_state / mll grad / gp_posterior)

IMPORTANT framing: this box has ONE physical core, so the n_dev "devices"
time-share it — walls here measure the sharding's overhead/FLOP *shape*
(panel-loop masked-update overhead, collective counts), NOT TPU speedups.
On real hardware each shard runs on its own chip; the expected wall is
roughly (work/D + collective latency). The numbers justify the routing
threshold's FORM (memory arithmetic, DENSE_BUDGET_BYTES) and quantify the
distributed path's constant-factor overhead vs dense at equal backend.

Usage (run alone — timings contend on the 1-core box):
    JAX_PLATFORMS=cpu python benchmarks/bench_distributed.py \
        --out benchmarks/results_distributed_scaling.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")  # CLAUDE.md backend gotcha

import jax.numpy as jnp
import numpy as np

from turbojax import distributed_linalg as DL
from turbojax import gp as G
from turbojax import linalg as L
from turbojax import parallel as PAR
from turbojax.config import GPConfig


def timed(f, reps=3):
    jax.block_until_ready(f())  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def bench_dist(n, n_dev, d, n_cand, q, config, reps):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n, d), jnp.float32)
    y = jnp.asarray(np.sin(3 * np.asarray(x[:, 0])) + 0.1 * rng.randn(n), jnp.float32)
    cands = jnp.asarray(rng.rand(n_cand, d), jnp.float32)
    mesh = PAR.make_mesh(n_dev, axis="rows")
    panel = 256
    raw = G.default_params(d, config, jnp.float32)
    params = G.constrain_params(raw, config)
    params = {k: params[k] for k in ("lengthscale", "outputscale", "noise")}

    row = {}
    chol_fn = jax.jit(
        lambda xx: DL.distributed_kernel_chol(params, xx, mesh, panel,
                                              kernel=config.kernel, jitter=1e-6)
    )
    row["dist_chol_s"] = timed(lambda: chol_fn(x), reps)
    chol = chol_fn(x)
    alpha_fn = jax.jit(
        lambda c, yy: DL.distributed_cho_solve(c, yy[:, None], mesh, panel)
    )
    alpha = alpha_fn(chol, y)
    row["dist_alpha_s"] = timed(lambda: alpha_fn(chol, y), reps)

    grad_fn = jax.jit(
        lambda r, xx, yy: jax.value_and_grad(
            lambda rr: DL.distributed_mll(rr, xx, yy, mesh, config, panel)
        )(r)
    )
    row["dist_mll_grad_s"] = timed(lambda: grad_fn(raw, x, y), reps)

    dgp = DL.DistributedGP(mesh, kernel=config.kernel, panel=panel)
    dgp.fit(x, y, params["lengthscale"], params["outputscale"], params["noise"])
    post_fn = jax.jit(lambda cc: dgp.posterior(cc))
    row["dist_posterior_5k_s"] = timed(lambda: post_fn(cands), reps)
    path_fn = jax.jit(
        lambda k, cc: DL.distributed_pathwise_paths(k, dgp, cc, q, 1024)
    )
    key = jax.random.key(0)
    row["dist_pathwise_q10_s"] = timed(lambda: path_fn(key, cands), reps)
    return row


def bench_dense(n, d, n_cand, q, config, reps):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n, d), jnp.float32)
    y = jnp.asarray(np.sin(3 * np.asarray(x[:, 0])) + 0.1 * rng.randn(n), jnp.float32)
    cands = jnp.asarray(rng.rand(n_cand, d), jnp.float32)
    mask = L.row_mask(n, jnp.asarray(n))
    raw = G.default_params(d, config, jnp.float32)

    row = {}
    state_fn = jax.jit(lambda xx, yy: G.make_gp_state(xx, yy, mask, raw, config))
    row["dense_chol_s"] = timed(lambda: state_fn(x, y), reps)
    state = state_fn(x, y)
    y_std = (y - state.y_mean) / state.y_std
    grad_fn = jax.jit(
        lambda r, xx, yy: jax.value_and_grad(
            lambda rr: G.mll(rr, xx, yy, mask, config)
        )(r)
    )
    row["dense_mll_grad_s"] = timed(lambda: grad_fn(raw, x, y_std), reps)
    post_fn = jax.jit(lambda cc: G.gp_posterior(state, cc, config))
    row["dense_posterior_5k_s"] = timed(lambda: post_fn(cands), reps)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="+", default=[4096, 8192, 16384])
    ap.add_argument("--n-devs", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--n-cand", type=int, default=5000)
    ap.add_argument("--q", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-dense-above", type=int, default=1 << 62,
                    help="skip the dense lane above this N (host-RAM guard)")
    ap.add_argument("--out", default="benchmarks/results_distributed_scaling.json")
    args = ap.parse_args()

    config = GPConfig(kernel="matern52")
    results = {"backend": jax.default_backend(), "d": args.d,
               "n_cand": args.n_cand, "q": args.q, "rows": []}
    for n in args.ns:
        if n <= args.skip_dense_above:
            row = {"n": n, "lane": "dense", **bench_dense(
                n, args.d, args.n_cand, args.q, config, args.reps)}
            results["rows"].append(row)
            print(json.dumps(row), flush=True)
        for n_dev in args.n_devs:
            if n % n_dev:
                continue
            row = {"n": n, "lane": f"dist_{n_dev}dev", "n_dev": n_dev,
                   **bench_dist(n, n_dev, args.d, args.n_cand, args.q,
                                config, args.reps)}
            results["rows"].append(row)
            print(json.dumps(row), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
