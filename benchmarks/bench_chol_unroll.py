"""Distributed blocked-Cholesky lane A/B: fori (full-width masked trailing
update, constant program size) vs unroll (FLOP-optimal narrow trailing
slices, program size ~ n_panels) — VERDICT r4 weak #6 / task 6.

The round-4 scaling table measured the 8-device chol at 4-5x the dense
wall on the same backend; the known decomposition is the ~2x average FLOP
overhead of the masked full-width trailing update (every panel iteration
multiplies against the full (rows, N) block; the true trailing width
averages N/2) plus per-panel dispatch. The ``unroll=True`` lane removes
the FLOP half of that; this bench measures whether it wins at moderate
panel counts, and its compile-time cost, to set the auto-routing cap.

Protocol: 8-virtual-device CPU mesh (one physical core: walls measure the
total-work shape, not TPU speedup — the dist/dense ratio is the overhead
constant; see bench_distributed.py framing). Per-rep-blocked median of 3.

Usage (idle box):
    python benchmarks/bench_chol_unroll.py --out benchmarks/results_chol_unroll.json
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
from turbojax import parallel as PAR
from turbojax.config import GPConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--n-dev", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    config = GPConfig(kernel="matern52")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.n, 10), jnp.float32)
    mesh = PAR.make_mesh(args.n_dev, axis="rows")
    raw = G.default_params(10, config, jnp.float32)
    params = G.constrain_params(raw, config)
    params = {k: params[k] for k in ("lengthscale", "outputscale", "noise")}

    rows = args.n // args.n_dev
    results = {"n": args.n, "n_dev": args.n_dev, "rows_per_dev": rows, "lanes": []}
    # panel sizes giving n_panels in {8, 16, 32} at this N, all dividing rows
    for n_panels in (8, 16, 32):
        panel = args.n // n_panels
        if rows % panel and panel % rows:
            continue
        panel = min(panel, rows)
        while rows % panel:
            panel -= 1
        n_panels_eff = args.n // panel
        for unroll in (False, True):
            fn = jax.jit(
                lambda p, xx, u=unroll, pan=panel: DL.distributed_kernel_chol(
                    p, xx, mesh, panel=pan, kernel=config.kernel, unroll=u,
                    jitter=config.jitter,
                )
            )
            t_c0 = time.perf_counter()
            out = fn(params, x)
            jax.block_until_ready(out)
            compile_s = time.perf_counter() - t_c0
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(params, x))
                ts.append(time.perf_counter() - t0)
            lane = {
                "panel": panel, "n_panels": n_panels_eff,
                "unroll": unroll,
                "wall_s": round(float(np.median(ts)), 4),
                "compile_s": round(compile_s, 2),
            }
            results["lanes"].append(lane)
            print(json.dumps(lane), flush=True)

    # dense reference on the same backend (the overhead denominator)
    from turbojax import linalg as LIN
    from turbojax import kernels as K

    kfn = K.get_kernel(config.kernel)
    dense = jax.jit(
        lambda p, xx: LIN.cholesky_jittered(
            kfn(p, xx, xx)
            + (p["noise"] + config.jitter * (p["outputscale"] + p["noise"]))
            * jnp.eye(args.n, dtype=jnp.float32),
            0.0,
        )
    )
    jax.block_until_ready(dense(params, x))
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        jax.block_until_ready(dense(params, x))
        ts.append(time.perf_counter() - t0)
    results["dense_wall_s"] = round(float(np.median(ts)), 4)
    print(json.dumps({"dense_wall_s": results["dense_wall_s"]}), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
