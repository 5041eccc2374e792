"""Candidate-axis sharding crossover (VERDICT r4 task 5, the measurement).

Dense single-device acquisition (posterior + EI + top-q) vs
`parallel.sharded_acq_topq` on the 8-virtual-device CPU mesh, over a
candidate-count ladder. On this mesh the D "devices" time-share one
physical core, so wall ~= total work across shards and the ratio
sharded/dense is the sharding's WORK-overhead constant; the implied
real-hardware speedup at D chips is ~ D / overhead (collective latency
excluded — the CPU sim can't see ICI). Combined with the real-TPU
latency floor (BASELINE.md acquisition-latency decomposition: the whole
dense acq is ~6 ms at the reference cap of 5000 candidates, at or below
the per-dispatch floor), this pins where the candidate axis starts to
pay: the measured crossover lands in docs/DESIGN.md §8b and
`bo_distributed.CAND_SHARD_MIN`.

Usage (idle box): python benchmarks/bench_cand_shard.py --out benchmarks/results_cand_shard.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np


def timed_s(fn, reps):
    import jax

    jax.block_until_ready(fn())  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--q", type=int, default=10)
    ap.add_argument("--cands", type=int, nargs="+",
                    default=[5000, 16384, 32768, 65536, 131072])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # axon overrides the env var
    import jax.numpy as jnp

    from turbojax import acq as A
    from turbojax import gp as G
    from turbojax import linalg as L
    from turbojax import parallel as PAR
    from turbojax.compile_cache import enable_persistent_cache
    from turbojax.config import GPConfig

    enable_persistent_cache()
    n_dev = len(jax.devices())
    mesh = PAR.make_mesh(n_dev, axis="dp")
    config = GPConfig(kernel="matern52")

    n, d, q = args.n, args.d, args.q
    rng = np.random.RandomState(0)
    x_buf = jnp.asarray(rng.rand(n, d), jnp.float32)
    y_buf = jnp.asarray(np.sin(3 * rng.rand(n)) + 0.1 * rng.randn(n), jnp.float32)
    mask = L.row_mask(n, n)
    raw = G.default_params(d, config)
    state = jax.jit(lambda: G.make_gp_state(x_buf, y_buf, mask, raw, config))()
    best = jnp.min(y_buf)

    @jax.jit
    def dense_acq(cands):
        mu, var = G.gp_posterior(state, cands, config)
        scores = A.expected_improvement(mu, var, best)
        _, top = jax.lax.top_k(scores, q)
        return cands[top]

    rows = []
    for n_cand in args.cands:
        # round to a multiple of the mesh (the product route requires it)
        n_cand = (n_cand // n_dev) * n_dev
        cands = jnp.asarray(rng.rand(n_cand, d), jnp.float32)
        t_dense = timed_s(lambda: dense_acq(cands), args.reps)
        t_shard = timed_s(
            lambda: PAR.sharded_acq_topq(state, cands, best, q, mesh, config,
                                         acq="ei")[0],
            args.reps,
        )
        overhead = t_shard / t_dense
        rows.append({
            "n_cand": n_cand,
            "dense_s": round(t_dense, 4),
            "sharded_s": round(t_shard, 4),
            "work_overhead": round(overhead, 2),
            "implied_speedup_at_8chips": round(n_dev / overhead, 2),
        })
        print(json.dumps(rows[-1]))

    report = {
        "backend": jax.default_backend(), "n_devices": n_dev,
        "n_train": n, "d": d, "q": q, "reps": args.reps, "rows": rows,
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
