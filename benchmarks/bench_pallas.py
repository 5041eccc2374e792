"""Pallas earn-or-retire measurements (VERDICT r1 weak #7; SURVEY.md §7.1.7).

Round 1 measured the fused kernel-matrix Pallas kernel NEUTRAL at the
flagship d=10 shape (1.96 ms vs 1.84 ms XLA) and shipped it off by default.
This harness measures the two attempts the verdict names:

  (a) fused kernel build at rover shapes (d=60, where the distance matmul's
      share of the work grows and the HBM round-trip between the matmul and
      the transcendental epilogue costs more), across the hot shapes;
  (b) a fused Thompson-chunk covariance kernel (k(xs,xs) − vᵀv + jitter in
      one pass — two MXU contractions per tile, no m×m intermediates in
      HBM), vs the XLA composition feeding the chunk Cholesky.

Run on the TPU: ``python benchmarks/bench_pallas.py`` → appends rows to
BENCH_pallas.json. The decision (default-on vs demoted) is recorded in
docs/DESIGN.md §2.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_kernel_build(n: int, m: int, d: int, kernel: str = "matern52"):
    """(a) fused kernel-matrix build: Pallas vs the jnp/XLA path."""
    from turbojax import kernels as K
    from turbojax import pallas_kernels as PK

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    x1 = jax.random.uniform(k1, (n, d), jnp.float32)
    x2 = jax.random.uniform(k2, (m, d), jnp.float32)
    ls = jnp.full((d,), 0.4, jnp.float32)
    params = {"lengthscale": ls, "outputscale": jnp.asarray(1.3, jnp.float32)}

    xla = jax.jit(lambda a, b: K.get_kernel(kernel)(params, a, b))
    pal = jax.jit(
        lambda a, b: PK.fused_kernel_matrix(
            a / ls, b / ls, params["outputscale"], jnp.asarray(1e-3, jnp.float32),
            kernel_name=kernel, add_noise=False,
        )
    )
    t_xla = _timeit(xla, x1, x2)
    t_pal = _timeit(pal, x1, x2)
    # parity check while we're here
    err = float(jnp.max(jnp.abs(xla(x1, x2) - pal(x1, x2))))
    return {
        "bench": f"kernel_build_n{n}_m{m}_d{d}",
        "xla_ms": round(t_xla * 1e3, 4),
        "pallas_ms": round(t_pal * 1e3, 4),
        "speedup": round(t_xla / t_pal, 3),
        "max_abs_err": err,
    }


def bench_ts_cov(n: int, m_chunk: int, d: int, kernel: str = "matern52"):
    """(b) fused TS-chunk covariance: cov = k(xs,xs) − vᵀv + jitter·I."""
    from turbojax import kernels as K
    from turbojax import pallas_kernels as PK

    key = jax.random.key(1)
    k1, k2 = jax.random.split(key)
    xs = jax.random.uniform(k1, (m_chunk, d), jnp.float32)
    v = jax.random.normal(k2, (n, m_chunk), jnp.float32) / jnp.sqrt(n)
    ls = jnp.full((d,), 0.4, jnp.float32)
    params = {"lengthscale": ls, "outputscale": jnp.asarray(1.0, jnp.float32)}
    jitter = jnp.asarray(1e-6, jnp.float32)

    def xla(xs, v):
        cov = K.get_kernel(kernel)(params, xs, xs) - v.T @ v
        return cov + jitter * jnp.eye(m_chunk, dtype=jnp.float32)

    pal = lambda xs, v: PK.fused_ts_cov(  # noqa: E731
        xs / ls, v, params["outputscale"], jitter, kernel_name=kernel
    )
    xla_j = jax.jit(xla)
    pal_j = jax.jit(pal)
    t_xla = _timeit(xla_j, xs, v)
    t_pal = _timeit(pal_j, xs, v)
    err = float(jnp.max(jnp.abs(xla_j(xs, v) - pal_j(xs, v))))
    return {
        "bench": f"ts_cov_n{n}_chunk{m_chunk}_d{d}",
        "xla_ms": round(t_xla * 1e3, 4),
        "pallas_ms": round(t_pal * 1e3, 4),
        "speedup": round(t_xla / t_pal, 3),
        "max_abs_err": err,
    }


def main():
    assert jax.default_backend() == "tpu", "measure on the TPU"
    rows = []
    for n, m, d in [(2048, 2048, 10), (2048, 5120, 10), (2048, 2048, 60),
                    (2048, 5120, 60), (2048, 5120, 128)]:
        rows.append(bench_kernel_build(n, m, d))
        print(rows[-1], flush=True)
    for n, m_chunk, d in [(2048, 1024, 10), (2048, 1024, 60)]:
        rows.append(bench_ts_cov(n, m_chunk, d))
        print(rows[-1], flush=True)
    with open("BENCH_pallas.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
