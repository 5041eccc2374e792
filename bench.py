"""Headline benchmark (BASELINE.md): wall-clock per BO iteration at N=2000
training points — TPU (turbojax) vs the CPU float64 numpy/BLAS reference
oracle (oracle/numpy_gp.py, the stand-in for the GPyTorch/sklearn reference
stack [B:5]).

One "BO iteration" here is the per-iteration device work of the reference
loop at N=2000 (SURVEY.md §3.1/§3.3), identical math in both lanes:
  1. kernel-matrix build + jittered Cholesky + alpha     (O(n³) fit core)
  2. posterior mean/variance over 5000 candidates        (C9 [B:5])
  3. batched Thompson sampling, q=10, 1000-point chunks  (C13 [B:9])
  4. EI over the candidate set                           (C11)
Objective evaluation time is excluded and compilation is excluded
(post-warmup average), per the BASELINE.md measurement protocol.

Prints ONE JSON line: {"metric", "value" (TPU s/iter), "unit",
"vs_baseline" (CPU-oracle s/iter ÷ TPU s/iter; ≥10 is the target [B:5])}.
"""

import json
import time

import numpy as np

N, N_MAX, D, N_CAND, Q, CHUNK = 2000, 2048, 10, 5000, 10, 1000
KERNEL = "matern52"
REPS_TPU = 10
REPS_CPU = 2


def _data():
    rng = np.random.RandomState(0)
    x = rng.rand(N, D)
    y = np.sin(3 * x[:, 0]) + 0.1 * rng.randn(N)
    cands = rng.rand(N_CAND, D)
    return x, y.astype(np.float64), cands


def bench_tpu(x, y, cands):
    import jax
    import jax.numpy as jnp

    from turbojax import acq as A
    from turbojax import gp as G
    from turbojax import linalg as L
    from turbojax.config import GPConfig

    config = GPConfig(kernel=KERNEL)
    x_buf = jnp.zeros((N_MAX, D), jnp.float32).at[:N].set(jnp.asarray(x, jnp.float32))
    y_buf = jnp.zeros((N_MAX,), jnp.float32).at[:N].set(jnp.asarray(y, jnp.float32))
    cands_j = jnp.asarray(cands, jnp.float32)
    raw = G.default_params(D, config)
    mask = L.row_mask(N_MAX, N)

    @jax.jit
    def iteration(x_buf, y_buf, cands_j, key):
        state = G.make_gp_state(x_buf, y_buf, mask, raw, config)  # chol + alpha
        mu, var = G.gp_posterior(state, cands_j, config)  # C9
        best = jnp.min(jnp.where(mask, y_buf, jnp.inf))
        ei = A.expected_improvement(mu, var, best)  # C11
        xs, vals = A.thompson_select(key, state, cands_j, Q, config, CHUNK)  # C13
        return xs, vals, ei, mu, var

    key = jax.random.key(0)
    # compile + warm the dispatch path: the first executed batch after
    # compilation pays one-time costs (~100 ms measured) that vanish from
    # the steady state the protocol measures (BASELINE.md: post-warmup)
    for w in range(4):
        out = iteration(x_buf, y_buf, cands_j, jax.random.fold_in(key, 1000 + w))
    jax.block_until_ready(out)
    # min over batches: robust to transient host/tunnel contention
    times = []
    for b in range(3):
        t0 = time.perf_counter()
        for i in range(REPS_TPU):
            out = iteration(x_buf, y_buf, cands_j, jax.random.fold_in(key, b * REPS_TPU + i))
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / REPS_TPU)
    return min(times)


def bench_cpu_oracle(x, y, cands):
    from oracle import numpy_gp as onp

    rng = np.random.RandomState(1)
    gp = onp.NumpyGP(KERNEL, lengthscale=np.full(D, 0.5), outputscale=1.0, noise=1e-3)

    def iteration():
        gp.fit(x, y)  # kernel build + chol + alpha
        mu, var = gp.posterior(cands)
        ei = onp.expected_improvement(mu, var, y.min())
        # chunked joint Thompson sampling, q=Q
        sel = []
        for c0 in range(0, N_CAND, CHUNK):
            mu_c, cov_c = gp.posterior_cov(cands[c0 : c0 + CHUNK])
            cov_c[np.diag_indices(CHUNK)] += 1e-6 * max(cov_c.diagonal().max(), 1e-12)
            l_c = np.linalg.cholesky(cov_c)
            z = rng.randn(Q, CHUNK)
            sel.append(mu_c[None] + z @ l_c.T)
        draws = np.concatenate(sel, axis=1)
        idx = np.argmin(draws, axis=1)
        return idx, ei

    iteration()  # warmup (BLAS thread spin-up)
    times = []
    for _ in range(REPS_CPU):
        t0 = time.perf_counter()
        iteration()
        times.append(time.perf_counter() - t0)
    return min(times)  # min: robust to host contention


def main():
    x, y, cands = _data()
    t_cpu = bench_cpu_oracle(x, y, cands)
    t_tpu = bench_tpu(x, y, cands)
    print(
        json.dumps(
            {
                "metric": "bo_iteration_wallclock_n2000",
                "value": round(t_tpu, 6),
                "unit": "s/iter",
                "vs_baseline": round(t_cpu / t_tpu, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
