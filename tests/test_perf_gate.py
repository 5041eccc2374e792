"""CI performance gate (SURVEY.md §4.2 performance tier; BASELINE.json:5's
">=10x lower wall-clock per BO iteration vs CPU reference at N=2000").

Round-1 VERDICT missing #5: bench.py printed the speedup but nothing
asserted it, so a perf regression would land silently. These tests enforce
the >=10x contract on BOTH the fixed-hyperparameter iteration (the round-1
headline) and the iteration INCLUDING the hyperparameter refit (the
reference's dominant per-iteration cost, SURVEY.md §3.2).

They only run in the TPU lane:

    TURBOJAX_TPU_TESTS=1 python -m pytest tests/test_perf_gate.py -q

(the default CPU-backend suite skips them — the contract is TPU vs CPU).
The refit gate uses a reduced-but-matched budget (4 restarts, 15 L-BFGS
iters in BOTH lanes; see the in-test note on why the restart axis must not
be reduced to 1); the full 4-restart/30-iter numbers live in
benchmarks/bench_iteration.py -> BENCH_components.json.
"""

import os
import time

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    os.environ.get("TURBOJAX_TPU_TESTS") != "1" or jax.default_backend() != "tpu",
    reason="TPU perf lane only (TURBOJAX_TPU_TESTS=1 on a TPU host)",
)

TARGET = 10.0  # BASELINE.json:5


def _record(gate: str, **measured):
    """Print one greppable JSON line per gate (run pytest with -s) so each
    round's TPU-lane results can be committed as an artifact
    (TPU_LANE_r{N}.json — VERDICT r2 task 6) instead of narrated."""
    import json

    print("\nTPU_LANE " + json.dumps({"gate": gate, **{k: round(float(v), 4) for k, v in measured.items()}}), flush=True)


def test_fixed_hyper_iteration_speedup_vs_oracle():
    import bench

    x, y, cands = bench._data()
    t_tpu = bench.bench_tpu(x, y, cands)
    t_cpu = bench.bench_cpu_oracle(x, y, cands)
    _record("fixed_hyper_iteration", tpu_s=t_tpu, cpu_s=t_cpu, speedup=t_cpu / t_tpu)
    assert t_cpu / t_tpu >= TARGET, (
        f"fixed-hyper BO iteration speedup {t_cpu / t_tpu:.1f}x < {TARGET}x "
        f"(TPU {t_tpu * 1e3:.1f} ms vs CPU oracle {t_cpu:.2f} s)"
    )


def test_refit_iteration_speedup_vs_oracle():
    """Iteration including the MLL hyperparameter fit (L-BFGS in both lanes,
    4 restarts x 15 iters — MATCHED restart budget; same optimizer family,
    same kernel, same data).

    Why 4 restarts: the TPU lane vmaps the restart axis (its marginal cost
    is ~zero — the design's actual claim [B:5]) while the oracle pays
    linearly, so a 1-restart gate erases the vmap advantage and sat right
    at the 10x line: measured 2026-08-19, same code, back-to-back runs
    swung 29.1x -> 9.2x purely on oracle-lane wall variance (oracle 124 s
    vs 39 s, TPU stable at 4.27 s) and flaked the gate. The reference
    practice this mirrors is multi-restart fitting (SURVEY.md C8), so the
    matched 4-restart budget is the honest comparison, not a handicap."""
    import dataclasses

    import jax.numpy as jnp

    from oracle import numpy_gp as onp
    from turbojax import acq as A
    from turbojax import gp as G
    from turbojax import linalg as L
    from turbojax.config import GPConfig

    n, n_max, d, n_cand, q = 2000, 2048, 10, 5000, 10
    rng = np.random.RandomState(0)
    x = rng.rand(n, d)
    y = np.sin(3 * x[:, 0]) + 0.1 * rng.randn(n)
    cands = rng.rand(n_cand, d)

    config = GPConfig(
        kernel="matern52", fit_optimizer="lbfgs", fit_maxiter=15, fit_restarts=4
    )
    x_buf = jnp.zeros((n_max, d), jnp.float32).at[:n].set(jnp.asarray(x, jnp.float32))
    y_buf = jnp.zeros((n_max,), jnp.float32).at[:n].set(jnp.asarray(y, jnp.float32))
    mask = L.row_mask(n_max, n)
    cands_j = jnp.asarray(cands, jnp.float32)

    @jax.jit
    def iteration(key, xb, yb, c):
        st = G.fit_gp(key, xb, yb, mask, config)
        mu, var = G.gp_posterior(st, c, config)
        best = jnp.min(jnp.where(mask, yb, jnp.inf))
        ei = A.expected_improvement(mu, var, best)
        xs, vals = A.thompson_select(jax.random.fold_in(key, 7), st, c, q, config, 1000)
        return xs, vals, ei

    key = jax.random.key(0)
    out = iteration(key, x_buf, y_buf, cands_j)  # compile
    jax.block_until_ready(out)
    # per-rep blocking, median of 3: a single trailing block_until_ready
    # once measured 0.6 ms for a fit that takes ~1 s per-rep-blocked
    # (axon async-dispatch artifact, 2026-08-19) — never trust one
    # unsynchronized loop for a gate
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = iteration(jax.random.fold_in(key, i), x_buf, y_buf, cands_j)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    t_tpu = sorted(times)[1]

    t0 = time.perf_counter()
    params, _, _ = onp.fit_mll_lbfgs(x, y, "matern52", n_restarts=4, maxiter=15)
    gp = onp.NumpyGP(
        "matern52", params["lengthscale"], params["outputscale"], params["noise"]
    ).fit(x, (y - y.mean()) / y.std())
    mu, var = gp.posterior(cands)
    onp.expected_improvement(mu, var, y.min())
    for c0 in range(0, n_cand, 1000):
        mu_c, cov_c = gp.posterior_cov(cands[c0 : c0 + 1000])
        cov_c[np.diag_indices(1000)] += 1e-6 * max(cov_c.diagonal().max(), 1e-12)
        lc = np.linalg.cholesky(cov_c)
        rng.randn(q, 1000) @ lc.T
    t_cpu = time.perf_counter() - t0

    _record("refit_iteration_lbfgs15x4", tpu_s=t_tpu, cpu_s=t_cpu, speedup=t_cpu / t_tpu)
    assert t_cpu / t_tpu >= TARGET, (
        f"with-refit BO iteration speedup {t_cpu / t_tpu:.1f}x < {TARGET}x "
        f"(TPU {t_tpu:.2f} s vs CPU oracle {t_cpu:.2f} s)"
    )


def test_ts_q10_acquisition_latency():
    """Absolute latency gate on the acquisition path alone (VERDICT r2
    weak #6: ts_q10 drifted 9.1 → 11.2 ms across rounds with nothing
    asserting it). Config-3 geometry [B:9]: N=2000 fit cache, 5k
    candidates, joint TS chunked at 1000, q=10 — budget 16 ms. Measured
    history on this exact protocol: 5.65/5.78 ms (round 3, TPU_LANE_r03)
    but 10.7 ms on an idle box in round 4 — the pipelined-dispatch
    protocol rides the axon tunnel's day-to-day latency jitter, so the
    budget is ~1.5× the worst measurement rather than 2× the best
    (VERDICT r3 weak #3: the old 20 ms budget was 3.5× looser than the
    then-measured value and would have passed a 2–3× regression; 16 ms
    still fails a 1.5× regression from the top of the observed range)."""
    import jax.numpy as jnp

    from turbojax import acq as A
    from turbojax import gp as G
    from turbojax import linalg as L
    from turbojax.config import GPConfig

    n, n_max, d, n_cand, q = 2000, 2048, 10, 5000, 10
    rng = np.random.RandomState(0)
    config = GPConfig(kernel="matern52")
    x_buf = jnp.zeros((n_max, d), jnp.float32).at[:n].set(
        jnp.asarray(rng.rand(n, d), jnp.float32)
    )
    y_buf = jnp.zeros((n_max,), jnp.float32).at[:n].set(
        jnp.asarray(np.sin(3 * np.asarray(x_buf[:n, 0])) + 0.1 * rng.randn(n), jnp.float32)
    )
    mask = L.row_mask(n_max, n)
    raw = G.default_params(d, config)
    state = jax.jit(lambda: G.make_gp_state(x_buf, y_buf, mask, raw, config))()
    cands = jnp.asarray(rng.rand(n_cand, d), jnp.float32)

    acq = jax.jit(lambda k: A.thompson_select(k, state, cands, q, config, 1000))
    jax.block_until_ready(acq(jax.random.key(0)))
    t0 = time.perf_counter()
    reps = 20
    for i in range(reps):
        out = acq(jax.random.key(i))
    jax.block_until_ready(out)
    t_ms = (time.perf_counter() - t0) / reps * 1e3
    _record("ts_q10_latency", latency_ms=t_ms, budget_ms=16.0)
    assert t_ms < 16.0, f"ts_q10 acquisition latency {t_ms:.1f} ms > 16 ms budget"


def test_pathwise_ts_latency():
    """Latency gate for the decoupled pathwise sampler (VERDICT r3 weak #3:
    23.2 ms measured in round 3 under a mean-of-30-blocked-dispatch
    protocol, but no gate at all — and pathwise is the ONLY Thompson route
    on the distributed N >> chip path, so a silent regression there matters
    most). Same geometry as ts_q10 (N=2000, 5k candidates, q=10, M=1024
    features); budget 46 ms ≈ 2× measured."""
    import jax.numpy as jnp

    from turbojax import acq as A
    from turbojax import gp as G
    from turbojax import linalg as L
    from turbojax.config import GPConfig

    n, n_max, d, n_cand, q = 2000, 2048, 10, 5000, 10
    rng = np.random.RandomState(0)
    config = GPConfig(kernel="matern52")
    x_buf = jnp.zeros((n_max, d), jnp.float32).at[:n].set(
        jnp.asarray(rng.rand(n, d), jnp.float32)
    )
    y_buf = jnp.zeros((n_max,), jnp.float32).at[:n].set(
        jnp.asarray(np.sin(3 * np.asarray(x_buf[:n, 0])) + 0.1 * rng.randn(n), jnp.float32)
    )
    mask = L.row_mask(n_max, n)
    raw = G.default_params(d, config)
    state = jax.jit(lambda: G.make_gp_state(x_buf, y_buf, mask, raw, config))()
    cands = jnp.asarray(rng.rand(n_cand, d), jnp.float32)

    acq = jax.jit(
        lambda k: A.pathwise_thompson_select(k, state, cands, q, config, 1024)
    )
    jax.block_until_ready(acq(jax.random.key(0)))
    t0 = time.perf_counter()
    reps = 20
    for i in range(reps):
        out = acq(jax.random.key(i))
    jax.block_until_ready(out)
    t_ms = (time.perf_counter() - t0) / reps * 1e3
    _record("pathwise_ts_latency", latency_ms=t_ms, budget_ms=46.0)
    assert t_ms < 46.0, f"pathwise TS latency {t_ms:.1f} ms > 46 ms budget"
