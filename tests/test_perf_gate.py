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


def _gate_with_control(prog_fn, ctrl_fn):
    """TS-gate protocol (round 5, superseding VERDICT r4 task 8's per-rep
    suggestion after measurement): millisecond programs through the axon
    tunnel are dominated by PER-DISPATCH overhead, not device time —
    measured 2026-08-21: per-rep-blocked ts_q10 read 48 ms (each
    synchronized dispatch pays a ~35-40 ms tunnel round-trip the pipelined
    loop overlaps away) while the same program pipelined read ~10 ms, of
    which a trivial control program costs ~8-10 ms — the DEVICE time of
    the whole acquisition is ~1 ms. Per-rep-blocked timing (the refit
    gate's protocol) is right for ~1 s programs where the 35 ms sync cost
    vanishes, and wrong at 5 ms where it IS the reading. So: batched
    medians for both the program and a tiny control program, and the gate
    asserts (a) the control-subtracted DEVICE cost (tunnel-independent —
    catches real program regressions) and (b) a generous raw ceiling
    (tunnel-weather tolerant — catches user-visible catastrophes).
    Program and control batches are INTERLEAVED so both ride the same
    minute-to-minute tunnel weather (a sequential pair measured 3.8 vs
    9.9 ms dispatch floors two minutes apart); the device cost is the
    median of per-pair differences. Returns (raw_ms, ctrl_ms, net_ms)."""
    batch, batches = 10, 7
    jax.block_until_ready(prog_fn(jax.random.key(0)))
    jax.block_until_ready(ctrl_fn(jax.random.key(0)))

    def one_batch(fn, b):
        t0 = time.perf_counter()
        for i in range(batch):
            out = fn(jax.random.key(b * batch + i))
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / batch * 1e3

    prog_ms, ctrl_ms, diffs = [], [], []
    for b in range(batches):
        p = one_batch(prog_fn, b)
        c = one_batch(ctrl_fn, b)
        prog_ms.append(p)
        ctrl_ms.append(c)
        diffs.append(p - c)
    raw = float(np.median(prog_ms))
    ctrl = float(np.median(ctrl_ms))
    return raw, ctrl, max(float(np.median(diffs)), 0.0)


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
    candidates, joint TS chunked at 1000, q=10.

    Round-5 protocol change (VERDICT r4 weak #3 / task 8, amended by
    measurement — see _gate_with_control): the old pipelined-20-reps loop
    measured tunnel dispatch weather as much as the program (budget
    renegotiated twice chasing it), and the verdict's per-rep-blocked
    suggestion turns out to measure a ~35-40 ms tunnel sync cost per rep —
    6x the program. The gate now asserts the control-subtracted DEVICE
    cost (measured ~1 ms; budget 6 ms fails a >=6x program regression
    independent of tunnel state) plus a raw per-dispatch ceiling 20 ms
    (the user-visible catastrophe bound; raw measured 5.8-10.3 ms across
    rounds depending on tunnel day)."""
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
    ctrl = jax.jit(lambda k: jnp.sum(cands) + jax.random.uniform(k))
    raw, c, net = _gate_with_control(acq, ctrl)
    _record("ts_q10_latency", raw_ms=raw, dispatch_ms=c, device_ms=net,
            device_budget_ms=6.0, raw_budget_ms=20.0)
    assert net < 6.0, f"ts_q10 device cost {net:.1f} ms > 6 ms budget (raw {raw:.1f})"
    assert raw < 20.0, f"ts_q10 raw latency {raw:.1f} ms > 20 ms ceiling"


def test_pathwise_ts_latency():
    """Latency gate for the decoupled pathwise sampler (VERDICT r3 weak #3
    — pathwise is the ONLY Thompson route on the distributed N >> chip
    path, so a silent regression there matters most). Same geometry as
    ts_q10 (N=2000, 5k candidates, q=10, M=1024 features); round-5
    protocol = _gate_with_control (see ts_q10's docstring): device-cost
    budget 30 ms, raw ceiling 46 ms (round-3 same-process measurement
    23.2 ms raw)."""
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
    ctrl = jax.jit(lambda k: jnp.sum(cands) + jax.random.uniform(k))
    raw, c, net = _gate_with_control(acq, ctrl)
    _record("pathwise_ts_latency", raw_ms=raw, dispatch_ms=c, device_ms=net,
            device_budget_ms=30.0, raw_budget_ms=46.0)
    assert net < 30.0, f"pathwise TS device cost {net:.1f} ms > 30 ms budget (raw {raw:.1f})"
    assert raw < 46.0, f"pathwise TS raw latency {raw:.1f} ms > 46 ms ceiling"


def test_config5_warm_wall():
    """End-to-end wall-clock gate for the flagship config (VERDICT r4
    missing #3): the config-5 warm wall is the product of the AOT bucket
    ladder, chunk-aligned dispatch, split-capacity fits, and one-ahead
    prefetch (measured ~61 s warm vs 219 s without the split fit and 448 s
    cold pre-prefetch — BASELINE.md wall forensics). Quality and per-op
    latencies are gated elsewhere; without this row a regression of the
    whole dispatch machinery passes the lane silently.

    Protocol (per-rep semantics like the refit gate): run seed 0 once to
    compile/load every bucket program this trajectory touches (trajectories
    are deterministic per seed, so the second identical run is guaranteed
    compile-free), then time the second run. Budget 125 s ≈ 2× the
    round-3/4 measured ~61 s warm wall; needs an otherwise-idle box."""
    import jax.random

    from configs import get_config
    from turbojax import benchmarks as B
    from turbojax.compile_cache import enable_persistent_cache
    from turbojax.turbo_m import run_turbom

    enable_persistent_cache()
    cfg = get_config("turbom5_rover60")
    b = B.get_benchmark(cfg.benchmark)

    def one_run():
        t0 = time.perf_counter()
        carries, _ = run_turbom(
            jax.random.key(0), b.fn, b.lb, b.ub, cfg.turbo, cfg.gp, m=cfg.m,
            host_loop=True, split_fit=True,
        )
        jax.block_until_ready(carries.best_y)
        return time.perf_counter() - t0, float(np.asarray(carries.best_y).min())

    wall_first, best_first = one_run()  # compile/cache-load inclusive
    wall_warm, best_warm = one_run()
    assert best_first == best_warm  # deterministic per seed (chaos probe)
    _record("config5_warm_wall", warm_s=wall_warm, first_run_s=wall_first,
            budget_s=125.0, best=best_warm)
    assert wall_warm < 125.0, (
        f"config-5 warm wall {wall_warm:.1f} s > 125 s budget "
        f"(first run incl. compile: {wall_first:.1f} s)"
    )
