"""Integration: each BASELINE config [B:7–B:11] reduced, end-to-end, seeded;
asserts a monotone incumbent and a sane final value (SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from configs import get_config
from configs.registry import reduced
from turbojax import acq as A
from turbojax import benchmarks as B
from turbojax import gp as G
from turbojax import linalg as L
from turbojax.bo import run_bo
from turbojax.trust_region import run_turbo1
from turbojax.turbo_m import run_turbom


def _run(name, max_evals, m_override=None):
    cfg = reduced(get_config(name), max_evals=max_evals)
    b = B.get_benchmark(cfg.benchmark)
    key = jax.random.key(0)
    if cfg.method == "bo":
        kwargs = {}
        if cfg.bo.fit_every == 0:
            kwargs["fixed_params"] = G.default_params(b.dim, cfg.gp)
        res = run_bo(key, b.fn, b.lb, b.ub, cfg.bo, cfg.gp, **kwargs)
        return np.asarray(res.incumbent_trace), float(res.best_y)
    if cfg.method == "turbo1":
        carry, trace = run_turbo1(key, b.fn, b.lb, b.ub, cfg.turbo, cfg.gp)
        return np.asarray(trace), float(carry.best_y)
    if cfg.method == "turbom":
        m = m_override or min(cfg.m, 3)
        carries, trace = run_turbom(key, b.fn, b.lb, b.ub, cfg.turbo, cfg.gp, m=m)
        return np.asarray(trace), float(np.asarray(carries.best_y).min())
    raise ValueError(cfg.method)


@pytest.mark.parametrize(
    "name,max_evals,threshold",
    [
        ("branin_ei", 20, 8.0),  # config 1 [B:7]
        ("hartmann6_lbfgs", 20, -0.5),  # config 2 [B:8]
        ("turbo1_ackley10", 45, 15.0),  # config 4 [B:10]
        ("turbom5_rover60", 36, 400.0),  # config 5 [B:11]
        ("turbom5_lunar60", 36, 40.0),  # config 5b [B:11 "rover/lunar-style"]; random median ≈17.3
    ],
)
def test_config_end_to_end(name, max_evals, threshold):
    trace, best = _run(name, max_evals)
    assert np.all(np.isfinite(trace))
    assert np.all(np.diff(trace) <= 1e-6), "incumbent must be monotone"
    assert best < threshold


def test_config3_ts_acquisition_latency_shape(rng, key):
    """Config 3 [B:9]: batched TS (q=10) over a 5k-point candidate set —
    correctness of the exact pipeline (latency measured in benchmarks/)."""
    cfg = get_config("ts_q10")
    n, n_max, d = 50, 64, 10
    x = rng.rand(n, d)
    y = np.sin(3 * x[:, 0]) + 0.1 * rng.randn(n)
    x_buf = jnp.zeros((n_max, d)).at[:n].set(jnp.asarray(x))
    y_buf = jnp.zeros((n_max,)).at[:n].set(jnp.asarray(y))
    state = G.make_gp_state(x_buf, y_buf, L.row_mask(n_max, n), G.default_params(d, cfg.gp), cfg.gp)
    cands = jnp.asarray(rng.rand(cfg.bo.n_candidates, d))
    xs, vals = A.thompson_select(key, state, cands, cfg.bo.batch_size, cfg.gp, cfg.bo.ts_chunk)
    assert xs.shape == (10, d) and vals.shape == (10,)
    assert np.unique(np.asarray(xs), axis=0).shape[0] == 10  # without replacement
