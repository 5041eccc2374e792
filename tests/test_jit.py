"""Static-shape/jit-cache tests (SURVEY.md §4.2): the compiled loops trace
once per (N_max, d, q) — iteration count and RNG key changes must not
retrace; a changed static config must."""

import jax
import jax.numpy as jnp

from turbojax import benchmarks as B
from turbojax import gp as G
from turbojax import linalg as L
from turbojax.bo import BOConfig, _run_bo_scan, run_bo
from turbojax.config import GPConfig
from turbojax.trust_region import TurboConfig, run_turbo1

GCFG = GPConfig(kernel="rbf", fit_restarts=2, fit_maxiter=10)


def test_run_bo_traces_once():
    b = B.get_benchmark("branin")
    cfg = BOConfig(n_init=4, max_evals=8, batch_size=1, acq="ei", n_candidates=32, fit_every=2)
    before = _run_bo_scan._cache_size()
    run_bo(jax.random.key(0), b.fn, b.lb, b.ub, cfg, GCFG)
    after_first = _run_bo_scan._cache_size()
    run_bo(jax.random.key(1), b.fn, b.lb, b.ub, cfg, GCFG)  # new key: no retrace
    assert _run_bo_scan._cache_size() == after_first
    assert after_first == before + 1


def test_run_turbo1_traces_once():
    b = B.get_benchmark("branin")
    cfg = TurboConfig(n_init=4, max_evals=10, batch_size=2, n_candidates=16)
    before = run_turbo1._cache_size()
    run_turbo1(jax.random.key(0), b.fn, b.lb, b.ub, cfg, GCFG)
    after = run_turbo1._cache_size()
    run_turbo1(jax.random.key(5), b.fn, b.lb, b.ub, cfg, GCFG)
    assert run_turbo1._cache_size() == after == before + 1


def test_posterior_jit_stable_across_data():
    """Same shapes, different data → one compilation of the posterior."""
    n_max, n, d = 16, 9, 2
    cfg = GPConfig(kernel="matern52")
    raw = G.default_params(d, cfg, jnp.float32)
    mask = L.row_mask(n_max, n)

    post = jax.jit(
        lambda xb, yb, xs: G.gp_posterior(G.make_gp_state(xb, yb, mask, raw, cfg), xs, cfg)
    )
    k1, k2 = jax.random.split(jax.random.key(0))
    for k in (k1, k2):
        xb = jax.random.uniform(k, (n_max, d))
        yb = jnp.sum(xb, -1)
        post(xb, yb, jax.random.uniform(k, (8, d)))
    assert post._cache_size() == 1
