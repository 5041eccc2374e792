"""Sharding tests (SURVEY.md §4.2 "distributed" tier): every shard_map path
runs on the 8-virtual-device CPU mesh; the same code is mesh-size generic and
runs unchanged on a mesh of 1 (single axon chip) or a real pod slice."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbojax import acq as A
from turbojax import gp as G
from turbojax import parallel as PAR
from turbojax import transforms as T
from turbojax.config import GPConfig

CFG = GPConfig(kernel="matern52", jitter=0.0)


def _state(rng, n=30, d=2, n_max=32, dtype=jnp.float64):
    x = rng.rand(n, d)
    y = np.sin(4 * x[:, 0]) + 0.2 * rng.randn(n)
    x_buf = jnp.zeros((n_max, d), dtype).at[:n].set(jnp.asarray(x, dtype))
    y_buf = jnp.zeros((n_max,), dtype).at[:n].set(jnp.asarray(y, dtype))
    mask = jnp.arange(n_max) < n
    raw = G.GPParams(
        raw_lengthscale=T.unconstrain(jnp.full((d,), 0.4, dtype), *CFG.lengthscale_bounds),
        raw_outputscale=T.unconstrain(jnp.asarray(1.0, dtype), *CFG.outputscale_bounds),
        raw_noise=T.unconstrain(jnp.asarray(1e-3, dtype), *CFG.noise_bounds),
        raw_mean=jnp.asarray(0.0, dtype),
    )
    return G.make_gp_state(x_buf, y_buf, mask, raw, CFG)


def test_virtual_mesh_present():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_sharded_acq_matches_single_device(rng, n_dev):
    """Candidate-sharded EI top-q == unsharded EI top-q (C14)."""
    state = _state(rng)
    cands = jnp.asarray(rng.rand(64, 2))
    best = jnp.asarray(0.1)
    mesh = PAR.make_mesh(n_dev)
    pts, scores = PAR.sharded_acq_topq(state, cands, best, 4, mesh, CFG, acq="ei")

    mu, var = G.gp_posterior(state, cands, CFG)
    ref_scores = np.asarray(A.expected_improvement(mu, var, best))
    order = np.argsort(-ref_scores)[:4]
    np.testing.assert_allclose(np.sort(np.asarray(scores)), np.sort(-ref_scores[order]), rtol=1e-9)
    ref_pts = np.asarray(cands)[order]
    np.testing.assert_allclose(
        np.sort(np.asarray(pts), axis=0), np.sort(ref_pts, axis=0), rtol=1e-9
    )


@pytest.mark.parametrize("acq", ["ei", "lcb"])
def test_sharded_acq_both_acquisitions(rng, acq):
    state = _state(rng)
    cands = jnp.asarray(rng.rand(32, 2))
    mesh = PAR.make_mesh(4)
    pts, scores = PAR.sharded_acq_topq(state, cands, jnp.asarray(0.0), 2, mesh, CFG, acq=acq)
    assert pts.shape == (2, 2) and scores.shape == (2,)
    assert np.all(np.isfinite(np.asarray(scores)))


def test_sharded_thompson_no_duplicates(rng, key):
    state = _state(rng)
    cands = jnp.asarray(rng.rand(64, 2))
    mesh = PAR.make_mesh(8)
    pts, vals = PAR.sharded_thompson_select(key, state, cands, 6, mesh, CFG)
    assert pts.shape == (6, 2)
    # without-replacement: all selected points distinct
    uniq = np.unique(np.asarray(pts).round(12), axis=0)
    assert uniq.shape[0] == 6
    assert np.all(np.isfinite(np.asarray(vals)))


def test_sharded_thompson_mesh1_matches_unsharded(rng, key):
    """On a mesh of 1 the sharded TS path must reproduce the unsharded
    sampler bit-for-bit (same fold_in(key, 0) stream → same draws → same
    without-replacement selection). The unsharded sampler's distribution is
    verified against the analytic posterior in test_acq.py, so equality
    here transfers that guarantee to the sharded path."""
    state = _state(rng)
    cands = jnp.asarray(rng.rand(16, 2))
    q = 3
    mesh = PAR.make_mesh(1)
    pts, vals = PAR.sharded_thompson_select(key, state, cands, q, mesh, CFG)

    draws = A.thompson_samples(jax.random.fold_in(key, 0), state, cands, q, CFG)
    idxs, vals_ref = A.select_q_batch(draws)
    np.testing.assert_array_equal(np.asarray(pts), np.asarray(cands)[np.asarray(idxs)])
    np.testing.assert_allclose(np.asarray(vals), np.asarray(vals_ref), rtol=1e-12)


@pytest.mark.slow
def test_sharded_turbom_step_runs(key):
    """One TR-axis-sharded TuRBO-m step on the 4-device mesh (C18/EP analog;
    the path dryrun_multichip exercises, asserted here in CI)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from turbojax.config import GPConfig as GC
    from turbojax.trust_region import TurboConfig, make_turbo_carry

    n_dev = 4
    mesh = PAR.make_mesh(n_dev, axis="tr")
    d, q, n_cand, n_loc = 3, 2, 16, 12
    cfg = TurboConfig(n_init=4, max_evals=12, batch_size=q, n_candidates=n_cand)
    config = GC(fit_restarts=2, fit_maxiter=5)
    keys = jax.random.split(key, n_dev)
    carries = jax.vmap(lambda k: make_turbo_carry(k, d, n_loc, cfg, config))(keys)
    carries = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("tr", *([None] * (a.ndim - 1))))),
        carries,
    )
    fn = lambda x: jnp.sum((x - 0.3) ** 2, axis=-1)
    fail_tol = cfg.tr.resolved_fail_tol(d, q)
    carries, best = PAR.sharded_turbom_step(
        carries, jax.random.key(1), fn, jnp.zeros(d), jnp.ones(d), cfg, config,
        mesh, n_cand, fail_tol,
    )
    assert np.isfinite(float(best))
    assert int(np.asarray(carries.n).sum()) == q  # exactly one batch landed


@pytest.mark.slow
@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_fit_runs_and_matches_quality(rng, key, n_dev):
    """Restart-sharded fit (C8) reaches the same-or-better MLL as vmap-only."""
    n, d, n_max = 40, 2, 48
    x = rng.rand(n, d)
    y = np.sin(5 * x[:, 0]) + 0.3 * rng.randn(n)
    x_buf = jnp.zeros((n_max, d)).at[:n].set(jnp.asarray(x))
    y_buf = jnp.zeros((n_max,)).at[:n].set(jnp.asarray(y))
    mask = jnp.arange(n_max) < n
    cfg = GPConfig(fit_restarts=4, fit_maxiter=25)
    mesh = PAR.make_mesh(n_dev)
    state_sh = PAR.sharded_fit_gp(key, x_buf, y_buf, mask, cfg, mesh)
    state_ref = G.fit_gp(key, x_buf, y_buf, mask, cfg)

    y_std, _, _ = T.standardize(y_buf, mask)
    mll_sh = float(G.mll(state_sh.raw, x_buf, y_std, mask, cfg))
    mll_ref = float(G.mll(state_ref.raw, x_buf, y_std, mask, cfg))
    # same restart inits, same optimizer — identical winner
    np.testing.assert_allclose(mll_sh, mll_ref, rtol=1e-5)


@pytest.mark.slow
def test_sharded_fit_gp_respects_y_warp(rng, key):
    """Code-review regression: sharded_fit_gp must fit the same (warped,
    standardized) targets gp.fit_gp does when GPConfig.y_warp is set —
    same inits + same optimizer → identical fitted state."""
    n, d, n_max = 40, 2, 48
    x = rng.rand(n, d)
    y = 50.0 * np.abs(np.sin(5 * x[:, 0])) + 5.0 * rng.randn(n)  # heavy scale
    x_buf = jnp.zeros((n_max, d)).at[:n].set(jnp.asarray(x))
    y_buf = jnp.zeros((n_max,)).at[:n].set(jnp.asarray(y))
    mask = jnp.arange(n_max) < n
    cfg = GPConfig(fit_restarts=2, fit_maxiter=15, y_warp="bilog")
    mesh = PAR.make_mesh(2)
    state_sh = PAR.sharded_fit_gp(key, x_buf, y_buf, mask, cfg, mesh)
    state_ref = G.fit_gp(key, x_buf, y_buf, mask, cfg)
    # y_mean/y_std live in warped space — a raw-space fit shows up here first
    np.testing.assert_allclose(
        float(state_sh.y_mean), float(state_ref.y_mean), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state_sh.alpha), np.asarray(state_ref.alpha),
        rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_sharded_turbom_step_imputes_failures(key):
    """Code-review regression (§5.3 on the sharded path): an all-NaN batch
    must be imputed with the degenerate 1e6 floor (empty history) and never
    poison the sharded buffers."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from turbojax.config import GPConfig as GC
    from turbojax.trust_region import TurboConfig, make_turbo_carry

    n_dev = 4
    mesh = PAR.make_mesh(n_dev, axis="tr")
    d, q, n_cand, n_loc = 3, 2, 16, 12
    cfg = TurboConfig(n_init=4, max_evals=12, batch_size=q, n_candidates=n_cand)
    config = GC(fit_restarts=2, fit_maxiter=5)
    keys = jax.random.split(key, n_dev)
    carries = jax.vmap(lambda k: make_turbo_carry(k, d, n_loc, cfg, config))(keys)
    carries = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("tr", *([None] * (a.ndim - 1))))),
        carries,
    )
    fn = lambda x: jnp.full(x.shape[:-1], jnp.nan)  # every evaluation fails
    fail_tol = cfg.tr.resolved_fail_tol(d, q)
    carries, best = PAR.sharded_turbom_step(
        carries, jax.random.key(1), fn, jnp.zeros(d), jnp.ones(d), cfg, config,
        mesh, n_cand, fail_tol,
    )
    y = np.asarray(carries.y_buf)
    n_active = np.asarray(carries.n)
    for i in range(y.shape[0]):
        assert np.isfinite(y[i, : int(n_active[i])]).all()
    assert np.isfinite(float(best)) and float(best) >= T._IMPUTE_FLOOR
