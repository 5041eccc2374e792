"""Mesh-of-1 collective/shard_map programs on the REAL TPU backend
(VERDICT r3 missing #3; SURVEY.md §4.2 '"Distributed": all shard_map/vmap
paths run on a mesh of 1 (this env has 1 axon device)').

The default CPU suite forces ``jax_platforms=cpu`` (conftest), so every
``psum``/``all_gather``/``shard_map`` path had only ever executed on the
virtual CPU mesh. These tests run the same programs through the axon TPU
backend on a 1-device mesh — validating that the collectives compile and
execute on real hardware — and assert finiteness plus (where cheap)
agreement with the unsharded result. Run once per round in the TPU lane:

    TURBOJAX_TPU_TESTS=1 python -m pytest tests/test_tpu_mesh1.py -q -s
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    os.environ.get("TURBOJAX_TPU_TESTS") != "1" or jax.default_backend() != "tpu",
    reason="TPU mesh-1 lane only (TURBOJAX_TPU_TESTS=1 on a TPU host)",
)


def _record(gate: str, **measured):
    import json

    print(
        "\nTPU_LANE "
        + json.dumps({"gate": gate, **{k: (round(float(v), 6) if isinstance(v, (int, float)) else v) for k, v in measured.items()}}),
        flush=True,
    )


def _fit_inputs(n=64, n_max=64, d=4):
    from turbojax import linalg as L

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n_max, d), jnp.float32)
    y = jnp.asarray(np.sin(3 * np.asarray(x[:, 0])) + 0.1 * rng.randn(n_max), jnp.float32)
    mask = L.row_mask(n_max, n)
    return x, y, mask


def test_mesh1_sharded_fit_gp():
    """Restart-axis shard_map (all_gather argmin-MLL) on the TPU backend."""
    from turbojax import gp as G
    from turbojax import parallel as PAR
    from turbojax.config import GPConfig

    config = GPConfig(fit_restarts=2, fit_maxiter=10, fit_optimizer="adam")
    x, y, mask = _fit_inputs()
    mesh = PAR.make_mesh(1, axis="restarts")
    key = jax.random.key(0)
    st_sh = PAR.sharded_fit_gp(key, x, y, mask, config, mesh)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(st_sh.raw))
    st_dense = G.fit_gp(key, x, y, mask, config)
    mll_sh = float(G.mll(st_sh.raw, x, (y - st_sh.y_mean) / st_sh.y_std, mask, config))
    mll_de = float(G.mll(st_dense.raw, x, (y - st_dense.y_mean) / st_dense.y_std, mask, config))
    _record("mesh1_sharded_fit_gp", mll_sharded=mll_sh, mll_dense=mll_de)
    assert mll_sh >= mll_de - 2.0  # same quality regime, hardware collectives


def test_mesh1_sharded_acq_topq_matches_unsharded():
    from turbojax import acq as A
    from turbojax import gp as G
    from turbojax import parallel as PAR
    from turbojax.config import GPConfig

    config = GPConfig()
    x, y, mask = _fit_inputs()
    raw = G.default_params(x.shape[-1], config)
    state = jax.jit(lambda: G.make_gp_state(x, y, mask, raw, config))()
    rng = np.random.RandomState(1)
    cands = jnp.asarray(rng.rand(64, x.shape[-1]), jnp.float32)
    best = jnp.min(jnp.where(mask, y, jnp.inf))
    mesh = PAR.make_mesh(1, axis="cands")
    pts, scores = PAR.sharded_acq_topq(state, cands, best, 4, mesh, config, acq="ei")
    mu, var = G.gp_posterior(state, cands, config)
    ref_scores = A.expected_improvement(mu, var, best)
    _, ref_idx = jax.lax.top_k(ref_scores, 4)
    np.testing.assert_allclose(
        np.asarray(pts), np.asarray(cands[ref_idx]), rtol=0, atol=0
    )
    _record("mesh1_sharded_acq_topq", top1_score=float(scores[0]), match=1)


def test_mesh1_sharded_turbom_step():
    """One TR-axis-sharded TuRBO-m step (all_gather of TS values + global
    allocation) executes through the TPU backend."""
    from turbojax import parallel as PAR
    from turbojax.config import GPConfig
    from turbojax.trust_region import TurboConfig, make_turbo_carry

    gcfg = GPConfig(fit_restarts=2, fit_maxiter=5, fit_optimizer="adam")
    cfg = TurboConfig(n_init=4, max_evals=40, batch_size=4, n_candidates=32)
    dim = 3
    mesh = PAR.make_mesh(1, axis="tr")
    keys = jax.random.split(jax.random.key(0), 1)
    carries = jax.vmap(lambda k: make_turbo_carry(k, dim, 16, cfg, gcfg))(keys)
    fn = lambda xs: jnp.sum((xs - 0.3) ** 2, axis=-1)  # noqa: E731
    lb, ub = jnp.zeros(dim), jnp.ones(dim)
    for i in range(3):
        carries, best = PAR.sharded_turbom_step(
            carries, jax.random.key(10 + i), fn, lb, ub, cfg, gcfg, mesh,
            n_cand=32, fail_tol=4,
        )
    assert int(np.asarray(carries.n)[0]) == 12
    assert np.isfinite(np.asarray(carries.y_buf)[0, :12]).all()
    _record("mesh1_sharded_turbom_step", best=float(best), n=int(np.asarray(carries.n)[0]))


def test_mesh1_distributed_gp_and_pathwise():
    """Row-sharded DistributedGP (blocked chol, distributed MLL fit,
    posterior, pathwise paths) on the TPU backend, mesh of 1 — posterior
    parity vs the dense state at the same hypers."""
    from turbojax import acq as A
    from turbojax import distributed_linalg as DL
    from turbojax import gp as G
    from turbojax import linalg as L
    from turbojax import parallel as PAR
    from turbojax.config import GPConfig

    config = GPConfig(fit_maxiter=5)
    n, d = 256, 4
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(n, d), jnp.float32)
    y = jnp.asarray(np.sin(3 * np.asarray(x[:, 0])) + 0.1 * rng.randn(n), jnp.float32)
    mesh = PAR.make_mesh(1, axis="rows")
    dgp = DL.fit_distributed_gp(x, y, mesh, config, panel=32)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(dgp.raw))

    cands = jnp.asarray(rng.rand(32, d), jnp.float32)
    mu_d, var_d = dgp.posterior(cands)
    mask = L.row_mask(n, jnp.asarray(n))
    state = G.make_gp_state(x, y, mask, dgp.raw, config)
    mu_ref, var_ref = G.gp_posterior(state, cands, config)
    err_mu = float(jnp.max(jnp.abs(mu_d - mu_ref)))
    err_var = float(jnp.max(jnp.abs(var_d - var_ref)))
    np.testing.assert_allclose(np.asarray(mu_d), np.asarray(mu_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(var_d), np.asarray(var_ref), rtol=2e-3, atol=2e-4)

    draws = DL.distributed_pathwise_paths(jax.random.key(5), dgp, cands, 4, 256)
    assert np.isfinite(np.asarray(draws)).all()
    draws_dense = A.pathwise_paths(jax.random.key(5), state, cands, 4, config, 256)
    err_path = float(jnp.max(jnp.abs(draws - draws_dense)))
    np.testing.assert_allclose(
        np.asarray(draws), np.asarray(draws_dense), rtol=5e-3, atol=5e-3
    )
    _record(
        "mesh1_distributed_gp",
        posterior_mu_maxerr=err_mu, posterior_var_maxerr=err_var,
        pathwise_maxerr=err_path,
    )
