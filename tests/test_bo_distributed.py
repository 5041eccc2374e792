"""run_bo_distributed: the N ≫ chip BO product path (VERDICT r2 task 5) —
auto-routing, optimization progress, failure imputation, and dense-vs-
distributed agreement, on the 8-virtual-device CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbojax import parallel as PAR
from turbojax.bo import BOConfig
from turbojax.bo_distributed import run_bo_distributed
from turbojax.config import GPConfig

CFG = dataclasses.replace(
    GPConfig(kernel="matern52"), fit_optimizer="adam", fit_maxiter=5
)


def _quad(x):
    return jnp.sum((x - 0.3) ** 2, axis=-1)


@pytest.mark.slow
def test_distributed_bo_optimizes_forced_distributed(key):
    mesh = PAR.make_mesh(8, axis="rows")
    bo = BOConfig(n_init=16, max_evals=56, batch_size=8, acq="ei",
                  n_candidates=128, fit_every=2)
    res = run_bo_distributed(
        key, _quad, [0.0] * 3, [1.0] * 3, bo, CFG, mesh, budget_bytes=1
    )
    assert res.y_hist.shape == (56,)
    trace = np.asarray(res.incumbent_trace)
    assert np.isfinite(trace).all()
    assert (np.diff(trace) <= 1e-12).all()  # monotone incumbent
    assert float(res.best_y) < float(res.y_hist[:16].min())  # improved on init
    assert float(res.best_y) < 0.05


@pytest.mark.slow
def test_distributed_bo_dense_route_matches_surface(key):
    """Below the threshold the same call runs the dense path — one surface."""
    mesh = PAR.make_mesh(8, axis="rows")
    bo = BOConfig(n_init=16, max_evals=40, batch_size=8, acq="lcb",
                  n_candidates=64, fit_every=2)
    res = run_bo_distributed(key, _quad, [0.0] * 3, [1.0] * 3, bo, CFG, mesh)
    assert np.isfinite(np.asarray(res.y_hist)).all()
    assert float(res.best_y) < 0.1


@pytest.mark.slow
def test_distributed_bo_candidate_sharded_route_matches(key, monkeypatch):
    """Candidate-axis sharding as a product route (VERDICT r4 missing #4 /
    SURVEY.md C14): forcing the route (cand_shard_min=0) on the 8-device
    mesh must (a) actually engage the sharded top-q, (b) reproduce the
    unsharded first acquisition batch exactly (same fit state, same
    candidates — the sharded selection is mathematically identical), and
    (c) land in the same optimization regime. Whole-trajectory bitwise
    equality is NOT asserted: per-shard matmul tiling perturbs EI scores
    at the 1-ulp level, which can flip exact near-ties in later batches
    (the same class of benign divergence as the round-3 chaos probe's
    pre-fix reading — here the selections differ only at ties)."""
    calls = {"n": 0}
    from turbojax.parallel import sharded_acq_topq as _sharded

    def counting(*a, **k):
        calls["n"] += 1
        return _sharded(*a, **k)

    mesh = PAR.make_mesh(8, axis="rows")
    base = BOConfig(n_init=16, max_evals=48, batch_size=8, acq="ei",
                    n_candidates=128, fit_every=2)
    res_plain = run_bo_distributed(
        key, _quad, [0.0] * 3, [1.0] * 3, base, CFG, mesh
    )
    import turbojax.parallel as PARmod

    monkeypatch.setattr(PARmod, "sharded_acq_topq", counting)
    res_shard = run_bo_distributed(
        key, _quad, [0.0] * 3, [1.0] * 3,
        dataclasses.replace(base, cand_shard_min=0), CFG, mesh,
    )
    assert calls["n"] == base.n_iters  # the route engaged every iteration
    # identical init design + identical first acquisition batch
    np.testing.assert_array_equal(
        np.asarray(res_plain.y_hist[:24]), np.asarray(res_shard.y_hist[:24])
    )
    # same optimization regime
    assert float(res_shard.best_y) < 0.05
    assert abs(float(res_shard.best_y) - float(res_plain.best_y)) < 0.05


@pytest.mark.slow
def test_distributed_bo_imputes_failures(key):
    mesh = PAR.make_mesh(4, axis="rows")

    def spiky(x):
        base = jnp.sum((x - 0.4) ** 2, axis=-1)
        return jnp.where(x[:, 0] > 0.85, jnp.nan, base)

    bo = BOConfig(n_init=8, max_evals=24, batch_size=4, acq="ei",
                  n_candidates=64, fit_every=2)
    res = run_bo_distributed(
        key, spiky, [0.0] * 3, [1.0] * 3, bo, CFG, mesh, budget_bytes=1
    )
    assert np.isfinite(np.asarray(res.y_hist)).all()
    assert float(res.best_y) < 1.0


@pytest.mark.parametrize("budget_bytes", [1, None])  # distributed / dense route
@pytest.mark.slow
def test_refactor_sees_new_data(key, budget_bytes):
    """refactor_gp_auto: the off-iteration factor refresh absorbs the grown
    history at pinned hypers — a stale fitted object must not be reused
    (regression: run_bo_distributed's fit_every>1 / fit_every=0 lanes)."""
    from turbojax import distributed_linalg as DL

    mesh = PAR.make_mesh(4, axis="rows")
    kw = {} if budget_bytes is None else {"budget_bytes": budget_bytes}
    k1, k2 = jax.random.split(key)
    x1 = jax.random.uniform(k1, (16, 3))
    y1 = _quad(x1)
    g = DL.fit_gp_auto(k1, x1, y1, CFG, mesh, panel=2, **kw)
    x_new = jax.random.uniform(k2, (8, 3))
    y_new = _quad(x_new)
    x2 = jnp.concatenate([x1, x_new])
    y2 = jnp.concatenate([y1, y_new])
    g2 = DL.refactor_gp_auto(x2, y2, g.raw, CFG, mesh, panel=2, **kw)
    mu_old, var_old = g.posterior(x_new)
    mu_new, var_new = g2.posterior(x_new)
    # the refreshed factor has absorbed the new observations: posterior
    # variance collapses there and the mean moves toward the data
    assert np.all(np.asarray(var_new) < np.asarray(var_old))
    err_old = np.abs(np.asarray(mu_old) - np.asarray(y_new)).mean()
    err_new = np.abs(np.asarray(mu_new) - np.asarray(y_new)).mean()
    assert err_new <= err_old + 1e-9


@pytest.mark.slow
def test_distributed_bo_fixed_hypers_still_learns(key):
    """fit_every=0 pins the hypers but the loop must keep refreshing the
    factorization over new data (dense run_bo's fixed-hyper semantics)."""
    mesh = PAR.make_mesh(4, axis="rows")
    bo = BOConfig(n_init=8, max_evals=32, batch_size=4, acq="ei",
                  n_candidates=128, fit_every=0)
    res = run_bo_distributed(
        key, _quad, [0.0] * 3, [1.0] * 3, bo, CFG, mesh, budget_bytes=1
    )
    assert float(res.best_y) < float(res.y_hist[:8].min())


@pytest.mark.slow
def test_distributed_bo_fit_every_zero_never_fits(key, monkeypatch):
    """Regression (round-3 review): fit_every=0 means NEVER fit on the dense
    route (bo.py '0 = never refit'); the distributed route used to sneak one
    full MLL fit in at iteration 0 via its `g is None` bootstrap, so the
    same optimize(fit_every=0) call changed surrogate semantics when mesh=
    was passed. Pin it: the loop must complete without ever calling
    fit_gp_auto."""
    import turbojax.bo_distributed as BD

    def _boom(*a, **k):
        raise AssertionError("fit_gp_auto called despite fit_every=0")

    monkeypatch.setattr(BD, "fit_gp_auto", _boom)
    mesh = PAR.make_mesh(4, axis="rows")
    bo = BOConfig(n_init=8, max_evals=24, batch_size=4, acq="ei",
                  n_candidates=128, fit_every=0)
    res = run_bo_distributed(
        key, _quad, [0.0] * 3, [1.0] * 3, bo, CFG, mesh, budget_bytes=1
    )
    assert np.isfinite(np.asarray(res.incumbent_trace)).all()


def test_distributed_bo_rejects_bad_layout(key):
    mesh = PAR.make_mesh(8, axis="rows")
    with pytest.raises(ValueError, match="multiples of the mesh size"):
        run_bo_distributed(
            key, _quad, [0.0] * 3, [1.0] * 3,
            BOConfig(n_init=10, max_evals=20, batch_size=8), CFG, mesh,
        )
    with pytest.raises(ValueError, match="'ei', 'lcb', or 'ts'"):
        run_bo_distributed(
            key, _quad, [0.0] * 3, [1.0] * 3,
            BOConfig(n_init=16, max_evals=32, batch_size=8, acq="ucb"), CFG, mesh,
        )
    with pytest.raises(ValueError, match="rff"):
        run_bo_distributed(
            key, _quad, [0.0] * 3, [1.0] * 3,
            BOConfig(n_init=16, max_evals=32, batch_size=8, acq="ts",
                     ts_sampler="rff"), CFG, mesh,
        )


@pytest.mark.slow
def test_distributed_bo_pathwise_ts_optimizes(key):
    """acq='ts' on the forced-distributed route: globally-joint pathwise
    Thompson batches against the row-sharded surrogate must optimize (the
    exact chunked sampler is structurally unavailable at N ≫ chip)."""
    mesh = PAR.make_mesh(8, axis="rows")
    bo = BOConfig(n_init=16, max_evals=64, batch_size=8, acq="ts",
                  ts_sampler="pathwise", n_candidates=128, fit_every=2,
                  rff_features=256)
    res = run_bo_distributed(
        key, _quad, [0.0] * 3, [1.0] * 3, bo, CFG, mesh, budget_bytes=1
    )
    trace = np.asarray(res.incumbent_trace)
    assert np.isfinite(trace).all()
    assert (np.diff(trace) <= 1e-12).all()
    assert float(res.best_y) < float(res.y_hist[:16].min())
    assert float(res.best_y) < 0.05


@pytest.mark.slow
def test_distributed_bo_ts_route_equivalence(key):
    """The SAME call with pinned hypers selects the SAME points on both
    sides of the memory threshold: the pathwise draws are RNG-layout
    compatible (test_distributed_linalg.py::test_distributed_pathwise_
    parity), so crossing the routing boundary never changes TS semantics."""
    from turbojax import gp as G

    mesh = PAR.make_mesh(4, axis="rows")
    bo = BOConfig(n_init=8, max_evals=32, batch_size=4, acq="ts",
                  n_candidates=64, fit_every=0, rff_features=128)
    fixed = G.default_params(3, CFG, jnp.float32)
    res_dist = run_bo_distributed(
        key, _quad, [0.0] * 3, [1.0] * 3, bo, CFG, mesh, budget_bytes=1,
        fixed_params=fixed,
    )
    res_dense = run_bo_distributed(
        key, _quad, [0.0] * 3, [1.0] * 3, bo, CFG, mesh, fixed_params=fixed,
    )
    np.testing.assert_allclose(
        np.asarray(res_dist.x_hist), np.asarray(res_dense.x_hist),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.slow
def test_distributed_bo_supports_y_warp(key):
    """y_warp on the distributed product path (model-space rule,
    docs/DESIGN.md §7b): both routing branches now model warp_y(y) and the
    EI incumbent is warped at the same choke point, so a bilog config runs
    — and still optimizes — on the forced-distributed route (this replaced
    the earlier up-front rejection, which existed because the distributed
    fit lane used to standardize raw y)."""
    mesh = PAR.make_mesh(8, axis="rows")
    bo = BOConfig(n_init=16, max_evals=48, batch_size=8, acq="ei",
                  n_candidates=128)
    res = run_bo_distributed(
        key, lambda x: 50.0 * _quad(x) + 1.0, [0.0] * 3, [1.0] * 3,
        bo, dataclasses.replace(CFG, y_warp="bilog"), mesh, budget_bytes=1,
    )
    trace = np.asarray(res.incumbent_trace)
    assert np.isfinite(trace).all() and np.all(np.diff(trace) <= 1e-6)
    assert float(res.best_y) < 50.0 * 0.1 + 1.0  # EI refined well past LHS
