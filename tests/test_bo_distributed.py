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


def test_distributed_bo_dense_route_matches_surface(key):
    """Below the threshold the same call runs the dense path — one surface."""
    mesh = PAR.make_mesh(8, axis="rows")
    bo = BOConfig(n_init=16, max_evals=40, batch_size=8, acq="lcb",
                  n_candidates=64, fit_every=2)
    res = run_bo_distributed(key, _quad, [0.0] * 3, [1.0] * 3, bo, CFG, mesh)
    assert np.isfinite(np.asarray(res.y_hist)).all()
    assert float(res.best_y) < 0.1


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


def test_distributed_bo_rejects_bad_layout(key):
    mesh = PAR.make_mesh(8, axis="rows")
    with pytest.raises(ValueError, match="multiples of the mesh size"):
        run_bo_distributed(
            key, _quad, [0.0] * 3, [1.0] * 3,
            BOConfig(n_init=10, max_evals=20, batch_size=8), CFG, mesh,
        )
    with pytest.raises(ValueError, match="'ei' or 'lcb'"):
        run_bo_distributed(
            key, _quad, [0.0] * 3, [1.0] * 3,
            BOConfig(n_init=16, max_evals=32, batch_size=8, acq="ts"), CFG, mesh,
        )


def test_distributed_bo_rejects_y_warp(key):
    """Code-review regression: the distributed fit lane models raw y, so
    y_warp must be rejected up front instead of silently disagreeing with
    the auto-routed dense lane about the model space."""
    mesh = PAR.make_mesh(8, axis="rows")
    bo = BOConfig(n_init=16, max_evals=24, batch_size=8, acq="ei",
                  n_candidates=64)
    with pytest.raises(ValueError, match="y_warp"):
        run_bo_distributed(
            key, _quad, [0.0] * 3, [1.0] * 3,
            bo, dataclasses.replace(CFG, y_warp="bilog"), mesh,
        )
