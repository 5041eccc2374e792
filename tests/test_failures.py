"""Objective-failure handling tests (SURVEY.md §5.3): NaN/inf y values are
imputed inside the jitted loops; buffers never hold non-finites."""

import jax
import jax.numpy as jnp
import numpy as np

from turbojax import transforms as T
from turbojax.bo import BOConfig, run_bo
from turbojax.config import GPConfig
from turbojax.trust_region import TurboConfig, run_turbo1

GCFG = GPConfig(fit_restarts=2, fit_maxiter=10)


def test_impute_failures_unit():
    y_buf = jnp.asarray([1.0, 5.0, 0.0, 0.0])
    mask = jnp.asarray([True, True, False, False])
    y_new = jnp.asarray([2.0, jnp.nan, jnp.inf])
    out = np.asarray(T.impute_failures(y_new, y_buf, mask))
    assert out[0] == 2.0
    assert np.isfinite(out).all()
    penalty = 5.0 + 3.0 * 6.0
    np.testing.assert_allclose(out[1:], penalty)


def test_impute_failures_no_history():
    out = np.asarray(
        T.impute_failures(
            jnp.asarray([jnp.nan, jnp.nan]), jnp.zeros((1,)), jnp.zeros((1,), bool)
        )
    )
    assert np.isfinite(out).all()


def _spiky(x):
    """Objective that returns NaN in a subregion (simulated sim failure)."""
    base = jnp.sum((x - 0.4) ** 2, axis=-1)
    return jnp.where(x[:, 0] > 0.8, jnp.nan, base)


def test_run_bo_survives_nan_objective():
    cfg = BOConfig(n_init=6, max_evals=18, batch_size=2, acq="ei", n_candidates=32, fit_every=2)
    res = run_bo(jax.random.key(0), _spiky, (0.0,) * 3, (1.0,) * 3, cfg, GCFG)
    y = np.asarray(res.y_buf[: int(res.n)])
    assert np.isfinite(y).all()
    assert np.isfinite(float(res.best_y))
    assert float(res.best_y) < 1.0  # still optimizes the finite region


def test_run_turbo1_survives_nan_objective():
    cfg = TurboConfig(n_init=6, max_evals=30, batch_size=3, n_candidates=32)
    carry, trace = run_turbo1(jax.random.key(0), _spiky, (0.0,) * 3, (1.0,) * 3, cfg, GCFG)
    assert np.isfinite(np.asarray(trace)).all()
    y = np.asarray(carry.y_buf[: int(carry.n)])
    assert np.isfinite(y).all()


def test_impute_penalty_never_ranks_as_incumbent():
    """Regression for the fabricated round-1 rover optimum: with an EMPTY
    history and an all-NaN batch, the old penalty formula collapsed to
    exactly 3.0 — small enough to become the recorded best on problems
    whose real costs exceed it. The penalty must be unmistakably terrible
    in every scope."""
    import jax.numpy as jnp
    import numpy as np

    from turbojax import transforms as T

    # degenerate scope: no history, whole batch failed
    y_new = jnp.full((4,), jnp.nan)
    out = T.impute_failures(y_new, jnp.zeros((8,)), jnp.zeros((8,), bool))
    assert np.all(np.asarray(out) >= 1e6)

    # normal scope: penalty strictly worse than every observation in scope
    y_buf = jnp.asarray([5.0, -2.0, 100.0, 0.0])
    mask = jnp.asarray([True, True, True, False])
    y_new2 = jnp.asarray([1.0, jnp.nan, jnp.inf])
    out2 = np.asarray(T.impute_failures(y_new2, y_buf, mask))
    assert out2[0] == 1.0
    assert np.all(out2[1:] > 100.0)


def test_ask_tell_impute_never_ranks_as_incumbent():
    """Ask/tell twin of the invariant above (VERDICT r2 weak #1): the host
    ``Optimizer.tell`` path must use the same history-aware imputation as
    the jitted loops. The old batch-only fallback (worst=1.0 → penalty 7.0)
    recorded a fake incumbent of 7.0 after one all-failed batch on any
    problem whose real costs exceed 7 (rover costs are 10–170)."""
    from turbojax.api import Optimizer

    opt = Optimizer(
        (0.0,) * 4, (1.0,) * 4, method="turbo1", n_init=4, max_evals=40,
        batch_size=4, gp_config=GCFG,
    )
    # first batch: ALL evaluations fail, with no history to lean on
    xs = opt.ask()
    opt.tell(xs, np.full((4,), np.nan, np.float32))
    assert opt.best[1] >= 1e6, (
        f"all-NaN first batch produced best={opt.best[1]} — small enough to "
        "masquerade as a real observation on rover-cost-scale problems"
    )
    # rover-cost-scale real observations must immediately dominate
    xs = opt.ask()
    real = np.asarray([140.0, 85.0, 23.0, 61.0], np.float32)
    opt.tell(xs, real)
    assert opt.best[1] == 23.0
    # a later partially-failed batch imputes against the history's worst,
    # strictly above every real observation so far
    xs = opt.ask()
    opt.tell(xs, np.asarray([50.0, np.nan, 30.0, np.inf], np.float32))
    ys = np.concatenate(opt._history_y)
    assert np.isfinite(ys).all()
    assert ys[ys > 150.0].min() > 140.0  # imputed > worst finite history
    assert opt.best[1] == 23.0
