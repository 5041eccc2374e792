"""Unit tests: transforms (SURVEY.md C10)."""

import jax.numpy as jnp
import numpy as np

from turbojax import transforms as T


def test_unit_cube_round_trip(rng):
    lb = jnp.asarray([-5.0, 0.0, 2.0])
    ub = jnp.asarray([10.0, 15.0, 3.0])
    x = jnp.asarray(rng.uniform(-5, 3, size=(20, 3)))
    u = T.to_unit_cube(x, lb, ub)
    np.testing.assert_allclose(T.from_unit_cube(u, lb, ub), x, rtol=1e-12)


def test_standardize_round_trip(rng):
    n_max, n = 16, 11
    y = jnp.asarray(rng.randn(n_max) * 3.0 + 7.0)
    mask = jnp.arange(n_max) < n
    y_std, mean, std = T.standardize(y, mask)
    active = np.asarray(y_std)[:n]
    assert abs(active.mean()) < 1e-10
    assert abs(active.std() - 1.0) < 1e-10
    assert np.all(np.asarray(y_std)[n:] == 0.0)
    np.testing.assert_allclose(T.unstandardize(y_std, mean, std)[:n], y[:n], rtol=1e-10)


def test_standardize_constant_y_is_finite():
    y = jnp.full((8,), 3.0)
    mask = jnp.ones(8, bool)
    y_std, mean, std = T.standardize(y, mask)
    assert np.all(np.isfinite(np.asarray(y_std)))


def test_constrain_round_trip():
    lo, hi = 0.005, 20.0
    vals = jnp.asarray([0.01, 0.5, 1.0, 19.0])
    raw = T.unconstrain(vals, lo, hi)
    np.testing.assert_allclose(T.constrain(raw, lo, hi), vals, rtol=1e-6)
    # constrained values always inside the box
    extreme = jnp.asarray([-100.0, 100.0])
    out = np.asarray(T.constrain(extreme, lo, hi))
    assert np.all(out > lo - 1e-9) and np.all(out < hi + 1e-9)


def test_inv_softplus():
    y = jnp.asarray([0.1, 1.0, 10.0, 50.0])
    np.testing.assert_allclose(T.softplus(T.inv_softplus(y)), y, rtol=1e-8)


def test_warp_y_bilog_properties(rng):
    """warp_y (GPConfig.y_warp extension): odd, strictly monotone, finite
    on the imputation-floor scale, identity for 'none', error otherwise."""
    y = jnp.asarray(np.sort(rng.randn(64) * 50.0))
    w = np.asarray(T.warp_y(y, "bilog"))
    assert np.all(np.diff(w) > 0)  # strictly increasing on distinct inputs
    np.testing.assert_allclose(np.asarray(T.warp_y(-y, "bilog")), -w, rtol=1e-6)
    assert np.isfinite(np.asarray(T.warp_y(jnp.asarray(1e6), "bilog")))
    np.testing.assert_allclose(np.asarray(T.warp_y(y, "none")), np.asarray(y))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        T.warp_y(y, "sqrt")
