"""Unit tests: covariance kernels vs sklearn + oracle f64 (SURVEY.md §4.2)."""

import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.gaussian_process.kernels import RBF, Matern

from oracle import numpy_gp as onp
from turbojax import kernels as K

KERNEL_NAMES = ["rbf", "matern12", "matern32", "matern52"]
_SKLEARN = {"rbf": None, "matern12": 0.5, "matern32": 1.5, "matern52": 2.5}


def _params(d, ls=0.7, s=1.3):
    return {"lengthscale": jnp.full((d,), ls), "outputscale": jnp.asarray(s)}


@pytest.mark.parametrize("name", KERNEL_NAMES)
def test_symmetry_and_diag(name, rng):
    x = jnp.asarray(rng.rand(15, 4))
    p = _params(4)
    k = np.asarray(K.get_kernel(name)(p, x, x))
    np.testing.assert_allclose(k, k.T, atol=1e-12)
    np.testing.assert_allclose(np.diag(k), 1.3, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(K.kernel_diag(p, x)), 1.3, rtol=1e-12)


@pytest.mark.parametrize("name", KERNEL_NAMES)
def test_psd(name, rng):
    x = jnp.asarray(rng.rand(30, 5))
    k = np.asarray(K.get_kernel(name)(_params(5), x, x))
    eig = np.linalg.eigvalsh(k)
    assert eig.min() > -1e-8


@pytest.mark.parametrize("name", KERNEL_NAMES)
def test_vs_sklearn(name, rng):
    if _SKLEARN[name] is None:
        sk = 1.3 * RBF(length_scale=0.7)
    else:
        sk = 1.3 * Matern(length_scale=0.7, nu=_SKLEARN[name])
    x1 = rng.rand(12, 3)
    x2 = rng.rand(9, 3)
    ours = np.asarray(K.get_kernel(name)(_params(3), jnp.asarray(x1), jnp.asarray(x2)))
    theirs = sk(x1, x2)
    np.testing.assert_allclose(ours, theirs, rtol=1e-7, atol=1e-10)


@pytest.mark.parametrize("name", KERNEL_NAMES)
def test_vs_oracle(name, rng):
    x1, x2 = rng.rand(10, 6), rng.rand(7, 6)
    ls = rng.uniform(0.3, 2.0, size=6)
    p = {"lengthscale": jnp.asarray(ls), "outputscale": jnp.asarray(2.1)}
    ours = np.asarray(K.get_kernel(name)(p, jnp.asarray(x1), jnp.asarray(x2)))
    theirs = onp.kernel_matrix(name, x1, x2, ls, 2.1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-7, atol=1e-10)


def test_ard_scaling(rng):
    """Stretching dim i by c and multiplying ℓ_i by c leaves K unchanged."""
    x = rng.rand(8, 3)
    ls = np.array([0.5, 1.0, 2.0])
    scale = np.array([3.0, 1.0, 0.25])
    p1 = {"lengthscale": jnp.asarray(ls), "outputscale": jnp.asarray(1.0)}
    p2 = {"lengthscale": jnp.asarray(ls * scale), "outputscale": jnp.asarray(1.0)}
    k1 = K.matern52(p1, jnp.asarray(x), jnp.asarray(x))
    k2 = K.matern52(p2, jnp.asarray(x * scale), jnp.asarray(x * scale))
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), rtol=1e-8, atol=1e-10)


def test_pairwise_sqdist_matches_naive(rng):
    x1, x2 = rng.rand(20, 7), rng.rand(13, 7)
    ours = np.asarray(K.pairwise_sqdist(jnp.asarray(x1), jnp.asarray(x2)))
    naive = onp.pairwise_sqdist(x1, x2)
    np.testing.assert_allclose(ours, naive, rtol=1e-9, atol=1e-12)
