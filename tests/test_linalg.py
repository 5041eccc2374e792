"""Unit tests: masked/jittered/incremental Cholesky (SURVEY.md §4.2).

The masked-vs-dense equality test is "the single most important unit test"
(SURVEY.md §7.3.1): everything downstream assumes identity-padded factors
behave exactly like dense factors on the active block.
"""

import jax
import jax.numpy as jnp
import numpy as np

from oracle import numpy_gp as onp
from turbojax import kernels as K
from turbojax import linalg as L


def _spd(rng, n, noise=1e-2):
    x = rng.rand(n, 3)
    k = onp.kernel_matrix("matern52", x, x, np.full(3, 0.5), 1.0)
    k[np.diag_indices(n)] += noise
    return x, k


def test_masked_chol_equals_dense(rng):
    """Identity-padded chol of a masked matrix == dense chol of active block."""
    n_max, n = 24, 17
    _, k_active = _spd(rng, n)
    k_buf = np.zeros((n_max, n_max))
    k_buf[:n, :n] = k_active
    k_buf[n:, n:] = rng.rand(n_max - n, n_max - n)  # garbage in inactive block
    mask = jnp.arange(n_max) < n
    k_masked = L.mask_kernel_matrix(jnp.asarray(k_buf), mask)
    l_buf = np.asarray(jnp.linalg.cholesky(k_masked))
    l_dense = np.linalg.cholesky(k_active)
    np.testing.assert_allclose(l_buf[:n, :n], l_dense, rtol=1e-10, atol=1e-12)
    # inactive block is exactly identity
    np.testing.assert_allclose(l_buf[n:, n:], np.eye(n_max - n), atol=1e-12)
    assert np.all(l_buf[n:, :n] == 0.0) and np.all(l_buf[:n, n:] == 0.0)


def test_masked_solve_keeps_inactive_rows_zero(rng):
    n_max, n = 20, 13
    _, k_active = _spd(rng, n)
    k_buf = np.eye(n_max)
    k_buf[:n, :n] = k_active
    mask = jnp.arange(n_max) < n
    l_buf = jnp.linalg.cholesky(L.mask_kernel_matrix(jnp.asarray(k_buf), mask))
    rhs = jnp.asarray(np.where(np.arange(n_max) < n, rng.randn(n_max), 0.0))
    sol = np.asarray(L.cho_solve(l_buf, rhs))
    dense_sol = np.linalg.solve(k_active, np.asarray(rhs)[:n])
    np.testing.assert_allclose(sol[:n], dense_sol, rtol=1e-9, atol=1e-11)
    assert np.all(sol[n:] == 0.0)


def test_masked_logdet(rng):
    n_max, n = 16, 9
    _, k_active = _spd(rng, n)
    k_buf = np.eye(n_max)
    k_buf[:n, :n] = k_active
    mask = jnp.arange(n_max) < n
    l_buf = jnp.linalg.cholesky(L.mask_kernel_matrix(jnp.asarray(k_buf), mask))
    ours = float(L.masked_logdet_from_chol(l_buf, mask))
    expected = np.linalg.slogdet(k_active)[1]
    np.testing.assert_allclose(ours, expected, rtol=1e-10)


def test_cholesky_jittered_rescues_singular():
    k = jnp.ones((6, 6))  # rank-1, not PD
    l_mat = L.cholesky_jittered(k, 1e-6)
    assert np.all(np.isfinite(np.asarray(l_mat)))


def test_safe_cholesky_ladder():
    k = jnp.ones((6, 6))  # plain chol fails -> ladder escalates
    l_mat = L.safe_cholesky(k)
    assert np.all(np.isfinite(np.asarray(l_mat)))
    # well-conditioned input takes the zero-jitter rung -> exact factor
    good = jnp.eye(4) * 2.0
    np.testing.assert_allclose(np.asarray(L.safe_cholesky(good)), np.sqrt(2.0) * np.eye(4), rtol=1e-12)


def test_safe_cholesky_grad_finite():
    def f(a):
        k = a @ a.T + 0.5 * jnp.eye(4)
        return jnp.sum(L.safe_cholesky(k))

    g = jax.grad(f)(jnp.asarray(np.random.RandomState(1).rand(4, 4)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_incremental_chol_equals_full(rng):
    """k appends reproduce the full factorization to 1e-6 (SURVEY.md §4.2)."""
    n_max, n0, k_app = 32, 6, 12
    x = rng.rand(n0 + k_app, 4)
    ls, s, noise = np.full(4, 0.6), 1.2, 1e-3
    k_full = onp.kernel_matrix("matern52", x, x, ls, s)
    k_full[np.diag_indices(n0 + k_app)] += noise

    # start from the masked factor of the first n0 points
    k_buf = np.eye(n_max)
    k_buf[:n0, :n0] = k_full[:n0, :n0]
    mask = jnp.arange(n_max) < n0
    l_buf = jnp.linalg.cholesky(L.mask_kernel_matrix(jnp.asarray(k_buf), mask))

    for j in range(k_app):
        n_cur = n0 + j
        k_vec = np.zeros(n_max)
        k_vec[:n_cur] = k_full[n_cur, :n_cur]
        l_buf = L.chol_append(l_buf, jnp.asarray(n_cur), jnp.asarray(k_vec), jnp.asarray(k_full[n_cur, n_cur]))

    l_ref = np.linalg.cholesky(k_full)
    np.testing.assert_allclose(np.asarray(l_buf)[: n0 + k_app, : n0 + k_app], l_ref, rtol=1e-6, atol=1e-8)
    # remaining padding still identity
    np.testing.assert_allclose(np.asarray(l_buf)[n0 + k_app :, n0 + k_app :], np.eye(n_max - n0 - k_app), atol=1e-12)


def test_chol_append_batch(rng):
    n_max, n0, q = 24, 8, 5
    x = rng.rand(n0 + q, 3)
    params = {"lengthscale": jnp.asarray(np.full(3, 0.5)), "outputscale": jnp.asarray(1.0)}
    noise = 1e-3
    x_buf = np.zeros((n_max, 3))
    x_buf[: n0 + q] = x

    k_full = np.asarray(K.matern52(params, jnp.asarray(x), jnp.asarray(x))) + noise * np.eye(n0 + q)
    k_buf = np.eye(n_max)
    k_buf[:n0, :n0] = k_full[:n0, :n0]
    l_buf = jnp.linalg.cholesky(L.mask_kernel_matrix(jnp.asarray(k_buf), jnp.arange(n_max) < n0))

    x_new = jnp.asarray(x[n0:])
    k_block = K.matern52(params, x_new, jnp.asarray(x_buf))  # (q, n_max) vs post-write buffer
    k_diag = K.kernel_diag(params, x_new) + noise
    l_out = L.chol_append_batch(l_buf, jnp.asarray(n0), k_block, k_diag, q)

    l_ref = np.linalg.cholesky(k_full)
    np.testing.assert_allclose(np.asarray(l_out)[: n0 + q, : n0 + q], l_ref, rtol=1e-6, atol=1e-8)


def test_incremental_matches_oracle_append(rng):
    n = 10
    _, k_full = _spd(rng, n + 1)
    l0 = np.linalg.cholesky(k_full[:n, :n])
    l_oracle = onp.incremental_chol_append(l0, k_full[n, :n], k_full[n, n])
    n_max = 16
    l_buf = np.eye(n_max)
    l_buf[:n, :n] = l0
    k_vec = np.zeros(n_max)
    k_vec[:n] = k_full[n, :n]
    l_ours = L.chol_append(jnp.asarray(l_buf), jnp.asarray(n), jnp.asarray(k_vec), jnp.asarray(k_full[n, n]))
    np.testing.assert_allclose(np.asarray(l_ours)[: n + 1, : n + 1], l_oracle, rtol=1e-8, atol=1e-10)
