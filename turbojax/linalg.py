"""Masked, statically-shaped linear algebra for GP inference (SURVEY.md C3–C5).

Reference capability [B:5]: jittered Cholesky of K+σ²I with an escalating
retry ladder (GPyTorch ``psd_safe_cholesky`` [R]), triangular solves, and an
O(n²) incremental Cholesky append per new observation.

TPU-native design: everything under ``jax.jit``/``lax.scan`` must be
statically shaped, so a growing n-point training set is carried as an
``(N_max, ·)`` buffer plus an active-count ``n``. The invariants that make
masked buffers safe (SURVEY.md §7.3.1):

  * masked kernel matrices are **identity-padded** (1 on the inactive
    diagonal, 0 off-diagonal), so ``cholesky`` of the padded matrix is the
    block-diagonal ``[chol(K_active), I]`` — finite, and with zero coupling
    between active and inactive rows;
  * masked right-hand sides are zero-padded, so triangular solves leave the
    inactive rows at exactly 0;
  * the masked log-determinant picks up ``log 1 = 0`` from inactive rows.

These are verified by the masked-vs-dense equality tests in
``tests/test_linalg.py`` (the gating unit test of SURVEY.md §4.2).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


# --------------------------------------------------------------------------
# Masking helpers


def row_mask(n_max: int, n: Array) -> Array:
    """Boolean (n_max,) mask with the first ``n`` entries active."""
    return jnp.arange(n_max) < n


def mask_kernel_matrix(k_mat: Array, mask: Array) -> Array:
    """Identity-pad a kernel matrix outside the active block."""
    both = mask[:, None] & mask[None, :]
    eye = jnp.eye(k_mat.shape[-1], dtype=k_mat.dtype)
    return jnp.where(both, k_mat, eye)


def mask_cross_matrix(k_cross: Array, mask: Array) -> Array:
    """Zero the rows of a train×candidate cross-covariance for inactive
    training points so they contribute nothing to posterior solves."""
    return jnp.where(mask[:, None], k_cross, jnp.zeros_like(k_cross))


# --------------------------------------------------------------------------
# Jittered / safe Cholesky


def cholesky_jittered(k_mat: Array, jitter: float) -> Array:
    """Cholesky of ``k_mat + jitter·mean(diag)·I`` — the fixed-jitter fast
    path used inside vmapped fits (a lax.cond ladder would degrade to
    compute-both-branches under vmap; SURVEY.md §7.3 notes the trade)."""
    n = k_mat.shape[-1]
    scale = jnp.mean(jnp.diagonal(k_mat, axis1=-2, axis2=-1), axis=-1)
    bumped = k_mat + (jitter * scale)[..., None, None] * jnp.eye(n, dtype=k_mat.dtype)
    return jnp.linalg.cholesky(bumped)


def safe_cholesky(k_mat: Array, jitters: Tuple[float, ...] = (0.0, 1e-8, 1e-6, 1e-4)) -> Array:
    """Cholesky with an escalating jitter ladder (GPyTorch
    ``psd_safe_cholesky`` parity [R]; SURVEY.md C3).

    Attempts each relative jitter in order and keeps the first finite
    factor; under plain jit only the taken branch executes. Differentiable
    (``lax.cond`` branches reverse-mode cleanly). The last rung is used
    unconditionally if all previous fail, so the caller always gets a
    factor (possibly of a heavily regularized matrix).
    """
    n = k_mat.shape[-1]
    eye = jnp.eye(n, dtype=k_mat.dtype)
    scale = jnp.mean(jnp.diagonal(k_mat, axis1=-2, axis2=-1), axis=-1)

    def attempt(i: int) -> Array:
        bump = (jitters[i] * scale)[..., None, None] * eye
        chol = jnp.linalg.cholesky(k_mat + bump)
        if i == len(jitters) - 1:
            return chol
        ok = jnp.all(jnp.isfinite(chol))
        return lax.cond(ok, lambda: chol, lambda: attempt(i + 1))

    return attempt(0)


def solve_lower(l_mat: Array, b: Array) -> Array:
    """x = L⁻¹ b with L lower-triangular."""
    return jax.scipy.linalg.solve_triangular(l_mat, b, lower=True)


def solve_upper_t(l_mat: Array, b: Array) -> Array:
    """x = L⁻ᵀ b with L lower-triangular."""
    return jax.scipy.linalg.solve_triangular(l_mat, b, lower=True, trans=1)


def cho_solve(l_mat: Array, b: Array) -> Array:
    """x = (L Lᵀ)⁻¹ b."""
    return solve_upper_t(l_mat, solve_lower(l_mat, b))


def masked_logdet_from_chol(l_mat: Array, mask: Array) -> Array:
    """log|K_active| from the identity-padded factor: inactive diagonal
    entries are 1 so they contribute log 1 = 0; masked anyway for safety."""
    diag = jnp.diagonal(l_mat, axis1=-2, axis2=-1)
    safe = jnp.where(mask, diag, jnp.ones_like(diag))
    return 2.0 * jnp.sum(jnp.log(safe), axis=-1)


# --------------------------------------------------------------------------
# Incremental Cholesky (SURVEY.md C5, [B:5, B:10])
#
#   L_{n+1} = [[L, 0], [bᵀ, d]],  b = L⁻¹ k(X, x_new),
#   d = sqrt(k_nn + σ² − bᵀb)
#
# O(n²) per append vs O(n³) refactorization. The masked-buffer variant
# appends row ``n`` of an (N_max, N_max) identity-padded factor in place.


def chol_append(l_buf: Array, n: Array, k_vec: Array, k_nn: Array, floor: float = 1e-10) -> Array:
    """Append one observation to an identity-padded Cholesky buffer.

    Args:
      l_buf: (N_max, N_max) lower factor, identity outside the active n×n block.
      n: active size (traced scalar int). Row ``n`` is written.
      k_vec: (N_max,) covariances k(X_buf, x_new) + (σ² on none); entries at
        index ≥ n may be garbage — they are masked here.
      k_nn: scalar k(x_new, x_new) + σ².
      floor: clamp for the new pivot (guards the sqrt when the schur
        complement underflows; mirrors the jitter ladder's last rung).

    Returns the updated (N_max, N_max) factor with active size n+1.
    """
    n_max = l_buf.shape[-1]
    idx = jnp.arange(n_max)
    active = idx < n
    rhs = jnp.where(active, k_vec, jnp.zeros_like(k_vec))
    b = solve_lower(l_buf, rhs)  # inactive rows stay 0 (identity block, zero rhs)
    b = jnp.where(active, b, jnp.zeros_like(b))
    # sum(b*b) runs elementwise on the VPU at full f32 (an MXU dot would
    # use the default reduced-precision pass; the pivot is a cancellation)
    pivot = jnp.sqrt(jnp.maximum(k_nn - jnp.sum(b * b), floor))
    new_row = jnp.where(active, b, jnp.where(idx == n, pivot, jnp.zeros_like(b)))
    # Row n of the identity padding was e_n; overwrite it with [b, d, 0...].
    l_new = lax.dynamic_update_slice(l_buf, new_row[None, :], (n, jnp.zeros_like(n)))
    return l_new


def chol_append_batch(l_buf: Array, n: Array, k_block: Array, k_diag_block: Array, q: int, floor: float = 1e-10):
    """Append ``q`` observations sequentially (a q-batch tell, [B:9]).

    Args:
      l_buf: (N_max, N_max) identity-padded factor with n active rows.
      n: active size before the appends.
      k_block: (q, N_max) covariances of each new point against the buffer
        **including the other new points** (column n+j holds k(x_i, x_j) for
        the j-th new point; callers build this from the post-append X buffer).
      k_diag_block: (q,) k(x_i, x_i) + σ² for each new point.
      q: static batch size.

    Returns the updated factor (active size n+q).
    """

    def body(i, l_cur):
        return chol_append(l_cur, n + i, k_block[i], k_diag_block[i], floor)

    return lax.fori_loop(0, q, body, l_buf)


# --------------------------------------------------------------------------
# Dense (unmasked) convenience wrappers used by the oracle-parity tests


@partial(jax.jit, static_argnames=())
def dense_chol_solve(k_mat: Array, y: Array, jitter: float = 0.0) -> Tuple[Array, Array]:
    l_mat = cholesky_jittered(k_mat, jitter) if jitter else jnp.linalg.cholesky(k_mat)
    return l_mat, cho_solve(l_mat, y)
