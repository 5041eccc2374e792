"""Distributed blocked Cholesky and triangular solves over a device mesh
(SURVEY.md §5.7(b)'s "row-block-sharded K with a distributed blocked
Cholesky" — the scaling path beyond single-chip HBM, built rather than
deferred).

Layout: K (N, N) is sharded by **row blocks** across the mesh axis — device
d owns rows [d·N/D, (d+1)·N/D). The factorization is right-looking over
column panels of width P (P divides N/D, so a panel's rows live on one
device):

  per panel k:
    1. ``all_gather`` the current panel column (N·P floats — the only
       communication; N²/2 total over the run, i.e. the matrix once);
    2. every device redundantly factorizes the P×P diagonal block and
       triangular-solves the gathered column (replicating this tiny work
       avoids an owner→all broadcast round);
    3. every device applies the trailing GEMM update to its own rows.

FLOPs and resident memory are 1/D per device; the per-device trailing GEMM
is MXU-shaped. The solves are panel-sequential with a ``psum`` of one
(P, m) block per panel (N·m total traffic).

Exact (no approximation): verified against dense factorization/solves on
the CPU mesh in tests/test_distributed_linalg.py. Intended for
N ≫ single-chip capacity — at N=2000 the single-chip path wins
(BASELINE.md) and remains the default.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array


def _check(n: int, n_dev: int, panel: int) -> int:
    assert n % n_dev == 0, "N must divide the mesh size"
    rows = n // n_dev
    assert rows % panel == 0, "panel must divide N/D"
    return rows


def distributed_cholesky(k_mat: Array, mesh: Mesh, panel: int = 128) -> Array:
    """Lower factor of SPD ``k_mat``, row-block-sharded on the mesh axis."""
    axis = mesh.axis_names[0]
    n = k_mat.shape[0]
    n_dev = mesh.devices.size
    rows = _check(n, n_dev, panel)
    n_panels = n // panel

    def local(a_loc: Array) -> Array:
        dev = lax.axis_index(axis)
        row0 = dev * rows
        gidx = row0 + jnp.arange(rows)

        for k in range(n_panels):  # static unroll: trailing widths stay static
            c0 = k * panel
            col_loc = lax.dynamic_slice(a_loc, (0, c0), (rows, panel))
            col_full = lax.all_gather(col_loc, axis, tiled=True)  # (n, panel)
            l_kk = jnp.linalg.cholesky(col_full[c0 : c0 + panel])
            lcol = jax.scipy.linalg.solve_triangular(l_kk, col_full.T, lower=True).T

            below = (gidx >= c0 + panel)[:, None]
            in_panel = ((gidx >= c0) & (gidx < c0 + panel))[:, None]
            local_lcol = lax.dynamic_slice(lcol, (row0, jnp.zeros_like(row0)), (rows, panel))
            rel = jnp.clip(gidx - c0, 0, panel - 1)
            new_cols = jnp.where(below, local_lcol, jnp.where(in_panel, l_kk[rel], 0.0))
            a_loc = lax.dynamic_update_slice(a_loc, new_cols, (0, c0))

            t0 = c0 + panel
            if t0 < n:
                lcol_m = jnp.where((jnp.arange(n) >= t0)[:, None], lcol, 0.0)
                my_l = jnp.where(below, local_lcol, 0.0)
                trail = lax.dynamic_slice(a_loc, (0, t0), (rows, n - t0))
                upd = my_l @ lcol_m[t0:].T
                a_loc = lax.dynamic_update_slice(a_loc, trail - upd, (0, t0))
        return a_loc

    fn = shard_map(local, mesh=mesh, in_specs=P(axis, None), out_specs=P(axis, None), check_vma=False)
    return fn(k_mat)


def _panel_psum(x_loc: Array, c0: int, panel: int, row0, rows: int, axis: str) -> Array:
    """The (panel, m) block of a row-sharded array at global rows
    [c0, c0+panel): zero-pad non-owners, psum (a masked broadcast)."""
    m = x_loc.shape[1]
    rel = jnp.clip(c0 - row0, 0, rows - panel)
    blk = lax.dynamic_slice(x_loc, (rel, jnp.zeros_like(rel)), (panel, m))
    gidx = row0 + rel + jnp.arange(panel)
    owns = ((gidx >= c0) & (gidx < c0 + panel))[:, None]
    return lax.psum(jnp.where(owns, blk, 0.0), axis)


def distributed_solve_lower(l_mat: Array, b: Array, mesh: Mesh, panel: int = 128) -> Array:
    """x = L⁻¹ b with L row-block-sharded and b (N, m) sharded the same way."""
    axis = mesh.axis_names[0]
    n = l_mat.shape[0]
    n_dev = mesh.devices.size
    rows = _check(n, n_dev, panel)
    n_panels = n // panel

    def local(l_loc: Array, b_loc: Array) -> Array:
        dev = lax.axis_index(axis)
        row0 = dev * rows
        gidx = row0 + jnp.arange(rows)
        r_loc = b_loc  # running residual b - L[:, solved] x[solved]
        x_loc = jnp.zeros_like(b_loc)

        for k in range(n_panels):
            c0 = k * panel
            r_panel = _panel_psum(r_loc, c0, panel, row0, rows, axis)
            l_kk_panel = _panel_psum(
                lax.dynamic_slice(l_loc, (0, c0), (rows, panel)), c0, panel, row0, rows, axis
            )
            x_k = jax.scipy.linalg.solve_triangular(l_kk_panel, r_panel, lower=True)

            in_panel = ((gidx >= c0) & (gidx < c0 + panel))[:, None]
            rel = jnp.clip(gidx - c0, 0, panel - 1)
            x_loc = jnp.where(in_panel, x_k[rel], x_loc)

            below = (gidx >= c0 + panel)[:, None]
            l_col = lax.dynamic_slice(l_loc, (0, c0), (rows, panel))
            r_loc = jnp.where(below, r_loc - l_col @ x_k, r_loc)
        return x_loc

    fn = shard_map(
        local, mesh=mesh, in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis, None), check_vma=False,
    )
    return fn(l_mat, b)


def distributed_solve_upper_t(l_mat: Array, b: Array, mesh: Mesh, panel: int = 128) -> Array:
    """x = L⁻ᵀ b (backward substitution), same sharding as above.

    Lᵀ's k-th row-panel couples x_k to x_j for j > k through L[j, k] — the
    rows *below* the panel of L's k-th column panel, which are row-sharded;
    the cross term is a local GEMM + psum per panel."""
    axis = mesh.axis_names[0]
    n = l_mat.shape[0]
    n_dev = mesh.devices.size
    rows = _check(n, n_dev, panel)
    n_panels = n // panel

    def local(l_loc: Array, b_loc: Array) -> Array:
        dev = lax.axis_index(axis)
        row0 = dev * rows
        gidx = row0 + jnp.arange(rows)
        x_loc = jnp.zeros_like(b_loc)

        for k in reversed(range(n_panels)):
            c0 = k * panel
            l_col = lax.dynamic_slice(l_loc, (0, c0), (rows, panel))
            below = (gidx >= c0 + panel)[:, None]
            # cross term Σ_{j>panel} L[j,k]ᵀ x_j — local rows then psum
            cross = lax.psum((jnp.where(below, l_col, 0.0)).T @ x_loc, axis)
            b_panel = _panel_psum(b_loc, c0, panel, row0, rows, axis)
            l_kk_panel = _panel_psum(l_col, c0, panel, row0, rows, axis)
            x_k = jax.scipy.linalg.solve_triangular(
                l_kk_panel, b_panel - cross, lower=True, trans=1
            )
            in_panel = ((gidx >= c0) & (gidx < c0 + panel))[:, None]
            rel = jnp.clip(gidx - c0, 0, panel - 1)
            x_loc = jnp.where(in_panel, x_k[rel], x_loc)
        return x_loc

    fn = shard_map(
        local, mesh=mesh, in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis, None), check_vma=False,
    )
    return fn(l_mat, b)


def distributed_cho_solve(l_mat: Array, b: Array, mesh: Mesh, panel: int = 128) -> Array:
    """(L Lᵀ)⁻¹ b — forward then backward distributed substitution."""
    return distributed_solve_upper_t(
        l_mat, distributed_solve_lower(l_mat, b, mesh, panel), mesh, panel
    )


def distributed_gp_posterior(
    l_mat: Array,
    alpha: Array,
    k_cross: Array,
    k_diag: Array,
    mesh: Mesh,
    panel: int = 128,
    mean: float | Array = 0.0,
) -> Tuple[Array, Array]:
    """Posterior mean/variance with the **training axis** row-sharded
    (the N ≫ chip regime; candidate-axis sharding for huge candidate sets
    is the orthogonal `parallel.sharded_acq_topq` path).

      μ* = m + K*ᵀα               — local partial GEMM + psum
      σ*² = k** − Σ_rows v²,  v = L⁻¹K*  — distributed forward solve,
                                    then a row-block reduction via psum.

    Args:
      l_mat: (N, N) distributed factor (from ``distributed_cholesky``).
      alpha: (N, 1) or (N,) distributed solve of the residual.
      k_cross: (N, m) cross-covariance, row-sharded like L.
      k_diag: (m,) prior variances k(x*, x*) (replicated).
    """
    axis = mesh.axis_names[0]
    a2 = alpha if alpha.ndim == 2 else alpha[:, None]
    v = distributed_solve_lower(l_mat, k_cross, mesh, panel)  # (N, m) sharded

    def local(k_cross_loc: Array, v_loc: Array, a_loc: Array):
        mu_part = lax.psum(k_cross_loc.T @ a_loc[:, 0], axis)
        vsq_part = lax.psum(jnp.sum(v_loc * v_loc, axis=0), axis)
        return mu_part, vsq_part

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None)),
        out_specs=(P(), P()), check_vma=False,
    )
    mu_dot, vsq = fn(k_cross, v, a2)
    mu = mean + mu_dot
    var = jnp.maximum(k_diag - vsq, 1e-12)
    return mu, var


def distributed_logdet_from_chol(l_mat: Array, mesh: Mesh) -> Array:
    """log|K| = 2·Σ log diag(L), row-sharded diag via psum."""
    axis = mesh.axis_names[0]
    n = l_mat.shape[0]
    n_dev = mesh.devices.size
    rows = n // n_dev

    def local(l_loc: Array) -> Array:
        dev = lax.axis_index(axis)
        gidx = dev * rows + jnp.arange(rows)
        diag = l_loc[jnp.arange(rows), gidx]
        return lax.psum(2.0 * jnp.sum(jnp.log(diag)), axis)

    fn = shard_map(local, mesh=mesh, in_specs=P(axis, None), out_specs=P(), check_vma=False)
    return fn(l_mat)


# --------------------------------------------------------------------------
# User-facing distributed exact GP (roadmap: "auto-distributed GP")


class DistributedGP:
    """Exact GP whose O(N²)/O(N³) state is row-block-sharded over a mesh —
    the drop-in for ``gp.make_gp_state``/``gp_posterior`` when N exceeds a
    chip (SURVEY.md §5.7(b)). Same math, same rtol-1e-5 parity bar
    (tests/test_distributed_linalg.py).

    Usage::

        dgp = DistributedGP(mesh, kernel="matern52", panel=128)
        dgp.fit(x, y, lengthscale, outputscale, noise)   # x: (N, d), N % D == 0
        mu, var = dgp.posterior(xs)
        mll = dgp.mll()
    """

    def __init__(self, mesh: Mesh, kernel: str = "matern52", panel: int = 128):
        self.mesh = mesh
        self.kernel = kernel
        self.panel = panel

    def fit(self, x: Array, y: Array, lengthscale, outputscale, noise) -> "DistributedGP":
        from turbojax import kernels as K

        self.x = x
        self.params = {
            "lengthscale": jnp.asarray(lengthscale),
            "outputscale": jnp.asarray(outputscale),
        }
        self.noise = jnp.asarray(noise)
        n = x.shape[0]
        kfn = K.get_kernel(self.kernel)
        k_mat = kfn(self.params, x, x) + self.noise * jnp.eye(n, dtype=x.dtype)
        self.chol = distributed_cholesky(k_mat, self.mesh, self.panel)
        self.y = y
        self.alpha = distributed_cho_solve(self.chol, y[:, None], self.mesh, self.panel)
        return self

    def posterior(self, xs: Array) -> Tuple[Array, Array]:
        from turbojax import kernels as K

        kfn = K.get_kernel(self.kernel)
        k_cross = kfn(self.params, self.x, xs)
        k_diag = K.kernel_diag(self.params, xs)
        return distributed_gp_posterior(
            self.chol, self.alpha, k_cross, k_diag, self.mesh, self.panel
        )

    def mll(self) -> Array:
        n = self.y.shape[0]
        quad = jnp.dot(self.y, self.alpha[:, 0])
        logdet = distributed_logdet_from_chol(self.chol, self.mesh)
        return -0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi))
