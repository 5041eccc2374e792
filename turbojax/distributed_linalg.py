"""Distributed blocked Cholesky, solves, and GP fitting over a device mesh
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

Resident memory is 1/D per device, and — crucially — **no device ever
materializes the dense N×N matrix**: kernel row-blocks are built *inside*
the shard from replicated X (``distributed_kernel_chol``), so the largest
live per-device array is the (N/D, N) row block.

The panel loop has two lanes, auto-routed on panel count (``unroll="auto"``
= unroll iff n/panel ≤ ``UNROLL_MAX_PANELS``, round 5): the **unrolled**
lane emits one body per panel with FLOP-optimal narrow trailing slices —
measured 2× faster than fori at 8–32 panels on the 8-dev CPU mesh,
bringing the 8-dev chol overhead vs dense to 2.3–2.8×
(benchmarks/results_chol_unroll.json) — while the **fori** lane
(``lax.fori_loop``, one compiled body, full-width masked trailing update,
≤3× trailing-GEMM FLOPs for O(1) program size) remains the large-N route:
at N=32k/panel=128 a 250-body unrolled program is something the
remote-tunnel compiler cannot digest.

Gradients: ``distributed_mll`` carries a closed-form custom VJP
(∂MLL/∂K = ½(ααᵀ − K⁻¹) via two extra distributed substitutions), so
fitting keeps the O(N²/D) per-device memory bound — reverse-mode AD
through the panel loop (still available for the raw primitives) would save
an (N/D, N) carry per panel iteration instead.

Exact (no approximation): verified against dense factorization/solves on
the CPU mesh in tests/test_distributed_linalg.py, including hyperparameter
FITTING (``fit_distributed_gp``: Adam on the distributed MLL matches the
dense-MLL trajectory). Intended for N ≫ single-chip capacity — at N=2000
the single-chip path wins (BASELINE.md) and remains the default;
``fit_gp_auto`` routes on a (N, mesh, dtype) memory threshold.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from turbojax.config import GPConfig

Array = jax.Array

#: full-f32 MXU passes for the factorization/solve GEMMs — the TPU default
#: reduced-precision pass breaks cancellation-heavy updates (see gp._HI)
_HI = jax.lax.Precision.HIGHEST


def _check(n: int, n_dev: int, panel: int) -> int:
    assert n % n_dev == 0, "N must divide the mesh size"
    rows = n // n_dev
    assert rows % panel == 0, "panel must divide N/D"
    return rows


UNROLL_MAX_PANELS = 32
# "auto" unroll routing (round 5, VERDICT r4 task 6): the fori lane's
# full-width masked trailing update does ~2x the GEMM FLOPs of the
# unrolled narrow-slice lane; measured on the 8-dev CPU mesh at N=4096
# (benchmarks/results_chol_unroll.json): unroll wins 2.0x/2.1x/1.6x at
# n_panels 8/16/32, dropping the 8-dev chol overhead vs dense from
# 4.5-5.4x to 2.3-2.8x (inside the pure FLOP-trade bound). Program size
# grows linearly with panel count, so auto unrolls only at <= 32 panels
# (compile 10 s vs 5.5 s there; the fori lane remains the large-N route
# and the remote tunnel never sees a multi-hundred-body program).


def _resolve_unroll(unroll, n: int, panel: int) -> bool:
    if unroll == "auto":
        return (n // panel) <= UNROLL_MAX_PANELS
    return bool(unroll)


# --------------------------------------------------------------------------
# Local (per-shard) panel algorithms — composable inside one shard_map.
# Each takes the local row-block plus (axis, row0, rows, panel, n).


def _local_chol(a_loc: Array, axis: str, row0, rows: int, panel: int, n: int,
                unroll: bool = False) -> Array:
    """Blocked right-looking Cholesky on a row-sharded matrix (local body)."""
    gidx = row0 + jnp.arange(rows)
    n_panels = n // panel

    def body_at(c0, a_loc):
        col_loc = lax.dynamic_slice(a_loc, (0, c0), (rows, panel))
        col_full = lax.all_gather(col_loc, axis, tiled=True)  # (n, panel)
        diag_blk = lax.dynamic_slice(col_full, (c0, jnp.zeros_like(c0)), (panel, panel))
        l_kk = jnp.linalg.cholesky(diag_blk)
        lcol = jax.scipy.linalg.solve_triangular(l_kk, col_full.T, lower=True).T

        below = (gidx >= c0 + panel)[:, None]
        in_panel = ((gidx >= c0) & (gidx < c0 + panel))[:, None]
        local_lcol = lax.dynamic_slice(lcol, (row0, jnp.zeros_like(row0)), (rows, panel))
        rel = jnp.clip(gidx - c0, 0, panel - 1)
        new_cols = jnp.where(below, local_lcol, jnp.where(in_panel, l_kk[rel], 0.0))
        a_loc = lax.dynamic_update_slice(a_loc, new_cols, (0, c0))

        my_l = jnp.where(below, local_lcol, 0.0)
        if isinstance(c0, int):  # unrolled: FLOP-optimal narrow trailing slice
            t0 = c0 + panel
            if t0 < n:
                lcol_m = jnp.where((jnp.arange(n) >= t0)[:, None], lcol, 0.0)
                trail = lax.dynamic_slice(a_loc, (0, t0), (rows, n - t0))
                a_loc = lax.dynamic_update_slice(
                    a_loc, trail - jnp.matmul(my_l, lcol_m[t0:].T, precision=_HI), (0, t0)
                )
        else:  # fori: full-width masked update keeps shapes static
            lcol_m = jnp.where((jnp.arange(n) >= c0 + panel)[:, None], lcol, 0.0)
            a_loc = a_loc - jnp.matmul(my_l, lcol_m.T, precision=_HI)
        return a_loc

    if unroll:
        for k in range(n_panels):
            a_loc = body_at(k * panel, a_loc)
        return a_loc
    return lax.fori_loop(0, n_panels, lambda k, a: body_at(k * panel, a), a_loc)


def _panel_psum(x_loc: Array, c0, panel: int, row0, rows: int, axis: str) -> Array:
    """The (panel, m) block of a row-sharded array at global rows
    [c0, c0+panel): zero-pad non-owners, psum (a masked broadcast)."""
    m = x_loc.shape[1]
    rel = jnp.clip(c0 - row0, 0, rows - panel)
    blk = lax.dynamic_slice(x_loc, (rel, jnp.zeros_like(rel)), (panel, m))
    gidx = row0 + rel + jnp.arange(panel)
    owns = ((gidx >= c0) & (gidx < c0 + panel))[:, None]
    return lax.psum(jnp.where(owns, blk, 0.0), axis)


def _local_solve_lower(l_loc: Array, b_loc: Array, axis: str, row0, rows: int,
                       panel: int, n: int, unroll: bool = False) -> Array:
    """x = L⁻¹ b, row-sharded (local body)."""
    gidx = row0 + jnp.arange(rows)
    n_panels = n // panel

    def body_at(c0, carry):
        r_loc, x_loc = carry
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
        r_loc = jnp.where(below, r_loc - jnp.matmul(l_col, x_k, precision=_HI), r_loc)
        return r_loc, x_loc

    init = (b_loc, jnp.zeros_like(b_loc))
    if unroll:
        carry = init
        for k in range(n_panels):
            carry = body_at(k * panel, carry)
        return carry[1]
    _, x_loc = lax.fori_loop(0, n_panels, lambda k, c: body_at(k * panel, c), init)
    return x_loc


def _local_solve_upper_t(l_loc: Array, b_loc: Array, axis: str, row0, rows: int,
                         panel: int, n: int, unroll: bool = False) -> Array:
    """x = L⁻ᵀ b (backward substitution), same sharding (local body).

    Lᵀ's k-th row-panel couples x_k to x_j for j > k through L[j, k] — the
    rows *below* the panel of L's k-th column panel, which are row-sharded;
    the cross term is a local GEMM + psum per panel."""
    gidx = row0 + jnp.arange(rows)
    n_panels = n // panel

    def body_at(c0, x_loc):
        l_col = lax.dynamic_slice(l_loc, (0, c0), (rows, panel))
        below = (gidx >= c0 + panel)[:, None]
        # cross term Σ_{j>panel} L[j,k]ᵀ x_j — local rows then psum
        cross = lax.psum(jnp.matmul(jnp.where(below, l_col, 0.0).T, x_loc, precision=_HI), axis)
        b_panel = _panel_psum(b_loc, c0, panel, row0, rows, axis)
        l_kk_panel = _panel_psum(l_col, c0, panel, row0, rows, axis)
        x_k = jax.scipy.linalg.solve_triangular(
            l_kk_panel, b_panel - cross, lower=True, trans=1
        )
        in_panel = ((gidx >= c0) & (gidx < c0 + panel))[:, None]
        rel = jnp.clip(gidx - c0, 0, panel - 1)
        return jnp.where(in_panel, x_k[rel], x_loc)

    x_loc = jnp.zeros_like(b_loc)
    if unroll:
        for k in reversed(range(n_panels)):
            x_loc = body_at(k * panel, x_loc)
        return x_loc
    return lax.fori_loop(
        0, n_panels, lambda i, x: body_at((n_panels - 1 - i) * panel, x), x_loc
    )


def _row0(axis: str, rows: int):
    return lax.axis_index(axis) * rows


# --------------------------------------------------------------------------
# Public sharded primitives (row-block layout on the mesh's first axis)


def distributed_cholesky(k_mat: Array, mesh: Mesh, panel: int = 128,
                         unroll="auto") -> Array:
    """Lower factor of SPD ``k_mat``, row-block-sharded on the mesh axis."""
    axis = mesh.axis_names[0]
    n = k_mat.shape[0]
    rows = _check(n, mesh.devices.size, panel)
    unroll = _resolve_unroll(unroll, n, panel)

    def local(a_loc: Array) -> Array:
        return _local_chol(a_loc, axis, _row0(axis, rows), rows, panel, n, unroll)

    fn = shard_map(local, mesh=mesh, in_specs=P(axis, None), out_specs=P(axis, None), check_vma=False)
    return fn(k_mat)


def distributed_solve_lower(l_mat: Array, b: Array, mesh: Mesh, panel: int = 128,
                            unroll="auto") -> Array:
    """x = L⁻¹ b with L row-block-sharded and b (N, m) sharded the same way."""
    axis = mesh.axis_names[0]
    n = l_mat.shape[0]
    rows = _check(n, mesh.devices.size, panel)
    unroll = _resolve_unroll(unroll, n, panel)

    def local(l_loc: Array, b_loc: Array) -> Array:
        return _local_solve_lower(l_loc, b_loc, axis, _row0(axis, rows), rows, panel, n, unroll)

    fn = shard_map(
        local, mesh=mesh, in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis, None), check_vma=False,
    )
    return fn(l_mat, b)


def distributed_solve_upper_t(l_mat: Array, b: Array, mesh: Mesh, panel: int = 128,
                              unroll="auto") -> Array:
    """x = L⁻ᵀ b (backward substitution), same sharding as above."""
    axis = mesh.axis_names[0]
    n = l_mat.shape[0]
    rows = _check(n, mesh.devices.size, panel)
    unroll = _resolve_unroll(unroll, n, panel)

    def local(l_loc: Array, b_loc: Array) -> Array:
        return _local_solve_upper_t(l_loc, b_loc, axis, _row0(axis, rows), rows, panel, n, unroll)

    fn = shard_map(
        local, mesh=mesh, in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis, None), check_vma=False,
    )
    return fn(l_mat, b)


def distributed_cho_solve(l_mat: Array, b: Array, mesh: Mesh, panel: int = 128,
                          unroll="auto") -> Array:
    """(L Lᵀ)⁻¹ b — forward then backward distributed substitution."""
    return distributed_solve_upper_t(
        l_mat, distributed_solve_lower(l_mat, b, mesh, panel, unroll), mesh, panel, unroll
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
        mu_part = lax.psum(jnp.matmul(k_cross_loc.T, a_loc[:, 0], precision=_HI), axis)
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
    rows = n // mesh.devices.size

    def local(l_loc: Array) -> Array:
        gidx = _row0(axis, rows) + jnp.arange(rows)
        diag = l_loc[jnp.arange(rows), gidx]
        return lax.psum(2.0 * jnp.sum(jnp.log(diag)), axis)

    fn = shard_map(local, mesh=mesh, in_specs=P(axis, None), out_specs=P(), check_vma=False)
    return fn(l_mat)


# --------------------------------------------------------------------------
# In-shard kernel construction — no device ever holds the dense N×N matrix


def distributed_kernel_chol(
    params: Dict[str, Array], x: Array, mesh: Mesh, panel: int = 128,
    kernel: str = "matern52", unroll="auto", jitter: float = 0.0,
) -> Array:
    """Row-sharded Cholesky of k(X,X)+σ²I with the kernel row-blocks built
    *inside* the shard from replicated X — the largest per-device live array
    is the (N/D, N) row block, never the dense matrix. X is (N, d): tiny.

    ``params`` must contain "lengthscale", "outputscale", "noise".
    ``jitter > 0`` adds the dense lane's relative diagonal bump
    ``jitter·(outputscale+noise)`` (matching ``linalg.cholesky_jittered``'s
    mean-diagonal scaling for a stationary kernel and ``distributed_mll``'s
    fit-time diagonal)."""
    from turbojax import kernels as K

    axis = mesh.axis_names[0]
    n = x.shape[0]
    rows = _check(n, mesh.devices.size, panel)
    unroll = _resolve_unroll(unroll, n, panel)
    kfn = K.get_kernel(kernel)

    def local(x_rows: Array, x_full: Array, p: Dict[str, Array]) -> Array:
        row0 = _row0(axis, rows)
        k_loc = kfn(p, x_rows, x_full)  # (rows, n)
        r = jnp.arange(rows)
        bump = p["noise"] + jitter * (p["outputscale"] + p["noise"])
        k_loc = k_loc.at[r, row0 + r].add(bump)
        return _local_chol(k_loc, axis, row0, rows, panel, n, unroll)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(None, None), P()),
        out_specs=P(axis, None), check_vma=False,
    )
    return fn(x, x, params)


def distributed_cross_covariance(
    params: Dict[str, Array], x: Array, xs: Array, mesh: Mesh, kernel: str = "matern52"
) -> Array:
    """k(X, X*) built row-sharded inside the shard (N·m/D per device)."""
    from turbojax import kernels as K

    axis = mesh.axis_names[0]
    kfn = K.get_kernel(kernel)
    fn = shard_map(
        lambda x_rows, xs_full, p: kfn(p, x_rows, xs_full),
        mesh=mesh, in_specs=(P(axis, None), P(None, None), P()),
        out_specs=P(axis, None), check_vma=False,
    )
    return fn(x, xs, params)


# --------------------------------------------------------------------------
# Distributed MLL + hyperparameter fitting (the VERDICT-#2 fit driver)


def _mll_parts(raw, x: Array, y_std: Array, mesh: Mesh, config: GPConfig, panel: int):
    """Shared forward body: one fused shard_map program — kernel rows →
    blocked chol → forward solve (quad = ‖L⁻¹r‖²) → logdet. Returns
    (mll, L row-sharded, v = L⁻¹r row-sharded)."""
    from turbojax import gp as G
    from turbojax import kernels as K

    axis = mesh.axis_names[0]
    n = x.shape[0]
    rows = _check(n, mesh.devices.size, panel)
    params = G.constrain_params(raw, config)
    kfn = K.get_kernel(config.kernel)

    def local(x_rows, x_full, y_loc, p):
        row0 = _row0(axis, rows)
        r = jnp.arange(rows)
        # same diagonal bump as the dense lane's linalg.cholesky_jittered:
        # jitter × mean(diag) with diag = outputscale + noise (stationary)
        bump = p["noise"] + config.jitter * (p["outputscale"] + p["noise"])
        k_loc = kfn(p, x_rows, x_full).at[r, row0 + r].add(bump)
        unroll = _resolve_unroll("auto", n, panel)  # fit path: measured 2x
        l_loc = _local_chol(k_loc, axis, row0, rows, panel, n, unroll)
        resid = (y_loc - p["mean"])[:, None]
        v_loc = _local_solve_lower(l_loc, resid, axis, row0, rows, panel, n, unroll)
        quad = lax.psum(jnp.sum(v_loc * v_loc), axis)
        logdet = lax.psum(2.0 * jnp.sum(jnp.log(l_loc[r, row0 + r])), axis)
        return quad, logdet, l_loc, v_loc

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(None, None), P(axis), P()),
        out_specs=(P(), P(), P(axis, None), P(axis, None)), check_vma=False,
    )
    quad, logdet, l_mat, v = fn(x, x, y_std, params)
    mll_val = -0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi).astype(y_std.dtype))
    return mll_val, l_mat, v


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def distributed_mll(
    raw, x: Array, y_std: Array, mesh: Mesh, config: GPConfig, panel: int = 128,
) -> Array:
    """Exact MLL −½(rᵀK⁻¹r + log|K| + n log 2π) with K row-block-sharded and
    built in-shard. Differentiable w.r.t. (raw, x, y_std); Adam on this is
    ``fit_distributed_gp``.

    The gradient is a **custom VJP from the closed-form GP identities**
    (∂MLL/∂K = ½(ααᵀ − K⁻¹), ∂MLL/∂y = −α), computed with two extra
    distributed substitutions against the identity — NOT reverse-mode AD
    through the panel loop, which would save an (N/D, N) carry per panel
    iteration (n/panel copies: more per-device memory than the dense N×N
    matrix this module promises no device ever materializes). Backward
    memory is O(N²/D) per device, same as the forward
    (tests/test_distributed_linalg.py::test_distributed_mll_grad_memory).

    Mirrors ``gp.mll`` (SURVEY.md C6) without masking: at the N ≫ chip scale
    history buffers are exact-size, not masked-padded."""
    return _mll_parts(raw, x, y_std, mesh, config, panel)[0]


def _distributed_mll_fwd(raw, x, y_std, mesh, config, panel):
    mll_val, l_mat, v = _mll_parts(raw, x, y_std, mesh, config, panel)
    # α = K⁻¹r via one backward substitution of the forward's v = L⁻¹r
    alpha = distributed_solve_upper_t(l_mat, v, mesh, panel)[:, 0]
    return mll_val, (raw, x, l_mat, alpha)


def _distributed_mll_bwd(mesh, config, panel, res, g):
    from turbojax import gp as G
    from turbojax import kernels as K

    raw, x, l_mat, alpha = res
    axis = mesh.axis_names[0]
    n = x.shape[0]
    rows = _check(n, mesh.devices.size, panel)
    kfn = K.get_kernel(config.kernel)

    # K⁻¹ row-sharded: distributed substitutions against the identity —
    # O(N³/D) work, O(N²/D) per-device memory (the identity is generated
    # in-shard by XLA iota fusion, never materialized on one device).
    eye = jnp.eye(n, dtype=l_mat.dtype)
    kinv = distributed_cho_solve(l_mat, eye, mesh, panel)

    def local(raw_rep, x_rows, x_full, alpha_loc, alpha_full, kinv_loc, g_rep):
        row0 = _row0(axis, rows)
        r = jnp.arange(rows)

        def build(raw_, x_rows_, x_full_):
            p = G.constrain_params(raw_, config)
            bump = p["noise"] + config.jitter * (p["outputscale"] + p["noise"])
            k_loc = kfn(p, x_rows_, x_full_).at[r, row0 + r].add(bump)
            return k_loc, p["mean"]

        _, vjp = jax.vjp(build, raw_rep, x_rows, x_full)
        # ∂MLL/∂K = ½(ααᵀ − K⁻¹), entrywise (the in-shard build assigns
        # every K entry exactly once across shards); ∂MLL/∂mean = Σα,
        # accumulated from per-shard partials via the psum below.
        gk_loc = (0.5 * g_rep) * (alpha_loc[:, None] * alpha_full[None, :] - kinv_loc)
        gmean_loc = g_rep * jnp.sum(alpha_loc)
        raw_bar, xr_bar, xf_bar = vjp((gk_loc, gmean_loc))
        raw_bar = jax.tree.map(lambda t: lax.psum(t, axis), raw_bar)
        xf_bar = lax.psum(xf_bar, axis)
        return raw_bar, xr_bar, xf_bar

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis, None), P(None, None), P(axis), P(), P(axis, None), P()),
        out_specs=(P(), P(axis, None), P()), check_vma=False,
    )
    raw_bar, xr_bar, xf_bar = fn(raw, x, x, alpha, alpha, kinv, g)
    x_bar = xr_bar + xf_bar  # row-block partials + replicated-operand partials
    y_bar = -g * alpha  # ∂MLL/∂y_std = −K⁻¹r
    return raw_bar, x_bar, y_bar


distributed_mll.defvjp(_distributed_mll_fwd, _distributed_mll_bwd)


@partial(jax.jit, static_argnames=("mesh", "config", "panel", "steps"))
def _fit_distributed_raw(raw0, x, y_std, mesh, config: GPConfig, panel: int, steps: int):
    import optax

    n = x.shape[0]

    def loss(raw):
        val = distributed_mll(raw, x, y_std, mesh, config, panel)
        if config.fit_prior != "none":
            from turbojax import gp as G

            # same MAP objective as the dense lane's _fit_one (replicated
            # O(d) compute — stays outside the shard_map)
            val = val + G.log_prior(raw, x.shape[-1], config)
        return -val / n

    opt = optax.adam(config.fit_lr)

    def body(_, carry):
        raw, opt_state = carry
        grads = jax.grad(loss)(raw)
        # NaN robustness, mirroring gp._fit_one's Adam path (the dense
        # lane's "fit never returns non-finite hypers" invariant): one bad
        # in-shard panel Cholesky at extreme hypers yields NaN grads that
        # would poison the whole trajectory — zero the grads for that step
        # and keep the previous finite iterate.
        grads = jax.tree.map(lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
        updates, opt_state = opt.update(grads, opt_state, raw)
        new_raw = optax.apply_updates(raw, updates)
        ok = jnp.all(
            jnp.stack([jnp.all(jnp.isfinite(leaf)) for leaf in jax.tree.leaves(new_raw)])
        )
        raw = jax.tree.map(lambda new, old: jnp.where(ok, new, old), new_raw, raw)
        return raw, opt_state

    raw_fin, _ = lax.fori_loop(0, steps, body, (raw0, opt.init(raw0)))
    # belt-and-braces: the iterate chain keeps the last finite raw, so this
    # only fires if raw0 itself was poisoned — fall back to it regardless so
    # the invariant is structural, not incidental
    fin = jnp.all(
        jnp.stack([jnp.all(jnp.isfinite(leaf)) for leaf in jax.tree.leaves(raw_fin)])
    )
    raw_fin = jax.tree.map(lambda a, b: jnp.where(fin, a, b), raw_fin, raw0)
    return raw_fin, loss(raw_fin)


def fit_distributed_gp(
    x: Array,
    y: Array,
    mesh: Mesh,
    config: GPConfig = GPConfig(),
    panel: int = 128,
    steps: Optional[int] = None,
    warm_start=None,
) -> "DistributedGP":
    """Fit GP hyperparameters at N ≫ chip: Adam over the differentiable
    distributed MLL (``config.fit_maxiter`` steps by default, reference-Adam
    parity like ``gp._fit_one``'s adam path), then cache the row-sharded
    factorization for posterior queries. Single-restart from the
    reference-parity default init (or ``warm_start``): at this scale one fit
    is the budget; restart diversity comes from the warm-started outer loop.

    Invariant (shared with the dense ``gp.fit_gp``, BASELINE.md): the fit
    never returns non-finite hypers — NaN gradients from a failed in-shard
    panel Cholesky are dropped per-step, a poisoned warm start falls back
    to the defaults, and the cached factorization gets the escalating-jitter
    rescue (``DistributedGP.fit``).
    """
    from turbojax import gp as G
    from turbojax import transforms as T

    n, d = x.shape
    steps = steps or config.fit_maxiter
    # model-space rule (docs/DESIGN.md §7b): the GP models warp_y(y), same
    # as the dense lane — posterior()/mll() then return model-space values
    # on BOTH sides of the fit_gp_auto routing threshold. The fit runs on
    # the warped+standardized targets; the returned object is assembled by
    # the shared _assemble_distributed_gp (the rule's single home).
    y_w = T.warp_y(y, config.y_warp)
    y_mean = jnp.mean(y_w)
    y_sd = jnp.maximum(jnp.std(y_w), jnp.asarray(1e-8, y_w.dtype))
    y_std = (y_w - y_mean) / y_sd

    raw0 = warm_start if warm_start is not None else G.default_params(d, config, x.dtype)
    if warm_start is not None and not all(
        bool(jnp.all(jnp.isfinite(leaf))) for leaf in jax.tree.leaves(warm_start)
    ):
        raw0 = G.default_params(d, config, x.dtype)  # sanitize like gp.fit_gp
    raw_fin, _ = _fit_distributed_raw(raw0, x, y_std, mesh, config, panel, steps)
    return _assemble_distributed_gp(x, y, raw_fin, config, mesh, panel)


# --------------------------------------------------------------------------
# User-facing distributed exact GP (roadmap item 4: "auto-distributed GP")


class DistributedGP:
    """Exact GP whose O(N²)/O(N³) state is row-block-sharded over a mesh —
    the drop-in for ``gp.make_gp_state``/``gp_posterior`` when N exceeds a
    chip (SURVEY.md §5.7(b)). Same math, same rtol-1e-5 parity bar
    (tests/test_distributed_linalg.py). The kernel matrix and cross-
    covariances are built inside the shard: no device materializes N².

    Usage::

        dgp = DistributedGP(mesh, kernel="matern52", panel=128)
        dgp.fit(x, y, lengthscale, outputscale, noise)   # x: (N, d), N % D == 0
        mu, var = dgp.posterior(xs)
        mll = dgp.mll()

    or fit the hyperparameters too: ``fit_distributed_gp(x, y, mesh)``.
    """

    def __init__(self, mesh: Mesh, kernel: str = "matern52", panel: int = 128,
                 jitter: float = 1e-6):
        self.mesh = mesh
        self.kernel = kernel
        self.panel = panel
        self.jitter = jitter
        self.y_mean = 0.0  # standardization constants (set by fit_distributed_gp)
        self.y_sd = 1.0

    def fit(self, x: Array, y: Array, lengthscale, outputscale, noise,
            mean: float | Array = 0.0) -> "DistributedGP":
        self.x = x
        self.params = {
            "lengthscale": jnp.asarray(lengthscale, x.dtype),
            "outputscale": jnp.asarray(outputscale, x.dtype),
            "noise": jnp.asarray(noise, x.dtype),
        }
        self.mean = jnp.asarray(mean, x.dtype)
        # cached factorization with the fit-time diagonal (same bump as
        # distributed_mll) plus the dense lane's escalating-jitter rescue
        # (C3 psd_safe_cholesky parity): near-duplicate rows at fitted
        # hypers can defeat the base jitter in f32; this is an eager host
        # method, so the ladder is a plain retry loop — no compute-all
        # lax.cond branches.
        chol = None
        for scale in (1.0, 1e2, 1e4):
            chol = distributed_kernel_chol(
                self.params, x, self.mesh, self.panel, kernel=self.kernel,
                jitter=self.jitter * scale,
            )
            if bool(jnp.all(jnp.isfinite(chol))):
                break
        self.chol = chol
        self.y = y
        self.alpha = distributed_cho_solve(
            self.chol, (y - self.mean)[:, None], self.mesh, self.panel
        )
        return self

    def posterior(self, xs: Array) -> Tuple[Array, Array]:
        from turbojax import kernels as K

        k_cross = distributed_cross_covariance(
            self.params, self.x, xs, self.mesh, kernel=self.kernel
        )
        k_diag = K.kernel_diag(self.params, xs)
        mu_s, var_s = distributed_gp_posterior(
            self.chol, self.alpha, k_cross, k_diag, self.mesh, self.panel, mean=self.mean
        )
        return self.y_mean + self.y_sd * mu_s, var_s * self.y_sd**2

    def mll(self) -> Array:
        n = self.y.shape[0]
        resid = self.y - self.mean
        quad = jnp.dot(resid, self.alpha[:, 0])
        logdet = distributed_logdet_from_chol(self.chol, self.mesh)
        return -0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi))

    def pathwise_paths(self, key: Array, xs: Array, n_paths: int,
                       n_features: int = 1024) -> Array:
        """Decoupled pathwise posterior draws at ``xs`` (Matheron's rule) —
        see ``distributed_pathwise_paths``."""
        return distributed_pathwise_paths(key, self, xs, n_paths, n_features)


def distributed_pathwise_paths(
    key: Array,
    dgp: "DistributedGP",
    xs: Array,
    n_paths: int,
    n_features: int = 1024,
) -> Array:
    """Globally-joint posterior sample paths at ``xs`` against a row-sharded
    ``DistributedGP`` — the N ≫ chip twin of ``acq.pathwise_paths``
    (decoupled sampling by Matheron's rule, Wilson et al. 2020):

        f_post(x*) = φ(x*)ᵀw + k(x*, X) (K + σ²I)⁻¹ (r − φ(X)ᵀw − ε),

    w ~ N(0, I_M) a weight-space prior path, ε ~ N(0, σ²I). This is what
    unlocks joint Thompson sampling on the distributed BO path: the exact
    chunked sampler needs n_chunk × chunk² candidate-covariance
    factorizations that the distributed posterior deliberately never forms,
    while this draw is in-shard matmuls (φ row-blocks and k(X, X*)
    row-blocks built inside the shard) plus ONE distributed cho_solve
    against the cached training factor. Per-device live memory is
    O(N·max(M, n_cand)/D + n_cand·M) — never N² and never n_cand².

    RNG layout mirrors ``acq.pathwise_paths`` exactly (same key → same
    (Ω, b, w, ε) stream), so the dense and distributed samplers agree to
    solver precision when N equals the dense buffer capacity
    (tests/test_distributed_linalg.py::test_distributed_pathwise_parity).

    Returns (n_paths, n_cand) draws in the unstandardized model space
    (warped-y units under ``y_warp`` — monotone, so argmin selection is
    unchanged; same convention as ``DistributedGP.posterior``).
    """
    from turbojax import acq as A

    mesh, panel = dgp.mesh, dgp.panel
    axis = mesh.axis_names[0]
    x = dgp.x
    n, dim = x.shape
    p = dgp.params
    kf, kw, ke = jax.random.split(key, 3)
    omega, b = A.rff_frequencies(kf, dim, n_features, dgp.kernel, xs.dtype)
    ls = jnp.broadcast_to(p["lengthscale"], (dim,))
    w = jax.random.normal(kw, (n_paths, n_features), xs.dtype)
    eps = jnp.sqrt(p["noise"]) * jax.random.normal(ke, (n_paths, n), xs.dtype)

    # rhs = r − φ(X)ᵀw − ε, row-sharded: the (N/D, M) φ row block is built
    # inside the shard from the device's own x rows (never a global (N, M)).
    # All traced values enter as explicit replicated args (module convention:
    # shard_map bodies never close over tracers).
    def local_rhs(x_rows, eps_rows, resid_rows, omega_, b_, w_, ls_, os_):
        phi_rows = A._rff_phi(x_rows, omega_, b_, ls_, os_)
        prior_rows = jnp.matmul(phi_rows, w_.T, precision=_HI)  # (rows, n_paths)
        return resid_rows[:, None] - prior_rows - eps_rows

    resid = dgp.y - dgp.mean  # (N,) standardized model-space residual
    rhs = shard_map(
        local_rhs, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis), P(None, None),
                  P(None), P(None, None), P(None), P()),
        out_specs=P(axis, None), check_vma=False,
    )(x, eps.T, resid, omega, b, w, ls, p["outputscale"])

    u = distributed_cho_solve(dgp.chol, rhs, mesh, panel)  # (N, n_paths)
    k_cross = distributed_cross_covariance(
        p, x, xs, mesh, kernel=dgp.kernel
    )  # (N, n_cand) row-sharded

    def local_update(k_cross_loc, u_loc):
        # cancellation-free contraction, but keep the factorization-path
        # precision rule anyway (docs/DESIGN.md §2b)
        return lax.psum(jnp.matmul(k_cross_loc.T, u_loc, precision=_HI), axis)

    update = shard_map(
        local_update, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)), out_specs=P(),
        check_vma=False,
    )(k_cross, u)  # (n_cand, n_paths) replicated

    phi_c = A._rff_phi(xs, omega, b, ls, p["outputscale"])  # (n_cand, M)
    prior_c = jnp.matmul(w, phi_c.T, precision=_HI)  # (n_paths, n_cand)
    draws_std = dgp.mean + prior_c + update.T
    return dgp.y_mean + dgp.y_sd * draws_std


# --------------------------------------------------------------------------
# Auto-routing (roadmap item 4): single-chip path below the memory
# threshold, distributed path above it.

#: Per-device bytes the dense path may spend on (K, L, AD residuals) before
#: auto-routing distributes. ~2 GiB default: conservative vs 16 GiB HBM,
#: leaving room for the optimizer loop around the fit.
DENSE_BUDGET_BYTES = 2 << 30


def should_distribute(n: int, mesh: Optional[Mesh], dtype=jnp.float32,
                      budget_bytes: int = DENSE_BUDGET_BYTES) -> bool:
    """True when the dense single-device fit working set (~3 N² buffers:
    K, its factor, and AD residuals) exceeds the per-device budget and a
    multi-device mesh is available to shard it."""
    if mesh is None or mesh.devices.size <= 1:
        return False
    return 3 * n * n * jnp.dtype(dtype).itemsize > budget_bytes


class _DenseGPAdapter:
    """Single-chip ``gp.fit_gp`` result behind the DistributedGP interface,
    so ``fit_gp_auto`` callers see one surface either way."""

    def __init__(self, state, config: GPConfig, y_std_buf: Array):
        self.state = state
        self.config = config
        self.raw = state.raw
        self._y_std_buf = y_std_buf

    def posterior(self, xs: Array) -> Tuple[Array, Array]:
        from turbojax import gp as G

        return G.gp_posterior(self.state, xs, self.config)

    def mll(self) -> Array:
        """Standardized-space MLL (same convention as DistributedGP fitted
        via ``fit_distributed_gp``, whose y is standardized)."""
        from turbojax import gp as G

        return G.mll(self.state.raw, self.state.x_buf, self._y_std_buf,
                     self.state.mask, self.config)


def _assemble_distributed_gp(x, y, raw, config: GPConfig, mesh, panel: int):
    """Construct a ``DistributedGP`` at pinned hypers ``raw`` over the raw
    (un-warped) targets ``y`` — the single home of the model-space rule
    (docs/DESIGN.md §7b: warp_y → standardize → factorize → record
    ``y_mean/y_sd/raw``). Both ``fit_distributed_gp`` and
    ``refactor_gp_auto`` end here, so the fit and refactor-only routes can
    never disagree on the convention."""
    from turbojax import gp as G
    from turbojax import transforms as T

    params = G.constrain_params(raw, config)
    y = T.warp_y(y, config.y_warp)
    y_mean = jnp.mean(y)
    y_sd = jnp.maximum(jnp.std(y), jnp.asarray(1e-8, y.dtype))
    dgp = DistributedGP(mesh, kernel=config.kernel, panel=panel,
                        jitter=config.jitter)
    dgp.fit(
        x, (y - y_mean) / y_sd, params["lengthscale"], params["outputscale"],
        params["noise"], mean=params["mean"],
    )
    dgp.y_mean, dgp.y_sd = y_mean, y_sd
    dgp.raw = raw
    return dgp


def _adapt_dense(state, y, mask, config: GPConfig):
    """Dense twin of ``_assemble_distributed_gp``: wrap a fitted/refactored
    dense ``GPState`` in the auto-routing adapter surface, scoring the same
    (warped, standardized) targets on ``.mll()``."""
    from turbojax import transforms as T

    y_std_buf, _, _ = T.standardize(T.warp_y(y, config.y_warp), mask)
    return _DenseGPAdapter(state, config, y_std_buf)


def fit_gp_auto(
    key: Array,
    x: Array,
    y: Array,
    config: GPConfig = GPConfig(),
    mesh: Optional[Mesh] = None,
    panel: int = 128,
    budget_bytes: int = DENSE_BUDGET_BYTES,
    warm_start=None,
):
    """Fit an exact GP, auto-routing between the single-chip masked path
    (``gp.fit_gp``: multi-restart, L-BFGS/Adam) and the distributed path
    (``fit_distributed_gp``: Adam over the row-sharded MLL) on the
    (N, mesh, dtype) memory threshold (``should_distribute``). Returns an
    object with ``.posterior(xs) -> (mu, var)``, ``.mll()`` and ``.raw``
    (pass ``.raw`` back as ``warm_start`` for outer-loop refits)."""
    from turbojax import gp as G
    from turbojax import linalg as L
    from turbojax import transforms as T

    n = x.shape[0]
    if should_distribute(n, mesh, x.dtype, budget_bytes):
        return fit_distributed_gp(x, y, mesh, config, panel, warm_start=warm_start)
    mask = L.row_mask(n, jnp.asarray(n))
    state = G.fit_gp(key, x, y, mask, config, warm_start=warm_start)
    return _adapt_dense(state, y, mask, config)


def refactor_gp_auto(
    x: Array,
    y: Array,
    raw,
    config: GPConfig = GPConfig(),
    mesh: Optional[Mesh] = None,
    panel: int = 128,
    budget_bytes: int = DENSE_BUDGET_BYTES,
):
    """Rebuild the cached factorization over the CURRENT ``(x, y)`` at
    pinned hypers ``raw`` — the refit-cadence off-iteration twin of
    ``fit_gp_auto`` (same auto-routing, same returned surface, no MLL
    optimization). The posterior must always see all data even between
    hyperparameter refits (``trust_region._fit_or_reuse`` is the dense-loop
    analog; SURVEY.md §7.3.6): reusing a stale fitted object skips the new
    observations entirely, which silently degrades ``fit_every > 1`` loops
    and breaks ``fit_every = 0`` (fixed hypers, factor-only updates)."""
    from turbojax import gp as G
    from turbojax import linalg as L
    from turbojax import transforms as T

    n = x.shape[0]
    if should_distribute(n, mesh, x.dtype, budget_bytes):
        return _assemble_distributed_gp(x, y, raw, config, mesh, panel)
    mask = L.row_mask(n, jnp.asarray(n))
    state = G.make_gp_state(x, y, mask, raw, config)
    return _adapt_dense(state, y, mask, config)
