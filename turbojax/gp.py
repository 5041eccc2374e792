"""GP surrogate: masked MLL, multi-restart L-BFGS fit, batched posterior.

Reference capability (SURVEY.md C6–C9, [B:5, B:8]): exact GP regression —
MLL hyperparameter optimization via gradients + L-BFGS with multi-restart,
posterior mean/variance over large candidate sets — provided by
GPyTorch ``ExactGP``/``ExactMarginalLogLikelihood`` in the reference stack.

TPU-native design:
  * all state lives in statically-shaped masked buffers (SURVEY.md §7.3.1)
    so fit + posterior compile once per (N_max, d) and run inside the outer
    ``lax.scan`` BO loop;
  * restarts are a ``vmap`` axis [B:5] (and a ``shard_map`` axis across ICI,
    see ``turbojax.parallel``);
  * the fit optimizer is ``optax.lbfgs`` inside ``lax.while_loop``
    (reference: scipy L-BFGS-B [R]), with an Adam fallback
    (SURVEY.md §7.3.3);
  * the posterior is one fused batched program: trsm + two matmuls + an
    elementwise epilogue, chunked over candidates to bound working-set size.

Invariant: X/y buffers must be finite in inactive rows (zero-padded) — the
masking uses ``jnp.where``, whose gradients would be polluted by NaN in the
unselected branch.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from turbojax import kernels as K
from turbojax import linalg as L
from turbojax import transforms as T
from turbojax.config import GPConfig

Array = jax.Array

_LOG_2PI = 1.8378770664093453

# Measured single-chip HBM boundaries (BASELINE.md "Round-3 large-N
# single-chip scaling"; benchmarks/bench_large_n.py, TPU v5 lite 15.75 GiB):
#  * the 15-way vmapped grid-fit MLL requested 47.42 GiB at N=16384
#    (~3·N²·itemsize per lane) while the N=8192 vmap (~11.9 GiB) ran fine —
#    above this budget the grid rows evaluate as sequential lax.map lanes
#    (same argmax, O(one lane) memory, ~15 sequential Cholesky's).
_GRID_VMAP_BUDGET_BYTES = 12 << 30
#  * the UNCHUNKED 5000-candidate posterior OOMed at N=16384 (XLA
#    materialized ≈20.9 GiB of (N, m) temps from a 327 MiB cross-matrix);
#    N=2048×5000 (41 MiB) is the largest unchunked program in the benches.
#    Above this cross-matrix size, gp_posterior auto-chunks the candidate
#    axis when the caller didn't pick a chunk.
_POSTERIOR_AUTO_CHUNK_BYTES = 128 << 20


class GPParams(NamedTuple):
    """Unconstrained (raw) hyperparameters; constrain via ``constrain_params``."""

    raw_lengthscale: Array  # (d,) with ARD, (1,) without
    raw_outputscale: Array  # ()
    raw_noise: Array  # ()
    raw_mean: Array  # ()


class GPState(NamedTuple):
    """Fitted-GP cache: everything the posterior needs, statically shaped.

    ``chol``/``alpha`` are the identity-padded Cholesky of
    K(X,X)+σ²I and (K+σ²I)⁻¹(y_std − m) over the active block. y-space
    standardization constants let the posterior report original units.
    """

    x_buf: Array  # (N_max, d), zero-padded
    mask: Array  # (N_max,) bool
    params: Dict[str, Array]  # constrained: lengthscale, outputscale, noise, mean
    raw: GPParams  # for warm-starting the next fit
    chol: Array  # (N_max, N_max)
    alpha: Array  # (N_max,)
    y_mean: Array  # ()
    y_std: Array  # ()


def constrain_params(raw: GPParams, config: GPConfig) -> Dict[str, Array]:
    lo, hi = config.lengthscale_bounds
    so, sh = config.outputscale_bounds
    no, nh = config.noise_bounds
    return {
        "lengthscale": T.constrain(raw.raw_lengthscale, lo, hi),
        "outputscale": T.constrain(raw.raw_outputscale, so, sh),
        "noise": jnp.maximum(T.constrain(raw.raw_noise, no, nh), config.noise_floor),
        "mean": raw.raw_mean if config.learn_mean else jnp.zeros_like(raw.raw_mean),
    }


def default_params(dim: int, config: GPConfig, dtype=jnp.float32) -> GPParams:
    """Reference-parity initial hypers [R]: ℓ=0.5 (unit cube), s²=1, σ²=noise floor·~10."""
    d_eff = dim if config.use_ard else 1
    lo, hi = config.lengthscale_bounds
    so, sh = config.outputscale_bounds
    no, nh = config.noise_bounds
    return GPParams(
        raw_lengthscale=jnp.full((d_eff,), T.unconstrain(jnp.asarray(0.5, dtype), lo, hi)),
        raw_outputscale=T.unconstrain(jnp.asarray(1.0, dtype), so, sh),
        raw_noise=T.unconstrain(jnp.asarray(max(1e-3, config.noise_floor), dtype), no, nh),
        raw_mean=jnp.asarray(0.0, dtype),
    )


def sample_restart_params(key: Array, dim: int, config: GPConfig, n: int, dtype=jnp.float32) -> GPParams:
    """Log-uniform restart inits over the interior of the constraint boxes."""
    d_eff = dim if config.use_ard else 1
    k1, k2, k3 = jax.random.split(key, 3)

    def logu(k, shape, lo, hi):
        # stay inside [10%, 90%] of the log-box so sigmoid unconstrain is stable
        llo, lhi = jnp.log(lo * 1.5), jnp.log(hi / 1.5)
        return jnp.exp(jax.random.uniform(k, shape, dtype, llo, lhi))

    lo, hi = config.lengthscale_bounds
    so, sh = config.outputscale_bounds
    no, nh = config.noise_bounds
    return GPParams(
        raw_lengthscale=T.unconstrain(logu(k1, (n, d_eff), max(lo, 0.05), min(hi, 2.0)), lo, hi),
        raw_outputscale=T.unconstrain(logu(k2, (n,), max(so, 0.2), min(sh, 5.0)), so, sh),
        raw_noise=T.unconstrain(logu(k3, (n,), max(no, 1e-4), min(nh, 1e-1)), no, nh),
        raw_mean=jnp.zeros((n,), dtype),
    )


# --------------------------------------------------------------------------
# Marginal log-likelihood (SURVEY.md C6)


def _use_pallas(config: GPConfig, *arrays: Array) -> bool:
    """Route through the fused Pallas kernel when profitable: TPU backend,
    f32, tile-aligned shapes, and d ≥ 32 — the regime where the fused
    dist+kernel tile kernel measured ≥1.2× vs XLA (1.23–1.70× at d=60–128,
    BENCH_pallas.json; neutral-to-slower at small d, so those shapes keep
    the jnp path). ``config.use_pallas``: None = this auto rule (default),
    True = force wherever shapes allow, False = never (parity CI lane)."""
    if config.use_pallas is False:
        return False
    if jax.config.jax_enable_x64:
        # Mosaic cannot legalize the 64-bit index types jax_enable_x64
        # injects into the pallas_call grid plumbing (measured round 4:
        # "failed to legalize operation 'func.return'" through the axon
        # compile helper, even with all-f32 arrays). x64 processes — the
        # test suite, any user parity lane — get the mathematically
        # identical jnp path; the fused kernel is an f32-production-path
        # optimization.
        return False
    from turbojax import pallas_kernels as PK

    if not PK.pallas_available():
        return False
    aligned = all(a.shape[0] % PK._TILE == 0 and a.dtype == jnp.float32 for a in arrays)
    if not aligned:
        return False
    if config.use_pallas is True:
        return True
    return arrays[0].shape[-1] >= 32  # auto: measured-profitable regime


def _kernel_matrix(
    params: Dict[str, Array], x1: Array, x2: Array, config: GPConfig, add_noise: bool
) -> Array:
    if _use_pallas(config, x1, x2):
        from turbojax import pallas_kernels as PK

        z1 = x1 / params["lengthscale"]
        z2 = x2 / params["lengthscale"]
        # center like kernels.pairwise_sqdist: the expansion's eps·‖z‖²
        # error otherwise swamps clustered trust-region candidates
        c = 0.5 * (jnp.mean(z1, axis=0) + jnp.mean(z2, axis=0))
        return PK.fused_kernel_matrix_ad(
            z1 - c, z2 - c, params["outputscale"], params["noise"],
            config.kernel, add_noise,
        )
    k_mat = K.get_kernel(config.kernel)(params, x1, x2)
    if add_noise:
        k_mat = k_mat + params["noise"] * jnp.eye(x1.shape[0], dtype=k_mat.dtype)
    return k_mat


def _masked_kernel_chol(
    params: Dict[str, Array], x_buf: Array, mask: Array, config: GPConfig,
    ladder: bool = False,
) -> Array:
    k_mat = _kernel_matrix(params, x_buf, x_buf, config, add_noise=True)
    k_mat = L.mask_kernel_matrix(k_mat, mask)
    if ladder:
        # escalating-jitter rescue (C3 psd_safe_cholesky parity) for the
        # cached factorization: near-duplicate rows at fitted hypers can
        # defeat the fixed jitter in f32. Cost note: un-vmapped, only the
        # taken lax.cond branch executes (one factorization in the common
        # case); under TuRBO-m's vmapped per-TR fit the cond degrades to
        # compute-all — 3 (cap,cap) factorizations per TR per refit. That
        # is accepted: the grid fit already runs 15 vmapped factorizations
        # per refit, so the rescue adds ~20% to the fit's chol count in
        # exchange for per-TR rescue (a shared post-hoc fallback would
        # re-factorize ALL TRs at the escalated jitter whenever any one
        # fails, changing healthy TRs' numerics).
        return L.safe_cholesky(
            k_mat, (config.jitter, 1e2 * config.jitter, 1e4 * config.jitter)
        )
    return L.cholesky_jittered(k_mat, config.jitter)


def mll(raw: GPParams, x_buf: Array, y_std: Array, mask: Array, config: GPConfig) -> Array:
    """Exact marginal log-likelihood over the active block:
    −½ rᵀα − ½ log|K+σ²I| − (n/2) log 2π, with r = y_std − m [B:5]."""
    params = constrain_params(raw, config)
    chol = _masked_kernel_chol(params, x_buf, mask, config)
    resid = jnp.where(mask, y_std - params["mean"], jnp.zeros_like(y_std))
    alpha = L.cho_solve(chol, resid)
    quad = jnp.sum(resid * alpha)  # elementwise product: full-f32 on the VPU
    # (a dot would take the MXU's default reduced-precision pass — see _HI)
    logdet = L.masked_logdet_from_chol(chol, mask)
    n_act = jnp.sum(mask).astype(y_std.dtype)
    return -0.5 * (quad + logdet + n_act * _LOG_2PI)


def log_prior(raw: GPParams, dim: int, config: GPConfig) -> Array:
    """Fit-time MAP log-prior over the CONSTRAINED hypers, up to
    parameter-independent constants (gpytorch convention: added to the MLL
    with no reparameterization Jacobian, so the argmax is the MAP in the
    constrained space as gpytorch/BoTorch users expect).

    ``fit_prior="dimscaled"`` is the Hvarfner et al. 2024 high-dimension
    recipe: ℓᵢ ~ LogNormal(√2 + ln(d)/2, √3) — the location grows like
    log √d, countering maximum-likelihood's systematic lengthscale collapse
    as d grows (which yields overconfident posteriors and, under TuRBO,
    mis-scaled trust-region geometry) — plus σ² ~ LogNormal(−4, 1) on the
    observation noise. The outputscale stays prior-free (y is standardized).
    Only the fit objective sees this; ``mll``/posteriors are prior-free.
    """
    if config.fit_prior == "none":
        return jnp.zeros((), raw.raw_outputscale.dtype)
    if config.fit_prior != "dimscaled":
        raise ValueError(
            f"unknown fit_prior {config.fit_prior!r}; expected 'none' or 'dimscaled'"
        )
    import math

    p = constrain_params(raw, config)

    def ln_logpdf(x, mu, sigma):
        lx = jnp.log(x)
        return -lx - 0.5 * jnp.square((lx - mu) / sigma)

    mu_ls = math.sqrt(2.0) + 0.5 * math.log(float(dim))
    lp = jnp.sum(ln_logpdf(p["lengthscale"], mu_ls, math.sqrt(3.0)))
    lp = lp + ln_logpdf(p["noise"], -4.0, 1.0)
    return lp


# --------------------------------------------------------------------------
# Fit (SURVEY.md C7, C8)


def _fit_one(raw0: GPParams, x_buf: Array, y_std: Array, mask: Array, config: GPConfig) -> Tuple[GPParams, Array]:
    """One optimizer run from one init; returns (params, final −mll/n).

    The whole fit computes in the BUFFER dtype: under ``jax_enable_x64``,
    optax's zoom-linesearch step-size scalars are strong float64, which
    silently promoted the evaluation point — and with it every kernel
    build and Cholesky — to (TPU-emulated) f64 on f32 buffers: measured
    28.7 s vs ~1 s per refit iteration on hardware (2026-08-19). Casting
    the loss input pins the heavy path; it is a no-op in plain-f32
    processes and on the deliberate f64 parity lane (f64 buffers)."""
    n_act = jnp.maximum(jnp.sum(mask).astype(y_std.dtype), 1.0)
    buf_dtype = y_std.dtype

    def _pin(raw: GPParams) -> GPParams:
        return jax.tree.map(lambda a: jnp.asarray(a, buf_dtype), raw)

    raw0 = _pin(raw0)

    dim = x_buf.shape[-1]

    def loss(raw: GPParams) -> Array:
        # _pin here, not only on raw0: the promotion happens INSIDE the
        # optimizer (f64 step size × f32 direction → f64 evaluation point)
        raw_p = _pin(raw)
        val = mll(raw_p, x_buf, y_std, mask, config)
        if config.fit_prior != "none":
            val = val + log_prior(raw_p, dim, config)  # MAP objective
        return -val / n_act

    if config.fit_optimizer == "adam":
        opt = optax.adam(config.fit_lr)

        def adam_step(raw, opt_state):
            value, grads = jax.value_and_grad(loss)(raw)
            # NaN robustness: a failed f32 Cholesky inside the loss (near-
            # duplicate rows at extreme hypers) yields NaN grads; one such
            # step would poison the parameter trajectory permanently (and
            # with it every later warm-started refit in the outer loop —
            # the round-2 full-budget regret bug). Zero the grads for that
            # step and keep the previous finite iterate instead.
            grads = jax.tree.map(lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
            updates, opt_state = opt.update(grads, opt_state, raw)
            new_raw = optax.apply_updates(raw, updates)
            ok = jnp.all(
                jnp.stack([jnp.all(jnp.isfinite(leaf)) for leaf in jax.tree.leaves(new_raw)])
            )
            raw = jax.tree.map(lambda new, old: jnp.where(ok, new, old), new_raw, raw)
            return raw, opt_state, value

        if config.fit_ftol > 0.0:
            # early-stop lane (fit_ftol): same NaN-robust step inside a
            # bounded while_loop, stopping once the per-step LOSS improvement
            # |Δ(−mll/n)| falls below ftol. Gradient norm was measured and
            # rejected as the stop signal: at the default-init softplus
            # plateau ‖∇‖ ≈ 1.5e-3 is SMALLER than at convergence (3.9e-3)
            # on a d=60 fit, so a gnorm threshold stops cold fits on the
            # plateau. Per-step improvement separates the two by >100×
            # (plateau ~1.6e-2/step, converged ~3e-5/step); a warm-up guard
            # of maxiter/4 steps additionally shields the first plateau
            # steps. Pays off when warm-chained refits (grid_warm_start)
            # start near the optimum; fit_ftol = 0 keeps the
            # fixed-trip-count fori_loop (bitwise round-3 default).
            warmup = max(1, config.fit_maxiter // 4)

            def w_cond(carry):
                _, _, it, _, improv = carry
                keep = (it < warmup) | (improv >= config.fit_ftol) | ~jnp.isfinite(improv)
                return jnp.logical_and(it < config.fit_maxiter, keep)

            def w_body(carry):
                raw, opt_state, it, prev, _ = carry
                raw, opt_state, val = adam_step(raw, opt_state)  # val: pre-update loss
                return raw, opt_state, it + 1, val, jnp.abs(prev - val)

            inf = jnp.asarray(jnp.inf, y_std.dtype)
            raw_fin, _, _, _, _ = lax.while_loop(
                w_cond, w_body, (raw0, opt.init(raw0), jnp.asarray(0), inf, inf)
            )
            return raw_fin, loss(raw_fin)

        def body(_, carry):
            raw, opt_state = carry
            raw, opt_state, _ = adam_step(raw, opt_state)
            return raw, opt_state

        raw_fin, _ = lax.fori_loop(0, config.fit_maxiter, body, (raw0, opt.init(raw0)))
        return raw_fin, loss(raw_fin)

    # L-BFGS with zoom line search — the reference-parity path [B:8]. The
    # line search is capped: every probe costs a full chol fwd+bwd, and the
    # uncapped default dominates fit wall-clock (config.fit_linesearch_steps).
    opt = optax.lbfgs(
        linesearch=optax.scale_by_zoom_linesearch(
            max_linesearch_steps=config.fit_linesearch_steps
        )
    )
    value_and_grad = optax.value_and_grad_from_state(loss)

    def cond(carry):
        _, _, it, gnorm = carry
        return jnp.logical_and(it < config.fit_maxiter, gnorm > 1e-6)

    def body(carry):
        raw, opt_state, it, _ = carry
        value, grads = value_and_grad(raw, state=opt_state)
        updates, opt_state = opt.update(
            grads, opt_state, raw, value=value, grad=grads, value_fn=loss
        )
        raw = optax.apply_updates(raw, updates)
        gnorm = optax.tree_utils.tree_norm(grads)
        return raw, opt_state, it + 1, gnorm

    init = (raw0, opt.init(raw0), jnp.asarray(0), jnp.asarray(jnp.inf, y_std.dtype))
    raw_fin, _, _, _ = lax.while_loop(cond, body, init)
    return _pin(raw_fin), loss(raw_fin)


def grid_params(dim: int, config: GPConfig, dtype=jnp.float32) -> GPParams:
    """The static hyperparameter grid for ``fit_optimizer="grid"``: isotropic
    lengthscale × noise combos (outputscale 1 on standardized y), stacked on
    a leading axis. Values sit strictly inside the constraint boxes."""
    lo, hi = config.lengthscale_bounds
    no, nh = config.noise_bounds
    ls_vals = [v for v in (0.1, 0.25, 0.5, 1.0, 1.9) if lo < v < hi]
    nz_vals = [v for v in (2e-4, 1e-3, 1e-2) if no < v < nh]
    d_eff = dim if config.use_ard else 1
    combos = [(l, nz) for l in ls_vals for nz in nz_vals]
    so, sh = config.outputscale_bounds
    return GPParams(
        raw_lengthscale=jnp.stack([
            jnp.full((d_eff,), T.unconstrain(jnp.asarray(l, dtype), lo, hi)) for l, _ in combos
        ]),
        raw_outputscale=jnp.stack([
            T.unconstrain(jnp.asarray(1.0, dtype), so, sh) for _ in combos
        ]),
        raw_noise=jnp.stack([
            T.unconstrain(jnp.asarray(nz, dtype), no, nh) for _, nz in combos
        ]),
        raw_mean=jnp.zeros((len(combos),), dtype),
    )


def _fit_gp_grid(
    x_buf: Array, y_buf: Array, mask: Array, config: GPConfig, adam_polish: bool = False,
    warm_start: Optional[GPParams] = None,
) -> GPState:
    """Grid MLL selection (``fit_optimizer="grid"``): evaluate the masked
    MLL at every grid combo in one vmap (15 parallel Cholesky factorizations
    — MXU-batched, ~50× cheaper than 50 sequential Adam steps) and keep the
    argmax. This is the CPU oracle's trainer made TPU-native
    (oracle/numpy_turbo._fit_gp_grid), and the reference-parity fit for the
    TuRBO loops where it measurably beats gradient fits on regret.

    ``adam_polish`` (``fit_optimizer="grid+adam"``): refine the grid argmax
    with ``fit_maxiter_warm or 10`` Adam steps (ARD unlocks here), keeping
    whichever of the two has the better MLL.

    ``warm_start`` (``grid_warm_start``, polish path only): the previous
    refit's polished hypers join the grid as one extra row, so the ARD
    refinement CHAINS across the outer loop instead of restarting from an
    isotropic point every iteration — the argmax picks whichever of
    {grid ∪ warm} explains the grown data best, and the polish continues
    from there. One extra vmapped MLL row; no extra factorization passes."""
    dim = x_buf.shape[-1]
    y_std_buf, _, _ = T.standardize(T.warp_y(y_buf, config.y_warp), mask)
    inits = grid_params(dim, config, y_buf.dtype)
    if adam_polish and config.grid_warm_start and warm_start is not None:
        # sanitize like fit_gp's restart-0 warm start: a non-finite carry-over
        # must never become the polish seed (or the all-rows-NaN fallback)
        defaults = default_params(dim, config, y_buf.dtype)
        warm_ok = jnp.all(
            jnp.stack([jnp.all(jnp.isfinite(leaf)) for leaf in jax.tree.leaves(warm_start)])
        )
        warm = jax.tree.map(
            lambda w, d0: jnp.where(warm_ok, w, d0), warm_start, defaults
        )
        inits = jax.tree.map(lambda g, w: jnp.concatenate([g, w[None]], axis=0), inits, warm)
    n_rows = jax.tree.leaves(inits)[0].shape[0]
    n_cap = x_buf.shape[0]

    def score(r: GPParams) -> Array:
        # MAP objective when fit_prior is on (log_prior is a no-op constant
        # otherwise): rows, argmax, and the polish-vs-grid comparison below
        # all rank by the SAME objective as _fit_one's loss.
        val = mll(r, x_buf, y_std_buf, mask, config)
        if config.fit_prior != "none":
            val = val + log_prior(r, dim, config)
        return val

    lane_bytes = 3 * n_cap * n_cap * jnp.dtype(y_buf.dtype).itemsize
    if n_rows * lane_bytes > _GRID_VMAP_BUDGET_BYTES:
        mlls = lax.map(score, inits)
    else:
        mlls = jax.vmap(score)(inits)
    mlls = jnp.where(jnp.isfinite(mlls), mlls, -jnp.inf)
    best = jnp.argmax(mlls)
    raw_best = jax.tree.map(lambda a: a[best], inits)
    if adam_polish:
        import dataclasses

        steps = config.fit_maxiter_warm or 10
        cfg_a = dataclasses.replace(config, fit_optimizer="adam", fit_maxiter=steps)
        n_act = jnp.maximum(jnp.sum(mask).astype(y_std_buf.dtype), 1.0)
        has_warm = config.grid_warm_start and warm_start is not None
        if config.grid_polish_both and has_warm:
            # dual polish (opt-in): polish the warm row AND the best
            # grid-only row as one vmapped pair — the warm chain keeps its
            # accumulated ARD depth while the fresh-grid polish retains an
            # escape hatch from chain-trapped local MLL optima. One extra
            # batched polish lane (~2x polish compute, MXU-batched).
            grid_best = jnp.argmax(mlls[:-1])  # best grid-only row
            seeds = jax.tree.map(
                lambda a: jnp.stack([a[grid_best], a[-1]]), inits
            )
            raw_pols, loss_pols = jax.vmap(
                lambda r: _fit_one(r, x_buf, y_std_buf, mask, cfg_a)
            )(seeds)
            loss_pols = jnp.where(jnp.isfinite(loss_pols), loss_pols, jnp.inf)
            pbest = jnp.argmin(loss_pols)
            raw_pol = jax.tree.map(lambda a: a[pbest], raw_pols)
            loss_pol = loss_pols[pbest]
        else:
            raw_pol, loss_pol = _fit_one(raw_best, x_buf, y_std_buf, mask, cfg_a)
        better = jnp.isfinite(loss_pol) & (loss_pol < -mlls[best] / n_act)
        raw_best = jax.tree.map(
            lambda p, g: jnp.where(better, p, g), raw_pol, raw_best
        )
    return make_gp_state(x_buf, y_buf, mask, raw_best, config)


def fit_gp(
    key: Array,
    x_buf: Array,
    y_buf: Array,
    mask: Array,
    config: GPConfig,
    warm_start: Optional[GPParams] = None,
) -> GPState:
    """Standardize y, run ``fit_restarts`` vmapped optimizer restarts, keep
    the best-MLL hypers [B:5 "multi-restart ... vmap across a chip"], and
    cache the posterior factorization.

    Restart 0 is the warm start (previous iteration's hypers [R]) when
    given, else the reference-parity defaults; the rest are random inits.
    Warm-started fits optionally use the smaller ``fit_maxiter_warm``
    iteration budget (reference refit practice [R]).
    """
    if config.fit_optimizer in ("grid", "grid+adam"):
        return _fit_gp_grid(
            x_buf, y_buf, mask, config,
            adam_polish=config.fit_optimizer == "grid+adam", warm_start=warm_start,
        )
    if warm_start is not None and config.fit_maxiter_warm:
        import dataclasses

        config = dataclasses.replace(config, fit_maxiter=config.fit_maxiter_warm)
    dim = x_buf.shape[-1]
    dtype = y_buf.dtype
    y_std_buf, y_mean, y_sd = T.standardize(T.warp_y(y_buf, config.y_warp), mask)

    base = warm_start if warm_start is not None else default_params(dim, config, dtype)
    # sanitize the warm start: a non-finite carry-over would poison restart
    # 0's whole trajectory AND the all-restarts-failed fallback below
    defaults = default_params(dim, config, dtype)
    base_ok = jnp.all(
        jnp.stack([jnp.all(jnp.isfinite(leaf)) for leaf in jax.tree.leaves(base)])
    )
    base = jax.tree.map(lambda b, d0: jnp.where(base_ok, b, d0), base, defaults)
    n_rand = max(config.fit_restarts - 1, 0)
    if n_rand:
        rand = sample_restart_params(key, dim, config, n_rand, dtype)
        inits = jax.tree.map(lambda b, r: jnp.concatenate([b[None], r], axis=0), base, rand)
    else:
        inits = jax.tree.map(lambda b: b[None], base)

    fitted, losses = jax.vmap(lambda r: _fit_one(r, x_buf, y_std_buf, mask, config))(inits)
    # invariant: fit_gp never returns non-finite hypers (a NaN raw would
    # poison the cached factorization, the TS draws, and — through the
    # warm-start chain — every subsequent refit). Restarts whose params or
    # loss are non-finite are excluded; if ALL restarts failed, fall back
    # to the (finite) base init.
    params_finite = jnp.stack([
        jnp.all(jnp.isfinite(leaf.reshape(leaf.shape[0], -1)), axis=1)
        for leaf in jax.tree.leaves(fitted)
    ]).all(axis=0)
    losses = jnp.where(jnp.isfinite(losses) & params_finite, losses, jnp.inf)
    best = jnp.argmin(losses)
    all_failed = ~jnp.isfinite(losses[best])
    raw_best = jax.tree.map(
        lambda a, b: jnp.where(all_failed, b, a[best]), fitted, base
    )
    return make_gp_state(x_buf, y_buf, mask, raw_best, config)


def make_gp_state(
    x_buf: Array, y_buf: Array, mask: Array, raw: GPParams, config: GPConfig
) -> GPState:
    """Factorize once for the fitted hypers and cache (chol, alpha)."""
    params = constrain_params(raw, config)
    # y_warp: the GP models w = warp_y(y) (transforms.warp_y docstring);
    # y_mean/y_std are the WARPED-scale constants, so unstandardized
    # posteriors live in warped space — order-consistent for all
    # acquisition ranking (EI incumbent is warped at the same choke point).
    y_std_buf, y_mean, y_sd = T.standardize(T.warp_y(y_buf, config.y_warp), mask)
    chol = _masked_kernel_chol(params, x_buf, mask, config, ladder=True)
    resid = jnp.where(mask, y_std_buf - params["mean"], jnp.zeros_like(y_std_buf))
    alpha = L.cho_solve(chol, resid)
    return GPState(
        x_buf=x_buf, mask=mask, params=params, raw=raw, chol=chol, alpha=alpha,
        y_mean=y_mean, y_std=y_sd,
    )


# --------------------------------------------------------------------------
# Posterior (SURVEY.md C9) — "the single most important kernel" [B:5]


_HI = jax.lax.Precision.HIGHEST
# The TPU MXU runs f32 dots in bf16 passes by default (~0.4% error). The
# posterior contractions below feed CANCELLATIONS (σ² = k** − Σv², cov =
# K** − vᵀv) whose true magnitude at deep trust-region refinement is ~1e-4
# of the operands — measured: default-precision TPU σ error (8.9e-3) larger
# than σ itself, vs 2e-5 on CPU f32; Thompson sampling then degenerates and
# TuRBO's full-budget regret triples. HIGHEST restores CPU-grade f32 at
# negligible cost (these ops are HBM/latency-bound at BO sizes).


def _posterior_chunk(
    state: GPState, xs: Array, config: GPConfig, include_noise: bool
) -> Tuple[Array, Array]:
    k_cross = L.mask_cross_matrix(
        _kernel_matrix(state.params, state.x_buf, xs, config, add_noise=False), state.mask
    )
    v = L.solve_lower(state.chol, k_cross)  # (N_max, m)
    mu_s = state.params["mean"] + jnp.matmul(k_cross.T, state.alpha, precision=_HI)
    var_s = K.kernel_diag(state.params, xs) - jnp.sum(v * v, axis=0)
    var_s = jnp.maximum(var_s, jnp.asarray(1e-12, var_s.dtype))
    if include_noise:
        var_s = var_s + state.params["noise"]
    return mu_s, var_s


def gp_posterior(
    state: GPState,
    xs: Array,
    config: GPConfig,
    include_noise: bool = False,
    chunk_size: Optional[int] = None,
    standardized: bool = False,
) -> Tuple[Array, Array]:
    """Posterior mean/variance at candidate points, batched on the MXU.

    μ* = m + K*ᵀα ; σ*² = k(x*,x*) − ‖L⁻¹K*‖²_col [B:5]. Chunked over the
    candidate axis when ``chunk_size`` divides it, bounding the live
    (N_max × chunk) working set. Returns original-y units unless
    ``standardized``.

    With ``chunk_size=None`` a chunk is auto-picked (largest divisor of m
    ≤ 1024) once the cross-matrix exceeds ``_POSTERIOR_AUTO_CHUNK_BYTES``:
    the unchunked program OOMs a 16 GiB chip at N=16384 × m=5000 (measured,
    BASELINE.md large-N section) — per-candidate results are unchanged
    (each candidate's μ/σ² reduces over its own column only).
    """
    m = xs.shape[0]
    if chunk_size is None:
        cross_bytes = state.x_buf.shape[0] * m * jnp.dtype(xs.dtype).itemsize
        if cross_bytes > _POSTERIOR_AUTO_CHUNK_BYTES:
            divs = [c for c in range(2, min(m - 1, 1024) + 1) if m % c == 0]
            if divs:
                chunk_size = divs[-1]
    if chunk_size is not None and m > chunk_size and m % chunk_size == 0:
        xs_c = xs.reshape(m // chunk_size, chunk_size, xs.shape[-1])
        mu_s, var_s = lax.map(lambda c: _posterior_chunk(state, c, config, include_noise), xs_c)
        mu_s, var_s = mu_s.reshape(m), var_s.reshape(m)
    else:
        mu_s, var_s = _posterior_chunk(state, xs, config, include_noise)
    if standardized:
        return mu_s, var_s
    return T.unstandardize(mu_s, state.y_mean, state.y_std), T.unstandardize_var(var_s, state.y_std)


def posterior_cov(
    state: GPState, xs: Array, config: GPConfig, include_noise: bool = False, standardized: bool = False
) -> Tuple[Array, Array]:
    """Joint posterior (mean, covariance) over a candidate chunk — the input
    to joint Thompson sampling (SURVEY.md C13). O(m²) memory: chunk upstream.
    """
    k_cross = L.mask_cross_matrix(
        _kernel_matrix(state.params, state.x_buf, xs, config, add_noise=False), state.mask
    )
    v = L.solve_lower(state.chol, k_cross)
    mu_s = state.params["mean"] + jnp.matmul(k_cross.T, state.alpha, precision=_HI)
    cov_s = _kernel_matrix(state.params, xs, xs, config, add_noise=False) - jnp.matmul(
        v.T, v, precision=_HI
    )
    if include_noise:
        cov_s = cov_s + state.params["noise"] * jnp.eye(xs.shape[0], dtype=cov_s.dtype)
    if standardized:
        return mu_s, cov_s
    return T.unstandardize(mu_s, state.y_mean, state.y_std), cov_s * state.y_std**2
