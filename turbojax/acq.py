"""Acquisition functions: EI, UCB/LCB, batched Thompson sampling
(SURVEY.md C11–C14, [B:5, B:9]).

Reference capability: closed-form EI and UCB over the GP posterior, and
joint-posterior Thompson sampling with q-batch argmin-without-replacement
selection over candidate sets of thousands of points.

TPU-native design: every acquisition is an elementwise epilogue on the
batched posterior kernel (``gp.gp_posterior``) — XLA fuses it into the
posterior matmuls. Thompson sampling factorizes the joint posterior
covariance over candidate **chunks** (block-diagonal across chunks,
SURVEY.md §7.3.5 — joint chol over all 5k candidates would be 40 GFLOP per
draw) and does the q-selection as a fixed-length masked scan. The whole
suggest step compiles to one fused device program [B:5].

Convention: the framework **minimizes**. EI is improvement below the
incumbent; LCB = μ − κσ is minimized.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from turbojax import gp as G
from turbojax import linalg as L
from turbojax.config import GPConfig

Array = jax.Array

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _norm_pdf(z: Array) -> Array:
    return _INV_SQRT_2PI * jnp.exp(-0.5 * z * z)


def _norm_cdf(z: Array) -> Array:
    return 0.5 * (1.0 + lax.erf(z * _INV_SQRT2))


def expected_improvement(mu: Array, var: Array, best: Array, xi: float = 0.0) -> Array:
    """EI for minimization: (f*−μ−ξ)Φ(z) + σφ(z), z=(f*−μ−ξ)/σ [B:5, B:7].

    σ→0 is handled by the exact limit max(f*−μ−ξ, 0) (SURVEY.md C11's
    "numerically-safe σ→0 branch")."""
    sigma = jnp.sqrt(var)
    imp = best - mu - xi
    tiny = jnp.asarray(1e-12, sigma.dtype)
    z = imp / jnp.maximum(sigma, tiny)
    ei = imp * _norm_cdf(z) + sigma * _norm_pdf(z)
    return jnp.where(sigma > tiny, ei, jnp.maximum(imp, 0.0))


def lower_confidence_bound(mu: Array, var: Array, kappa: float = 2.0) -> Array:
    """LCB = μ − κσ; minimize it (reference UCB in minimization form [B:5])."""
    return mu - kappa * jnp.sqrt(var)


def upper_confidence_bound(mu: Array, var: Array, kappa: float = 2.0) -> Array:
    """UCB = μ + κσ for maximization callers."""
    return mu + kappa * jnp.sqrt(var)


# --------------------------------------------------------------------------
# Thompson sampling (SURVEY.md C13)


#: Escalating absolute-floor rungs for the TS-covariance factorization, in
#: units of outputscale·y_std² (the magnitude of the standardized-covariance
#: OPERANDS). The f32 assembly of cov = k** − vᵀv is a catastrophic
#: cancellation whose absolute error stays O(√n·eps·operand) no matter how
#: small the posterior covariance itself gets at deep trust-region
#: refinement — measured λ_min(cov_f32 − cov_ref) ≈ −7e-6·scale on CPU and
#: −4e-5·scale on TPU (XLA's chol/trsm expansions run their internal dots
#: at reduced MXU precision; benchmarks/exp_ts_numerics.py). The round-2
#: bump of 1e-6·max(diag cov) was ~1000× below that floor at deep
#: refinement: the factorization silently went NaN ON BOTH BACKENDS and
#: q-batch selection degenerated to first-NaN-index garbage — the isolated
#: cause of the config-4 TPU regret gap (VERDICT r2 #1).
_TS_EPS_RUNGS = (3e-5, 3e-4, 3e-3)
#: f64 path: the cancellation floor is ~1e-14·scale, so the first rung can
#: sit 9 orders lower without risking the factorization — the exact-law
#: sampler should not pay the f32 ladder's noise floor
_TS_EPS_RUNGS_F64 = (1e-9, 3e-5, 3e-3)


def _robust_cov_chol(cov: Array, scale_abs: Array) -> Array:
    """Cholesky of the TS covariance with an escalating error-floor bump.

    Rung i adds ``1e-6·max(diag) + rungs[i]·scale_abs`` (rungs picked per
    dtype); the next rung is attempted only if the factor comes back
    non-finite (lax.cond — one factorization in the common case; under
    TuRBO-m's vmapped per-TR sampler the cond computes all rungs, ~2
    extra sub-ms chols)."""
    rungs = _TS_EPS_RUNGS_F64 if cov.dtype == jnp.float64 else _TS_EPS_RUNGS
    eye = jnp.eye(cov.shape[0], dtype=cov.dtype)
    cmax = jnp.maximum(jnp.max(jnp.diagonal(cov)), 1e-12)

    def attempt(i: int) -> Array:
        bump = 1e-6 * cmax + jnp.asarray(rungs[i], cov.dtype) * scale_abs
        l_cov = jnp.linalg.cholesky(cov + bump * eye)
        if i == len(rungs) - 1:
            return l_cov
        return lax.cond(
            jnp.all(jnp.isfinite(l_cov)), lambda: l_cov, lambda: attempt(i + 1)
        )

    return attempt(0)


def _state_f64(state: G.GPState, config: GPConfig) -> G.GPState:
    """Rebuild the posterior cache in float64 from an f32 fitted state
    (``ts_dtype="float64"``): cast buffers/hypers, refactorize K+σ²I, and
    recover the standardized residual from the cached solve (r = L Lᵀ α —
    an f32-accuracy r only perturbs the posterior MEAN at ~1e-7·y, while
    the covariance, which is what deep-refinement TS quality rides on,
    depends only on X and the hypers and becomes fully f64)."""
    f64 = jnp.float64
    x64 = state.x_buf.astype(f64)
    raw64 = jax.tree.map(lambda a: a.astype(f64), state.raw)
    params64 = G.constrain_params(raw64, config)
    chol64 = G._masked_kernel_chol(params64, x64, state.mask, config)
    resid = jnp.matmul(
        state.chol,
        jnp.matmul(state.chol.T, state.alpha, precision=jax.lax.Precision.HIGHEST),
        precision=jax.lax.Precision.HIGHEST,
    )  # factorization path: never a plain @ (docs/DESIGN.md §2b)
    resid64 = jnp.where(state.mask, resid.astype(f64), 0.0)
    alpha64 = L.cho_solve(chol64, resid64)
    return G.GPState(
        x_buf=x64, mask=state.mask, params=params64, raw=raw64, chol=chol64,
        alpha=alpha64, y_mean=state.y_mean.astype(f64), y_std=state.y_std.astype(f64),
    )


def thompson_samples(
    key: Array,
    state: G.GPState,
    xs: Array,
    q: int,
    config: GPConfig,
    chunk_size: Optional[int] = None,
    dtype: Optional[str] = None,
) -> Array:
    """Draw ``q`` joint posterior sample rows over the candidate set.

    Returns (q, n_cand) function-value draws in original y units. Joint
    covariance is factorized per chunk of the candidate axis (exact joint
    law within a chunk, independent across chunks — SURVEY.md §7.3.5).

    ``dtype="float64"`` computes the posterior covariance, its factor, and
    the draws in f64 (state refactorized once per call): at deep
    trust-region refinement the f32 covariance error floor exceeds the
    covariance itself, and the f64 path measurably restores the exact
    selection law (benchmarks/exp_ts_numerics.py). Cost: one f64
    factorization + solve per call (~50× the f32 rate on TPU — opt in
    where quality matters more than acquisition latency)."""
    m = xs.shape[0]
    out_dtype = xs.dtype
    if dtype == "float64":
        if not jax.config.jax_enable_x64:
            raise ValueError(
                'ts_dtype="float64" requires jax_enable_x64 '
                "(jax.config.update('jax_enable_x64', True))"
            )
        state = _state_f64(state, config)
        xs = xs.astype(jnp.float64)
    scale_abs = (state.params["outputscale"] * state.y_std**2).astype(xs.dtype)

    def sample_chunk(k: Array, chunk: Array) -> Array:
        mu, cov = G.posterior_cov(state, chunk, config)
        l_cov = _robust_cov_chol(cov, scale_abs)
        z = jax.random.normal(k, (q, chunk.shape[0]), dtype=cov.dtype)
        draws = mu[None, :] + jnp.matmul(z, l_cov.T, precision=jax.lax.Precision.HIGHEST)
        return draws.astype(out_dtype)

    if chunk_size is not None and m > chunk_size and m % chunk_size == 0:
        n_chunks = m // chunk_size
        xs_c = xs.reshape(n_chunks, chunk_size, xs.shape[-1])
        keys = jax.random.split(key, n_chunks)
        draws = lax.map(lambda kc: sample_chunk(kc[0], kc[1]), (keys, xs_c))  # (n_chunks, q, chunk)
        return jnp.moveaxis(draws, 0, 1).reshape(q, m)
    return sample_chunk(key, xs)


def select_q_batch(samples: Array, valid: Optional[Array] = None) -> Tuple[Array, Array]:
    """q-batch argmin-without-replacement: sample row j picks the best
    not-yet-chosen candidate (reference TS batch selection [R, B:9]).

    Args:
      samples: (q, m) Thompson draws.
      valid: optional (m,) mask of selectable candidates.

    Returns (indices (q,), values (q,)).
    """
    q, m = samples.shape
    big = jnp.asarray(jnp.finfo(samples.dtype).max, samples.dtype)
    taken0 = jnp.zeros((m,), jnp.bool_) if valid is None else ~valid

    def step(taken, row):
        # NaN/+inf-proof: a degenerate draw (failed covariance factor)
        # must never be selectable — jnp.argmin would otherwise return
        # the first NaN index, silently turning the q-batch into
        # deterministic garbage (the round-2 deep-refinement failure mode)
        masked = jnp.where(taken | ~jnp.isfinite(row), big, row)
        idx = jnp.argmin(masked)
        return taken.at[idx].set(True), (idx, masked[idx])

    _, (idxs, vals) = lax.scan(step, taken0, samples)
    return idxs, vals


def thompson_select(
    key: Array,
    state: G.GPState,
    xs: Array,
    q: int,
    config: GPConfig,
    chunk_size: Optional[int] = None,
    dtype: Optional[str] = None,
) -> Tuple[Array, Array]:
    """Full batched-TS acquisition: draw, then select q points [B:9]."""
    samples = thompson_samples(key, state, xs, q, config, chunk_size, dtype)
    idxs, vals = select_q_batch(samples)
    return xs[idxs], vals


# --------------------------------------------------------------------------
# Random-Fourier-feature (weight-space) Thompson sampling — the optional
# cheaper sampler of SURVEY.md C13, off by default for reference parity.
#
# f(x) ≈ φ(x)ᵀw with φ(x) = sqrt(2 s²/M) cos(Ωx + b), Ω drawn from the
# kernel's spectral density (Rahimi & Recht 2007); conditioning w on the
# data is Bayesian linear regression, so one M×M factorization yields
# *globally joint* sample paths — no per-chunk block-diagonal approximation,
# and O(M²) instead of O(n_cand²) — at the cost of the feature-truncation
# approximation (M features).


def rff_frequencies(
    key: Array, dim: int, n_features: int, kernel: str, dtype=jnp.float32
) -> Tuple[Array, Array]:
    """Spectral frequencies Ω (M, d) for unit lengthscale + phases b (M,).

    RBF: Ω ~ N(0, I). Matérn-ν: Ω ~ multivariate-t with 2ν dof
    (Ω = Z·sqrt(ν/Gamma(ν)) row-wise)."""
    kw, kb, kg = jax.random.split(key, 3)
    z = jax.random.normal(kw, (n_features, dim), dtype)
    if kernel == "rbf":
        omega = z
    elif kernel in ("matern12", "matern32", "matern52"):
        nu = {"matern12": 0.5, "matern32": 1.5, "matern52": 2.5}[kernel]
        g = jax.random.gamma(kg, nu, (n_features, 1), dtype)
        omega = z * jnp.sqrt(nu / jnp.maximum(g, 1e-12))
    else:
        raise ValueError(f"no spectral density for kernel {kernel!r}")
    b = jax.random.uniform(kb, (n_features,), dtype, 0.0, 2.0 * jnp.pi)
    return omega, b


def _rff_phi(x: Array, omega: Array, b: Array, lengthscale: Array, outputscale: Array) -> Array:
    """(n, M) feature map; the Ω x product is one MXU matmul."""
    m = omega.shape[0]
    proj = (x / lengthscale) @ omega.T + b[None, :]
    return jnp.sqrt(2.0 * outputscale / m) * jnp.cos(proj)


def rff_paths(
    key: Array,
    state: G.GPState,
    xs: Array,
    n_paths: int,
    config: GPConfig,
    n_features: int = 1024,
) -> Array:
    """Draw ``n_paths`` *globally joint* posterior sample paths at ``xs``
    via weight-space conditioning (original y units, (n_paths, n_cand)).

    Known failure mode — **variance starvation**: with M features the prior
    is a rank-M degenerate GP, so when the active data size n approaches M
    (or candidates sit far outside the data span) the sampled paths
    under-disperse relative to the exact posterior. Characterized in
    tests/test_acq.py::test_rff_variance_starvation_characterization; keep
    M ≳ 4·n when enabling ``ts_sampler="rff"``."""
    kf, kw = jax.random.split(key)
    p = state.params
    dim = xs.shape[-1]
    omega, b = rff_frequencies(kf, dim, n_features, config.kernel, xs.dtype)
    ls = jnp.broadcast_to(p["lengthscale"], (dim,))

    phi_x = _rff_phi(state.x_buf, omega, b, ls, p["outputscale"])  # (N_max, M)
    phi_x = jnp.where(state.mask[:, None], phi_x, 0.0)
    noise = p["noise"]
    # A = ΦᵀΦ/σ² + I ;  w | y ~ N(A⁻¹ Φᵀ r / σ², A⁻¹), r = y_std − mean
    a_mat = jnp.matmul(phi_x.T, phi_x, precision=jax.lax.Precision.HIGHEST) / noise + jnp.eye(n_features, dtype=xs.dtype)
    chol_a = jnp.linalg.cholesky(a_mat)
    # recover the standardized residual from the cached solve: r = L Lᵀ α
    resid = jnp.matmul(
        state.chol,
        jnp.matmul(state.chol.T, state.alpha, precision=jax.lax.Precision.HIGHEST),
        precision=jax.lax.Precision.HIGHEST,
    )  # factorization path: never a plain @ (docs/DESIGN.md §2b)
    resid = jnp.where(state.mask, resid, 0.0)
    mean_w = L.cho_solve(chol_a, phi_x.T @ resid / noise)
    z = jax.random.normal(kw, (n_paths, n_features), xs.dtype)
    w = mean_w[None, :] + jax.scipy.linalg.solve_triangular(
        chol_a, z.T, lower=True, trans=1
    ).T  # (n_paths, M): mean + A^{-1/2} z via L⁻ᵀ z

    phi_c = _rff_phi(xs, omega, b, ls, p["outputscale"])  # (n_cand, M)
    draws_std = p["mean"] + w @ phi_c.T  # (n_paths, n_cand)
    return draws_std * state.y_std + state.y_mean


def pathwise_paths(
    key: Array,
    state: G.GPState,
    xs: Array,
    n_paths: int,
    config: GPConfig,
    n_features: int = 1024,
) -> Array:
    """Decoupled pathwise posterior sampling (Matheron's rule): globally
    joint draws at ``xs`` with the **exact** data update,

        f_post(x*) = φ(x*)ᵀw  +  k(x*, X) (K + σ²I)⁻¹ (r − φ(X)ᵀw − ε),

    w ~ N(0, I_M) a weight-space *prior* path, ε ~ N(0, σ²I) (Wilson et al.
    2020, "Efficiently Sampling Functions from Gaussian Process
    Posteriors"). Returns (n_paths, n_cand) draws in original y units.

    Why this third sampler exists (SURVEY.md C13):
      * vs the exact chunked sampler (``thompson_samples``): one coherent
        path across ALL candidates — no block-diagonal independence across
        chunks — and no n_chunk × chunk² covariance factorizations: the
        whole draw is MXU matmuls + one triangular solve against the
        CACHED training factor.
      * vs weight-space RFF (``rff_paths``): the data conditioning is exact
        (uses K itself, not φφᵀ), so there is **no variance starvation** —
        the M-feature truncation only perturbs the prior path, an O(1/√M)
        error uniform in n (verified in
        tests/test_acq.py::test_pathwise_no_variance_starvation).
    """
    kf, kw, ke = jax.random.split(key, 3)
    p = state.params
    dim = xs.shape[-1]
    omega, b = rff_frequencies(kf, dim, n_features, config.kernel, xs.dtype)
    ls = jnp.broadcast_to(p["lengthscale"], (dim,))

    # prior paths at the training inputs and the candidates
    w = jax.random.normal(kw, (n_paths, n_features), xs.dtype)
    phi_x = _rff_phi(state.x_buf, omega, b, ls, p["outputscale"])  # (N_max, M)
    phi_c = _rff_phi(xs, omega, b, ls, p["outputscale"])  # (n_cand, M)
    prior_x = w @ phi_x.T  # (n_paths, N_max)
    prior_c = w @ phi_c.T  # (n_paths, n_cand)
    eps = jnp.sqrt(p["noise"]) * jax.random.normal(ke, (n_paths, state.mask.shape[0]), xs.dtype)

    # standardized residual from the cached solve: r = L Lᵀ α
    resid = jnp.matmul(
        state.chol,
        jnp.matmul(state.chol.T, state.alpha, precision=jax.lax.Precision.HIGHEST),
        precision=jax.lax.Precision.HIGHEST,
    )  # factorization path: never a plain @ (docs/DESIGN.md §2b)
    # exact update direction u = (K+σ²I)⁻¹ (r − prior_x − ε) per path.
    # Inactive rows are zeroed; the identity-padded factor then returns
    # zero in those rows (masked-buffer invariant, SURVEY.md §7.3.1).
    rhs = jnp.where(state.mask[None, :], resid[None, :] - prior_x - eps, 0.0)
    u = L.cho_solve(state.chol, rhs.T)  # (N_max, n_paths)

    from turbojax import kernels as K

    k_cross = K.get_kernel(config.kernel)(p, xs, state.x_buf)  # (n_cand, N_max)
    k_cross = jnp.where(state.mask[None, :], k_cross, 0.0)
    update_c = jnp.matmul(k_cross, u, precision=jax.lax.Precision.HIGHEST).T
    draws_std = p["mean"] + prior_c + update_c
    return draws_std * state.y_std + state.y_mean


def pathwise_thompson_select(
    key: Array,
    state: G.GPState,
    xs: Array,
    q: int,
    config: GPConfig,
    n_features: int = 1024,
) -> Tuple[Array, Array]:
    """Pathwise TS: q decoupled posterior paths, q-batch argmin selection.
    Enable via ``ts_sampler="pathwise"`` in the loop configs."""
    draws = pathwise_paths(key, state, xs, q, config, n_features)
    idxs, vals = select_q_batch(draws)
    return xs[idxs], vals


def rff_thompson_select(
    key: Array,
    state: G.GPState,
    xs: Array,
    q: int,
    config: GPConfig,
    n_features: int = 1024,
) -> Tuple[Array, Array]:
    """Weight-space TS: condition w | data in feature space, draw q joint
    paths, select q candidates without replacement. Enable via
    ``ts_sampler="rff"`` in the loop configs (see ``rff_paths`` for the
    variance-starvation caveat that keeps it off by default)."""
    draws = rff_paths(key, state, xs, q, config, n_features)
    idxs, vals = select_q_batch(draws)
    return xs[idxs], vals
