"""Float64 numpy GP oracle for numerical parity (SURVEY.md C22).

This is the build's stand-in for the reference implementation
(GPyTorch/sklearn on CPU BLAS [B:5]): a hand-rolled, dense, float64 exact
GP — kernel matrices, jittered Cholesky, triangular solves, MLL, posterior,
EI/UCB closed forms — written with scipy/numpy only, deliberately
independent of the JAX code it validates. The parity contract is rtol 1e-5
on posterior mean/variance [B:5], checked in tests/test_gp.py; sklearn's
``GaussianProcessRegressor`` provides a second, third-party cross-check.

It is also the CPU-reference timing baseline for BASELINE.md's ≥10×
wall-clock target (benchmarks/bench_iteration.py).
"""

from __future__ import annotations

import numpy as np
from scipy.linalg import cho_solve, cholesky, solve_triangular
from scipy.stats import norm

_SQRT3 = np.sqrt(3.0)
_SQRT5 = np.sqrt(5.0)


def pairwise_sqdist(x1: np.ndarray, x2: np.ndarray) -> np.ndarray:
    d = x1[:, None, :] - x2[None, :, :]
    return np.sum(d * d, axis=-1)


def kernel_matrix(name: str, x1, x2, lengthscale, outputscale) -> np.ndarray:
    z1 = x1 / lengthscale
    z2 = x2 / lengthscale
    d2 = pairwise_sqdist(z1, z2)
    r = np.sqrt(np.maximum(d2, 0.0))
    if name == "rbf":
        return outputscale * np.exp(-0.5 * d2)
    if name == "matern12":
        return outputscale * np.exp(-r)
    if name == "matern32":
        return outputscale * (1 + _SQRT3 * r) * np.exp(-_SQRT3 * r)
    if name == "matern52":
        return outputscale * (1 + _SQRT5 * r + (5.0 / 3.0) * d2) * np.exp(-_SQRT5 * r)
    raise ValueError(name)


class NumpyGP:
    """Exact float64 GP: fit stores the Cholesky; posterior/MLL are dense."""

    def __init__(self, kernel="matern52", lengthscale=0.5, outputscale=1.0, noise=1e-4, mean=0.0, jitter=0.0):
        self.kernel = kernel
        self.lengthscale = np.atleast_1d(np.asarray(lengthscale, np.float64))
        self.outputscale = float(outputscale)
        self.noise = float(noise)
        self.mean = float(mean)
        self.jitter = float(jitter)

    def fit(self, x: np.ndarray, y: np.ndarray) -> "NumpyGP":
        self.x = np.asarray(x, np.float64)
        self.y = np.asarray(y, np.float64)
        n = len(self.x)
        k = kernel_matrix(self.kernel, self.x, self.x, self.lengthscale, self.outputscale)
        k[np.diag_indices(n)] += self.noise
        if self.jitter:
            k[np.diag_indices(n)] += self.jitter * np.mean(np.diag(k))
        self.L = cholesky(k, lower=True)
        self.alpha = cho_solve((self.L, True), self.y - self.mean)
        return self

    def posterior(self, xs: np.ndarray, include_noise: bool = False):
        xs = np.asarray(xs, np.float64)
        ks = kernel_matrix(self.kernel, self.x, xs, self.lengthscale, self.outputscale)
        v = solve_triangular(self.L, ks, lower=True)
        mu = self.mean + ks.T @ self.alpha
        var = self.outputscale - np.sum(v * v, axis=0)
        if include_noise:
            var = var + self.noise
        return mu, np.maximum(var, 0.0)

    def posterior_cov(self, xs: np.ndarray):
        xs = np.asarray(xs, np.float64)
        ks = kernel_matrix(self.kernel, self.x, xs, self.lengthscale, self.outputscale)
        v = solve_triangular(self.L, ks, lower=True)
        mu = self.mean + ks.T @ self.alpha
        cov = kernel_matrix(self.kernel, xs, xs, self.lengthscale, self.outputscale) - v.T @ v
        return mu, cov

    def mll(self) -> float:
        n = len(self.y)
        resid = self.y - self.mean
        quad = resid @ self.alpha
        logdet = 2.0 * np.sum(np.log(np.diag(self.L)))
        return float(-0.5 * (quad + logdet + n * np.log(2 * np.pi)))


def expected_improvement(mu, var, best, xi=0.0):
    """Closed-form EI (minimization), scipy-based — oracle for C11."""
    sigma = np.sqrt(var)
    imp = best - mu - xi
    with np.errstate(divide="ignore", invalid="ignore"):
        z = np.where(sigma > 0, imp / sigma, 0.0)
        ei = imp * norm.cdf(z) + sigma * norm.pdf(z)
    return np.where(sigma > 1e-12, ei, np.maximum(imp, 0.0))


def lower_confidence_bound(mu, var, kappa=2.0):
    return mu - kappa * np.sqrt(var)


# ---------------------------------------------------------------------------
# Hyperparameter fit oracle (SURVEY.md C7 reference lane): multi-restart
# scipy L-BFGS-B on the analytic-gradient MLL — the reference stack's way of
# doing the same job (GPyTorch autograd + L-BFGS / scipy L-BFGS-B [B:5, B:8]).
# This is the CPU baseline lane for BENCH's mll_fit / iteration_with_refit
# rows; numerical finite differences would be unfairly slow, so the gradient
# is the standard closed form  dMLL/dθ = ½ tr((ααᵀ − K⁻¹) ∂K/∂θ).

_SQRT5_ = _SQRT5


def _kernel_sig_and_dr2(name: str, d2: np.ndarray, outputscale: float):
    """Signal kernel matrix s²k̃(r) and dK/d(r²) for the supported kernels."""
    r = np.sqrt(np.maximum(d2, 0.0))
    if name == "rbf":
        k_sig = outputscale * np.exp(-0.5 * d2)
        return k_sig, -0.5 * k_sig
    if name == "matern32":
        e = np.exp(-_SQRT3 * r)
        return outputscale * (1 + _SQRT3 * r) * e, -1.5 * outputscale * e
    if name == "matern52":
        e = np.exp(-_SQRT5 * r)
        k_sig = outputscale * (1 + _SQRT5 * r + (5.0 / 3.0) * d2) * e
        return k_sig, -(5.0 / 6.0) * outputscale * (1 + _SQRT5 * r) * e
    if name == "matern12":
        k_sig = outputscale * np.exp(-r)
        # dk/d(r²) = −k/(2r); singular at r=0 but always multiplied by
        # ∂r²/∂θ which vanishes there — guard and zero.
        safe_r = np.maximum(r, 1e-12)
        return k_sig, np.where(r > 0, -k_sig / (2.0 * safe_r), 0.0)
    raise ValueError(name)


def neg_mll_value_and_grad(theta: np.ndarray, x: np.ndarray, y: np.ndarray, kernel: str):
    """−MLL and its gradient w.r.t. θ = [log ℓ₁..log ℓ_d, log s², log σ²].

    One Cholesky + one explicit K⁻¹ per call (the same O(n³) work the
    reference's autograd backward pays).
    """
    n, d = x.shape
    log_ls, log_s2, log_n2 = theta[:d], theta[d], theta[d + 1]
    ls = np.exp(log_ls)
    s2 = np.exp(log_s2)
    n2 = np.exp(log_n2)

    z = x / ls
    d2 = pairwise_sqdist(z, z)
    k_sig, dk_dr2 = _kernel_sig_and_dr2(kernel, d2, s2)
    k = k_sig + n2 * np.eye(n)

    L = cholesky(k, lower=True)
    alpha = cho_solve((L, True), y)
    k_inv = cho_solve((L, True), np.eye(n))
    neg_mll = 0.5 * (y @ alpha + 2.0 * np.sum(np.log(np.diag(L))) + n * np.log(2 * np.pi))

    outer_minus_inv = np.outer(alpha, alpha) - k_inv  # (ααᵀ − K⁻¹)
    grad = np.empty(d + 2)
    m = dk_dr2 * outer_minus_inv
    for i in range(d):
        diff = x[:, i : i + 1] - x[None, :, i]
        s_i = (diff * diff) / (ls[i] * ls[i])  # scaled sqdist along dim i
        grad[i] = np.sum(m * s_i)  # dMLL/dlogℓ = −Σ m∘s; negated for −MLL
    grad[d] = -0.5 * np.sum(outer_minus_inv * k_sig)
    grad[d + 1] = -0.5 * n2 * (alpha @ alpha - np.trace(k_inv))
    return neg_mll, grad


def fit_mll_lbfgs(
    x: np.ndarray,
    y: np.ndarray,
    kernel: str = "matern52",
    n_restarts: int = 4,
    maxiter: int = 30,
    lengthscale_bounds=(0.005, 2.0),
    outputscale_bounds=(0.05, 20.0),
    noise_bounds=(1e-4, 0.2),
    seed: int = 0,
):
    """Multi-restart L-BFGS-B MLL maximization (reference train_gp oracle,
    SURVEY.md §3.2). y is standardized internally (as the build's fit_gp
    does). Returns (params dict, best −MLL, total fn evals)."""
    from scipy.optimize import minimize

    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    y_std = (y - y.mean()) / max(y.std(), 1e-8)
    n, d = x.shape
    rng = np.random.RandomState(seed)

    bounds = (
        [tuple(np.log(lengthscale_bounds))] * d
        + [tuple(np.log(outputscale_bounds))]
        + [tuple(np.log(noise_bounds))]
    )
    # restart 0: reference defaults (ℓ=0.5, s²=1, σ²=1e-3); rest log-uniform
    # over the interior box (mirrors gp.sample_restart_params)
    inits = [np.concatenate([np.log(np.full(d, 0.5)), [0.0], [np.log(1e-3)]])]
    for _ in range(n_restarts - 1):
        ls0 = np.exp(rng.uniform(np.log(0.05 * 1.5), np.log(2.0 / 1.5), d))
        s0 = np.exp(rng.uniform(np.log(0.2 * 1.5), np.log(5.0 / 1.5)))
        e0 = np.exp(rng.uniform(np.log(1e-4 * 1.5), np.log(1e-1 / 1.5)))
        inits.append(np.concatenate([np.log(ls0), [np.log(s0)], [np.log(e0)]]))

    best_val, best_theta, nfev = np.inf, inits[0], 0
    for theta0 in inits:
        res = minimize(
            neg_mll_value_and_grad,
            theta0,
            args=(x, y_std, kernel),
            jac=True,
            method="L-BFGS-B",
            bounds=bounds,
            options={"maxiter": maxiter},
        )
        nfev += res.nfev
        if res.fun < best_val:
            best_val, best_theta = res.fun, res.x
    return (
        {
            "lengthscale": np.exp(best_theta[:d]),
            "outputscale": float(np.exp(best_theta[d])),
            "noise": float(np.exp(best_theta[d + 1])),
        },
        float(best_val),
        nfev,
    )


def incremental_chol_append(L: np.ndarray, k_vec: np.ndarray, k_nn: float) -> np.ndarray:
    """Dense incremental Cholesky append (oracle for C5)."""
    n = L.shape[0]
    b = solve_triangular(L, k_vec, lower=True)
    d = np.sqrt(k_nn - b @ b)
    out = np.zeros((n + 1, n + 1))
    out[:n, :n] = L
    out[n, :n] = b
    out[n, n] = d
    return out
