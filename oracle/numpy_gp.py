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
