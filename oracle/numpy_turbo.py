"""Reference TuRBO-1 loop in float64 numpy (SURVEY.md C22; algorithmic
contract of C17 [R — Eriksson et al. 2019], mechanics per SURVEY.md §3.1).

Implements the same state machine as ``turbojax.trust_region`` with
numpy/scipy only: LHS init, per-iteration GP fit (here: fixed, coarse-grid
MLL selection — the oracle trades fit sophistication for independence),
lengthscale-weighted TR box, Sobol+perturbation candidates, joint Thompson
sampling, success/failure counters, restarts. Used by the regret-parity
tests as an independent same-algorithm baseline.
"""

from __future__ import annotations

import math

import numpy as np
from scipy.stats import qmc

from oracle.numpy_gp import NumpyGP


def _fit_gp_grid(x_unit, y_std, kernel="matern52"):
    """Coarse MLL grid search over isotropic lengthscale/noise — a simple,
    dependency-free stand-in for the reference's trainer."""
    best, best_mll = None, -np.inf
    for ls in (0.1, 0.25, 0.5, 1.0, 2.0):
        for noise in (1e-4, 1e-3, 1e-2):
            gp = NumpyGP(kernel, np.full(x_unit.shape[1], ls), 1.0, noise).fit(x_unit, y_std)
            m = gp.mll()
            if m > best_mll:
                best, best_mll = gp, m
    return best


def run_turbo1_oracle(
    fn,
    lb,
    ub,
    n_init=10,
    max_evals=100,
    batch_size=5,
    n_candidates=200,
    seed=0,
    length_init=0.8,
    length_min=0.5**7,
    length_max=1.6,
    succ_tol=3,
):
    rng = np.random.RandomState(seed)
    lb = np.asarray(lb, np.float64)
    ub = np.asarray(ub, np.float64)
    d = len(lb)
    fail_tol = max(1, math.ceil(max(4.0, d) / batch_size))

    best_x_global, best_y_global = None, np.inf
    trace = []
    n_evals = 0

    while n_evals < max_evals:
        # (re)start a fresh trust region [R]
        x_unit = qmc.LatinHypercube(d=d, seed=rng.randint(1 << 30)).random(n_init)
        y = np.asarray(fn(x_unit * (ub - lb) + lb), np.float64)
        n_evals += n_init
        length, succ, fail = length_init, 0, 0

        while length >= length_min and n_evals < max_evals:
            best_local = y.min()
            if best_local < best_y_global:
                best_y_global = best_local
                best_x_global = x_unit[np.argmin(y)]
            trace.append(best_y_global)

            y_mean, y_sd = y.mean(), max(y.std(), 1e-8)
            gp = _fit_gp_grid(x_unit, (y - y_mean) / y_sd)

            # TR box with lengthscale weights [R]
            ls = gp.lengthscale
            w = ls / ls.mean()
            w = w / np.prod(w) ** (1.0 / d)
            center = x_unit[np.argmin(y)]
            tr_lb = np.clip(center - w * length / 2, 0, 1)
            tr_ub = np.clip(center + w * length / 2, 0, 1)

            sob = qmc.Sobol(d=d, scramble=True, seed=rng.randint(1 << 30))
            pert = tr_lb + (tr_ub - tr_lb) * sob.random(n_candidates)
            prob = min(20.0 / d, 1.0)
            mask = rng.rand(n_candidates, d) <= prob
            rows_empty = ~mask.any(axis=1)
            mask[rows_empty, rng.randint(0, d, rows_empty.sum())] = True
            cands = np.where(mask, pert, center[None, :])

            # joint Thompson sampling, q-batch argmin without replacement
            mu, cov = gp.posterior_cov(cands)
            cov[np.diag_indices(n_candidates)] += 1e-6 * max(cov.diagonal().max(), 1e-12)
            l_c = np.linalg.cholesky(cov)
            draws = mu[None] + rng.randn(batch_size, n_candidates) @ l_c.T
            taken = np.zeros(n_candidates, bool)
            sel = []
            for j in range(batch_size):
                row = np.where(taken, np.inf, draws[j])
                i = int(np.argmin(row))
                taken[i] = True
                sel.append(i)
            x_next = cands[sel]
            y_next = np.asarray(fn(x_next * (ub - lb) + lb), np.float64)
            n_evals += batch_size

            # counters [R]
            if y_next.min() < best_local - 1e-3 * abs(best_local):
                succ, fail = succ + 1, 0
            else:
                succ, fail = 0, fail + 1
            if succ >= succ_tol:
                length, succ = min(2 * length, length_max), 0
            if fail >= fail_tol:
                length, fail = length / 2, 0

            x_unit = np.concatenate([x_unit, x_next])
            y = np.concatenate([y, y_next])

    best_local = y.min()
    if best_local < best_y_global:
        best_y_global = best_local
        best_x_global = x_unit[np.argmin(y)]
    trace.append(best_y_global)
    return best_x_global * (ub - lb) + lb, best_y_global, np.asarray(trace)
