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


# ---------------------------------------------------------------------------
# TuRBO-m oracle (SURVEY.md C18 [B:11]; VERDICT r3 task 1): the reference
# multi-trust-region algorithm in float64 numpy/scipy, independent of the
# JAX build. Mirrors turbojax.turbo_m's semantics — m independent TRs with
# one GP each, per-batch global Thompson argmin-without-replacement
# allocation across the union of candidate sets (turbo_m.global_allocate),
# per-TR success/failure counters (trust_region.tr_update), independent
# restarts — with the same trainer grid as the build's
# ``fit_optimizer="grid"`` lane (gp.grid_params: isotropic ls x noise, 15
# combos) so the comparison is matched-algorithm, matched-trainer. The JAX
# config-5 default additionally polishes ARD lengthscales (grid+adam);
# the oracle stays isotropic (an ARD Adam fit in 1-core numpy costs minutes
# per refit at n~1800 — computationally out of reach), so it anchors the
# build's *isotropic* lane directly and lower-bounds the ARD lane.

from scipy.linalg import cho_solve, cholesky, solve_triangular

from oracle.numpy_gp import _SQRT5

_TURBOM_GRID_LS = (0.1, 0.25, 0.5, 1.0, 1.9)  # = gp.grid_params ls values
_TURBOM_GRID_NOISE = (2e-4, 1e-3, 1e-2)  # = gp.grid_params noise values


class _IsoGP:
    """Isotropic-grid GP fit with the raw squared-distance matrix computed
    once and rescaled per lengthscale (the 15-combo grid then costs 15
    Cholesky factorizations, not 15 kernel builds)."""

    def __init__(self, x, y_std, ls, noise, L, alpha):
        self.x = x
        self.y_std = y_std
        self.ls = ls
        self.noise = noise
        self.L = L
        self.alpha = alpha


def _sqdist(a, b):
    """(n, m) pairwise squared distances via BLAS (|a|^2 + |b|^2 - 2ab)."""
    aa = np.sum(a * a, axis=1)[:, None]
    bb = np.sum(b * b, axis=1)[None, :]
    d2 = aa + bb - 2.0 * (a @ b.T)
    return np.maximum(d2, 0.0)


def _matern52_from_d2(d2_over_ls2):
    r = np.sqrt(d2_over_ls2)
    return (1.0 + _SQRT5 * r + (5.0 / 3.0) * d2_over_ls2) * np.exp(-_SQRT5 * r)


def _fit_grid_iso(x, y_std):
    """argmax-MLL over the gp.grid_params grid (outputscale 1 on
    standardized y, mean 0) — the build's "grid" trainer in f64 numpy."""
    n = x.shape[0]
    d2 = _sqdist(x, x)
    best = None
    best_mll = -np.inf
    eye = np.eye(n)
    for ls in _TURBOM_GRID_LS:
        k_sig = _matern52_from_d2(d2 / (ls * ls))
        for noise in _TURBOM_GRID_NOISE:
            try:
                L = cholesky(k_sig + noise * eye, lower=True)
            except np.linalg.LinAlgError:
                continue
            alpha = cho_solve((L, True), y_std)
            mll = -0.5 * (
                y_std @ alpha
                + 2.0 * np.sum(np.log(np.diag(L)))
                + n * np.log(2 * np.pi)
            )
            if mll > best_mll:
                best_mll = mll
                best = _IsoGP(x, y_std, ls, noise, L, alpha)
    assert best is not None, "all grid combos failed to factorize"
    return best


def _ts_draws_chunked(rng, gp, cands, q, y_mean, y_sd, ts_chunk):
    """(q, n_cand) joint Thompson draws in ORIGINAL y units, factorized per
    candidate chunk (exact joint law within a chunk, independent across
    chunks — the build's thompson_samples semantics, SURVEY.md §7.3.5)."""
    n_cand = cands.shape[0]
    chunk = ts_chunk if (ts_chunk and n_cand > ts_chunk) else n_cand
    d2_cross = _sqdist(gp.x, cands) / (gp.ls * gp.ls)
    k_cross = _matern52_from_d2(d2_cross)  # (n, n_cand)
    draws = np.empty((q, n_cand))
    for c0 in range(0, n_cand, chunk):
        c1 = min(c0 + chunk, n_cand)
        ks = k_cross[:, c0:c1]
        v = solve_triangular(gp.L, ks, lower=True)
        mu_std = ks.T @ gp.alpha
        cc = cands[c0:c1]
        cov = _matern52_from_d2(_sqdist(cc, cc) / (gp.ls * gp.ls)) - v.T @ v
        m_c = c1 - c0
        cov[np.diag_indices(m_c)] += 1e-6 * max(cov.diagonal().max(), 1e-12)
        l_c = np.linalg.cholesky(cov)
        z = rng.randn(q, m_c)
        draws[:, c0:c1] = y_mean + y_sd * (mu_std[None, :] + z @ l_c.T)
    return draws


def _global_allocate_np(values):
    """turbo_m.global_allocate in numpy: slot j takes the global minimum of
    draw row j over all (TR, candidate) pairs not yet chosen."""
    m, q, n_cand = values.shape
    flat = np.swapaxes(values, 0, 1).reshape(q, m * n_cand)
    taken = np.zeros(m * n_cand, bool)
    tr_idx = np.empty(q, np.int64)
    cand_idx = np.empty(q, np.int64)
    for j in range(q):
        row = np.where(taken, np.inf, flat[j])
        row = np.where(np.isfinite(row) | taken, row, np.finfo(row.dtype).max * 0.5)
        i = int(np.argmin(row))
        taken[i] = True
        tr_idx[j] = i // n_cand
        cand_idx[j] = i % n_cand
    return tr_idx, cand_idx


def run_turbom_oracle(
    fn,
    lb,
    ub,
    m=5,
    n_init=40,
    max_evals=2000,
    batch_size=10,
    n_candidates=5000,
    ts_chunk=1000,
    seed=0,
    length_init=0.8,
    length_min=0.5**7,
    length_max=1.6,
    succ_tol=3,
    fail_tol=None,
    success_eps=1e-3,
    progress=None,
):
    """Full-budget TuRBO-m in f64 numpy (config 5's reference-algorithm
    anchor). ``fn`` maps (q, d) arrays in the original box to (q,) costs.
    Each TR evaluates its own LHS(n_init) design up front (m*n_init evals),
    then ``(max_evals - m*n_init) // batch_size`` global-allocation batches
    run — the same evaluation budget the build's allocator-mediated init
    consumes. Restarting TRs re-seed with a fresh LHS(n_init), charged to
    the remaining budget. Returns (best_x, best_y, trace) with one trace
    entry per batch (global incumbent).
    """
    rng = np.random.RandomState(seed)
    lb = np.asarray(lb, np.float64)
    ub = np.asarray(ub, np.float64)
    d = len(lb)
    q = batch_size
    if fail_tol is None:
        fail_tol = max(1, math.ceil(max(4.0, d) / q))
    prob = min(20.0 / d, 1.0)

    def evaluate(x_unit):
        return np.asarray(fn(x_unit * (ub - lb) + lb), np.float64).reshape(-1)

    # per-TR state; the global incumbent is tracked monotonically (a TR
    # restart wipes its local history but never the run-level best)
    xs, ys = [], []
    length = np.full(m, length_init)
    succ = np.zeros(m, np.int64)
    fail = np.zeros(m, np.int64)
    n_evals = 0
    best_y_global = np.inf
    best_x_global = None

    def note_best(x_unit, y):
        nonlocal best_y_global, best_x_global
        j = int(np.argmin(y))
        if y[j] < best_y_global:
            best_y_global = float(y[j])
            best_x_global = x_unit[j]

    for i in range(m):
        x0 = qmc.LatinHypercube(d=d, seed=rng.randint(1 << 30)).random(n_init)
        xs.append(x0)
        ys.append(evaluate(x0))
        note_best(x0, ys[i])
        n_evals += n_init

    trace = []
    while n_evals + q <= max_evals:
        cands_all = np.empty((m, n_candidates, d))
        values = np.empty((m, q, n_candidates))
        for i in range(m):
            y_i = ys[i]
            y_mean = y_i.mean()
            y_sd = max(y_i.std(), 1e-8)
            gp = _fit_grid_iso(xs[i], (y_i - y_mean) / y_sd)

            # TR box: isotropic fit -> unit ARD weights, half-width L/2 [R]
            center = xs[i][np.argmin(y_i)]
            tr_lb = np.clip(center - length[i] / 2.0, 0.0, 1.0)
            tr_ub = np.clip(center + length[i] / 2.0, 0.0, 1.0)
            sob = qmc.Sobol(d=d, scramble=True, seed=rng.randint(1 << 30))
            pert = tr_lb + (tr_ub - tr_lb) * sob.random(n_candidates)
            mask = rng.rand(n_candidates, d) <= prob
            rows_empty = ~mask.any(axis=1)
            mask[rows_empty, rng.randint(0, d, rows_empty.sum())] = True
            cands = np.where(mask, pert, center[None, :])
            cands_all[i] = cands
            values[i] = _ts_draws_chunked(
                rng, gp, cands, q, y_mean, y_sd, ts_chunk
            )

        tr_idx, cand_idx = _global_allocate_np(values)
        x_sel = cands_all[tr_idx, cand_idx]  # (q, d)
        y_sel = evaluate(x_sel)
        note_best(x_sel, y_sel)
        n_evals += q

        for i in range(m):
            acc = tr_idx == i
            if not acc.any():
                continue  # counted=False: untouched TRs keep their state
            local_best_before = ys[i].min()
            xs[i] = np.concatenate([xs[i], x_sel[acc]])
            ys[i] = np.concatenate([ys[i], y_sel[acc]])
            improved = y_sel[acc].min() < (
                local_best_before - success_eps * abs(local_best_before)
            )
            # trust_region.tr_update transition table
            succ[i] = succ[i] + 1 if improved else 0
            fail[i] = 0 if improved else fail[i] + 1
            if succ[i] >= succ_tol:
                length[i] = min(2.0 * length[i], length_max)
                succ[i] = 0
            if fail[i] >= fail_tol:
                length[i] = 0.5 * length[i]
                fail[i] = 0

        # independent restarts [R]: a collapsed TR re-seeds from fresh LHS
        for i in range(m):
            if length[i] < length_min and n_evals + n_init <= max_evals:
                x0 = qmc.LatinHypercube(d=d, seed=rng.randint(1 << 30)).random(n_init)
                xs[i], ys[i] = x0, evaluate(x0)
                note_best(x0, ys[i])
                n_evals += n_init
                length[i], succ[i], fail[i] = length_init, 0, 0

        trace.append(best_y_global)
        if progress is not None:
            progress(len(trace), n_evals, trace[-1])

    return best_x_global * (ub - lb) + lb, best_y_global, np.asarray(trace)
