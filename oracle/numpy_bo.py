"""Reference BO loop in float64 numpy (SURVEY.md C22, §4.2 regret parity).

This mirrors the reference's plain BO behavior (call stack SURVEY.md §3.5):
Latin-hypercube init, fixed-hyperparameter RBF GP, EI maximized over a
quasi-random candidate set, one observation per iteration — implemented
entirely with numpy/scipy so it is an independent oracle for the
"matched simple-regret curves" target [B:5].
"""

from __future__ import annotations

import numpy as np
from scipy.stats import qmc

from oracle.numpy_gp import NumpyGP, expected_improvement


def run_bo_oracle(
    fn,
    lb: np.ndarray,
    ub: np.ndarray,
    n_init: int = 10,
    max_evals: int = 60,
    n_candidates: int = 2000,
    lengthscale: float = 0.5,
    outputscale: float = 1.0,
    noise: float = 1e-3,
    seed: int = 0,
):
    """Returns (X, y, incumbent_trace) in original units; minimization."""
    rng = np.random.RandomState(seed)
    lb = np.asarray(lb, np.float64)
    ub = np.asarray(ub, np.float64)
    d = len(lb)

    x_unit = qmc.LatinHypercube(d=d, seed=seed).random(n_init)
    xs = [x_unit * (ub - lb) + lb]
    ys = [np.asarray(fn(xs[0]), np.float64)]
    trace = []

    sobol = qmc.Sobol(d=d, scramble=True, seed=seed)
    for _ in range(max_evals - n_init):
        x_all = np.concatenate(xs)
        y_all = np.concatenate(ys)
        trace.append(y_all.min())
        y_mean, y_std = y_all.mean(), max(y_all.std(), 1e-8)
        gp = NumpyGP("rbf", np.full(d, lengthscale), outputscale, noise).fit(
            (x_all - lb) / (ub - lb), (y_all - y_mean) / y_std
        )
        cands = sobol.random(n_candidates)
        mu, var = gp.posterior(cands)
        best_std = (y_all.min() - y_mean) / y_std
        ei = expected_improvement(mu, var, best_std)
        x_next_unit = cands[int(np.argmax(ei))]
        x_next = x_next_unit * (ub - lb) + lb
        xs.append(x_next[None])
        ys.append(np.asarray(fn(x_next[None]), np.float64))
    y_all = np.concatenate(ys)
    trace.append(y_all.min())
    return np.concatenate(xs), y_all, np.asarray(trace)
