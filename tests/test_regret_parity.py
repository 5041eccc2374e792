"""Regret parity vs the independent numpy oracle BO loop
(BASELINE.md "matched simple-regret curves"; SURVEY.md C22/§4.2).

Statistical, not bit-wise: both optimizers run the same algorithm family
(LHS init, fixed-hyper RBF GP, EI over QMC candidates) from independent
seeds; parity = the turbojax runs land in the same regret regime as the
oracle runs (and both clearly beat random search)."""

import jax
import numpy as np
import pytest

from oracle.numpy_bo import run_bo_oracle
from turbojax import benchmarks as B
from turbojax import gp as G
from turbojax import transforms as T
from turbojax.bo import BOConfig, run_bo
from turbojax.config import GPConfig

SEEDS = [0, 1, 2]
MAX_EVALS = 40
N_INIT = 8


@pytest.fixture(scope="module")
def branin_regrets():
    b = B.get_benchmark("branin")
    fn_np = lambda x: np.asarray(b.fn(x))
    gcfg = GPConfig(kernel="rbf", noise_bounds=(1e-4, 0.2))
    # same fixed hypers both sides: ℓ=0.5 on the unit cube, s²=1, σ²=1e-3
    raw = G.GPParams(
        raw_lengthscale=T.unconstrain(np.full(2, 0.5), *gcfg.lengthscale_bounds),
        raw_outputscale=T.unconstrain(np.asarray(1.0), *gcfg.outputscale_bounds),
        raw_noise=T.unconstrain(np.asarray(1e-3), *gcfg.noise_bounds),
        raw_mean=np.asarray(0.0),
    )
    cfg = BOConfig(n_init=N_INIT, max_evals=MAX_EVALS, batch_size=1, acq="ei",
                   n_candidates=512, fit_every=0)

    ours, oracle = [], []
    for s in SEEDS:
        res = run_bo(jax.random.key(s), b.fn, b.lb, b.ub, cfg, gcfg, fixed_params=raw)
        ours.append(float(res.best_y) - b.optimum)
        _, _, tr = run_bo_oracle(
            fn_np, b.lb, b.ub, n_init=N_INIT, max_evals=MAX_EVALS,
            n_candidates=512, seed=s,
        )
        oracle.append(float(tr[-1]) - b.optimum)
    return np.asarray(ours), np.asarray(oracle)


def test_regret_parity_vs_oracle(branin_regrets):
    ours, oracle = branin_regrets
    # same regime: medians within a factor band (regret is heavy-tailed)
    assert np.median(ours) < 10 * max(np.median(oracle), 0.05) + 0.5
    assert np.median(oracle) < 10 * max(np.median(ours), 0.05) + 0.5


def test_both_beat_random_search(branin_regrets, rng):
    ours, oracle = branin_regrets
    b = B.get_benchmark("branin")
    lb, ub = np.asarray(b.lb), np.asarray(b.ub)
    rand_best = []
    for s in SEEDS:
        r = np.random.RandomState(100 + s)
        xs = r.rand(MAX_EVALS, 2) * (ub - lb) + lb
        rand_best.append(float(np.min(np.asarray(b.fn(xs)))) - b.optimum)
    assert np.median(ours) < np.median(rand_best)
    assert np.median(oracle) < np.median(rand_best)
