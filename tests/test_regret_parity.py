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


def test_turbo1_regret_parity_vs_oracle():
    """Config-4 family parity (BASELINE.md secondary metric): turbojax
    TuRBO-1 lands in the same Ackley-10D regret regime as the independent
    numpy TuRBO-1 oracle at equal (reduced) budget."""
    from oracle.numpy_turbo import run_turbo1_oracle
    from turbojax.trust_region import TurboConfig, run_turbo1

    b = B.get_benchmark("ackley10")
    fn_np = lambda x: np.asarray(b.fn(x))
    gcfg = GPConfig(fit_restarts=2, fit_maxiter=20)
    cfg = TurboConfig(n_init=10, max_evals=100, batch_size=5, n_candidates=200)

    ours, oracle = [], []
    for s in [0, 1]:
        carry, _ = run_turbo1(jax.random.key(s), b.fn, b.lb, b.ub, cfg, gcfg)
        ours.append(float(carry.best_y))
        _, by, _ = run_turbo1_oracle(
            fn_np, b.lb, b.ub, n_init=10, max_evals=100, batch_size=5,
            n_candidates=200, seed=s,
        )
        oracle.append(by)
    # same regime (Ackley-10 at 100 evals: both well under random ≈ 13–15,
    # and within an additive band of each other)
    assert np.median(ours) < 13.0 and np.median(oracle) < 13.0
    assert abs(np.median(ours) - np.median(oracle)) < 6.0


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


def test_turbom_regret_parity_vs_oracle():
    """Config-5 family parity (VERDICT r3 task 1): turbojax TuRBO-m lands in
    the same Ackley-10D regret regime as the independent numpy TuRBO-m
    oracle (oracle/numpy_turbo.run_turbom_oracle) at equal reduced budget.
    The full-budget rover60/lunar60 anchor runs in the campaign
    (benchmarks/campaign_oracle_turbom.py -> BASELINE.md) and its band is
    gated in tests/test_full_budget_parity.py."""
    from oracle.numpy_turbo import run_turbom_oracle
    from turbojax.trust_region import TurboConfig
    from turbojax.turbo_m import run_turbom

    b = B.get_benchmark("ackley10")
    fn_np = lambda x: np.asarray(b.fn(x))  # noqa: E731
    gcfg = GPConfig(fit_restarts=2, fit_maxiter=20, fit_optimizer="grid")
    cfg = TurboConfig(n_init=10, max_evals=100, batch_size=5, n_candidates=200)

    ours, oracle = [], []
    for s in [0, 1]:
        carries, _ = run_turbom(
            jax.random.key(s), b.fn, b.lb, b.ub, cfg, gcfg, m=2
        )
        ours.append(float(np.min(np.asarray(carries.best_y))))
        _, by, _ = run_turbom_oracle(
            fn_np, b.lb, b.ub, m=2, n_init=10, max_evals=100, batch_size=5,
            n_candidates=200, ts_chunk=None, seed=s,
        )
        oracle.append(by)
    # same regime (both well under random ~= 13-15 at this budget, and
    # within an additive band of each other)
    assert np.median(ours) < 13.0 and np.median(oracle) < 13.0
    assert abs(np.median(ours) - np.median(oracle)) < 6.0
