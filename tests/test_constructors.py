"""Reference-style constructor API tests (SURVEY.md C21 [R]) + plotting."""

import os

import numpy as np

from turbojax import benchmarks as B
from turbojax.api import Turbo1, TurboM
from turbojax.config import GPConfig
from turbojax.plotting import plot_regret, plot_run_log

GCFG = GPConfig(fit_restarts=2, fit_maxiter=10)


def test_turbo1_constructor_flow():
    b = B.get_benchmark("branin")

    def f(xs):
        return np.asarray(b.fn(xs))

    t = Turbo1(
        f, b.lb, b.ub, n_init=6, max_evals=24, batch_size=3, seed=0, gp_config=GCFG,
    )
    out = t.optimize()
    assert out is t
    assert t.X.shape[0] >= 24 and t.fX.shape == (t.X.shape[0],)
    assert t.best_y == np.min(t.fX)
    assert np.isfinite(t.best_x).all()


def test_turbom_constructor_flow():
    b = B.get_benchmark("branin")
    t = TurboM(
        b.fn, b.lb, b.ub, n_init=6, max_evals=30, batch_size=3,
        n_trust_regions=2, gp_config=GCFG,
    ).optimize()
    assert t.fX.shape[0] > 0
    assert t.best_y == np.min(t.fX) or np.isfinite(t.best_y)


def test_plot_regret_and_runlog(tmp_path):
    curves = [np.array([3.0, 2.0, 1.5, 1.5, 0.9]), np.array([2.5, 2.5, 1.0, 0.5, 0.4])]
    p1 = plot_regret(curves, labels=["a", "b"], optimum=0.0, path=str(tmp_path / "r.png"))
    assert os.path.exists(p1) and os.path.getsize(p1) > 0
    records = [
        {"iter": 0, "best_y": 2.0, "tr_length": 0.8},
        {"iter": 1, "best_y": 1.0, "tr_length": 0.4},
    ]
    p2 = plot_run_log(records, path=str(tmp_path / "l.png"))
    assert os.path.exists(p2) and os.path.getsize(p2) > 0
