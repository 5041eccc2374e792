"""Integration: user API (SURVEY.md C21) — functional optimize() and the
host-side ask/tell Optimizer, including NaN objective imputation (§5.3)."""

import numpy as np
import pytest

from turbojax import benchmarks as B
from turbojax.api import Optimizer, optimize
from turbojax.config import GPConfig

GCFG = GPConfig(fit_restarts=2, fit_maxiter=15)


def test_optimize_bo():
    b = B.get_benchmark("branin")
    res = optimize(
        b.fn, b.lb, b.ub, max_evals=18, method="bo", n_init=8,
        batch_size=1, acq="ei", gp_config=GCFG, n_candidates=64, fit_every=2,
    )
    assert res.y_hist.shape == (18,)
    assert res.best_y == pytest.approx(res.y_hist.min())
    assert float(b(res.best_x[None])[0]) == pytest.approx(res.best_y, rel=1e-4)


def test_optimize_turbo1():
    b = B.get_benchmark("ackley10")
    res = optimize(
        b.fn, b.lb, b.ub, max_evals=40, method="turbo1", n_init=10,
        batch_size=5, gp_config=GCFG, n_candidates=64,
    )
    assert res.best_y < 18.0
    lb, ub = np.asarray(b.lb), np.asarray(b.ub)
    assert np.all(res.best_x >= lb) and np.all(res.best_x <= ub)


def test_optimize_turbom():
    b = B.get_benchmark("branin")
    res = optimize(
        b.fn, b.lb, b.ub, max_evals=30, method="turbom", m=2, n_init=6,
        batch_size=3, gp_config=GCFG, n_candidates=32,
    )
    assert np.isfinite(res.best_y)
    assert res.incumbent_trace.shape[0] > 0


@pytest.mark.slow
def test_optimize_bo_mesh_routes_distributed():
    """optimize(mesh=...) is the front door for the N ≫ chip workflow
    (VERDICT r2 task 5): same Result surface, surrogate forced through the
    distributed route by the tiny budget override."""
    import dataclasses

    from turbojax import parallel as PAR

    b = B.get_benchmark("branin")
    cfg = dataclasses.replace(GCFG, fit_optimizer="adam", fit_maxiter=5)
    res = optimize(
        b.fn, b.lb, b.ub, max_evals=32, method="bo", n_init=8,
        batch_size=4, acq="ei", gp_config=cfg, n_candidates=64,
        mesh=PAR.make_mesh(4, axis="rows"), budget_bytes=1,
    )
    assert res.y_hist.shape == (32,)
    assert res.best_y == pytest.approx(res.y_hist.min())
    assert float(b(res.best_x[None])[0]) == pytest.approx(res.best_y, rel=1e-4)
    assert res.best_y < res.y_hist[:8].min()  # improved on the init design


def test_optimize_turbom_mesh_routes_sharded():
    """optimize(mesh=..., method='turbom') shards the TR axis through
    parallel.run_turbom_sharded (VERDICT r3 missing #5: one front door)."""
    from turbojax import parallel as PAR

    b = B.get_benchmark("branin")
    res = optimize(
        b.fn, b.lb, b.ub, max_evals=30, method="turbom", m=2, n_init=6,
        batch_size=3, gp_config=GCFG, n_candidates=32,
        mesh=PAR.make_mesh(2, axis="tr"),
    )
    assert np.isfinite(res.best_y)
    assert res.best_y == pytest.approx(float(res.y_hist.min()))
    assert res.incumbent_trace.shape[0] > 0
    with pytest.raises(ValueError, match="multiple of the mesh size"):
        optimize(
            b.fn, b.lb, b.ub, max_evals=30, method="turbom", m=3, n_init=6,
            batch_size=3, gp_config=GCFG, n_candidates=32,
            mesh=PAR.make_mesh(2, axis="tr"),
        )


def test_optimize_mesh_rejects_turbo1():
    from turbojax import parallel as PAR

    b = B.get_benchmark("branin")
    with pytest.raises(ValueError, match="turbo1 has no device axis"):
        optimize(
            b.fn, b.lb, b.ub, max_evals=20, method="turbo1",
            mesh=PAR.make_mesh(4, axis="rows"),
        )


def test_ask_tell_turbo1_black_box():
    """The ask/tell protocol with a numpy-only objective (C15 API (a))."""
    b = B.get_benchmark("branin")
    opt = Optimizer(
        b.lb, b.ub, method="turbo1", n_init=6, max_evals=30, batch_size=3,
        gp_config=GCFG, n_candidates=32, seed=1,
    )
    lb, ub = np.asarray(b.lb), np.asarray(b.ub)
    for _ in range(8):
        xs = opt.ask()
        assert xs.shape == (3, 2)
        assert np.all(xs >= lb - 1e-6) and np.all(xs <= ub + 1e-6)
        ys = np.asarray(b.fn(xs))  # host-side "black box"
        opt.tell(xs, ys)
    bx, by = opt.best
    assert by == pytest.approx(min(np.concatenate(opt._history_y)))
    assert by < 25.0


def test_ask_tell_bo_with_nan_imputation():
    """NaN/inf objective values are imputed with a large penalty (§5.3)."""
    b = B.get_benchmark("branin")
    opt = Optimizer(
        b.lb, b.ub, method="bo", n_init=4, max_evals=12, batch_size=2,
        acq="ei", gp_config=GCFG, n_candidates=32, seed=2,
    )
    for i in range(5):
        xs = opt.ask()
        ys = np.asarray(b.fn(xs))
        if i == 2:
            ys = ys.copy()
            ys[0] = np.nan  # simulated objective failure
        opt.tell(xs, ys)
    ys_all = np.concatenate(opt._history_y)
    assert np.all(np.isfinite(ys_all))
    assert np.isfinite(opt.best[1])


def test_ask_tell_turbom():
    """Ask/tell for TuRBO-m (C18): global allocation maps points to TRs;
    the protocol converges on Branin like the compiled loop."""
    b = B.get_benchmark("branin")
    opt = Optimizer(
        b.lb, b.ub, method="turbom", m=2, n_init=4, max_evals=40, batch_size=4,
        gp_config=GCFG, n_candidates=32, seed=3,
    )
    lb, ub = np.asarray(b.lb), np.asarray(b.ub)
    for _ in range(9):
        xs = opt.ask()
        assert xs.shape == (4, 2)
        assert np.all(xs >= lb - 1e-5) and np.all(xs <= ub + 1e-5)
        opt.tell(xs, np.asarray(b.fn(xs)))
    assert opt.best[1] < 25.0
    # every evaluated point landed in exactly one TR
    assert int(np.asarray(opt._carry.n).sum()) == 9 * 4


def test_turbom_tell_requires_matching_ask():
    b = B.get_benchmark("branin")
    opt = Optimizer(
        b.lb, b.ub, method="turbom", m=2, n_init=4, max_evals=20, batch_size=2,
        gp_config=GCFG, n_candidates=16,
    )
    xs = opt.ask()
    n_hist_before = len(opt._history_y)
    with pytest.raises(ValueError, match="ask"):
        opt.tell(np.asarray(xs) + 0.5, np.zeros(2))  # different points
    assert len(opt._history_y) == n_hist_before  # rejected tell leaves no trace


def test_tell_capacity_guard():
    """tell() past max_evals raises instead of silently clobbering the
    last buffer row (clamped dynamic_update_slice)."""
    b = B.get_benchmark("branin")
    opt = Optimizer(
        b.lb, b.ub, method="turbo1", n_init=4, max_evals=8, batch_size=4,
        gp_config=GCFG, n_candidates=16,
    )
    for _ in range(2):
        xs = opt.ask()
        opt.tell(xs, np.asarray(b.fn(xs)))
    with pytest.raises(ValueError, match="capacity"):
        opt.tell(opt.ask(), np.zeros(4))


def test_optimizer_optimize_driver():
    b = B.get_benchmark("branin")
    opt = Optimizer(
        b.lb, b.ub, method="turbo1", n_init=6, max_evals=24, batch_size=3,
        gp_config=GCFG, n_candidates=32,
    )
    res = opt.optimize(lambda xs: np.asarray(b.fn(xs)))
    assert res.y_hist.shape[0] >= 24
    assert np.all(np.diff(res.incumbent_trace) <= 1e-9)
