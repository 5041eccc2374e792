"""Checkpoint/resume tests (SURVEY.md §5.4): save → load round-trips the
full optimizer pytree (including the PRNG key) bit-exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbojax import checkpoint as CK
from turbojax.config import GPConfig
from turbojax.trust_region import TurboConfig, make_turbo_carry

# the save/restore round-trip test drives the ask/tell Optimizer (§5.4)


def test_round_trip_carry(tmp_path, key):
    cfg = TurboConfig(n_init=4, max_evals=20, batch_size=2, n_candidates=16)
    gcfg = GPConfig(fit_restarts=2, fit_maxiter=5)
    carry = make_turbo_carry(key, 3, 12, cfg, gcfg)
    carry = carry._replace(
        y_buf=carry.y_buf.at[:4].set(
            jnp.asarray([1.0, 2.0, 3.0, 4.0], dtype=carry.y_buf.dtype)
        ),
        n=jnp.asarray(4),
    )
    path = str(tmp_path / "ck.npz")
    CK.save_state(path, carry, meta={"iteration": 7})

    fresh = make_turbo_carry(jax.random.key(99), 3, 12, cfg, gcfg)
    restored = CK.load_state(path, like=fresh)

    for a, b in zip(jax.tree.leaves(carry), jax.tree.leaves(restored)):
        if jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
            assert jnp.all(jax.random.key_data(a) == jax.random.key_data(b))
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert CK.load_meta(path)["iteration"] == 7


def test_resume_determinism(tmp_path, key):
    """Key round-trip: random draws after restore equal draws after save."""
    k = jax.random.split(key)[0]
    state = {"key": k, "x": jnp.arange(5.0)}
    path = str(tmp_path / "s.npz")
    CK.save_state(path, state)
    restored = CK.load_state(path, like={"key": jax.random.key(123), "x": jnp.zeros(5)})
    a = jax.random.uniform(state["key"], (4,))
    b = jax.random.uniform(restored["key"], (4,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_optimizer_save_restore_continues_identically(tmp_path):
    """Save mid-run, restore into a fresh Optimizer, continue: the restored
    run's asks match what the original would produce (RNG is state, §5.4)."""
    import numpy as np

    from turbojax import benchmarks as B
    from turbojax.api import Optimizer

    b = B.get_benchmark("branin")
    gcfg = GPConfig(fit_restarts=2, fit_maxiter=5)
    mk = lambda: Optimizer(
        b.lb, b.ub, method="turbo1", n_init=4, max_evals=20, batch_size=2,
        gp_config=gcfg, n_candidates=16, seed=7,
    )
    a = mk()
    for _ in range(3):
        xs = a.ask()
        a.tell(xs, np.asarray(b.fn(xs)))
    path = str(tmp_path / "opt.npz")
    a.save(path)
    nxt_a = a.ask()

    c = mk().restore(path)
    nxt_c = c.ask()
    np.testing.assert_allclose(nxt_a, nxt_c, rtol=1e-6)
    assert c.best[1] == a.best[1]


def test_leaf_count_mismatch_raises(tmp_path):
    CK.save_state(str(tmp_path / "x.npz"), {"a": jnp.zeros(3)})
    try:
        CK.load_state(str(tmp_path / "x.npz"), like={"a": jnp.zeros(3), "b": jnp.zeros(2)})
        assert False, "expected ValueError"
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# Run-level checkpoint/resume for the one-shot drivers (VERDICT r1 missing
# #3): a killed run restarts from its checkpoint and reproduces the exact
# uninterrupted trajectory.


class _Boom(Exception):
    pass


def _boom_at(k):
    def cb(it, best):
        if it == k:
            raise _Boom()

    return cb


_GCFG = GPConfig(fit_restarts=2, fit_maxiter=3, fit_optimizer="adam")


def _quad(x):
    return jnp.sum((x - 0.4) ** 2, axis=-1)


def test_run_bo_host_checkpoint_resume(tmp_path):
    """Kill a checkpointing run_bo host loop mid-flight; resume; the full
    incumbent trace and final best equal the uninterrupted run's exactly."""
    import pytest

    from turbojax.bo import BOConfig, run_bo

    lb, ub = (0.0, 0.0), (1.0, 1.0)
    cfg = BOConfig(n_init=4, max_evals=16, batch_size=2, n_candidates=64, fit_every=2)
    key = jax.random.key(3)
    ref = run_bo(key, _quad, lb, ub, cfg, _GCFG, host_loop=True)

    path = str(tmp_path / "bo_ck")
    with pytest.raises(_Boom):
        run_bo(key, _quad, lb, ub, cfg, _GCFG, checkpoint_path=path,
               checkpoint_every=1, on_iteration=_boom_at(3))
    assert CK.exists(path)
    res = run_bo(key, _quad, lb, ub, cfg, _GCFG, checkpoint_path=path,
                 checkpoint_every=1, resume=True)
    np.testing.assert_array_equal(
        np.asarray(res.incumbent_trace), np.asarray(ref.incumbent_trace)
    )
    assert float(res.best_y) == float(ref.best_y)


def test_run_turbo1_host_checkpoint_resume(tmp_path):
    """Segmented TuRBO-1 host driver: killed + resumed == uninterrupted."""
    import pytest

    from turbojax.trust_region import run_turbo1_host

    lb, ub = (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)
    cfg = TurboConfig(n_init=4, max_evals=16, batch_size=2, n_candidates=16)
    key = jax.random.key(5)
    _, trace_ref = run_turbo1_host(key, _quad, lb, ub, cfg, _GCFG, checkpoint_every=2)

    path = str(tmp_path / "t1_ck")
    with pytest.raises(_Boom):
        run_turbo1_host(key, _quad, lb, ub, cfg, _GCFG, checkpoint_path=path,
                        checkpoint_every=2, on_iteration=_boom_at(3))
    assert CK.exists(path)
    carry, trace = run_turbo1_host(key, _quad, lb, ub, cfg, _GCFG,
                                   checkpoint_path=path, checkpoint_every=2,
                                   resume=True)
    np.testing.assert_array_equal(np.asarray(trace), np.asarray(trace_ref))


def test_run_turbom_host_checkpoint_resume(tmp_path):
    """TuRBO-m host loop (bucketed, chunked dispatch): killed + resumed ==
    uninterrupted, chunk boundaries and bucket growth included."""
    import pytest

    from turbojax.turbo_m import run_turbom

    lb, ub = (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)
    cfg = TurboConfig(n_init=4, max_evals=28, batch_size=2, n_candidates=16)
    key = jax.random.key(7)
    kw = dict(m=2, host_loop=True, scan_chunk=2)
    _, trace_ref = run_turbom(key, _quad, lb, ub, cfg, _GCFG, **kw)

    path = str(tmp_path / "tm_ck")
    with pytest.raises(_Boom):
        run_turbom(key, _quad, lb, ub, cfg, _GCFG, **kw, checkpoint_path=path,
                   checkpoint_every=2, on_iteration=_boom_at(5))
    assert CK.exists(path)
    _, trace = run_turbom(key, _quad, lb, ub, cfg, _GCFG, **kw,
                          checkpoint_path=path, checkpoint_every=2, resume=True)
    np.testing.assert_array_equal(np.asarray(trace), np.asarray(trace_ref))


def test_optimize_resume_kwarg(tmp_path):
    """SURVEY §5.4 API shape: optimize(..., checkpoint_path, resume=True)
    works end-to-end (fresh start writes checkpoints; resume restores)."""
    from turbojax.api import optimize

    path = str(tmp_path / "opt_ck")
    kw = dict(
        max_evals=14, method="turbo1", n_init=4, batch_size=2, seed=1,
        gp_config=_GCFG, n_candidates=16,
        checkpoint_path=path, checkpoint_every=2,
    )
    ref = optimize(_quad, (0.0, 0.0), (1.0, 1.0), **kw)
    assert CK.exists(path)
    # checkpoint now holds the FINISHED run; resuming returns it immediately
    res = optimize(_quad, (0.0, 0.0), (1.0, 1.0), resume=True, **kw)
    np.testing.assert_array_equal(res.incumbent_trace, ref.incumbent_trace)
    assert res.best_y == ref.best_y


@pytest.mark.slow
def test_run_bo_distributed_checkpoint_resume(tmp_path):
    """The N >> chip driver survives a kill (VERDICT r3 missing #2): killed
    at iteration 3, resumed, and the trace + final best equal the
    uninterrupted run's exactly — on the forced-distributed route, with a
    fit_every=2 cadence so the resume must also restore the warm-start
    hypers (an off-cadence first resumed iteration refactors, not refits)."""
    import dataclasses

    import pytest

    from turbojax import parallel as PAR
    from turbojax.bo import BOConfig
    from turbojax.bo_distributed import run_bo_distributed
    from turbojax.runlog import RunLog

    mesh = PAR.make_mesh(4, axis="rows")
    cfg = BOConfig(n_init=8, max_evals=32, batch_size=4, acq="ei",
                   n_candidates=64, fit_every=2)
    gcfg = dataclasses.replace(_GCFG, fit_maxiter=3)
    key = jax.random.key(7)
    args = (key, _quad, [0.0] * 3, [1.0] * 3, cfg, gcfg, mesh)
    ref = run_bo_distributed(*args, budget_bytes=1)

    path = str(tmp_path / "dbo_ck")
    with pytest.raises(_Boom):
        run_bo_distributed(*args, budget_bytes=1, checkpoint_path=path,
                           checkpoint_every=1, on_iteration=_boom_at(3))
    assert CK.exists(path)
    log = RunLog()
    res = run_bo_distributed(*args, budget_bytes=1, checkpoint_path=path,
                             checkpoint_every=1, resume=True, runlog=log)
    np.testing.assert_array_equal(
        np.asarray(res.incumbent_trace), np.asarray(ref.incumbent_trace)
    )
    assert float(res.best_y) == float(ref.best_y)
    # RunLog integration (SURVEY.md 5.5): one record per resumed iteration,
    # carrying the route and history size
    assert [r["iter"] for r in log.records] == list(range(3, cfg.n_iters))
    assert all(r["route"] == "distributed" for r in log.records)
    assert log.records[-1]["n"] == cfg.max_evals
