"""Integration tests: TuRBO-1 / TuRBO-m loops (SURVEY.md C17, C18;
configs 4, 5 reduced)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbojax import benchmarks as B
from turbojax.config import GPConfig
from turbojax.trust_region import TurboConfig, run_turbo1
from turbojax.turbo_m import global_allocate, run_turbom

GCFG = GPConfig(fit_restarts=2, fit_maxiter=15)


@pytest.fixture(scope="module")
def ackley_turbo1():
    b = B.get_benchmark("ackley10")
    cfg = TurboConfig(n_init=10, max_evals=80, batch_size=5, n_candidates=200)
    return run_turbo1(jax.random.key(0), b.fn, b.lb, b.ub, cfg, GCFG)


def test_turbo1_improves(ackley_turbo1):
    carry, trace = ackley_turbo1
    trace = np.asarray(trace)
    assert np.all(np.diff(trace) <= 1e-6)
    # random search on Ackley-10 in [-5,10] stays ≈ 13+; TuRBO should beat it
    assert float(carry.best_y) < 10.0
    assert int(carry.n) <= 80


def test_turbo1_state_invariants(ackley_turbo1):
    carry, _ = ackley_turbo1
    assert 0 < float(carry.tr.length) <= 1.6
    x = np.asarray(carry.x_buf[: int(carry.n)])
    assert np.all(x >= 0) and np.all(x <= 1)  # unit-cube internal storage


def test_turbo1_forced_restart():
    """A TR that can never succeed shrinks to restart (length resets, history
    cleared) — drive with an adversarial flat objective."""
    flat = lambda x: jnp.zeros(x.shape[0])
    cfg = TurboConfig(
        n_init=4, max_evals=60, batch_size=4, n_candidates=32,
    )
    from turbojax.config import TRConfig

    cfg = TurboConfig(
        n_init=4, max_evals=120, batch_size=4, n_candidates=32,
        tr=TRConfig(fail_tol=1),  # every non-improving batch halves the length
    )
    carry, _ = run_turbo1(jax.random.key(1), flat, (0.0,) * 3, (1.0,) * 3, cfg, GCFG)
    assert int(carry.tr.restarts) >= 1
    assert float(carry.tr.length) > 0.5**7  # fresh region after restart


def test_global_allocate_without_replacement():
    vals = jnp.asarray(
        [  # (m=2, q=2, n_cand=3)
            [[5.0, 1.0, 9.0], [5.0, 1.0, 9.0]],
            [[2.0, 8.0, 9.0], [0.5, 8.0, 9.0]],
        ]
    )
    tr_idx, cand_idx = global_allocate(vals)
    # slot 0: global min is TR0/cand1 (1.0); slot 1: TR1/cand0 (0.5)
    assert tr_idx.tolist() == [0, 1]
    assert cand_idx.tolist() == [1, 0]


def test_global_allocate_no_duplicate_pairs(key):
    vals = jax.random.uniform(key, (3, 6, 10))
    tr_idx, cand_idx = global_allocate(vals)
    pairs = list(zip(tr_idx.tolist(), cand_idx.tolist()))
    assert len(set(pairs)) == len(pairs)


@pytest.fixture(scope="module")
def ackley_turbom():
    b = B.get_benchmark("ackley10")
    cfg = TurboConfig(n_init=8, max_evals=56, batch_size=4, n_candidates=64)
    return run_turbom(jax.random.key(0), b.fn, b.lb, b.ub, cfg, GCFG, m=3)


def test_turbom_runs_and_improves(ackley_turbom):
    carries, trace = ackley_turbom
    trace = np.asarray(trace)
    assert np.all(np.diff(trace) <= 1e-6)
    assert float(trace[-1]) < 15.0
    # every TR completed its init design
    assert np.all(np.asarray(carries.n) >= 8)


def test_turbom_host_loop_matches_scan():
    """host_loop=True drives the identical jitted step — same trajectory as
    the monolithic scan for the same key (docs/DESIGN.md)."""
    b = B.get_benchmark("branin")
    cfg = TurboConfig(n_init=4, max_evals=20, batch_size=2, n_candidates=16)
    carries_s, trace_s = run_turbom(jax.random.key(3), b.fn, b.lb, b.ub, cfg, GCFG, m=2)
    carries_h, trace_h = run_turbom(
        jax.random.key(3), b.fn, b.lb, b.ub, cfg, GCFG, m=2, host_loop=True
    )
    np.testing.assert_allclose(np.asarray(trace_s), np.asarray(trace_h), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(carries_s.n), np.asarray(carries_h.n))


def test_turbom_host_loop_bucket_growth():
    """Bucketed buffer growth (docs/DESIGN.md): buffers start at 32 and
    double; trajectory invariants hold across growth boundaries."""
    b = B.get_benchmark("branin")
    cfg = TurboConfig(n_init=4, max_evals=90, batch_size=2, n_candidates=16)
    carries, trace = run_turbom(
        jax.random.key(5), b.fn, b.lb, b.ub, cfg, GCFG, m=2, host_loop=True
    )
    trace = np.asarray(trace)
    assert np.all(np.diff(trace) <= 1e-6)
    assert carries.x_buf.shape[1] > 32  # growth actually happened
    n_iters = (90 - 4 + 1) // 2
    assert int(np.asarray(carries.n).sum()) <= n_iters * 2
    assert np.isfinite(trace).all()


def test_turbom_eval_accounting(ackley_turbom):
    carries, _ = ackley_turbom
    cfg_iters = (56 - 8 + 3) // 4
    total = int(np.asarray(carries.n).sum())
    assert total == cfg_iters * 4  # every evaluated point landed in exactly one TR


def test_global_allocate_cap_spreads_batch(key):
    """alloc_cap: no TR may take more than cap slots of one batch, the
    allocation is still without-replacement, and cap=None reproduces the
    reference-parity unconstrained argmin."""
    m, q, n_cand = 3, 6, 8
    # TR 0 dominates every draw row -> uncapped allocation gives it all 6
    vals = jax.random.uniform(key, (m, q, n_cand)) + jnp.array([0.0, 10.0, 10.0])[:, None, None]
    tr_idx, cand_idx = global_allocate(vals)
    assert int(jnp.sum(tr_idx == 0)) == q  # winner-takes-all baseline

    tr_idx_c, cand_idx_c = global_allocate(vals, cap=2)
    counts = np.bincount(np.asarray(tr_idx_c), minlength=m)
    assert counts.max() <= 2 and counts.sum() == q
    # still without replacement across (tr, cand) pairs
    pairs = set(zip(np.asarray(tr_idx_c).tolist(), np.asarray(cand_idx_c).tolist()))
    assert len(pairs) == q
    # within each TR, its best candidates were taken in draw-row order
    # (cap only blocks, never reorders): TR 0's picks are finite-valued
    for t, c in pairs:
        assert np.isfinite(float(vals[t, 0, c]))

    with pytest.raises(ValueError):
        global_allocate(vals, cap=1)  # 1 * 3 < q=6: cannot cover the batch


def test_turbo1_fit_every_cadence():
    """TurboConfig.fit_every is honored by the jitted loops (it was
    previously ask/tell-only): with fit_every=k the hypers refit on every
    k-th accepted batch and are reused (refactorize-only) in between; the
    run still improves; fit_every=1 is bit-identical to the old
    unconditional-fit program."""
    import dataclasses

    from turbojax.trust_region import _fit_or_reuse, make_turbo_carry
    from turbojax import gp as G
    from turbojax import linalg as L

    fn = lambda x: jnp.sum((x - 0.4) ** 2, -1)  # noqa: E731
    cfg1 = TurboConfig(n_init=6, max_evals=40, batch_size=2, n_candidates=32, fit_every=1)
    cfg3 = dataclasses.replace(cfg1, fit_every=3)
    gcfg = GPConfig(fit_optimizer="grid", noise_floor=1e-4)
    c1, _ = run_turbo1(jax.random.key(1), fn, (0.0,) * 3, (1.0,) * 3, cfg1, gcfg)
    c3, _ = run_turbo1(jax.random.key(1), fn, (0.0,) * 3, (1.0,) * 3, cfg3, gcfg)
    assert float(c3.best_y) < 0.15  # still optimizes with a 3-batch cadence
    assert int(c3.n) == int(c1.n)  # same evaluation accounting

    # cadence unit behavior: off-cadence returns the carried raw unchanged
    key = jax.random.key(0)
    carry = make_turbo_carry(key, 3, 16, cfg3, gcfg)
    xs = jax.random.uniform(key, (16, 3), dtype=jnp.float32)  # match the f32 carry
    carry = carry._replace(
        x_buf=xs, y_buf=jnp.sum((xs - 0.4) ** 2, -1),
        n=jnp.asarray(cfg3.n_init + 1 * cfg3.batch_size),  # batch_idx=1: off-cadence
    )
    mask = L.row_mask(16, carry.n)
    st = _fit_or_reuse(key, carry, mask, cfg3, gcfg)
    for a, b in zip(jax.tree.leaves(st.raw), jax.tree.leaves(carry.raw)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # on-cadence (batch_idx=0 mod 3): the grid fit moves the hypers
    carry0 = carry._replace(n=jnp.asarray(cfg3.n_init + 3 * cfg3.batch_size))
    mask0 = L.row_mask(16, carry0.n)
    st0 = _fit_or_reuse(key, carry0, mask0, cfg3, gcfg)
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(st0.raw), jax.tree.leaves(carry0.raw))
    )
    assert moved
