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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_global_allocate_cap_survives_degenerate_tr():
    """Regression (round-3 review): cap + an all-NaN TR must not silently
    credit duplicate (0, 0) picks past the cap. Once the healthy TR hits
    its cap, the overflow spreads to the degenerate TR's UNTAKEN candidates
    (NaN draws rank worst but stay selectable), so the per-batch cap — and
    with it the n_init + n_iters·cap history bound — holds."""
    m, q, n_cand, cap = 2, 6, 8, 3
    row = jax.random.uniform(jax.random.key(7), (n_cand,))
    vals = jnp.stack([
        jnp.tile(row, (q, 1)),           # TR 0: same draw row every slot
        jnp.full((q, n_cand), jnp.nan),  # TR 1 degenerate: every draw NaN
    ])
    tr_idx, cand_idx = global_allocate(vals, cap=cap)
    counts = np.bincount(np.asarray(tr_idx), minlength=m)
    assert counts.max() <= cap, f"cap violated: {counts}"
    assert counts.sum() == q
    pairs = list(zip(np.asarray(tr_idx).tolist(), np.asarray(cand_idx).tolist()))
    assert len(set(pairs)) == q, f"duplicate picks: {pairs}"
    # the healthy TR's cap slots go to its true best candidates
    order = np.argsort(np.asarray(row))[:cap]
    assert {c for t, c in pairs if t == 0} == set(order.tolist())


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


def test_split_cap_bounds():
    """_split_cap: power-of-2 rungs with the _CAPB_MIN floor; the rung
    bounds every non-largest lane for a full chunk; None when no rung is
    at most half the full capacity (no FLOP win) or m < 2."""
    from turbojax.turbo_m import _CAPB_MIN, _split_cap

    assert _split_cap([5], 4096, 16, 10) is None  # m=1
    assert _split_cap([0, 0, 0, 0, 0], 512, 16, 10) is None  # 2*512 > 512
    assert _split_cap([300, 40, 50, 60, 70], 1024, 16, 10) == 512
    assert _split_cap([1800, 60, 40, 50, 55], 2000, 16, 10) == 512
    # n2=600: need 760 -> rung 1024; 2*1024 > 2000 -> no win
    assert _split_cap([1800, 600, 40, 50, 55], 2000, 16, 10) is None
    cap_b = _split_cap([1800, 600, 40, 50, 55], 4096, 16, 10)
    assert cap_b == 1024 and cap_b >= 600 + 16 * 10 and cap_b >= _CAPB_MIN


@pytest.mark.slow
def test_turbom_split_fit_step_exactness():
    """Split-capacity proposals (_split_proposals): the largest lane runs
    the identical full-capacity program (bitwise-equal warm-chain hypers);
    everything downstream of the fit — selections, buffers, counters,
    incumbent — is identical to the unsplit step. Small-lane hypers are
    mathematically equivalent (padding-equivalence, SURVEY.md §7.3.1) but
    not bitwise-pinned: backend factorization blocking may differ across
    capacities, which is exactly the fit-flat noise the selection argmins
    are robust to (BASELINE.md round-3 chaos probe)."""
    from turbojax.trust_region import make_turbo_carry
    from turbojax.turbo_m import _make_step

    b = B.get_benchmark("ackley10")
    dim = len(b.lb)
    m, cap, cap_b = 3, 64, 32
    cfg = TurboConfig(n_init=8, max_evals=36, batch_size=2, n_candidates=64)
    gpc = GPConfig(fit_restarts=4, fit_maxiter=5)
    keys0 = jax.random.split(jax.random.key(0), m)
    carries = jax.jit(
        lambda ks: jax.vmap(lambda k: make_turbo_carry(k, dim, cap, cfg, gpc))(ks)
    )(keys0)
    lb = tuple(float(v) for v in b.lb)
    ub = tuple(float(v) for v in b.ub)
    step_full = jax.jit(_make_step(b.fn, lb, ub, cfg, gpc, m))
    step_split = jax.jit(_make_step(b.fn, lb, ub, cfg, gpc, m, cap_b=cap_b))
    for _ in range(14):  # desynchronize the per-TR active counts
        carries, _best = step_full(carries)
    ns = np.asarray(carries.n)
    assert ns.max() <= cap_b  # precondition _split_cap guarantees in product
    c_full, best_full = step_full(carries)
    c_split, best_split = step_split(carries)
    assert float(best_full) == float(best_split)

    def as_np(a):  # typed PRNG keys refuse plain np.asarray
        if jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
            a = jax.random.key_data(a)
        return np.asarray(a)

    for name, a, bb in zip(c_full._fields, c_full, c_split):
        if name == "raw":
            continue
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(bb)):
            np.testing.assert_array_equal(as_np(x), as_np(y), err_msg=name)
    big = int(ns.argmax())
    for x, y in zip(jax.tree.leaves(c_full.raw), jax.tree.leaves(c_split.raw)):
        x, y = np.asarray(x), np.asarray(y)
        np.testing.assert_array_equal(x[big], y[big])  # full-cap lane: bitwise
        assert np.isfinite(y).all()


@pytest.mark.slow
def test_turbom_host_loop_split_fit_plumbing(monkeypatch):
    """The host driver's split-fit plumbing end-to-end: with a lowered
    _CAPB_MIN the ladder compiles and dispatches split programs mid-run
    (cap_b follows the live second-largest count) and the run stays sane."""
    import turbojax.turbo_m as TM

    monkeypatch.setattr(TM, "_CAPB_MIN", 8)
    returned = []
    orig = TM._split_cap

    def spy(ns, cap, chunk, step_max):
        r = orig(ns, cap, chunk, step_max)
        returned.append(r)
        return r

    monkeypatch.setattr(TM, "_split_cap", spy)
    b = B.get_benchmark("branin")
    cfg = TurboConfig(n_init=4, max_evals=90, batch_size=2, n_candidates=16)
    carries, trace = run_turbom(
        jax.random.key(5), b.fn, b.lb, b.ub, cfg, GCFG, m=2,
        host_loop=True, scan_chunk=2,
    )
    trace = np.asarray(trace)
    assert np.all(np.diff(trace) <= 1e-6)
    assert np.isfinite(trace).all()
    n_iters = (90 - 4 + 1) // 2
    assert int(np.asarray(carries.n).sum()) <= n_iters * 2
    assert any(r is not None for r in returned)  # split programs actually ran


@pytest.mark.slow
def test_stagnation_restart_triggers():
    """TRConfig.stagnation_tol (opt-in, round-4): a TR that stops improving
    restarts after that many improvement-free search batches even though its
    length never collapses to length_min — on a flat objective with the
    default fail_tol the length only halves every 2 batches, so stagnation
    fires restarts long before collapse would."""
    from turbojax.config import TRConfig

    flat = lambda x: jnp.zeros(x.shape[0], jnp.float32)  # noqa: E731
    # fail_tol=4: collapse from 0.8 to below 0.5^7 needs 7 halvings = 28
    # improvement-free batches; the 14-batch budget never collapses
    base = dict(n_init=4, max_evals=60, batch_size=4, n_candidates=32)
    cfg_ref = TurboConfig(**base, tr=TRConfig(fail_tol=4))
    carry_ref, _ = run_turbo1(
        jax.random.key(1), flat, (0.0,) * 3, (1.0,) * 3, cfg_ref, GCFG
    )
    assert int(carry_ref.tr.restarts) == 0  # reference: no collapse

    cfg = TurboConfig(**base, tr=TRConfig(fail_tol=4, stagnation_tol=4))
    carry, _ = run_turbo1(jax.random.key(1), flat, (0.0,) * 3, (1.0,) * 3, cfg, GCFG)
    assert int(carry.tr.restarts) >= 2
    assert int(carry.tr.stag) < 4  # counter reset by the restart


def test_stagnation_counts_starved_trs():
    """A TuRBO-m TR the global allocation starves (zero accepted points)
    still accumulates stagnation — that's the winner-takes-most scenario
    the lever exists for (BASELINE.md m-sweep diagnostic)."""
    from turbojax.config import TRConfig
    from turbojax.trust_region import make_turbo_carry, turbo_absorb

    cfg = TurboConfig(
        n_init=4, max_evals=40, batch_size=4, n_candidates=32,
        tr=TRConfig(stagnation_tol=3),
    )
    carry = make_turbo_carry(jax.random.key(0), 3, 16, cfg, GCFG)
    # put the TR in search phase with 4 active points
    xs = jnp.linspace(0.1, 0.9, 12, dtype=jnp.float32).reshape(4, 3)
    ys = jnp.asarray([1.0, 2.0, 3.0, 4.0], jnp.float32)
    carry = turbo_absorb(
        carry, xs, ys, jnp.ones(4, bool), jnp.asarray(False), cfg, GCFG, 4,
        jax.random.key(1),
    )
    assert int(carry.n) == 4 and int(carry.tr.stag) == 0
    none_accepted = jnp.zeros(4, bool)
    for i in range(2):  # starved batches: counters untouched, stag grows
        carry = turbo_absorb(
            carry, xs, ys, none_accepted, jnp.asarray(True), cfg, GCFG, 4,
            jax.random.key(2 + i),
        )
    assert int(carry.tr.stag) == 2 and int(carry.tr.restarts) == 0
    assert int(carry.tr.fail) == 0  # starved batches are not failures
    carry = turbo_absorb(
        carry, xs, ys, none_accepted, jnp.asarray(True), cfg, GCFG, 4,
        jax.random.key(9),
    )
    assert int(carry.tr.restarts) == 1  # third starved batch hits the tol
    assert int(carry.n) == 0  # fresh region
