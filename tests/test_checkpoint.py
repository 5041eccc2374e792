"""Checkpoint/resume tests (SURVEY.md §5.4): save → load round-trips the
full optimizer pytree (including the PRNG key) bit-exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from turbojax import checkpoint as CK
from turbojax.config import GPConfig
from turbojax.trust_region import TurboConfig, make_turbo_carry

# the save/restore round-trip test drives the ask/tell Optimizer (§5.4)


def test_round_trip_carry(tmp_path, key):
    cfg = TurboConfig(n_init=4, max_evals=20, batch_size=2, n_candidates=16)
    gcfg = GPConfig(fit_restarts=2, fit_maxiter=5)
    carry = make_turbo_carry(key, 3, 12, cfg, gcfg)
    carry = carry._replace(
        y_buf=carry.y_buf.at[:4].set(jnp.asarray([1.0, 2.0, 3.0, 4.0])),
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
