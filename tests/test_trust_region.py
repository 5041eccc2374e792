"""Unit tests: TR state machine transitions, table-driven (SURVEY.md §4.2)."""

import jax.numpy as jnp
import numpy as np

from turbojax.config import TRConfig
from turbojax.trust_region import TRState, tr_init, tr_update

CFG = TRConfig(succ_tol=3, fail_tol=4)


def _state(length=0.8, succ=0, fail=0, stag=0):
    return TRState(
        length=jnp.asarray(length),
        succ=jnp.asarray(succ),
        fail=jnp.asarray(fail),
        restarts=jnp.asarray(0),
        stag=jnp.asarray(stag),
    )


def _step(state, improved, counted=True, fail_tol=4):
    return tr_update(state, jnp.asarray(improved), jnp.asarray(counted), CFG, fail_tol)


def test_success_counter_accumulates():
    s = _step(_state(succ=1), True)
    assert int(s.succ) == 2 and int(s.fail) == 0
    assert float(s.length) == 0.8


def test_expand_on_succ_tol():
    s = _step(_state(succ=2), True)  # 3rd success -> expand, reset counter
    assert float(s.length) == 1.6
    assert int(s.succ) == 0


def test_expand_caps_at_length_max():
    s = _step(_state(length=1.0, succ=2), True)
    assert float(s.length) == CFG.length_max


def test_fail_counter_and_shrink():
    s = _step(_state(fail=2), False)
    assert int(s.fail) == 3 and float(s.length) == 0.8
    s = _step(s, False)  # 4th failure -> halve
    np.testing.assert_allclose(float(s.length), 0.4)
    assert int(s.fail) == 0


def test_success_resets_fail_and_vice_versa():
    s = _step(_state(succ=2, fail=2), False)
    assert int(s.succ) == 0 and int(s.fail) == 3
    s2 = _step(_state(succ=1, fail=3), True)
    assert int(s2.succ) == 2 and int(s2.fail) == 0


def test_uncounted_step_is_identity():
    before = _state(length=0.8, succ=2, fail=3)
    after = _step(before, True, counted=False)
    assert float(after.length) == 0.8
    assert int(after.succ) == 2 and int(after.fail) == 3


def test_resolved_fail_tol():
    # ceil(max(4, d)/q) [R]
    assert TRConfig().resolved_fail_tol(dim=10, batch_size=10) == 1
    assert TRConfig().resolved_fail_tol(dim=10, batch_size=3) == 4
    assert TRConfig().resolved_fail_tol(dim=2, batch_size=1) == 4
    assert TRConfig(fail_tol=7).resolved_fail_tol(dim=50, batch_size=1) == 7


def test_tr_init_defaults():
    s = tr_init()
    np.testing.assert_allclose(float(s.length), 0.8, rtol=1e-6)
    assert int(s.succ) == 0 and int(s.fail) == 0 and int(s.restarts) == 0


def test_shrink_below_min_triggers_restart_condition():
    cfg = TRConfig()
    length = cfg.length_init
    for _ in range(8):
        length /= 2
    assert length < cfg.length_min  # 0.8/2^8 < 0.5^7
