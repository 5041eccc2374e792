"""Tests: §5.2 NaN/checkify tooling and §5.5 run logging."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbojax import debug as D
from turbojax.runlog import RunLog, annotate, profile


def test_checked_passes_clean():
    f = D.checked(lambda x: jnp.sqrt(x) + 1.0)
    out = f(jnp.asarray([1.0, 4.0]))
    np.testing.assert_allclose(np.asarray(out), [2.0, 3.0])


def test_checked_raises_on_nan():
    f = D.checked(lambda x: jnp.log(x))  # log(-1) -> nan
    with pytest.raises(Exception) as e:
        f(jnp.asarray([-1.0]))
    assert "nan" in str(e.value).lower()


def test_assert_finite_state():
    good = {"a": jnp.ones(3), "n": jnp.asarray(4)}
    D.assert_finite_state(good)
    bad = {"a": jnp.asarray([1.0, jnp.inf])}
    with pytest.raises(FloatingPointError):
        D.assert_finite_state(bad, "carry")


def test_debug_nans_scope():
    before = jax.config.jax_debug_nans
    with D.debug_nans(True):
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


def test_runlog_jsonl_and_records(tmp_path):
    path = str(tmp_path / "run.jsonl")
    with RunLog(path, verbose=False) as log:
        log.log(0, best_y=1.5, tr_length=0.8)
        log.log(1, best_y=1.2, mll=-3.3)
    lines = [json.loads(l) for l in open(path)]
    assert [l["iter"] for l in lines] == [0, 1]
    assert lines[1]["best_y"] == 1.2
    assert len(log.records) == 2


def test_profile_and_annotate_noop():
    with profile(None):
        with annotate("fit"):
            x = jnp.ones(4) * 2
    assert float(x.sum()) == 8.0


def test_profile_writes_trace(tmp_path):
    """§5.1: jax.profiler integration actually emits a perfetto dump."""
    import os

    with profile(str(tmp_path)):
        with annotate("bench-region"):
            jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    found = []
    for root, _, files in os.walk(tmp_path):
        found.extend(files)
    assert found, "profiler produced no trace files"


def test_start_profiler_server_idempotent():
    """§5.1 live-profiling integration: the server starts once and repeat
    calls are safe no-ops (long host-loop runs call this unconditionally)."""
    from turbojax import runlog

    port = runlog.start_profiler_server(9917)
    assert port == 9917
    assert runlog.start_profiler_server(9917) == 9917  # idempotent
