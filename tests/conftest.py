"""Test harness config (SURVEY.md §4.2).

Tests run on the CPU backend with 8 virtual devices
(``xla_force_host_platform_device_count=8``) so every shard_map/mesh code
path executes multi-device without TPU hardware; the same tests pass
unchanged on real meshes. f64 is enabled globally — the parity lane is
defined against float64 (SURVEY.md §7.3.2); f32-specific behavior is tested
with explicit f32 arrays.

Note: the axon TPU plugin force-selects itself via JAX_PLATFORMS; the
``jax.config.update('jax_platforms', 'cpu')`` below overrides it (env-var
overrides are clobbered by the plugin's sitecustomize).
"""

import os
import sys

# repo root on sys.path so tests can import bench.py / benchmarks/ directly
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import tempfile

import jax

# TPU lane (TURBOJAX_TPU_TESTS=1): leave the axon TPU backend selected so the
# performance-gate tests (tests/test_perf_gate.py) measure real hardware;
# everything else should be run in the default CPU lane.
_TPU_LANE = os.environ.get("TURBOJAX_TPU_TESTS") == "1"
if not _TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: the suite compiles ~40 scan-loop programs; the
# cache turns repeat runs (and -x reruns) from ~10 min into ~2 min.
_cache_dir = os.path.join(tempfile.gettempdir(), "turbojax-xla-cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def key():
    return jax.random.key(0)
