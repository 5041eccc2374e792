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


def _raise_vm_max_map_count(target: int = 262144) -> None:
    """Best-effort bump of the kernel's mmap-region cap for this suite.

    The full suite compiles hundreds of XLA CPU executables in ONE process;
    jaxlib's JIT code regions push the process VMA count past the kernel
    default ``vm.max_map_count`` (65530) right at the largest TuRBO-m scan
    compiles. The failed mmap then aborts/segfaults INSIDE native XLA
    serialize/deserialize with no Python traceback (measured 2026-08-19:
    58.8k maps immediately before a deterministic crash at the 218th test,
    in both the cache-read and cache-write paths, never reproducible on any
    subset of the suite). Root containers may write the sysctl; elsewhere we
    warn so the failure mode is at least named when it strikes.
    """
    path = "/proc/sys/vm/max_map_count"
    try:
        with open(path) as f:
            current = int(f.read().strip())
        if current < target:
            with open(path, "w") as f:
                f.write(str(target))
    except (OSError, ValueError):
        import warnings

        warnings.warn(
            f"could not raise {path} (need ≥~100k for the full suite in one "
            "process; a low cap can abort native XLA code mid-suite with no "
            "Python traceback). Run the suite in shards if it crashes.",
            stacklevel=1,
        )


_raise_vm_max_map_count()


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def key():
    return jax.random.key(0)
