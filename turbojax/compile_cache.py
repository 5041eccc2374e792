"""Persistent XLA compile cache (SURVEY.md §4.2 perf tier support;
docs/ROADMAP.md item 2 "persist the TPU compile cache across runs").

Through the axon remote-compile tunnel a cold TuRBO-m bucket compile costs
seconds; the persistent cache turns every repeat run (same shapes) into a
disk hit. Tests already enable this via conftest; this helper gives the
bench harness, examples, and the host-loop drivers the same treatment.
"""

from __future__ import annotations

import os
import tempfile

import jax

_DEFAULT = os.path.join(tempfile.gettempdir(), "turbojax-xla-cache")


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's compilation cache at a persistent directory (idempotent;
    respects an already-configured cache dir unless ``path`` is given)."""
    current = jax.config.jax_compilation_cache_dir
    if current and path is None:
        return current
    path = path or os.environ.get("TURBOJAX_CACHE_DIR", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
