"""Numerical-safety tooling (SURVEY.md §5.2 — the race-detector/sanitizer
slot of the template; for a single-program JAX stack this is NaN detection
and in-jit invariant checking).

Reference: N/A (single thread, no sanitizers [R]). Build mechanisms:
  * ``debug_nans()`` — scoped ``jax_debug_nans``: any NaN produced inside
    jitted code raises at the op that made it (wired to ``--debug`` flags in
    the example scripts).
  * ``checked(fn)`` — ``jax.experimental.checkify`` wrapper with float +
    index checks: returns a function that raises ``JaxRuntimeError`` on
    NaN/inf/OOB inside jit, usable in CI builds.
  * ``assert_finite_state`` — host-side pytree validator for optimizer
    carries (used by the ask/tell API between steps).
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped jax_debug_nans (SURVEY.md §5.2)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked(fn: Callable, *, jit: bool = True) -> Callable:
    """Wrap ``fn`` with checkify float/index error detection; the returned
    function raises on the first NaN/inf/out-of-bounds inside the program."""
    errs = checkify.float_checks | checkify.index_checks
    cfn = checkify.checkify(fn, errors=errs)
    if jit:
        cfn = jax.jit(cfn)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_finite_state(state: Any, name: str = "state") -> None:
    """Host-side: every float leaf of a pytree is finite (mask invariant
    §7.3.1: buffers must never hold NaN/inf, even in inactive rows)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(state)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            pretty = "/".join(str(p) for p in path)
            raise FloatingPointError(f"{name}.{pretty} contains non-finite values")
