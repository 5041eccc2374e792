"""Regression lane: the fit must compute in the BUFFER dtype under x64.

Round-3 hardware find (docs/DESIGN.md §2c): with ``jax_enable_x64`` on,
optax's zoom-linesearch step-size scalars are STRONG float64, so the
line-search evaluation point — and with it every kernel build and Cholesky
inside the fit — silently promoted to f64 even with all-f32 buffers. On
TPU f64 is double-float emulation: measured 28.7 s vs 0.96 s per 4-restart
refit iteration at N=2000. ``gp._fit_one`` now pins its loss input and
returned params to the buffer dtype.

The conftest enables x64 globally, which is exactly the poisoned
configuration; these tests assert the pin holds by inspecting the lowered
HLO for wide f64 tensors (optax keeps a handful of f64 SCALARS — counts,
step sizes — which are harmless and ignored via a size threshold).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbojax import gp as G
from turbojax.config import GPConfig


def _wide_f64_shapes(hlo_text: str, min_elems: int = 1024):
    """All f64 tensor shapes in the HLO with at least ``min_elems`` elements."""
    wide = []
    for dims in re.findall(r"f64\[([0-9,]+)\]", hlo_text):
        elems = int(np.prod([int(d) for d in dims.split(",") if d]))
        if elems >= min_elems:
            wide.append(f"f64[{dims}]")
    return sorted(set(wide))


def _f32_problem(n=40, d=3, n_max=64):
    rng = np.random.RandomState(0)
    x = rng.rand(n, d)
    y = np.sin(3 * x[:, 0]) + 0.1 * rng.randn(n)
    x_buf = jnp.zeros((n_max, d), jnp.float32).at[:n].set(jnp.asarray(x, jnp.float32))
    y_buf = jnp.zeros((n_max,), jnp.float32).at[:n].set(jnp.asarray(y, jnp.float32))
    mask = jnp.arange(n_max) < n
    return x_buf, y_buf, mask


@pytest.mark.parametrize("optimizer", ["lbfgs", "adam", "grid+adam"])
def test_fit_has_no_wide_f64_under_x64(optimizer):
    """f32 buffers + x64 mode: the lowered fit contains no wide f64 tensor.

    Without the ``gp._fit_one`` dtype pin, this lowers f64 kernel matrices
    (e.g. f64[2,64,64] here; f64[4,256,256] in the perf gate) — the ~30×
    TPU wall-clock bug of docs/DESIGN.md §2c.
    """
    assert jax.config.jax_enable_x64, "this lane exists to test x64 mode"
    x_buf, y_buf, mask = _f32_problem()
    config = GPConfig(
        kernel="matern52", fit_optimizer=optimizer, fit_maxiter=5, fit_restarts=2
    )
    lowered = jax.jit(
        lambda k, xb, yb, m: G.fit_gp(k, xb, yb, m, config)
    ).lower(jax.random.key(0), x_buf, y_buf, mask)
    wide = _wide_f64_shapes(lowered.as_text())
    assert not wide, f"fit promoted to f64 under x64 with f32 buffers: {wide}"


def test_fit_returns_buffer_dtype_params():
    """Fitted raw hypers come back in the buffer dtype (f32), and the f64
    parity lane is untouched (f64 buffers stay f64)."""
    x_buf, y_buf, mask = _f32_problem()
    config = GPConfig(
        kernel="matern52", fit_optimizer="lbfgs", fit_maxiter=5, fit_restarts=2
    )
    state = G.fit_gp(jax.random.key(0), x_buf, y_buf, mask, config)
    for leaf in jax.tree.leaves(state.raw):
        assert leaf.dtype == jnp.float32, f"f32 buffers produced {leaf.dtype} hypers"

    state64 = G.fit_gp(
        jax.random.key(0),
        x_buf.astype(jnp.float64),
        y_buf.astype(jnp.float64),
        mask,
        config,
    )
    for leaf in jax.tree.leaves(state64.raw):
        assert leaf.dtype == jnp.float64, f"f64 parity lane demoted to {leaf.dtype}"
