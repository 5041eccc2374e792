"""Pallas TPU kernels for the kernel-matrix hot path (SURVEY.md C1/C2 build
column: "Pallas fused kernel-matrix tile kernel for the N=2000 hot path";
[B:5] "fused Pallas/XLA kernels").

One ``pallas_call`` computes, per (128, 128) output tile, the full chain
    cross-term matmul (MXU) → squared distance → kernel function (VPU)
    → optional diagonal noise add
without materializing the intermediate distance matrix in HBM — the fusion
XLA usually does, made explicit, plus the jitter/noise add that XLA keeps as
a separate kernel. Inputs are pre-scaled by the ARD lengthscales (that
scaling fuses into the caller's surrounding ops).

Shapes must be multiples of the 128 tile; ``gp.py`` routes through here only
when that holds and the backend is TPU (``GPConfig.use_pallas``), falling
back to the pure-jnp path otherwise (parity CI runs both, SURVEY.md §7.1.7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 128
_SQRT5 = 2.23606797749979


def _kernel_body(kernel_name: str, add_noise: bool):
    def body(z1_ref, z2_ref, scal_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        z1 = z1_ref[:]  # (TILE, d) — rows pre-scaled by 1/lengthscale
        z2 = z2_ref[:]  # (TILE, d)
        cross = jax.lax.dot_general(
            z1, z2, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        s1 = jnp.sum(z1 * z1, axis=-1, keepdims=True)  # (TILE, 1)
        s2 = jnp.sum(z2 * z2, axis=-1, keepdims=True).T  # (1, TILE)
        d2 = jnp.maximum(s1 + s2 - 2.0 * cross, 0.0)
        outputscale = scal_ref[0, 0]
        if kernel_name == "rbf":
            k = outputscale * jnp.exp(-0.5 * d2)
        elif kernel_name == "matern12":
            r = jnp.sqrt(d2 + 1e-30)
            k = outputscale * jnp.exp(-r)
        elif kernel_name == "matern32":
            r = jnp.sqrt(d2 + 1e-30)
            sr = 1.7320508075688772 * r
            k = outputscale * (1.0 + sr) * jnp.exp(-sr)
        elif kernel_name == "matern52":
            r = jnp.sqrt(d2 + 1e-30)
            sr = _SQRT5 * r
            k = outputscale * (1.0 + sr + (5.0 / 3.0) * d2) * jnp.exp(-sr)
        else:
            raise ValueError(f"unknown kernel {kernel_name!r}")
        if add_noise:
            noise = scal_ref[0, 1]
            rows = jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 0) + i * _TILE
            cols = jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 1) + j * _TILE
            k = jnp.where(rows == cols, k + noise, k)
        out_ref[:] = k

    return body


@functools.partial(jax.jit, static_argnames=("kernel_name", "add_noise"))
def fused_kernel_matrix(
    z1: jax.Array,
    z2: jax.Array,
    outputscale: jax.Array,
    noise: jax.Array,
    kernel_name: str = "matern52",
    add_noise: bool = False,
) -> jax.Array:
    """K = k(z1, z2) (+ noise·I) for pre-scaled inputs, tiled on the MXU.

    Requires n, m to be multiples of 128 (caller pads or falls back).
    """
    n, d = z1.shape
    m = z2.shape[0]
    assert n % _TILE == 0 and m % _TILE == 0, (n, m)
    scal = jnp.stack([outputscale.astype(jnp.float32), noise.astype(jnp.float32)]).reshape(1, 2)

    grid = (n // _TILE, m // _TILE)
    return pl.pallas_call(
        _kernel_body(kernel_name, add_noise),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((_TILE, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_TILE, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (_TILE, _TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * d + 8 * n * m,
            bytes_accessed=4 * (n * d + m * d + n * m),
            transcendentals=n * m,
        ),
    )(z1.astype(jnp.float32), z2.astype(jnp.float32), scal)


def _jnp_reference_kernel(z1, z2, outputscale, noise, kernel_name: str, add_noise: bool):
    """The pure-jnp equivalent of ``fused_kernel_matrix`` on pre-scaled
    inputs (lengthscale already divided out) — the AD fallback below."""
    from turbojax import kernels as K

    params = {
        "lengthscale": jnp.ones((z1.shape[-1],), z1.dtype),
        "outputscale": outputscale,
    }
    k = K.get_kernel(kernel_name)(params, z1, z2)
    if add_noise:
        k = k + noise * jnp.eye(z1.shape[0], dtype=k.dtype)
    return k


@functools.partial(jax.custom_jvp, nondiff_argnums=(4, 5))
def fused_kernel_matrix_ad(z1, z2, outputscale, noise, kernel_name="matern52",
                           add_noise=False):
    """``fused_kernel_matrix`` that is safe under autodiff: pallas_call has
    no JVP rule (``jax.grad`` through it crashes in Mosaic's program_id
    tracing), so differentiation falls back to the mathematically identical
    jnp path via custom_jvp — primal-only callers (posterior, grid-fit MLL
    selection, cached factorization) keep the fused tile kernel."""
    return fused_kernel_matrix(
        z1, z2, outputscale, noise, kernel_name=kernel_name, add_noise=add_noise
    )


@fused_kernel_matrix_ad.defjvp
def _fused_kernel_matrix_jvp(kernel_name, add_noise, primals, tangents):
    return jax.jvp(
        lambda *p: _jnp_reference_kernel(*p, kernel_name, add_noise), primals, tangents
    )


def _ts_cov_body(kernel_name: str):
    def body(z1_ref, z2_ref, v1_ref, v2_ref, scal_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        z1 = z1_ref[:]  # (TILE, d) candidate rows, pre-scaled
        z2 = z2_ref[:]
        cross = jax.lax.dot_general(
            z1, z2, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        s1 = jnp.sum(z1 * z1, axis=-1, keepdims=True)
        s2 = jnp.sum(z2 * z2, axis=-1, keepdims=True).T
        d2 = jnp.maximum(s1 + s2 - 2.0 * cross, 0.0)
        outputscale = scal_ref[0, 0]
        if kernel_name == "rbf":
            k = outputscale * jnp.exp(-0.5 * d2)
        elif kernel_name == "matern12":
            r = jnp.sqrt(d2 + 1e-30)
            k = outputscale * jnp.exp(-r)
        elif kernel_name == "matern32":
            r = jnp.sqrt(d2 + 1e-30)
            sr = 1.7320508075688772 * r
            k = outputscale * (1.0 + sr) * jnp.exp(-sr)
        elif kernel_name == "matern52":
            r = jnp.sqrt(d2 + 1e-30)
            sr = _SQRT5 * r
            k = outputscale * (1.0 + sr + (5.0 / 3.0) * d2) * jnp.exp(-sr)
        else:
            raise ValueError(f"unknown kernel {kernel_name!r}")
        # subtract the explained covariance vᵀv (second MXU contraction,
        # over the training axis) — never materialized in HBM
        vtv = jax.lax.dot_general(
            v1_ref[:], v2_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        k = k - vtv
        jitter = scal_ref[0, 1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 0) + i * _TILE
        cols = jax.lax.broadcasted_iota(jnp.int32, (_TILE, _TILE), 1) + j * _TILE
        out_ref[:] = jnp.where(rows == cols, k + jitter, k)

    return body


@functools.partial(jax.jit, static_argnames=("kernel_name",))
def fused_ts_cov(
    zs: jax.Array,
    v: jax.Array,
    outputscale: jax.Array,
    jitter: jax.Array,
    kernel_name: str = "matern52",
) -> jax.Array:
    """Thompson-chunk posterior covariance ``k(xs,xs) − vᵀv + jitter·I`` in
    one pallas_call (VERDICT r1 weak #7 attempt (b)): per (128,128) tile two
    MXU contractions (candidate cross term over d; explained term over the
    n training rows) plus the kernel-function epilogue and the diagonal
    bump — the m×m prior matrix and the vᵀv product never round-trip HBM.

    RETIRED — measured negative, NOT routed to the product path: at BO
    sizes (n=2000, chunk 1000) the fusion was slower than XLA's own
    schedule (BENCH_pallas.json), and the σ²/cov cancellation demands the
    HIGHEST-precision dense path anyway (docs/DESIGN.md §2b/§5b). Kept,
    with its parity test, as the documented negative result.

    Args:
      zs: (m, d) candidates pre-scaled by 1/lengthscale; m % 128 == 0.
      v:  (n, m) forward-solve L⁻¹K* (training axis first).
    """
    m, d = zs.shape
    n = v.shape[0]
    assert m % _TILE == 0, m
    scal = jnp.stack([outputscale.astype(jnp.float32), jitter.astype(jnp.float32)]).reshape(1, 2)
    grid = (m // _TILE, m // _TILE)
    return pl.pallas_call(
        _ts_cov_body(kernel_name),
        out_shape=jax.ShapeDtypeStruct((m, m), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((_TILE, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_TILE, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, _TILE), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, _TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (_TILE, _TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * m * (d + n) + 8 * m * m,
            bytes_accessed=4 * (2 * m * d + 2 * n * m + m * m),
            transcendentals=m * m,
        ),
    )(zs.astype(jnp.float32), zs.astype(jnp.float32), v.astype(jnp.float32),
      v.astype(jnp.float32), scal)


def pallas_available() -> bool:
    """True when the default backend can run these kernels."""
    try:
        return jax.default_backend() in ("tpu",)
    except Exception:  # pragma: no cover
        return False
