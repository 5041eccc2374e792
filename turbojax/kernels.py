"""Covariance kernels: RBF and Matérn family with ARD (SURVEY.md C1, C2).

Reference capability [B:5, B:7, B:8]: RBF (squared-exponential) and
Matérn-5/2 covariances with ARD lengthscales and an output scale, provided by
GPyTorch's ``RBFKernel``/``MaternKernel`` in the reference stack.

TPU-native design: the kernel matrix is built from one MXU matmul
(the cross term of the pairwise squared distance) plus VPU elementwise math
that XLA fuses into the matmul's epilogue. The expansion
``‖a−b‖² = ‖a‖² + ‖b‖² − 2a·b`` routes the O(n²d) work through the MXU
instead of an O(n²d) broadcast-subtract (which would be HBM-bound at
n=2000, d=60). A fused Pallas tile kernel for the same computation lives in
``turbojax.pallas_kernels`` (enabled via ``gp.py``'s ``use_pallas`` flag).

Kernel params are a dict ``{"lengthscale": (d,) or (), "outputscale": ()}``;
all functions are dtype-preserving and vmap/jit-friendly.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

Array = jax.Array
KernelFn = Callable[[Dict[str, Array], Array, Array], Array]

_SQRT3 = 1.7320508075688772
_SQRT5 = 2.23606797749979


def pairwise_sqdist(x1: Array, x2: Array) -> Array:
    """Pairwise squared Euclidean distances, (n, d) x (m, d) -> (n, m).

    MXU-friendly expansion, **centered first**: the expansion's absolute
    error is ~eps·‖x‖², so for clustered inputs (trust-region candidates at
    small TR length, scaled by 1/ℓ) the uncentered form loses ALL the
    signal in f32 — measured as the dominant regret gap vs the f64 oracle
    at deep refinement (TuRBO-1 Ackley-10D full budget: regret 2.5 → ~0.6).
    Subtracting the shared mean is distance-invariant and shrinks ‖x‖² to
    the cluster radius; the remaining cancellation is clamped at 0.
    """
    c = 0.5 * (jnp.mean(x1, axis=0) + jnp.mean(x2, axis=0))
    x1 = x1 - c
    x2 = x2 - c
    # precision=HIGHEST: the TPU MXU computes f32 dots in bf16 passes by
    # default (~8 mantissa bits) — fatal for the d² cancellation and hence
    # for deep trust-region refinement (measured: TuRBO-1 Ackley-10D full
    # budget regret 2.5 on TPU vs 1.3 on CPU at identical f32 math; HIGHEST
    # restores CPU-grade f32). The cross matmul is transcendental-dominated
    # at d ≤ 60, so the extra MXU passes are free in wall-clock.
    cross = jax.lax.dot_general(
        x1,
        x2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=x1.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    sq1 = jnp.sum(x1 * x1, axis=-1)[:, None]
    sq2 = jnp.sum(x2 * x2, axis=-1)[None, :]
    return jnp.maximum(sq1 + sq2 - 2.0 * cross, 0.0)


def _scale(x: Array, lengthscale: Array) -> Array:
    return x / lengthscale


def rbf(params: Dict[str, Array], x1: Array, x2: Array) -> Array:
    """Squared-exponential: s² · exp(−½‖(x1−x2)/ℓ‖²)."""
    d2 = pairwise_sqdist(_scale(x1, params["lengthscale"]), _scale(x2, params["lengthscale"]))
    return params["outputscale"] * jnp.exp(-0.5 * d2)


def matern12(params: Dict[str, Array], x1: Array, x2: Array) -> Array:
    """Matérn-1/2 (exponential): s² · exp(−r)."""
    d2 = pairwise_sqdist(_scale(x1, params["lengthscale"]), _scale(x2, params["lengthscale"]))
    r = jnp.sqrt(d2 + 1e-30)
    return params["outputscale"] * jnp.exp(-r)


def matern32(params: Dict[str, Array], x1: Array, x2: Array) -> Array:
    """Matérn-3/2: s² · (1 + √3 r) exp(−√3 r)."""
    d2 = pairwise_sqdist(_scale(x1, params["lengthscale"]), _scale(x2, params["lengthscale"]))
    r = jnp.sqrt(d2 + 1e-30)
    sr = _SQRT3 * r
    return params["outputscale"] * (1.0 + sr) * jnp.exp(-sr)


def matern52(params: Dict[str, Array], x1: Array, x2: Array) -> Array:
    """Matérn-5/2: s² · (1 + √5 r + 5r²/3) exp(−√5 r) — the reference's
    default surrogate kernel for Hartmann-6 and the TuRBO loops [B:8]."""
    d2 = pairwise_sqdist(_scale(x1, params["lengthscale"]), _scale(x2, params["lengthscale"]))
    r = jnp.sqrt(d2 + 1e-30)
    sr = _SQRT5 * r
    return params["outputscale"] * (1.0 + sr + (5.0 / 3.0) * d2) * jnp.exp(-sr)


KERNELS: Dict[str, KernelFn] = {
    "rbf": rbf,
    "matern12": matern12,
    "matern32": matern32,
    "matern52": matern52,
}


def get_kernel(name: str) -> KernelFn:
    try:
        return KERNELS[name]
    except KeyError:
        raise ValueError(f"unknown kernel {name!r}; available: {sorted(KERNELS)}") from None


def kernel_diag(params: Dict[str, Array], x: Array) -> Array:
    """k(x, x) for each row — equals the outputscale for all stationary
    kernels above; kept as a function so nonstationary kernels can slot in."""
    return jnp.broadcast_to(params["outputscale"], x.shape[:-1])
