"""Input/output normalization and constraint transforms (SURVEY.md C10, C7).

Reference behavior being matched [R]: X is mapped to the unit cube before any
GP math (``to_unit_cube`` / ``from_unit_cube``), y is standardized to
zero-mean/unit-variance per fit. Hyperparameter positivity/box constraints go
through a softplus reparameterization so the MLL optimization is
unconstrained (reference uses GPyTorch constraints / scipy L-BFGS-B bounds,
SURVEY.md §2.1 C7).

All functions are pure jnp, shape-polymorphic, and dtype-preserving.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# --------------------------------------------------------------------------
# Unit-cube transforms


def to_unit_cube(x: Array, lb: Array, ub: Array) -> Array:
    """Map points from the box [lb, ub] to [0, 1]^d."""
    return (x - lb) / (ub - lb)


def from_unit_cube(x: Array, lb: Array, ub: Array) -> Array:
    """Map points from [0, 1]^d back to the box [lb, ub]."""
    return x * (ub - lb) + lb


# --------------------------------------------------------------------------
# Output standardization (masked: buffers carry inactive rows, SURVEY.md §7.3.1)


def masked_mean_std(y: Array, mask: Array, eps: float = 1e-8):
    """Mean/std over the active entries of a masked buffer.

    Returns (mean, std) where std has a floor of ``eps`` so standardizing a
    constant-y history stays finite.
    """
    w = mask.astype(y.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(y * w) / n
    var = jnp.sum(w * (y - mean) ** 2) / n
    std = jnp.maximum(jnp.sqrt(var), eps)
    return mean, std


def standardize(y: Array, mask: Array, eps: float = 1e-8):
    """Standardize the active entries of y; inactive entries are zeroed.

    Returns (y_std, mean, std); invert with ``unstandardize``.
    """
    mean, std = masked_mean_std(y, mask, eps)
    y_std = jnp.where(mask, (y - mean) / std, jnp.zeros_like(y))
    return y_std, mean, std


def warp_y(y: Array, kind: str) -> Array:
    """Monotone output warp applied BEFORE standardization when
    ``GPConfig.y_warp != "none"`` (a build extension beyond the reference,
    off by default; SURVEY.md C10 covers only standardization [R]).

    ``"bilog"``: sign(y)·log1p(|y|) — compresses heavy-tailed objective
    scales (e.g. rover60's obstacle penalties, 10–170×) so the stationary
    GP is not dominated by the tail. Odd, strictly increasing, finite
    everywhere (safe on masked/imputed buffers), so every argmin/ranking
    consumer (EI incumbent, Thompson selection) is order-consistent with
    the raw objective.
    """
    if kind in (None, "none"):
        return y
    if kind == "bilog":
        return jnp.sign(y) * jnp.log1p(jnp.abs(y))
    raise ValueError(f"unknown y_warp {kind!r} (expected 'none' or 'bilog')")


def unstandardize(y_std: Array, mean: Array, std: Array) -> Array:
    return y_std * std + mean


def unstandardize_var(var_std: Array, std: Array) -> Array:
    return var_std * std**2


#: Penalty scale when a batch fails with NO finite reference (empty history
#: AND all-NaN batch). Must be unmistakably terrible: round 1 used 0 here,
#: which made the imputed penalty exactly 3.0 — small enough to RANK AS THE
#: INCUMBENT on problems whose real costs exceed it (the fabricated
#: "rover60 best 3.00"). Any constant is arbitrary in this degenerate case;
#: it only must never masquerade as a good observation.
_IMPUTE_FLOOR = 1e6


def impute_failures(y_new: Array, y_buf: Array, mask: Array) -> Array:
    """Objective-failure handling (SURVEY.md §5.3), jit-safe: replace
    NaN/inf objective values with a large finite penalty derived from the
    worst observation so far, so masked buffers never hold non-finites
    (the §7.3.1 invariant) and the surrogate keeps a usable landscape.

    Invariant (tests/test_failures.py): the penalty is strictly worse than
    every finite observation in scope, so an imputed value can never become
    the incumbent."""
    finite_new = jnp.isfinite(y_new)
    known = jnp.where(mask, y_buf, -jnp.inf)
    worst_hist = jnp.max(known)
    worst_new = jnp.max(jnp.where(finite_new, y_new, -jnp.inf))
    worst = jnp.maximum(worst_hist, worst_new)
    worst = jnp.where(
        jnp.isfinite(worst), worst, jnp.asarray(_IMPUTE_FLOOR, y_new.dtype)
    )
    penalty = worst + 3.0 * (jnp.abs(worst) + 1.0)
    return jnp.where(finite_new, y_new, penalty)


# --------------------------------------------------------------------------
# Softplus box constraints for hyperparameters


def softplus(x: Array) -> Array:
    return jax.nn.softplus(x)


def inv_softplus(y: Array) -> Array:
    """Inverse of softplus, numerically stable for large y.

    softplus(x) = log(1 + e^x)  =>  x = y + log(1 - e^(-y)) = y + log(-expm1(-y)).
    """
    return y + jnp.log(-jnp.expm1(-y))


def constrain(raw: Array, lo: float, hi: float) -> Array:
    """Map an unconstrained value into (lo, hi) via a scaled sigmoid.

    A sigmoid box keeps L-BFGS unconstrained while matching the reference's
    L-BFGS-B box bounds [R]; gradients stay finite at the boundary.
    """
    return lo + (hi - lo) * jax.nn.sigmoid(raw)


def unconstrain(value: Array, lo: float, hi: float) -> Array:
    """Inverse of ``constrain``; clips into the open interval for safety."""
    t = (value - lo) / (hi - lo)
    t = jnp.clip(t, 1e-6, 1.0 - 1e-6)
    return jnp.log(t) - jnp.log1p(-t)
