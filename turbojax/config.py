"""Frozen dataclass configs for the GP surrogate and trust-region machinery.

The knob names mirror the reference's constructor kwargs where those exist
(``n_init``, ``max_evals``, ``batch_size``, ``use_ard``,
``max_cholesky_size`` — SURVEY.md §5.6 [R]); everything else is build-specific
(dtype/jitter policy, fit cadence, mesh axes).

All configs are hashable and immutable so they can be closed over by
``jax.jit`` as static arguments.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class GPConfig:
    """Configuration of the GP surrogate (SURVEY.md C1–C9).

    Attributes:
      kernel: one of "rbf", "matern12", "matern32", "matern52".
      use_ard: one lengthscale per input dimension if True, shared otherwise.
      noise_floor: lower bound on the observation-noise variance. The floor
        doubles as the PSD safety net for the fixed-jitter Cholesky used in
        the vmapped fit path (SURVEY.md §7.3.1/§7.3.2).
      jitter: relative diagonal jitter added before every Cholesky
        (multiplied by the mean of the kernel diagonal).
      lengthscale_bounds / outputscale_bounds / noise_bounds: box constraints
        applied through a softplus reparameterization (SURVEY.md C7 [R]).
      fit_optimizer: "lbfgs" (reference-parity, [B:8]) or "adam" (fallback,
        SURVEY.md §7.3.3).
      fit_maxiter: max optimizer iterations per restart.
      fit_restarts: number of random restarts, vmapped on-chip [B:5].
      learn_mean: fit a constant mean; otherwise zero mean on standardized y.
    """

    kernel: str = "matern52"
    use_ard: bool = True
    use_pallas: Optional[bool] = None  # fused Pallas kernel-matrix builds:
    # None = auto (TPU + tile-aligned + d ≥ 32, the measured ≥1.2× regime —
    # BENCH_pallas.json), True = force where shapes allow, False = never
    # (the parity-CI jnp lane)
    noise_floor: float = 1e-4
    jitter: float = 1e-6
    lengthscale_bounds: Tuple[float, float] = (0.005, 2.0)  # the reference's
    # unit-cube clamp [R]; looser bounds over-smooth and distort TR geometry
    # (measured: TuRBO-1 Ackley-10D median regret 5.18 -> 3.89 at 1000 evals)
    outputscale_bounds: Tuple[float, float] = (0.05, 20.0)
    noise_bounds: Tuple[float, float] = (1e-4, 0.2)
    fit_optimizer: str = "lbfgs"
    fit_maxiter: int = 50
    fit_maxiter_warm: Optional[int] = None  # smaller iteration budget when a
    # warm start is supplied (the reference trains fewer steps on refits [R]);
    # None = same budget as cold fits
    fit_linesearch_steps: int = 12  # zoom-linesearch cap; unbounded search
    # dominates fit wall-clock on TPU (measured: 18 s → ~6 s at N=2000)
    fit_lr: float = 0.1
    fit_restarts: int = 4
    fit_ftol: float = 0.0  # adam path only: early-stop once the per-step
    # loss improvement |Δ(−mll/n)| < ftol (bounded while_loop, after a
    # maxiter/4 warm-up). 0 = fixed fit_maxiter trip count (the measured
    # round-3 default). Gradient norm was measured and rejected as the stop
    # signal (plateau ‖∇‖ < converged ‖∇‖ at d=60 — see gp._fit_one). Pays
    # off when warm-chained refits (grid_warm_start) start near the MLL
    # optimum — see BASELINE.md round-3 polish early-stop probe
    grid_polish_both: bool = False  # "grid+adam" + warm chain only: polish
    # BOTH the warm row and the best grid-only row (one vmapped pair) and
    # keep the better final MLL — the chain keeps its accumulated ARD
    # depth, the fresh-grid lane keeps an escape hatch from chain-trapped
    # local optima. ~2x polish compute (MXU-batched)
    grid_warm_start: bool = True  # "grid+adam" only: enter the previous
    # iteration's polished hypers as an extra grid row and polish from the
    # overall MLL argmax. Chains the ARD refinement across refits (40 Adam
    # steps from an isotropic grid point is a very short ARD run at d=60;
    # the chain is effectively a long one) — measured on rover60, see
    # BASELINE.md round-3 "warm-start ARD" campaign. The plain "grid"
    # trainer ignores this (config-4 parity trajectories unchanged).
    learn_mean: bool = False
    fit_prior: str = "none"  # "dimscaled": add a MAP log-prior to the FIT
    # objective (gp.log_prior) — LogNormal(√2 + ln(d)/2, √3) on each
    # lengthscale and LogNormal(−4, 1) on the noise (Hvarfner et al. 2024,
    # "Vanilla Bayesian Optimization Performs Great in High Dimensions",
    # arXiv:2402.02229). Counters the MLE's systematic lengthscale collapse as d
    # grows (overconfident posteriors at d≳30). Fit-time only: mll(),
    # posteriors, and parity oracles stay prior-free; "none" (default)
    # traces the identical pre-prior fit program.
    y_warp: str = "none"  # "bilog": model w = sign(y)·log1p(|y|) instead of
    # y (transforms.warp_y) — a flagged extension beyond the reference for
    # heavy-tailed objectives; monotone, so all ranking consumers stay
    # order-consistent. Raw-space TR success logic is unaffected. Honored
    # on both fit_gp_auto routing branches (docs/DESIGN.md §7b).


@dataclasses.dataclass(frozen=True)
class TRConfig:
    """TuRBO trust-region hyperparameters (SURVEY.md C17 [R], named at [B:10]).

    Defaults are the canonical TuRBO-1 constants: initial side length 0.8,
    expand to at most 1.6 after ``succ_tol`` successes, halve after
    ``fail_tol`` failures, restart when the length drops below ``0.5**7``.
    ``fail_tol`` defaults to ``ceil(max(4, d) / batch_size)`` when None.
    """

    length_init: float = 0.8
    length_max: float = 1.6
    length_min: float = 0.5**7
    succ_tol: int = 3
    fail_tol: Optional[int] = None
    success_eps: float = 1e-3
    stagnation_tol: Optional[int] = None  # opt-in beyond-reference lever:
    # restart a TR after this many consecutive improvement-free search
    # batches (counting batches the TuRBO-m allocation starved it of
    # entirely) even while length > length_min. None = reference parity —
    # only length collapse restarts (measured: the flagship 2000-eval
    # budget produces ZERO natural restarts, so the restart machinery is
    # inert without this; BASELINE.md round-4 stagnation-restart A/B)

    def resolved_fail_tol(self, dim: int, batch_size: int) -> int:
        if self.fail_tol is not None:
            return self.fail_tol
        return max(1, math.ceil(max(4.0, float(dim)) / batch_size))
