"""The five driver-defined benchmark configs [B:7–B:11], expressed as data.

| # | name              | spec                                                      |
|---|-------------------|-----------------------------------------------------------|
| 1 | branin_ei         | Branin-2D, fixed-hyper RBF GP + EI, 50 iterations [B:7]   |
| 2 | hartmann6_lbfgs   | Hartmann-6, Matérn-5/2, L-BFGS MLL fit per iter [B:8]     |
| 3 | ts_q10            | batched TS (q=10) over a 5k-point candidate set [B:9]     |
| 4 | turbo1_ackley10   | TuRBO-1, Ackley-10D, 1000 evals, incremental chol [B:10]  |
| 5 | turbom5_rover60   | TuRBO-m (m=5), 60-D rover-style, N=2000, vmapped [B:11]   |
| 5b| turbom5_lunar60   | TuRBO-m (m=5), 60-D lunar-style descent dynamics [B:11]   |
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from turbojax.bo import BOConfig
from turbojax.config import GPConfig, TRConfig
from turbojax.trust_region import TurboConfig


@dataclasses.dataclass(frozen=True)
class BenchConfig:
    name: str
    benchmark: str  # key into turbojax.benchmarks.BENCHMARKS
    method: str  # "bo" | "turbo1" | "turbom" | "acq_only"
    gp: GPConfig
    bo: Optional[BOConfig] = None
    turbo: Optional[TurboConfig] = None
    m: int = 1
    note: str = ""


CONFIGS = {
    # 1 — Branin-2D BO loop: fixed-hyperparam RBF GP + EI, 50 iterations [B:7]
    "branin_ei": BenchConfig(
        name="branin_ei",
        benchmark="branin",
        method="bo",
        gp=GPConfig(kernel="rbf", use_ard=True),
        bo=BOConfig(
            n_init=10, max_evals=60, batch_size=1, acq="ei",
            n_candidates=2000, fit_every=0,  # fixed hypers -> pure incremental chol
            chol_mode="incremental",  # reference-parity path [B:7]
            local_frac=0.0,  # pure global candidates (reference behavior [R])
        ),
        note="incremental Cholesky append per observation; whole loop one lax.scan",
    ),
    # 2 — Hartmann-6, Matérn-5/2 GP, L-BFGS MLL fit per iteration [B:8]
    "hartmann6_lbfgs": BenchConfig(
        name="hartmann6_lbfgs",
        benchmark="hartmann6",
        method="bo",
        gp=GPConfig(
            kernel="matern52", use_ard=True, fit_optimizer="lbfgs",
            fit_maxiter=50, fit_restarts=4,
        ),
        bo=BOConfig(
            n_init=12, max_evals=112, batch_size=1, acq="ei",
            n_candidates=2000, fit_every=1,
        ),
        note="multi-restart L-BFGS MLL fit per iteration, vmapped restarts",
    ),
    # 3 — Batched Thompson-sampling acquisition (q=10) over 5k candidates [B:9]
    "ts_q10": BenchConfig(
        name="ts_q10",
        benchmark="ackley10",
        method="acq_only",
        gp=GPConfig(kernel="matern52"),
        bo=BOConfig(n_init=0, max_evals=0, batch_size=10, acq="ts", n_candidates=5000, ts_chunk=1000),
        note="acquisition-latency config: posterior + joint TS over 5000 points",
    ),
    # 4 — TuRBO-1 on Ackley-10D, 1000 evaluations, incremental Cholesky [B:10]
    "turbo1_ackley10": BenchConfig(
        name="turbo1_ackley10",
        benchmark="ackley10",
        method="turbo1",
        gp=GPConfig(
            kernel="matern52", fit_restarts=2, fit_optimizer="grid",
            fit_maxiter=50, fit_maxiter_warm=25, fit_lr=0.1,
        ),  # "grid" = the CPU oracle's trainer made TPU-native (15 vmapped
        # parallel Cholesky, argmax MLL): measured BOTH better regret than
        # warm-started Adam (median 2.1 vs 3.2 at 1000 evals, 5 seeds) and
        # ~5x faster end-to-end (0.6 s vs 3.5 s full run post-compile)
        turbo=TurboConfig(
            n_init=20, max_evals=1000, batch_size=10,
            n_candidates=1000, ts_chunk=None, tr=TRConfig(),
        ),
        note="single trust region, TS batches of 10, grid MLL fit (oracle parity)",
    ),
    # 5 — TuRBO-m (m=5) on the 60-D rover-style problem, N=2000 [B:11]
    "turbom5_rover60": BenchConfig(
        name="turbom5_rover60",
        benchmark="rover60",
        method="turbom",
        m=5,
        gp=GPConfig(
            kernel="matern52", fit_restarts=2, fit_optimizer="grid+adam",
            fit_maxiter=50, fit_maxiter_warm=40, fit_lr=0.1,
        ),  # "grid+adam" = isotropic grid argmax + ARD Adam polish: restores
        # the lengthscale-driven TR geometry w = l/mean(l) at d=60. Measured
        # (round 3, 10 paired seeds, full 2000-eval budget, TPU): rover
        # median 16.9 (isotropic grid) -> 11.17 (polish 25, 7/10 seed wins,
        # ~1.6x wall) -> 9.75 (polish 40, 6/10 wins vs polish 25, no wall
        # cost; rescues the catastrophic seeds — BASELINE.md round-3
        # polish-depth sweep)
        turbo=TurboConfig(
            n_init=40, max_evals=2000, batch_size=10,
            n_candidates=5000, ts_chunk=1000, tr=TRConfig(),
        ),
        note="m=5 vmapped surrogates, global TS allocation, independent restarts",
    ),
    # 5b — the second hermetic 60-D problem (dynamics-flavored lunar-style
    # descent control; "rover/lunar-style" [B:11]). Same TuRBO-m shape as
    # config 5 but the isotropic grid trainer: ARD measured neutral on the
    # globally-coupled lunar dynamics at 2x wall (BASELINE.md round-3
    # lunar60 campaign: grid 1.629 median vs grid+adam 1.694, 5 seeds).
    "turbom5_lunar60": BenchConfig(
        name="turbom5_lunar60",
        benchmark="lunar60",
        method="turbom",
        m=5,
        gp=GPConfig(
            kernel="matern52", fit_restarts=2, fit_optimizer="grid",
            fit_maxiter=50, fit_maxiter_warm=25, fit_lr=0.1,
        ),
        turbo=TurboConfig(
            n_init=40, max_evals=2000, batch_size=10,
            n_candidates=5000, ts_chunk=1000, tr=TRConfig(),
        ),
        note="lunar-style 60-D descent control; measured best 1.63 median vs best-known 0.63",
    ),
}


def get_config(name: str) -> BenchConfig:
    try:
        return CONFIGS[name]
    except KeyError:
        raise ValueError(f"unknown config {name!r}; available: {sorted(CONFIGS)}") from None


def reduced(cfg: BenchConfig, max_evals: int, n_init: Optional[int] = None, n_candidates: int = 64) -> BenchConfig:
    """A small version of a config for CI (SURVEY.md §4.2 integration tier)."""
    changes = {}
    if cfg.bo is not None:
        changes["bo"] = dataclasses.replace(
            cfg.bo, max_evals=max_evals, n_init=n_init or min(cfg.bo.n_init, max_evals // 2) or 1,
            n_candidates=n_candidates, ts_chunk=None,
        )
    if cfg.turbo is not None:
        changes["turbo"] = dataclasses.replace(
            cfg.turbo, max_evals=max_evals, n_init=n_init or min(cfg.turbo.n_init, max_evals // 3) or 2,
            n_candidates=n_candidates, ts_chunk=None,
        )
    gp = dataclasses.replace(cfg.gp, fit_restarts=2, fit_maxiter=15)
    return dataclasses.replace(cfg, gp=gp, **changes)
