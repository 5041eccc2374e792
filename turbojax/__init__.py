"""turbojax — a TPU-native Gaussian-process Bayesian-optimization framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of the
reference GP-BO stack (``mbway/turbo``; see SURVEY.md): GP surrogates with
RBF/Matérn ARD kernels, jittered/incremental Cholesky, MLL hyperparameter
fitting (L-BFGS, multi-restart via vmap), EI/UCB/Thompson acquisition over
large candidate sets, plain-BO and TuRBO-1/TuRBO-m trust-region loops — all
expressed as statically-shaped, jit-compiled programs that map onto the TPU
MXU, with vmap/shard_map parallelism across chips.

Reference provenance: the reference mount was empty (SURVEY.md §0); the
capability contract is BASELINE.json — citations in docstrings use the
[B:n] / [R] scheme defined in SURVEY.md §0.
"""

from turbojax import acq as acq
from turbojax import benchmarks as benchmarks
from turbojax import checkpoint as checkpoint
from turbojax import debug as debug
from turbojax import distributed_linalg as distributed_linalg
from turbojax import kernels as kernels
from turbojax import linalg as linalg
from turbojax import parallel as parallel
from turbojax import sampling as sampling
from turbojax import transforms as transforms
from turbojax.api import Optimizer, Turbo1, TurboM, optimize
from turbojax.bo import BOConfig, run_bo
from turbojax.bo_distributed import run_bo_distributed
from turbojax.config import GPConfig, TRConfig
from turbojax.distributed_linalg import (
    DistributedGP,
    fit_distributed_gp,
    fit_gp_auto,
    refactor_gp_auto,
)
from turbojax.gp import GPParams, GPState, fit_gp, gp_posterior, make_gp_state
from turbojax.runlog import RunLog
from turbojax.trust_region import TRState, TurboConfig, run_turbo1
from turbojax.turbo_m import run_turbom

__version__ = "0.1.0"

__all__ = [
    "BOConfig",
    "DistributedGP",
    "GPConfig",
    "GPParams",
    "GPState",
    "Optimizer",
    "RunLog",
    "TRConfig",
    "TRState",
    "Turbo1",
    "TurboConfig",
    "TurboM",
    "acq",
    "benchmarks",
    "checkpoint",
    "debug",
    "distributed_linalg",
    "fit_distributed_gp",
    "fit_gp",
    "fit_gp_auto",
    "refactor_gp_auto",
    "gp_posterior",
    "kernels",
    "linalg",
    "make_gp_state",
    "optimize",
    "parallel",
    "run_bo",
    "run_bo_distributed",
    "run_turbo1",
    "run_turbom",
    "sampling",
    "transforms",
]
