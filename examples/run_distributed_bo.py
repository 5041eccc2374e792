"""BO at N beyond one chip's memory (SURVEY.md §5.7(b) as a PRODUCT path):
the surrogate auto-routes to the row-block-sharded DistributedGP — in-shard
kernel build, blocked Cholesky, distributed-MLL Adam fit — once the history
crosses the per-device memory threshold; no device ever materializes N².

Run on a pod slice as-is, or simulate a mesh on CPU:
    TURBOJAX_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/run_distributed_bo.py --devices 8 --force-distributed
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CI smoke runs force a backend (the axon TPU plugin ignores JAX_PLATFORMS):
if os.environ.get("TURBOJAX_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["TURBOJAX_PLATFORM"])

import argparse
import dataclasses

import jax
import jax.numpy as jnp

from turbojax import parallel as PAR
from turbojax.bo import BOConfig
from turbojax.bo_distributed import run_bo_distributed
from turbojax.distributed_linalg import DENSE_BUDGET_BYTES
from turbojax.config import GPConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--n-init", type=int, default=None)
    ap.add_argument("--evals", type=int, default=None)
    ap.add_argument("--dim", type=int, default=6)
    ap.add_argument(
        "--force-distributed", action="store_true",
        help="route through the distributed GP regardless of size "
        "(budget_bytes=1) — for demos/CI on small shapes",
    )
    args = ap.parse_args()

    mesh = PAR.make_mesh(args.devices, axis="rows")
    n_dev = mesh.devices.size
    d = args.dim
    max_evals = args.evals or 26 * n_dev
    n_init = args.n_init or max(n_dev, (max_evals // 2) // n_dev * n_dev)

    def objective(x):  # smooth multimodal toy standing in for a big dataset
        return jnp.sum((x - 0.3) ** 2, axis=-1) + 0.3 * jnp.sin(6.0 * x[:, 0])

    bo = BOConfig(
        n_init=n_init, max_evals=max_evals, batch_size=n_dev, acq="ei",
        n_candidates=1024, fit_every=2,
    )
    config = dataclasses.replace(
        GPConfig(kernel="matern52"), fit_optimizer="adam", fit_maxiter=15
    )
    res = run_bo_distributed(
        jax.random.key(0), objective, [0.0] * d, [1.0] * d, bo, config, mesh,
        budget_bytes=1 if args.force_distributed else DENSE_BUDGET_BYTES,
        on_iteration=lambda it, best: print(f"[{it:3d}] best = {best:.5f}"),
    )
    print(f"best y = {float(res.best_y):.5f}  n = {res.y_hist.shape[0]}  "
          f"mesh = {n_dev} devices")


if __name__ == "__main__":
    main()
