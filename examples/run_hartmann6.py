"""Config 2 [B:8]: Hartmann-6 with a Matérn-5/2 GP and a multi-restart
L-BFGS MLL hyperparameter fit every iteration (vmapped restarts)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CI smoke runs force a backend (the axon TPU plugin ignores JAX_PLATFORMS):
if os.environ.get("TURBOJAX_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["TURBOJAX_PLATFORM"])

import argparse

import jax

from configs import get_config
from turbojax import benchmarks as B
from turbojax.bo import run_bo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--evals", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = get_config("hartmann6_lbfgs")
    bo = cfg.bo
    if args.evals:
        import dataclasses

        bo = dataclasses.replace(bo, max_evals=args.evals)
    b = B.get_benchmark(cfg.benchmark)
    # L-BFGS refits over many iterations make the monolithic scan program
    # too large for the compiler — drive from the host (same math)
    res = run_bo(
        jax.random.key(args.seed), b.fn, b.lb, b.ub, bo, cfg.gp,
        host_loop=bo.n_iters > 40,
    )
    print(
        f"best y = {float(res.best_y):.5f}  (optimum {b.optimum})  "
        f"n = {int(res.n)}  at x = {res.best_x}"
    )


if __name__ == "__main__":
    main()
