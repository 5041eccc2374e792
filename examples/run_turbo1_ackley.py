"""Config 4 [B:10]: TuRBO-1 on Ackley-10D, 1000 evaluations — trust-region
state machine + TS batches, one compiled scan. Pass --evals to reduce."""

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
from turbojax.trust_region import run_turbo1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--evals", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = get_config("turbo1_ackley10")
    turbo = cfg.turbo
    if args.evals:
        import dataclasses

        turbo = dataclasses.replace(turbo, max_evals=args.evals)
    b = B.get_benchmark(cfg.benchmark)
    carry, trace = run_turbo1(jax.random.key(args.seed), b.fn, b.lb, b.ub, turbo, cfg.gp)
    print(
        f"best y = {float(carry.best_y):.4f}  n = {int(carry.n)}  "
        f"TR length = {float(carry.tr.length):.4f}  restarts = {int(carry.tr.restarts)}"
    )


if __name__ == "__main__":
    main()
