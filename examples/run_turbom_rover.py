"""Config 5 [B:11]: TuRBO-m (m=5) on the 60-D rover-style problem —
vmapped per-TR surrogates, global Thompson allocation. Pass --evals/--m to
reduce; --mesh N to shard the TR axis across the first N devices
(requires m % N == 0).

The full-budget run uses the host-loop driver (one jitted step + AOT
bucket ladder) — the supported mode at this scale: the monolithic
196-iteration scan program overwhelms the remote-tunnel compiler
(BASELINE.md; docs/DESIGN.md)."""

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
from turbojax.turbo_m import run_turbom


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--evals", type=int, default=None)
    ap.add_argument("--m", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--mesh", type=int, default=None,
        help="shard the trust-region axis across the first N devices",
    )
    args = ap.parse_args()

    cfg = get_config("turbom5_rover60")
    turbo = cfg.turbo
    if args.evals:
        import dataclasses

        turbo = dataclasses.replace(turbo, max_evals=args.evals)
    b = B.get_benchmark(cfg.benchmark)
    m = args.m or cfg.m
    key = jax.random.key(args.seed)
    if args.mesh:
        from turbojax import parallel as PAR

        mesh = PAR.make_mesh(args.mesh, axis="tr")
        carries, trace = PAR.run_turbom_sharded(
            key, b.fn, b.lb, b.ub, turbo, cfg.gp, mesh, m=m
        )
    else:
        carries, trace = run_turbom(
            key, b.fn, b.lb, b.ub, turbo, cfg.gp, m=m, host_loop=True
        )
    import numpy as np

    best = float(np.asarray(carries.best_y).min())
    print(f"best y = {best:.4f}  per-TR n = {np.asarray(carries.n).tolist()}")


if __name__ == "__main__":
    main()
