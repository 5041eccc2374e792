"""Config 5 [B:11]: TuRBO-m (m=5) on the 60-D rover-style problem —
vmapped per-TR surrogates, global Thompson allocation. Pass --evals/--m to
reduce; --mesh to shard the TR axis across available devices."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    args = ap.parse_args()

    cfg = get_config("turbom5_rover60")
    turbo = cfg.turbo
    if args.evals:
        import dataclasses

        turbo = dataclasses.replace(turbo, max_evals=args.evals)
    b = B.get_benchmark(cfg.benchmark)
    carries, trace = run_turbom(
        jax.random.key(args.seed), b.fn, b.lb, b.ub, turbo, cfg.gp, m=args.m or cfg.m
    )
    import numpy as np

    best = float(np.asarray(carries.best_y).min())
    print(f"best y = {best:.4f}  per-TR n = {np.asarray(carries.n).tolist()}")


if __name__ == "__main__":
    main()
