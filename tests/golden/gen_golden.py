"""Regenerate golden regret curves (SURVEY.md §4.2 golden tier).

Run from the repo root on the CPU backend (same as the test lane):
    python tests/golden/gen_golden.py
Goldens are compared with tolerance bands, not exactly — Cholesky reduction
order differs across backends/compilers, so trajectories can diverge after
many iterations; the bands check the *envelope* (monotonicity, final-regret
ceiling, early-progress floor) plus pointwise agreement on the first steps.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

GOLDEN_DIR = os.path.dirname(os.path.abspath(__file__))

RUNS = {
    "branin_ei": dict(config="branin_ei", max_evals=30, seed=0),
    "turbo1_ackley10": dict(config="turbo1_ackley10", max_evals=60, seed=0),
    # config-2 family: L-BFGS MLL refit per iteration (reduced budget/cands
    # keep the CPU lane affordable; the curve is still the L-BFGS fit path)
    "hartmann6_lbfgs": dict(
        config="hartmann6_lbfgs", max_evals=27, seed=0, n_candidates=256
    ),
    # config-5 family: a TuRBO-m trace (m=2, reduced candidates) — covers
    # vmapped per-TR fits + global TS allocation + init-stream restarts.
    # n_init=20 (vs the registered 40): at the reduced 120-eval budget the
    # full init design left only 4 search batches and the incumbent never
    # moved post-init, so the golden pinned nothing about the fit/TS path —
    # 40 init + 80 search evals makes the curve search-dominated.
    "turbom5_rover60": dict(
        config="turbom5_rover60", max_evals=120, seed=0, m=2, n_candidates=256,
        n_init=20,
    ),
}


def main():
    from benchmarks.regret_harness import run_config

    for name, spec in RUNS.items():
        rec = run_config(
            spec["config"], spec["seed"], spec["max_evals"],
            m=spec.get("m"), n_candidates=spec.get("n_candidates"),
            n_init=spec.get("n_init"),
        )
        out = {
            "config": spec["config"],
            "seed": spec["seed"],
            "max_evals": spec["max_evals"],
            "m": spec.get("m"),
            "n_candidates": spec.get("n_candidates"),
            "n_init": spec.get("n_init"),
            "regret_curve": rec["regret_curve"],
            "final_regret": rec["simple_regret"],
        }
        path = os.path.join(GOLDEN_DIR, f"{name}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"{name}: final regret {rec['simple_regret']:.4f} -> {path}")


if __name__ == "__main__":
    main()
