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
}


def main():
    from benchmarks.regret_harness import run_config

    for name, spec in RUNS.items():
        rec = run_config(spec["config"], spec["seed"], spec["max_evals"])
        out = {
            "config": spec["config"],
            "seed": spec["seed"],
            "max_evals": spec["max_evals"],
            "regret_curve": rec["regret_curve"],
            "final_regret": rec["simple_regret"],
        }
        path = os.path.join(GOLDEN_DIR, f"{name}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"{name}: final regret {rec['simple_regret']:.4f} -> {path}")


if __name__ == "__main__":
    main()
