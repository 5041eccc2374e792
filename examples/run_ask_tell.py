"""Ask/tell with a true black-box objective (host-side numpy function):
the reference-style constructor API [R] (SURVEY.md C21)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CI smoke runs force a backend (the axon TPU plugin ignores JAX_PLATFORMS):
if os.environ.get("TURBOJAX_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["TURBOJAX_PLATFORM"])

import numpy as np

from turbojax.api import Optimizer


def expensive_simulator(xs: np.ndarray) -> np.ndarray:
    """Stands in for any non-JAX objective (lab experiment, external sim)."""
    return np.sum((xs - 0.7) ** 2, axis=-1) + 0.01 * np.random.randn(len(xs))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--evals", type=int, default=100)
    args = ap.parse_args()

    d = 6
    opt = Optimizer(lb=[0.0] * d, ub=[1.0] * d, method="turbo1", n_init=10,
                    max_evals=args.evals, batch_size=5)
    res = opt.optimize(expensive_simulator)
    print(f"best y = {res.best_y:.5f} at x = {np.round(res.best_x, 3)}")


if __name__ == "__main__":
    main()
