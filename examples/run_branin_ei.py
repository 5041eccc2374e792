"""Config 1 [B:7]: Branin-2D, fixed-hyperparam RBF GP + EI, 50 iterations,
incremental Cholesky — the whole loop compiled as one lax.scan on device."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CI smoke runs force a backend (the axon TPU plugin ignores JAX_PLATFORMS):
if os.environ.get("TURBOJAX_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["TURBOJAX_PLATFORM"])

import jax

from turbojax import benchmarks as B
from turbojax import gp as G
from turbojax.runlog import RunLog
from configs import get_config


def main():
    cfg = get_config("branin_ei")
    b = B.get_benchmark(cfg.benchmark)
    from turbojax.bo import run_bo

    res = run_bo(
        jax.random.key(0), b.fn, b.lb, b.ub, cfg.bo, cfg.gp,
        fixed_params=G.default_params(b.dim, cfg.gp),
    )
    with RunLog(verbose=True) as log:
        for i, v in enumerate(res.incumbent_trace.tolist()):
            log.log(i, best_y=v)
    print(f"best y = {float(res.best_y):.6f}  (optimum {b.optimum})  at x = {res.best_x}")


if __name__ == "__main__":
    main()
