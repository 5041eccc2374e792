"""Full-budget regret parity (VERDICT r1 missing #4; BASELINE.md secondary
metric): TuRBO-1 on Ackley-10D at the FULL 1000-evaluation budget [B:10],
≥5 seeds, asserted against the independent numpy TuRBO-1 oracle — the
round-1 suite only asserted reduced budgets (100 evals).

TPU lane only (TURBOJAX_TPU_TESTS=1): our side runs the compiled scan on
the chip (~3 s/seed post-compile); the oracle side is ~75 s/seed of host
numpy. Total ~5 min — run once per round:

    TURBOJAX_TPU_TESTS=1 python -m pytest tests/test_full_budget_parity.py -q
"""

import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    os.environ.get("TURBOJAX_TPU_TESTS") != "1" or jax.default_backend() != "tpu",
    reason="full-budget parity runs in the TPU lane (TURBOJAX_TPU_TESTS=1)",
)

SEEDS = [0, 1, 2, 3, 4]
ORACLE_SEEDS = [0, 1, 2]


def test_config4_full_budget_regret_parity():
    from benchmarks.regret_harness import run_config
    from oracle.numpy_turbo import run_turbo1_oracle
    from turbojax import benchmarks as B

    ours = [run_config("turbo1_ackley10", s)["simple_regret"] for s in SEEDS]

    b = B.get_benchmark("ackley10")
    fn_np = lambda x: np.asarray(b.fn(x))  # noqa: E731
    oracle = []
    for s in ORACLE_SEEDS:
        _, by, _ = run_turbo1_oracle(
            fn_np, b.lb, b.ub, n_init=20, max_evals=1000, batch_size=10,
            n_candidates=1000, seed=s,
        )
        oracle.append(by - b.optimum)

    med_ours, med_oracle = float(np.median(ours)), float(np.median(oracle))
    import json

    print(
        "\nTPU_LANE "
        + json.dumps(
            {
                "gate": "config4_full_budget_parity",
                "median_ours": round(med_ours, 4),
                "median_oracle": round(med_oracle, 4),
                "ours_per_seed": [round(r, 3) for r in ours],
                "oracle_per_seed": [round(float(r), 3) for r in oracle],
            }
        ),
        flush=True,
    )
    # parity band (tightened in round 3 after the deep-refinement TS fix —
    # VERDICT r2 task 1 done-criteria): median ≤ 1.0 absolute and within
    # +0.5 of the oracle median. Round-3 campaign: TPU median 0.18 over 10
    # seeds (benchmarks/campaign_config4.py) vs oracle 0.46.
    assert med_ours <= 1.0, (
        f"median regret {med_ours:.2f} > 1.0 "
        f"(ours per-seed: {[round(r, 2) for r in ours]})"
    )
    assert med_ours <= med_oracle + 0.5, (
        f"full-budget parity violated: ours {med_ours:.2f} vs oracle {med_oracle:.2f} "
        f"(ours per-seed: {[round(r, 2) for r in ours]})"
    )
    assert med_oracle < 13.0  # oracle sanity: it is actually optimizing
