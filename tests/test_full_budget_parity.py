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


def test_config5_full_budget_regret_parity():
    """Config-5 anchor (VERDICT r3 task 1): the flagship TuRBO-m config at
    the FULL 2000-eval rover60 budget vs the reference-algorithm TuRBO-m
    oracle. The oracle side costs ~20 min/seed of 1-core f64 numpy, so the
    test reads the committed full-budget campaign results
    (benchmarks/results_oracle_turbom_rover.json, regenerable via
    benchmarks/campaign_oracle_turbom.py) rather than re-running it; the
    build side runs live on the chip (~1-2 min/seed warm).

    Band: the build's median must land at or below the oracle's + 3.0
    (one documented rover seed-spread quantum; BASELINE.md). The shipped
    ARD default has measured ~9.5 vs the oracle's isotropic-trainer ~14 —
    the assert catches a regression of the whole quality margin, not noise.
    """
    import json

    oracle_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "results_oracle_turbom_rover.json",
    )
    with open(oracle_path) as f:
        oracle = json.load(f)
    assert oracle["summary"]["n_seeds"] >= 3, "oracle campaign incomplete"
    med_oracle = float(oracle["summary"]["median"])

    from benchmarks.regret_harness import run_config

    ours = [run_config("turbom5_rover60", s)["best"] for s in [0, 1, 2]]
    med_ours = float(np.median(ours))
    print(
        "\nTPU_LANE "
        + json.dumps(
            {
                "gate": "config5_full_budget_parity",
                "median_ours": round(med_ours, 4),
                "median_oracle": round(med_oracle, 4),
                "ours_per_seed": [round(r, 3) for r in ours],
                "oracle_n_seeds": oracle["summary"]["n_seeds"],
            }
        ),
        flush=True,
    )
    assert med_oracle < 30.0  # oracle sanity: it is actually optimizing
    assert med_ours <= med_oracle + 3.0, (
        f"config-5 parity violated: ours {med_ours:.2f} vs oracle "
        f"{med_oracle:.2f} (ours per-seed: {[round(r, 2) for r in ours]})"
    )
