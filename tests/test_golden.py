"""Golden regret-curve tests (SURVEY.md §4.2): fixed-seed reduced runs vs
stored curves with tolerance bands (exact equality is not expected across
backends — Cholesky reduction order differs; the bands check the envelope
plus pointwise agreement early in the run).

Regenerate after an intentional algorithm change:
    python tests/golden/gen_golden.py
"""

import json
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _load(name):
    with open(os.path.join(GOLDEN_DIR, f"{name}.json")) as f:
        return json.load(f)


@pytest.mark.parametrize(
    "name", ["branin_ei", "turbo1_ackley10", "hartmann6_lbfgs", "turbom5_rover60"]
)
def test_golden_regret(name):
    from benchmarks.regret_harness import run_config

    golden = _load(name)
    rec = run_config(
        golden["config"], golden["seed"], golden["max_evals"],
        m=golden.get("m"), n_candidates=golden.get("n_candidates"),
        n_init=golden.get("n_init"),
    )
    curve = np.asarray(rec["regret_curve"])
    gold = np.asarray(golden["regret_curve"])

    assert curve.shape == gold.shape
    assert np.all(np.diff(curve) <= 1e-6)  # monotone incumbent
    # same-backend fixed seed: early iterations should agree tightly
    k = max(2, len(gold) // 4)
    np.testing.assert_allclose(curve[:k], gold[:k], rtol=1e-3, atol=1e-3)
    # envelope: final regret within a generous band of the golden
    assert rec["simple_regret"] <= golden["final_regret"] * 1.5 + 0.5
