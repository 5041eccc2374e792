"""Fleet/multi-seed parallelism tests (SURVEY.md §2.6 seed axis)."""

import jax
import jax.numpy as jnp
import numpy as np

from turbojax import parallel as PAR


def test_fleet_slicing_covers_all_seeds():
    seeds = list(range(10))
    seen = []
    for pi in range(3):
        mine, results = PAR.fleet_run(
            lambda key: jax.random.uniform(key, ()), seeds, process_index=pi, process_count=3
        )
        seen.extend(mine)
        assert len(results) == len(mine)
    assert sorted(seen) == seeds  # disjoint cover, no comms needed


def test_fleet_single_host_defaults():
    mine, results = PAR.fleet_run(lambda key: float(jax.random.uniform(key, ())), [1, 2, 3])
    assert mine == [1, 2, 3]
    assert len(set(results)) == 3  # different seeds -> different draws
