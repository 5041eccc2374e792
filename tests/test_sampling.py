"""Unit tests: Sobol/LHS/TR candidate generation (SURVEY.md C16, §7.3.7)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import qmc

from turbojax import sampling as S


def test_sobol_raw_bit_exact_vs_scipy():
    for d in (1, 3, 10, 60):
        ref = qmc.Sobol(d=d, scramble=False).random(64)
        ours = np.asarray(S.sobol_raw(d, 64, dtype=jnp.float64))
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_sobol_shift_uniform_and_distinct(key):
    pts1 = np.asarray(S.sobol_sample(key, 5, 512))
    pts2 = np.asarray(S.sobol_sample(jax.random.key(7), 5, 512))
    assert pts1.min() >= 0.0 and pts1.max() < 1.0
    assert not np.allclose(pts1, pts2)  # different randomization per key
    # digital shift preserves near-uniform marginals
    assert np.all(np.abs(pts1.mean(axis=0) - 0.5) < 0.05)


def test_sobol_jit_traceable(key):
    f = jax.jit(lambda k: S.sobol_sample(k, 4, 128))
    out = f(key)
    assert out.shape == (128, 4)


def test_latin_hypercube_stratification(key):
    n, d = 64, 3
    pts = np.asarray(S.latin_hypercube(key, n, d))
    assert pts.shape == (n, d)
    # exactly one point per 1/n stratum per dimension
    for j in range(d):
        strata = np.floor(pts[:, j] * n).astype(int)
        assert sorted(strata.tolist()) == list(range(n))


def test_perturbation_mask_always_one_dim(key):
    mask = np.asarray(S.perturbation_mask(key, 256, 40))  # prob = 0.5
    assert mask.any(axis=1).all()
    frac = mask.mean()
    assert 0.4 < frac < 0.6


def test_perturbation_mask_low_dim_all_on(key):
    mask = np.asarray(S.perturbation_mask(key, 50, 3))  # prob = 1 for d<=20
    assert mask.all()


def test_tr_candidates_inside_box(key):
    d = 8
    center = jnp.full((d,), 0.9)
    ls = jnp.asarray(np.random.RandomState(0).uniform(0.2, 2.0, d))
    cands = np.asarray(S.tr_candidates(key, center, jnp.asarray(0.4), ls, 200))
    assert cands.shape == (200, d)
    assert cands.min() >= 0.0 and cands.max() <= 1.0
    # every candidate differs from the center in at least one dim, and
    # unperturbed dims are exactly the center value
    diff = cands != np.asarray(center)
    assert diff.any(axis=1).all()


def test_tr_candidates_respect_length(key):
    d = 4
    center = jnp.full((d,), 0.5)
    ls = jnp.ones((d,))
    length = 0.2
    cands = np.asarray(S.tr_candidates(key, center, jnp.asarray(length), ls, 100))
    # isotropic lengthscales -> box is exactly center ± length/2
    assert np.all(np.abs(cands - 0.5) <= length / 2 + 1e-9)


def test_n_candidates_rule():
    assert S.n_candidates(2) == 200
    assert S.n_candidates(10) == 1000
    assert S.n_candidates(60) == 5000  # capped [B:9]
