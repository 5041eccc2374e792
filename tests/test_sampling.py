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


# --- LMS scrambling (round 5: the scipy/reference-stack stream class) -------


def test_lms_scramble_sv_bit_exact_vs_scipy():
    """Replaying scipy's own rng draws through ``lms_scramble_sv`` must
    reproduce ``Sobol(scramble=True)._sv`` bit-exactly — the transform is
    scipy's ``_cscramble`` (Matousek LMS), not merely LMS-like."""
    from scipy.stats._qmc import rng_integers

    bits = S._SOBOL_BITS
    for d, seed in ((3, 1234), (10, 7), (60, 0)):
        sv0 = S._direction_numbers(d)
        ref = qmc.Sobol(d=d, scramble=True, seed=seed)
        rng = np.random.default_rng(seed)
        shift_bits = rng_integers(rng, 2, size=(d, bits), dtype=ref._sv.dtype)
        shift = shift_bits.astype(np.uint64) @ (2 ** np.arange(bits, dtype=np.uint64))
        ltm = np.tril(rng_integers(rng, 2, size=(d, bits, bits), dtype=ref._sv.dtype))
        # ltm row i, column j (MSB-first) -> integer-bit row mask with the
        # forced diagonal (scipy sets the diagonal inside _cscramble)
        col_weights = (1 << (bits - 1 - np.arange(bits))).astype(np.uint32)
        M = ltm.astype(np.uint32)
        idx = np.arange(bits)
        M[:, idx, idx] = 1  # unit diagonal
        rows = (M * col_weights[None, None, :]).sum(axis=2).astype(np.uint32)
        ours = np.asarray(S.lms_scramble_sv(jnp.asarray(sv0), jnp.asarray(rows)))
        np.testing.assert_array_equal(ours.astype(np.uint64), np.array(ref._sv, np.uint64))
        np.testing.assert_array_equal(shift, np.array(ref._shift, np.uint64))


def test_lms_random_rows_structure(key):
    """Row masks: unit diagonal, random only strictly above it (MSB-first),
    i.e. integer-bit positions > 29−i."""
    bits = S._SOBOL_BITS
    rows = np.asarray(S.lms_random_rows(key, 8))
    assert rows.shape == (8, bits)
    for i in range(bits):
        diag = 1 << (bits - 1 - i)
        below = diag - 1  # positions < 29-i must be zero
        assert np.all(rows[:, i] & diag == diag)
        assert np.all(rows[:, i] & below == 0)
    # some randomness above the diagonal (row 29 has 29 free bits)
    assert len(set(np.asarray(S.lms_random_rows(jax.random.key(1), 8))[:, bits - 1].tolist())) > 1


def test_sobol_lms_uniform_and_stratified(key):
    """LMS+shift preserves the (t, m, s)-net structure: 2^m points remain
    one-per-stratum in every dyadic 1-D refinement, and marginals stay
    uniform. (Digital-shift-only already had this; the test pins that the
    scramble didn't break it.)"""
    n, d = 256, 6
    pts = np.asarray(S.sobol_sample(key, d, n, dtype=jnp.float64, scramble="lms"))
    assert pts.min() >= 0.0 and pts.max() < 1.0
    for j in range(d):
        strata = np.floor(pts[:, j] * n).astype(int)
        assert sorted(strata.tolist()) == list(range(n)), f"dim {j} not a net"
    # 2-D dyadic stratification (16 x 16 boxes, one point each) on dim pairs
    for (a, b) in ((0, 1), (2, 5)):
        box = np.floor(pts[:, a] * 16).astype(int) * 16 + np.floor(pts[:, b] * 16).astype(int)
        assert sorted(box.tolist()) == list(range(256))


def test_sobol_lms_distinct_per_key(key):
    p1 = np.asarray(S.sobol_sample(key, 5, 128, scramble="lms"))
    p2 = np.asarray(S.sobol_sample(jax.random.key(42), 5, 128, scramble="lms"))
    assert not np.allclose(p1, p2)
    f = jax.jit(lambda k: S.sobol_sample(k, 5, 128, scramble="lms"))
    np.testing.assert_allclose(np.asarray(f(key)), p1, rtol=1e-6)


def test_sobol_lms_statistical_agreement_with_scipy():
    """RQMC integration-variance agreement with scipy's scrambled stream on
    a separable smooth integrand: the two streams are the same
    randomization class, so their RMSE over randomizations must be the
    same order (band 3x), and both clearly beat plain MC."""
    d, n, reps = 6, 256, 24
    f = lambda x: np.prod(1.0 + 0.6 * (x - 0.5), axis=1)  # true integral 1.0
    est_ours, est_scipy, est_mc = [], [], []
    rng = np.random.default_rng(0)
    for r in range(reps):
        ours = np.asarray(S.sobol_sample(jax.random.key(r), d, n, dtype=jnp.float64, scramble="lms"))
        sp = qmc.Sobol(d=d, scramble=True, seed=r).random(n)
        mc = rng.random((n, d))
        est_ours.append(f(ours).mean() - 1.0)
        est_scipy.append(f(sp).mean() - 1.0)
        est_mc.append(f(mc).mean() - 1.0)
    rmse_ours = float(np.sqrt(np.mean(np.square(est_ours))))
    rmse_scipy = float(np.sqrt(np.mean(np.square(est_scipy))))
    rmse_mc = float(np.sqrt(np.mean(np.square(est_mc))))
    assert rmse_ours < rmse_scipy * 3.0 and rmse_scipy < rmse_ours * 3.0, (
        rmse_ours, rmse_scipy)
    assert rmse_ours < rmse_mc  # QMC beats MC at n=256 on a smooth integrand


def test_tr_candidates_scramble_thread(key):
    d = 8
    center = jnp.full((d,), 0.5)
    ls = jnp.ones((d,))
    c1 = np.asarray(S.tr_candidates(key, center, jnp.asarray(0.4), ls, 100, scramble="lms"))
    c2 = np.asarray(S.tr_candidates(key, center, jnp.asarray(0.4), ls, 100, scramble="shift"))
    assert c1.shape == c2.shape == (100, d)
    assert np.all((c1 >= 0.3 - 1e-6) & (c1 <= 0.7 + 1e-6))
    assert not np.allclose(c1, c2)  # the scramble actually changes the stream
