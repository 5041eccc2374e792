"""Unit tests: acquisitions (SURVEY.md §4.2): EI/UCB closed forms vs scipy
oracle; TS sample distribution matches the posterior statistically."""

import jax
import jax.numpy as jnp
import numpy as np

from oracle import numpy_gp as onp
from turbojax import acq as A
from turbojax import gp as G
from turbojax import transforms as T
from turbojax.config import GPConfig

CFG = GPConfig(kernel="matern52", jitter=0.0)


def test_ei_vs_scipy_oracle(rng):
    mu = jnp.asarray(rng.randn(100))
    var = jnp.asarray(rng.rand(100) * 2 + 1e-6)
    best = jnp.asarray(0.3)
    ours = np.asarray(A.expected_improvement(mu, var, best, xi=0.01))
    theirs = onp.expected_improvement(np.asarray(mu), np.asarray(var), 0.3, xi=0.01)
    np.testing.assert_allclose(ours, theirs, rtol=1e-7, atol=1e-12)
    assert np.all(ours >= 0.0)


def test_ei_sigma_zero_limit():
    mu = jnp.asarray([0.0, 1.0])
    var = jnp.zeros(2)
    ei = np.asarray(A.expected_improvement(mu, var, jnp.asarray(0.5)))
    np.testing.assert_allclose(ei, [0.5, 0.0], atol=1e-12)


def test_lcb_ucb(rng):
    mu = jnp.asarray(rng.randn(10))
    var = jnp.asarray(rng.rand(10))
    np.testing.assert_allclose(
        np.asarray(A.lower_confidence_bound(mu, var, 2.0)),
        onp.lower_confidence_bound(np.asarray(mu), np.asarray(var), 2.0),
        rtol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(A.upper_confidence_bound(mu, var, 2.0)),
        np.asarray(mu) + 2.0 * np.sqrt(np.asarray(var)),
        rtol=1e-8,
    )


def _state(rng, n=20, d=2, n_max=32):
    x = rng.rand(n, d)
    y = np.sin(4 * x[:, 0]) + 0.2 * rng.randn(n)
    x_buf = jnp.zeros((n_max, d)).at[:n].set(jnp.asarray(x))
    y_buf = jnp.zeros((n_max,)).at[:n].set(jnp.asarray(y))
    mask = jnp.arange(n_max) < n
    raw = G.GPParams(
        raw_lengthscale=T.unconstrain(jnp.full((d,), 0.4), *CFG.lengthscale_bounds),
        raw_outputscale=T.unconstrain(jnp.asarray(1.0), *CFG.outputscale_bounds),
        raw_noise=T.unconstrain(jnp.asarray(1e-3), *CFG.noise_bounds),
        raw_mean=jnp.asarray(0.0),
    )
    return G.make_gp_state(x_buf, y_buf, mask, raw, CFG)


def test_thompson_sample_distribution(rng, key):
    """Mean/cov of 10k TS draws matches the posterior (statistical tol)."""
    state = _state(rng)
    xs = jnp.asarray(rng.rand(12, 2))
    draws = np.asarray(A.thompson_samples(key, state, xs, 10000, CFG))
    mu_ref, cov_ref = G.posterior_cov(state, xs, CFG)
    mu_ref, cov_ref = np.asarray(mu_ref), np.asarray(cov_ref)
    sd_ref = np.sqrt(np.diag(cov_ref))
    np.testing.assert_allclose(draws.mean(axis=0), mu_ref, atol=4 * sd_ref.max() / np.sqrt(10000) + 1e-3)
    emp_cov = np.cov(draws.T)
    np.testing.assert_allclose(emp_cov, cov_ref, atol=0.05 * max(1e-3, sd_ref.max() ** 2) + 2e-3)


def test_thompson_chunked_marginals(rng, key):
    """Chunked TS keeps exact marginals (block-diagonal joint, SURVEY.md §7.3.5)."""
    state = _state(rng)
    xs = jnp.asarray(rng.rand(16, 2))
    draws = np.asarray(A.thompson_samples(key, state, xs, 8000, CFG, chunk_size=4))
    mu_ref, var_ref = G.gp_posterior(state, xs, CFG)
    np.testing.assert_allclose(draws.mean(axis=0), np.asarray(mu_ref), atol=0.05)
    np.testing.assert_allclose(draws.var(axis=0), np.asarray(var_ref), rtol=0.15, atol=1e-3)


def test_select_q_batch_without_replacement():
    samples = jnp.asarray(
        [
            [5.0, 1.0, 3.0, 4.0],
            [5.0, 1.0, 3.0, 4.0],  # same row: must pick 2nd-best now
            [0.0, 9.0, 9.0, 9.0],
        ]
    )
    idx, vals = A.select_q_batch(samples)
    assert idx.tolist() == [1, 2, 0]
    np.testing.assert_allclose(np.asarray(vals), [1.0, 3.0, 0.0])


def test_select_q_batch_respects_valid_mask():
    samples = jnp.asarray([[1.0, 2.0, 3.0]])
    idx, _ = A.select_q_batch(samples, valid=jnp.asarray([False, True, True]))
    assert idx.tolist() == [1]


def test_thompson_select_shapes(rng, key):
    state = _state(rng)
    xs = jnp.asarray(rng.rand(50, 2))
    pts, vals = A.thompson_select(key, state, xs, 5, CFG)
    assert pts.shape == (5, 2) and vals.shape == (5,)


def test_select_q_batch_never_picks_nonfinite():
    """NaN/inf draws (a failed covariance factor) must be unselectable —
    jnp.argmin would otherwise return the first NaN index and the batch
    degenerates to deterministic garbage (the round-2 deep-refinement
    failure isolated by benchmarks/exp_ts_numerics.py)."""
    samples = jnp.asarray(
        [
            [jnp.nan, 2.0, jnp.inf, 1.0],
            [jnp.nan, 2.0, jnp.inf, 1.0],
        ]
    )
    idx, vals = A.select_q_batch(samples)
    assert idx.tolist() == [3, 1]
    assert np.isfinite(np.asarray(vals)).all()


def _deep_refinement_state(rng, n=160, d=10, n_max=256):
    """A TuRBO-like deep-refinement regime: training data in a shrinking
    box around an incumbent, candidates in a tiny trust region — the f32
    posterior covariance here is indefinite beyond the old 1e-6·cmax bump."""
    center = np.full(d, 0.41)
    x = np.clip(center + 0.05 * rng.randn(n, d), 0, 1).astype(np.float32)
    y = (np.sum((x - 0.4) ** 2, axis=1) * 30.0 + 0.01 * rng.randn(n)).astype(np.float32)
    x_buf = jnp.zeros((n_max, d), jnp.float32).at[:n].set(jnp.asarray(x))
    y_buf = jnp.zeros((n_max,), jnp.float32).at[:n].set(jnp.asarray(y))
    mask = jnp.arange(n_max) < n
    cfg = GPConfig(kernel="matern52", jitter=1e-6)
    raw = G.GPParams(
        raw_lengthscale=T.unconstrain(jnp.full((d,), 1.0, jnp.float32), *cfg.lengthscale_bounds),
        raw_outputscale=T.unconstrain(jnp.asarray(1.0, jnp.float32), *cfg.outputscale_bounds),
        raw_noise=T.unconstrain(jnp.asarray(1e-2, jnp.float32), *cfg.noise_bounds),
        raw_mean=jnp.asarray(0.0, jnp.float32),
    )
    state = G.make_gp_state(x_buf, y_buf, mask, raw, cfg)
    cands = np.clip(
        center + 0.003 * (rng.rand(500, d) - 0.5), 0, 1
    ).astype(np.float32)  # tiny TR box -> near-singular joint covariance
    return state, jnp.asarray(cands), cfg


def test_thompson_robust_at_deep_refinement(rng, key):
    """The escalating error-floor bump keeps deep-refinement TS finite and
    non-degenerate (VERDICT r2 #1): draws are finite, selections vary with
    the key, and no batch collapses to the first-q index pattern."""
    state, cands, cfg = _deep_refinement_state(rng)
    idx_sets = []
    for i in range(6):
        samples = A.thompson_samples(jax.random.key(i), state, cands, 5, cfg)
        assert np.isfinite(np.asarray(samples)).all(), "TS draws went non-finite"
        idxs, vals = A.select_q_batch(samples)
        assert np.isfinite(np.asarray(vals)).all()
        idx_sets.append(tuple(np.asarray(idxs).tolist()))
    assert len(set(idx_sets)) > 1, "selection degenerate: identical across keys"
    assert all(s != (0, 1, 2, 3, 4) for s in idx_sets)


def test_thompson_f64_matches_exact_law(rng, key):
    """ts_dtype='float64' (exact-law TS): draw moments at deep refinement
    match the f64 reference covariance, where the f32 path needs its bump."""
    state, cands, cfg = _deep_refinement_state(rng)
    sub = cands[:40]
    draws = np.asarray(
        A.thompson_samples(key, state, sub, 4000, cfg, dtype="float64"), np.float64
    )
    state64 = A._state_f64(state, cfg)
    mu_ref, cov_ref = G.posterior_cov(state64, sub.astype(jnp.float64), cfg)
    mu_ref, cov_ref = np.asarray(mu_ref), np.asarray(cov_ref)
    sd = np.sqrt(np.maximum(np.diag(cov_ref), 1e-12))
    np.testing.assert_allclose(
        draws.mean(axis=0), mu_ref, atol=5 * sd.max() / np.sqrt(4000) + 1e-4
    )
    emp = np.cov(draws.T)
    # the only distortion allowed is the (tiny, f64-rung) diagonal bump
    np.testing.assert_allclose(
        np.diag(emp), np.diag(cov_ref), rtol=0.2, atol=3e-5 * float(state.y_std) ** 2 * 2
    )


def test_rff_frequencies_distributions(key):
    # RBF: standard normal; Matérn-5/2: heavier-tailed t with matching center
    om_rbf, b = A.rff_frequencies(key, 3, 4000, "rbf", jnp.float64)
    assert abs(float(om_rbf.mean())) < 0.05
    assert abs(float(om_rbf.std()) - 1.0) < 0.05
    assert b.min() >= 0 and b.max() < 2 * np.pi
    om_m52, _ = A.rff_frequencies(key, 3, 4000, "matern52", jnp.float64)
    # t with 5 dof has std sqrt(5/3) ≈ 1.291
    assert abs(float(om_m52.std()) - np.sqrt(5.0 / 3.0)) < 0.1


def test_rff_feature_kernel_approximation(rng, key):
    """E[φ(x)ᵀφ(x')] converges to k(x, x') (Rahimi-Recht identity)."""
    from turbojax import kernels as K

    d, m = 2, 16384
    x = jnp.asarray(rng.rand(10, d))
    ls = jnp.asarray([0.5, 0.8])
    params = {"lengthscale": ls, "outputscale": jnp.asarray(1.5)}
    omega, b = A.rff_frequencies(key, d, m, "rbf", jnp.float64)
    phi = A._rff_phi(x, omega, b, ls, jnp.asarray(1.5))
    approx = np.asarray(phi @ phi.T)
    exact = np.asarray(K.rbf(params, x, x))
    np.testing.assert_allclose(approx, exact, atol=0.06)


def test_rff_posterior_mean_matches_exact(rng, key):
    """The RFF weight-space *posterior mean* at candidates approximates the
    exact GP posterior mean (feature-truncation tolerance) — validates the
    Bayesian-linear-regression conditioning inside the sampler (C13)."""
    from turbojax import linalg as L
    from turbojax.acq import _rff_phi, rff_frequencies

    # well-conditioned regime: larger noise keeps K⁻¹ from amplifying the
    # O(1/√M) feature-truncation error (the near-noiseless regime is RFF's
    # known "variance starvation" weakness — why the sampler is off by default)
    cfg = GPConfig(kernel="rbf", jitter=0.0, noise_bounds=(1e-4, 0.5))
    x = rng.rand(20, 2)
    y = np.sin(4 * x[:, 0]) + 0.2 * rng.randn(20)
    x_buf = jnp.zeros((32, 2)).at[:20].set(jnp.asarray(x))
    y_buf = jnp.zeros((32,)).at[:20].set(jnp.asarray(y))
    mask = jnp.arange(32) < 20
    from turbojax import transforms as T

    raw = G.GPParams(
        raw_lengthscale=T.unconstrain(jnp.full((2,), 0.4), *cfg.lengthscale_bounds),
        raw_outputscale=T.unconstrain(jnp.asarray(1.0), *cfg.outputscale_bounds),
        raw_noise=T.unconstrain(jnp.asarray(0.05), *cfg.noise_bounds),
        raw_mean=jnp.asarray(0.0),
    )
    state = G.make_gp_state(x_buf, y_buf, mask, raw, cfg)
    CFG_L = cfg
    xs = jnp.asarray(rng.rand(12, 2))
    dim = 2
    m = 4096
    p = state.params
    omega, b = rff_frequencies(key, dim, m, CFG_L.kernel, jnp.float64)
    ls = jnp.broadcast_to(p["lengthscale"], (dim,))
    phi_x = jnp.where(state.mask[:, None], _rff_phi(state.x_buf, omega, b, ls, p["outputscale"]), 0.0)
    a_mat = phi_x.T @ phi_x / p["noise"] + jnp.eye(m, dtype=jnp.float64)
    chol_a = jnp.linalg.cholesky(a_mat)
    resid = jnp.where(state.mask, state.chol @ (state.chol.T @ state.alpha), 0.0)
    mean_w = L.cho_solve(chol_a, phi_x.T @ resid / p["noise"])
    mu_rff = np.asarray(_rff_phi(xs, omega, b, ls, p["outputscale"]) @ mean_w)

    mu_exact, _ = G.gp_posterior(state, xs, CFG_L, standardized=True)
    np.testing.assert_allclose(mu_rff, np.asarray(mu_exact), atol=0.08)


def test_rff_thompson_select_shapes_and_uniqueness(rng, key):
    state = _state(rng)
    xs = jnp.asarray(rng.rand(64, 2))
    pts, vals = A.rff_thompson_select(key, state, xs, 6, CFG, n_features=512)
    assert pts.shape == (6, 2) and vals.shape == (6,)
    assert np.unique(np.asarray(pts), axis=0).shape[0] == 6


def test_rff_variance_starvation_characterization(rng):
    """Characterize the RFF sampler's known failure mode (docs/DESIGN.md §5,
    VERDICT r1 weak #8) and pin down WHEN ``ts_sampler="rff"`` is safe.

    Measured regime map (n=96, d=1, M features, 4000 paths): the signed
    median relative error of the empirical path variance vs the exact
    posterior variance is governed by the NOISE level — the exact posterior
    variance scales with σ², while the RFF kernel-approximation error scales
    like 1/√M, so near noiseless data the paths under-disperse at ANY
    practical M (−62% at σ²=1e-4 even with M=1024 ≈ 10n), while at σ²=0.1
    the same M is accurate to ~6%. This is why the exact chunked sampler is
    the default: TuRBO fits near-deterministic benchmarks where σ² rides the
    noise floor. Guidance: enable "rff" only when fitted noise ≳ 1e-2."""
    n, n_max, m_cand, n_paths = 96, 128, 64, 4000
    x = np.sort(rng.rand(n))[:, None]
    y = np.sin(6 * x[:, 0])  # deterministic objective
    cfg = GPConfig(kernel="matern52", jitter=0.0)
    xs = jnp.asarray(rng.rand(m_cand, 1))
    x_buf = jnp.zeros((n_max, 1)).at[:n].set(jnp.asarray(x))
    y_buf = jnp.zeros((n_max,)).at[:n].set(jnp.asarray(y))
    mask = jnp.arange(n_max) < n

    def signed_err(noise, n_features):
        raw = G.GPParams(
            raw_lengthscale=T.unconstrain(jnp.full((1,), 0.2), *cfg.lengthscale_bounds),
            raw_outputscale=T.unconstrain(jnp.asarray(1.0), *cfg.outputscale_bounds),
            raw_noise=T.unconstrain(jnp.asarray(noise), *cfg.noise_bounds),
            raw_mean=jnp.asarray(0.0),
        )
        state = G.make_gp_state(x_buf, y_buf, mask, raw, cfg)
        _, var_exact = G.gp_posterior(state, xs, cfg)
        var_exact = np.asarray(var_exact)
        paths = A.rff_paths(jax.random.key(0), state, xs, n_paths, cfg, n_features)
        var_emp = np.var(np.asarray(paths), axis=0)
        return np.median((var_emp - var_exact) / (var_exact + 1e-12))

    starved = signed_err(1e-4, 1024)  # noise floor: the TuRBO regime
    noisy = signed_err(1e-1, 1024)  # genuinely noisy observations
    # (a) under-dispersion (negative sign), badly starved at the noise floor
    assert starved < -0.4, f"expected severe starvation at σ²=1e-4: {starved:+.3f}"
    # (b) accurate in the high-noise regime — rff IS safe there
    assert abs(noisy) < 0.15, f"rff should be accurate at σ²=0.1: {noisy:+.3f}"
    # (c) more features help but cannot rescue the noise-floor regime
    starved_small_m = signed_err(1e-4, 128)
    assert starved_small_m <= starved + 0.02, (
        f"error should not improve with fewer features: "
        f"M=128 {starved_small_m:+.3f} vs M=1024 {starved:+.3f}"
    )


def test_pathwise_sample_distribution(rng, key):
    """Decoupled pathwise draws (Matheron update) match the exact posterior
    moments up to the O(1/√M) prior-truncation error — globally joint, no
    chunking. 10k paths, M=4096 features."""
    state = _state(rng)
    xs = jnp.asarray(rng.rand(12, 2))
    draws = np.asarray(A.pathwise_paths(key, state, xs, 10000, CFG, n_features=4096))
    mu_ref, cov_ref = G.posterior_cov(state, xs, CFG)
    mu_ref, cov_ref = np.asarray(mu_ref), np.asarray(cov_ref)
    sd_ref = np.sqrt(np.diag(cov_ref))
    np.testing.assert_allclose(
        draws.mean(axis=0), mu_ref, atol=4 * sd_ref.max() / np.sqrt(10000) + 0.02
    )
    emp_cov = np.cov(draws.T)
    # statistical tol + feature-truncation tol (prior path error only)
    np.testing.assert_allclose(emp_cov, cov_ref, atol=0.05 * max(1e-2, sd_ref.max() ** 2) + 0.02)


def test_pathwise_no_variance_starvation(rng):
    """The pathwise sampler's data conditioning is EXACT (uses K through the
    cached factor, not φφᵀ), so the noise-floor regime that starves the
    weight-space RFF sampler (−60% path variance at σ²=1e-4, see
    test_rff_variance_starvation_characterization) leaves pathwise draws
    calibrated — the reason "pathwise" is safe where "rff" is not."""
    n, n_max, m_cand, n_paths = 96, 128, 64, 4000
    x = np.sort(rng.rand(n))[:, None]
    y = np.sin(6 * x[:, 0])  # deterministic objective (TuRBO regime)
    cfg = GPConfig(kernel="matern52", jitter=0.0)
    xs = jnp.asarray(rng.rand(m_cand, 1))
    x_buf = jnp.zeros((n_max, 1)).at[:n].set(jnp.asarray(x))
    y_buf = jnp.zeros((n_max,)).at[:n].set(jnp.asarray(y))
    mask = jnp.arange(n_max) < n
    raw = G.GPParams(
        raw_lengthscale=T.unconstrain(jnp.full((1,), 0.2), *cfg.lengthscale_bounds),
        raw_outputscale=T.unconstrain(jnp.asarray(1.0), *cfg.outputscale_bounds),
        raw_noise=T.unconstrain(jnp.asarray(1e-4), *cfg.noise_bounds),
        raw_mean=jnp.asarray(0.0),
    )
    state = G.make_gp_state(x_buf, y_buf, mask, raw, cfg)
    _, var_exact = G.gp_posterior(state, xs, cfg)
    var_exact = np.asarray(var_exact)
    paths = A.pathwise_paths(jax.random.key(0), state, xs, n_paths, cfg, 1024)
    var_emp = np.var(np.asarray(paths), axis=0)
    err = np.median((var_emp - var_exact) / (var_exact + 1e-12))
    assert abs(err) < 0.2, f"pathwise should stay calibrated at the noise floor: {err:+.3f}"
    # and the posterior-mean component is exact: path average ≈ exact mean
    mu_exact, _ = G.gp_posterior(state, xs, cfg)
    np.testing.assert_allclose(
        paths.mean(axis=0), np.asarray(mu_exact),
        atol=4 * np.sqrt(var_exact.max()) / np.sqrt(n_paths) + 0.02,
    )


def test_pathwise_thompson_select_shapes_and_uniqueness(rng, key):
    state = _state(rng)
    xs = jnp.asarray(rng.rand(64, 2))
    pts, vals = A.pathwise_thompson_select(key, state, xs, 6, CFG, n_features=512)
    assert pts.shape == (6, 2) and vals.shape == (6,)
    assert np.unique(np.asarray(pts), axis=0).shape[0] == 6
