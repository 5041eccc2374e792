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
