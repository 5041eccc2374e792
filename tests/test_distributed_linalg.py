"""Distributed blocked Cholesky / solves vs dense (SURVEY.md §5.7(b)).

Exactness tests on the 8-virtual-device CPU mesh; the same code runs on a
pod slice unchanged (mesh-size generic, like all of turbojax.parallel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oracle import numpy_gp as onp
from turbojax import distributed_linalg as DL
from turbojax import parallel as PAR


def _spd(rng, n, noise=1e-2):
    x = rng.rand(n, 6)
    k = onp.kernel_matrix("matern52", x, x, np.full(6, 0.5), 1.0)
    k[np.diag_indices(n)] += noise
    return jnp.asarray(k)


@pytest.mark.parametrize("n_dev,panel", [(4, 16)])
def test_distributed_cholesky_exact(rng, n_dev, panel):
    n = 64
    k = _spd(rng, n)
    mesh = PAR.make_mesh(n_dev, axis="rows")
    l_dist = np.asarray(DL.distributed_cholesky(k, mesh, panel=panel))
    l_ref = np.linalg.cholesky(np.asarray(k))
    np.testing.assert_allclose(l_dist, l_ref, rtol=1e-9, atol=1e-11)


def test_distributed_solves_exact(rng):
    n, m = 64, 5
    k = _spd(rng, n)
    b = jnp.asarray(rng.randn(n, m))
    mesh = PAR.make_mesh(4, axis="rows")
    l_dist = DL.distributed_cholesky(k, mesh, panel=16)

    x_fwd = np.asarray(DL.distributed_solve_lower(l_dist, b, mesh, panel=16))
    l_ref = np.linalg.cholesky(np.asarray(k))
    ref_fwd = np.linalg.solve(l_ref, np.asarray(b))
    np.testing.assert_allclose(x_fwd, ref_fwd, rtol=1e-8, atol=1e-10)

    x_full = np.asarray(DL.distributed_cho_solve(l_dist, b, mesh, panel=16))
    ref_full = np.linalg.solve(np.asarray(k), np.asarray(b))
    np.testing.assert_allclose(x_full, ref_full, rtol=1e-7, atol=1e-9)


def test_distributed_logdet(rng):
    n = 64
    k = _spd(rng, n)
    mesh = PAR.make_mesh(4, axis="rows")
    l_dist = DL.distributed_cholesky(k, mesh, panel=16)
    ours = float(DL.distributed_logdet_from_chol(l_dist, mesh))
    ref = np.linalg.slogdet(np.asarray(k))[1]
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_distributed_posterior_exact(rng):
    """Train-axis-sharded posterior == dense oracle posterior (rtol 1e-5 —
    the [B:5] parity bar, now at N ≫ chip layout)."""
    n, m = 64, 9
    x = rng.rand(n, 6)
    y = np.sin(3 * x[:, 0])
    xs = rng.rand(m, 6)
    ls, s, noise = np.full(6, 0.5), 1.0, 1e-2

    k = onp.kernel_matrix("matern52", x, x, ls, s)
    k[np.diag_indices(n)] += noise
    k_cross = onp.kernel_matrix("matern52", x, xs, ls, s)

    mesh = PAR.make_mesh(4, axis="rows")
    l_dist = DL.distributed_cholesky(jnp.asarray(k), mesh, panel=16)
    alpha = DL.distributed_cho_solve(l_dist, jnp.asarray(y)[:, None], mesh, panel=16)
    mu, var = DL.distributed_gp_posterior(
        l_dist, alpha, jnp.asarray(k_cross), jnp.full((m,), s), mesh, panel=16
    )

    gp = onp.NumpyGP("matern52", ls, s, noise).fit(x, y)
    mu_ref, var_ref = gp.posterior(xs)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var), var_ref, rtol=1e-5, atol=1e-10)


def test_distributed_gp_class(rng):
    """User-facing DistributedGP: fit/posterior/mll parity vs the dense
    oracle at the same hypers (the auto-distributed GP entry point)."""
    from turbojax.distributed_linalg import DistributedGP

    n, m, d = 64, 7, 4
    x = rng.rand(n, d)
    y = np.sin(4 * x[:, 0]) + 0.1 * rng.randn(n)
    xs = rng.rand(m, d)
    mesh = PAR.make_mesh(4, axis="rows")
    # jitter=0: the oracle adds no diagonal bump, and this test is the
    # exact-same-math parity check (the default 1e-6 jitter + escalation
    # ladder is covered by test_distributed_fit_never_returns_nan_hypers)
    dgp = DistributedGP(mesh, kernel="matern52", panel=16, jitter=0.0).fit(
        jnp.asarray(x), jnp.asarray(y), np.full(d, 0.5), 1.0, 1e-2
    )
    mu, var = dgp.posterior(jnp.asarray(xs))
    gp = onp.NumpyGP("matern52", np.full(d, 0.5), 1.0, 1e-2).fit(x, y)
    mu_ref, var_ref = gp.posterior(xs)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var), var_ref, rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(float(dgp.mll()), gp.mll(), rtol=1e-8)


@pytest.mark.slow
def test_distributed_mll_is_differentiable(rng):
    """grad of the distributed MLL w.r.t. kernel hypers matches the dense
    grad — shard_map/all_gather/psum all transpose, so distributed
    hyperparameter FITTING works, not just inference."""
    from turbojax import kernels as K
    from turbojax import distributed_linalg as DLX

    n, d = 32, 3
    x = jnp.asarray(rng.rand(n, d))
    y = jnp.asarray(np.sin(4 * rng.rand(n)))
    mesh = PAR.make_mesh(4, axis="rows")

    def mll_dist(log_ls):
        params = {"lengthscale": jnp.exp(log_ls), "outputscale": jnp.asarray(1.0)}
        k = K.matern52(params, x, x) + 1e-2 * jnp.eye(n)
        l_mat = DLX.distributed_cholesky(k, mesh, panel=8)
        alpha = DLX.distributed_cho_solve(l_mat, y[:, None], mesh, panel=8)
        quad = jnp.dot(y, alpha[:, 0])
        logdet = DLX.distributed_logdet_from_chol(l_mat, mesh)
        return -0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi))

    def mll_dense(log_ls):
        params = {"lengthscale": jnp.exp(log_ls), "outputscale": jnp.asarray(1.0)}
        k = K.matern52(params, x, x) + 1e-2 * jnp.eye(n)
        l_mat = jnp.linalg.cholesky(k)
        a = jax.scipy.linalg.cho_solve((l_mat, True), y)
        return -0.5 * (
            jnp.dot(y, a) + 2 * jnp.sum(jnp.log(jnp.diag(l_mat))) + n * jnp.log(2 * jnp.pi)
        )

    log_ls = jnp.asarray(np.log([0.4, 0.6, 0.5]))
    v1, g1 = jax.value_and_grad(mll_dist)(log_ls)
    v2, g2 = jax.value_and_grad(mll_dense)(log_ls)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6, atol=1e-9)


def test_distributed_gp_mll_pipeline(rng):
    """End-to-end large-N GP fit core on the mesh: chol + alpha + logdet
    reproduce the dense MLL — the N ≫ chip scaling path."""
    n = 64
    x = rng.rand(n, 6)
    y = np.sin(3 * x[:, 0]) + 0.1 * rng.randn(n)
    k = onp.kernel_matrix("matern52", x, x, np.full(6, 0.5), 1.0)
    k[np.diag_indices(n)] += 1e-2

    mesh = PAR.make_mesh(4, axis="rows")
    l_dist = DL.distributed_cholesky(jnp.asarray(k), mesh, panel=16)
    alpha = DL.distributed_cho_solve(l_dist, jnp.asarray(y)[:, None], mesh, panel=16)
    quad = float(y @ np.asarray(alpha)[:, 0])
    logdet = float(DL.distributed_logdet_from_chol(l_dist, mesh))
    mll_dist = -0.5 * (quad + logdet + n * np.log(2 * np.pi))

    gp = onp.NumpyGP("matern52", np.full(6, 0.5), 1.0, 1e-2).fit(x, y)
    np.testing.assert_allclose(mll_dist, gp.mll(), rtol=1e-9)


def test_distributed_kernel_chol_never_materializes_dense(rng):
    """In-shard kernel construction: the factor's per-device shard is the
    (N/D, N) row block, and the compiled (SPMD-partitioned) program contains
    no dense (N, N) tensor — the VERDICT-#2 memory contract: largest live
    per-device array is O(N²/D)."""
    n, d, n_dev, panel = 4096, 8, 8, 128
    x = jnp.asarray(rng.rand(n, d), jnp.float32)
    mesh = PAR.make_mesh(n_dev, axis="rows")
    params = {
        "lengthscale": jnp.full((d,), 0.5, jnp.float32),
        "outputscale": jnp.asarray(1.0, jnp.float32),
        "noise": jnp.asarray(1e-2, jnp.float32),
    }

    fn = jax.jit(lambda p, xx: DL.distributed_kernel_chol(p, xx, mesh, panel))
    compiled = fn.lower(params, x).compile()
    text = compiled.as_text()
    assert f"f32[{n},{n}]" not in text, "dense N x N tensor found in per-device HLO"
    assert f"f32[{n // n_dev},{n}]" in text, "expected the (N/D, N) row block"

    chol = fn(params, x)
    shard_shapes = {s.data.shape for s in chol.addressable_shards}
    assert shard_shapes == {(n // n_dev, n)}


def test_distributed_kernel_chol_matches_dense_build(rng):
    """Factor from in-shard kernel rows == factor of the densely-built
    matrix (same math, no N² residency)."""
    from turbojax import kernels as K

    n, d, panel = 64, 5, 8
    x = jnp.asarray(rng.rand(n, d))
    mesh = PAR.make_mesh(8, axis="rows")
    params = {
        "lengthscale": jnp.full((d,), 0.4),
        "outputscale": jnp.asarray(1.3),
        "noise": jnp.asarray(1e-2),
    }
    l_sharded = DL.distributed_kernel_chol(params, x, mesh, panel)
    k_dense = K.matern52(params, x, x) + params["noise"] * jnp.eye(n)
    l_ref = np.linalg.cholesky(np.asarray(k_dense))
    np.testing.assert_allclose(np.asarray(l_sharded), l_ref, rtol=1e-9, atol=1e-11)


@pytest.mark.slow
def test_distributed_mll_matches_dense_mll(rng):
    """distributed_mll (one fused shard_map: in-shard kernel rows -> blocked
    chol -> forward solve -> logdet) == gp.mll on the same data, and so do
    its gradients w.r.t. the raw hyperparameters."""
    from turbojax import gp as G
    from turbojax import linalg as L
    from turbojax.config import GPConfig

    n, d = 64, 4
    x = jnp.asarray(rng.rand(n, d))
    y = jnp.asarray(np.sin(4 * rng.rand(n)))
    y_std = (y - y.mean()) / y.std()
    config = GPConfig(kernel="matern52")
    raw = G.default_params(d, config, x.dtype)
    mesh = PAR.make_mesh(8, axis="rows")

    def f_dist(r):
        return DL.distributed_mll(r, x, y_std, mesh, config, panel=8)

    def f_dense(r):
        return G.mll(r, x, y_std, L.row_mask(n, jnp.asarray(n)), config)

    v1, g1 = jax.value_and_grad(f_dist)(raw)
    v2, g2 = jax.value_and_grad(f_dense)(raw)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-9)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-10)


@pytest.mark.slow
def test_fit_distributed_gp_matches_dense_trajectory(rng):
    """Hyperparameter FITTING at N >> one buffer: Adam on the distributed
    MLL lands on the same hypers as Adam on the dense MLL (same init, same
    step count), and the fitted posterior matches the dense-lane posterior.
    N=4096 = 2x the flagship single-chip buffer (VERDICT #2 done-criterion);
    f32 keeps the 1-core CPU lane affordable."""
    import dataclasses

    from turbojax import gp as G
    from turbojax import linalg as L
    from turbojax.config import GPConfig

    n, d, n_dev, panel, steps = 4096, 6, 8, 256, 2
    x = jnp.asarray(rng.rand(n, d), jnp.float32)
    y = jnp.asarray(
        np.sin(3 * rng.rand(n)) + 0.05 * rng.randn(n), jnp.float32
    ) + jnp.sum(x, axis=1)
    mesh = PAR.make_mesh(n_dev, axis="rows")
    config = dataclasses.replace(
        GPConfig(kernel="matern52"), fit_optimizer="adam", fit_maxiter=steps
    )

    dgp = DL.fit_distributed_gp(x, y, mesh, config, panel=panel)

    # dense lane: same standardization, same init, same Adam trajectory
    y_std = (y - y.mean()) / jnp.maximum(y.std(), 1e-8)
    raw0 = G.default_params(d, config, x.dtype)
    raw_dense, _ = G._fit_one(raw0, x, y_std, L.row_mask(n, jnp.asarray(n)), config)

    for a, b in zip(jax.tree.leaves(dgp.raw), jax.tree.leaves(raw_dense)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)

    # fitted posterior parity vs the dense path at the distributed hypers
    xs = jnp.asarray(rng.rand(16, d), jnp.float32)
    mu_d, var_d = dgp.posterior(xs)
    state = G.make_gp_state(x, y, L.row_mask(n, jnp.asarray(n)), dgp.raw, config)
    mu_ref, var_ref = G.gp_posterior(state, xs, config)
    np.testing.assert_allclose(np.asarray(mu_d), np.asarray(mu_ref), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(var_d), np.asarray(var_ref), rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_distributed_fit_never_returns_nan_hypers(rng):
    """The dense lane's fit invariant on the distributed path (VERDICT r2
    weak #2): exact-duplicate rows + a vanishing noise floor make the
    in-shard panel Cholesky fail in f32; the NaN gradients must be dropped
    per-step (finite hypers out), and a poisoned warm start must fall back
    to the defaults."""
    import dataclasses

    from turbojax import gp as G
    from turbojax.config import GPConfig

    n, d = 64, 3
    x_uniq = rng.rand(8, d)
    x = jnp.asarray(np.repeat(x_uniq, 8, axis=0), jnp.float32)  # rank-8 K
    y = jnp.asarray(rng.randn(n), jnp.float32)
    mesh = PAR.make_mesh(8, axis="rows")
    config = dataclasses.replace(
        GPConfig(kernel="matern52"), fit_optimizer="adam", fit_maxiter=4,
        noise_bounds=(1e-12, 1e-10), noise_floor=1e-12, jitter=0.0,
    )
    dgp = DL.fit_distributed_gp(x, y, mesh, config, panel=8)
    for leaf in jax.tree.leaves(dgp.raw):
        assert np.isfinite(np.asarray(leaf)).all(), "non-finite fitted hypers"

    # poisoned warm start: sanitized to defaults, not propagated
    bad = jax.tree.map(
        lambda a: jnp.full_like(a, jnp.nan), G.default_params(d, config, jnp.float32)
    )
    dgp2 = DL.fit_distributed_gp(x, y, mesh, config, panel=8, warm_start=bad)
    for leaf in jax.tree.leaves(dgp2.raw):
        assert np.isfinite(np.asarray(leaf)).all(), "warm-start poison propagated"

    # with the default relative jitter the escalating ladder rescues the
    # cached factorization too (ADVICE r2: fit-time diagonal + rescue)
    config_j = dataclasses.replace(config, jitter=1e-6)
    dgp3 = DL.fit_distributed_gp(x, y, mesh, config_j, panel=8)
    assert np.isfinite(np.asarray(dgp3.chol)).all()
    mu, var = dgp3.posterior(jnp.asarray(rng.rand(4, d), jnp.float32))
    assert np.isfinite(np.asarray(mu)).all() and np.isfinite(np.asarray(var)).all()


def test_distributed_mll_grad_memory(rng):
    """The fit gradient keeps the O(N²/D) per-device memory bound (ADVICE
    r2 medium): the compiled grad program contains no buffer larger than
    ~3×(N/D)×N elements. Reverse AD through the panel loop would stack
    n/panel (N/D, N) carries — an f32[16, 512, 4096] scan residual here,
    16× over the bound — which the closed-form custom VJP avoids."""
    import re

    from turbojax import gp as G
    from turbojax.config import GPConfig

    n, d, n_dev, panel = 4096, 8, 8, 256
    x = jnp.asarray(rng.rand(n, d), jnp.float32)
    y = jnp.asarray(rng.randn(n), jnp.float32)
    mesh = PAR.make_mesh(n_dev, axis="rows")
    config = GPConfig(kernel="matern52")
    raw = G.default_params(d, config, jnp.float32)

    grad_fn = jax.jit(
        lambda r, xx, yy: jax.grad(
            lambda rr: DL.distributed_mll(rr, xx, yy, mesh, config, panel)
        )(r)
    )
    text = grad_fn.lower(raw, x, y).compile().as_text()
    sizes = []
    for m in re.finditer(r"f32\[([0-9,]+)\]", text):
        total = 1
        for t in m.group(1).split(","):
            total *= int(t)
        sizes.append(total)
    rows = n // n_dev
    biggest = max(sizes)
    assert biggest <= 3 * rows * n, (
        f"grad HLO holds a {biggest}-element buffer (> 3·(N/D)·N = {3 * rows * n}): "
        "the O(N²/D) backward-memory bound is broken"
    )


@pytest.mark.slow
def test_fit_gp_auto_routes_on_threshold(rng):
    """fit_gp_auto: dense path below the memory threshold, distributed above
    (forced via a tiny budget); both expose the same surface."""
    n, d = 64, 3
    x = jnp.asarray(rng.rand(n, d))
    y = jnp.asarray(np.sin(3 * rng.rand(n)))
    xs = jnp.asarray(rng.rand(5, d))
    mesh = PAR.make_mesh(8, axis="rows")
    import dataclasses

    from turbojax.config import GPConfig

    config = dataclasses.replace(GPConfig(), fit_optimizer="adam", fit_maxiter=3, fit_restarts=1)

    assert not DL.should_distribute(n, mesh, x.dtype)  # tiny n: stay dense
    assert not DL.should_distribute(10**6, None)  # no mesh: stay dense
    assert DL.should_distribute(n, mesh, x.dtype, budget_bytes=1)

    dense = DL.fit_gp_auto(jax.random.key(0), x, y, config, mesh)
    assert isinstance(dense, DL._DenseGPAdapter)
    dist = DL.fit_gp_auto(jax.random.key(0), x, y, config, mesh, panel=8, budget_bytes=1)
    assert isinstance(dist, DL.DistributedGP)
    for g in (dense, dist):
        mu, var = g.posterior(xs)
        assert np.isfinite(np.asarray(mu)).all() and (np.asarray(var) > 0).all()
        assert np.isfinite(float(g.mll()))


def test_fit_gp_auto_dense_adapter_mll_respects_y_warp(rng):
    """Code-review regression: the dense adapter's .mll() must score the
    same (warped, standardized) targets the wrapped state was fitted on."""
    import dataclasses

    from turbojax import gp as G
    from turbojax import linalg as L
    from turbojax import transforms as T
    from turbojax.config import GPConfig

    n, d = 48, 2
    x = jnp.asarray(rng.rand(n, d))
    y = jnp.asarray(30.0 * np.abs(np.sin(3 * rng.rand(n))) + 1.0)
    config = dataclasses.replace(
        GPConfig(), fit_optimizer="adam", fit_maxiter=3, fit_restarts=1,
        y_warp="bilog",
    )
    g = DL.fit_gp_auto(jax.random.key(0), x, y, config, mesh=None)
    assert isinstance(g, DL._DenseGPAdapter)
    mask = L.row_mask(n, jnp.asarray(n))
    y_std, _, _ = T.standardize(T.warp_y(y, "bilog"), mask)
    expect = float(G.mll(g.state.raw, x, y_std, mask, config))
    np.testing.assert_allclose(float(g.mll()), expect, rtol=1e-6)


@pytest.mark.slow
def test_refactor_gp_auto_y_warp_consistent_across_routes(rng):
    """The model-space rule (docs/DESIGN.md §7b) must hold on BOTH sides of
    the auto-routing threshold: with y_warp set and the SAME pinned hypers,
    the distributed factor refresh and the dense one predict the same
    (warped-space) posterior — previously the distributed branch silently
    standardized RAW y, so a bilog config changed model semantics exactly
    when N crossed the memory threshold."""
    import dataclasses

    from turbojax import gp as G
    from turbojax.config import GPConfig

    n, d = 64, 3
    x = jnp.asarray(rng.rand(n, d))
    y = jnp.asarray(40.0 * np.abs(np.sin(3 * rng.rand(n))) + 2.0)
    xs = jnp.asarray(rng.rand(7, d))
    mesh = PAR.make_mesh(8, axis="rows")
    config = dataclasses.replace(GPConfig(), y_warp="bilog")
    raw = G.default_params(d, config, x.dtype)

    dense = DL.refactor_gp_auto(x, y, raw, config, mesh=None)
    assert isinstance(dense, DL._DenseGPAdapter)
    dist = DL.refactor_gp_auto(x, y, raw, config, mesh, panel=8, budget_bytes=1)
    assert isinstance(dist, DL.DistributedGP)

    mu_dense, var_dense = dense.posterior(xs)
    mu_dist, var_dist = dist.posterior(xs)
    np.testing.assert_allclose(np.asarray(mu_dist), np.asarray(mu_dense), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var_dist), np.asarray(var_dense), rtol=1e-5)


@pytest.mark.slow
def test_distributed_pathwise_parity(rng):
    """Distributed decoupled pathwise draws (Matheron update) are BIT-LAYOUT
    compatible with the dense sampler: same key → same (Ω, b, w, ε) stream →
    identical posterior sample paths to solver precision, with the training
    factor row-sharded. This is the draw that unlocks globally-joint TS on
    the N ≫ chip BO path (no candidate-covariance factorization exists
    there by design)."""
    from turbojax import acq as A
    from turbojax import gp as G
    from turbojax.config import GPConfig

    n, d, m, n_paths, feats = 64, 3, 11, 4, 256
    x = jnp.asarray(rng.rand(n, d))
    y = jnp.asarray(np.sin(4 * rng.rand(n)) + 0.1 * rng.randn(n))
    xs = jnp.asarray(rng.rand(m, d))
    mesh = PAR.make_mesh(4, axis="rows")
    config = GPConfig()
    raw = G.default_params(d, config, x.dtype)

    dense = DL.refactor_gp_auto(x, y, raw, config, mesh=None)
    assert isinstance(dense, DL._DenseGPAdapter)
    dist = DL.refactor_gp_auto(x, y, raw, config, mesh, panel=16, budget_bytes=1)
    assert isinstance(dist, DL.DistributedGP)

    key = jax.random.key(11)
    # dense state buffers are exactly (n, d) here (cap == n), so the RNG
    # shapes — and therefore the draws — must coincide, not just the moments
    draws_dense = A.pathwise_paths(key, dense.state, xs, n_paths, config, feats)
    draws_dist = dist.pathwise_paths(key, xs, n_paths, feats)
    assert draws_dist.shape == (n_paths, m)
    np.testing.assert_allclose(
        np.asarray(draws_dist), np.asarray(draws_dense), rtol=1e-6, atol=1e-8
    )


@pytest.mark.slow
def test_distributed_mll_grad_memory_16k(rng):
    """Shape-level twin of the memory-bound test at product scale (VERDICT
    r3 weak #5: the path exists for N=32k+ but the contract was only pinned
    at N=4096). Compile-only — no 16k buffers are ever allocated; the HLO
    is inspected for the O(N²/D) bound."""
    import re

    from turbojax import gp as G
    from turbojax.config import GPConfig

    n, d, n_dev, panel = 16384, 8, 8, 256
    mesh = PAR.make_mesh(n_dev, axis="rows")
    config = GPConfig(kernel="matern52")
    raw = G.default_params(d, config, jnp.float32)
    x_s = jax.ShapeDtypeStruct((n, d), jnp.float32)
    y_s = jax.ShapeDtypeStruct((n,), jnp.float32)

    grad_fn = jax.jit(
        lambda r, xx, yy: jax.grad(
            lambda rr: DL.distributed_mll(rr, xx, yy, mesh, config, panel)
        )(r)
    )
    text = grad_fn.lower(raw, x_s, y_s).compile().as_text()
    sizes = []
    for m in re.finditer(r"f32\[([0-9,]+)\]", text):
        total = 1
        for t in m.group(1).split(","):
            total *= int(t)
        sizes.append(total)
    rows = n // n_dev
    biggest = max(sizes)
    assert biggest <= 3 * rows * n, (
        f"grad HLO holds a {biggest}-element buffer (> 3·(N/D)·N = {3 * rows * n}): "
        "the O(N²/D) backward-memory bound is broken at 16k"
    )
