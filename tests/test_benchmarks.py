"""Unit tests: benchmark objectives (SURVEY.md C20) — known optima and shapes."""

import jax.numpy as jnp
import numpy as np

from turbojax import benchmarks as B


def test_branin_optima():
    b = B.get_benchmark("branin")
    pts = jnp.asarray([[-np.pi, 12.275], [np.pi, 2.275], [9.42478, 2.475]])
    np.testing.assert_allclose(np.asarray(b(pts)), 0.397887, atol=1e-4)


def test_hartmann6_optimum():
    b = B.get_benchmark("hartmann6")
    x = jnp.asarray([[0.20169, 0.150011, 0.476874, 0.275332, 0.311652, 0.6573]])
    np.testing.assert_allclose(float(b(x)[0]), -3.32237, atol=1e-4)


def test_ackley_optimum():
    b = B.get_benchmark("ackley10")
    np.testing.assert_allclose(float(b(jnp.zeros((1, 10)))[0]), 0.0, atol=1e-6)
    assert float(b(jnp.ones((1, 10)) * 3)[0]) > 5.0


def test_levy_rastrigin_optimum():
    np.testing.assert_allclose(float(B.get_benchmark("levy10")(jnp.ones((1, 10)))[0]), 0.0, atol=1e-8)
    np.testing.assert_allclose(float(B.get_benchmark("rastrigin10")(jnp.zeros((1, 10)))[0]), 0.0, atol=1e-8)


def test_rosenbrock_griewank_optima():
    np.testing.assert_allclose(
        float(B.get_benchmark("rosenbrock10")(jnp.ones((1, 10)))[0]), 0.0, atol=1e-8
    )
    np.testing.assert_allclose(
        float(B.get_benchmark("griewank10")(jnp.zeros((1, 10)))[0]), 0.0, atol=1e-8
    )


def test_michalewicz_properties():
    b = B.get_benchmark("michalewicz10")
    rng = np.random.RandomState(0)
    vals = np.asarray(b(jnp.asarray(rng.rand(64, 10) * np.pi)))
    assert vals.min() > b.optimum  # known minimum ≈ −9.66 for d=10
    assert np.all(vals <= 0.0)


def test_rover60_properties():
    b = B.get_benchmark("rover60")
    assert b.dim == 60
    # straight-line path start->goal is near-optimal and beats random
    t = np.linspace(0, 1, 30)
    straight = (np.array([0.05, 0.05])[None] * (1 - t[:, None]) + np.array([0.95, 0.95])[None] * t[:, None])
    v_straight = float(b(jnp.asarray(straight.reshape(1, 60)))[0])
    rng = np.random.RandomState(0)
    v_rand = np.asarray(b(jnp.asarray(rng.rand(16, 60))))
    assert v_straight < v_rand.min()
    assert v_straight < 100.0  # crosses some obstacles but beats any random path


def test_lunar60_properties():
    b = B.get_benchmark("lunar60")
    assert b.dim == 60
    # physics sanity: zero thrust free-falls through the terrain -> large
    # violation cost; a constant gentle up-thrust hover does much better
    v_zero = float(b(jnp.zeros((1, 60)))[0])
    hover = np.tile([0.0, 1.0 / 3.0], 30)  # a = a_max/3 * 1 = g: near-hover
    v_hover = float(b(jnp.asarray(hover.reshape(1, 60)))[0])
    assert v_hover < v_zero
    # calibration pins (benchmarks.py registry note): random is far from
    # the best-known 0.63, and the terrain makes random much worse than
    # the no-ridge cost scale
    rng_ = np.random.RandomState(0)
    v_rand = np.asarray(b(jnp.asarray(rng_.rand(64, 60) * 2.0 - 1.0)))
    assert v_rand.min() > b.optimum + 0.5
    assert np.all(np.isfinite(v_rand))
    # dynamics coupling: perturbing an EARLY control changes the cost more
    # than perturbing the last one (global coupling — unlike rover60)
    base = jnp.asarray(hover.reshape(1, 60))
    d_early = abs(float(b(base.at[0, 1].add(0.3))[0]) - v_hover)
    d_late = abs(float(b(base.at[0, 59].add(0.3))[0]) - v_hover)
    assert d_early > d_late


def test_batching_consistency(rng):
    for name in B.BENCHMARKS:
        b = B.get_benchmark(name)
        lb, ub = np.asarray(b.lb), np.asarray(b.ub)
        xs = jnp.asarray(rng.rand(5, b.dim) * (ub - lb) + lb)
        batched = np.asarray(b(xs))
        single = np.asarray([float(b(xs[i : i + 1])[0]) for i in range(5)])
        np.testing.assert_allclose(batched, single, rtol=1e-6)
        assert np.all(np.isfinite(batched))
