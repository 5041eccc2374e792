"""Plain Bayesian-optimization loop (SURVEY.md C15, C19; call stack §3.5).

Reference capability [B:7]: init design → fit GP → maximize acquisition →
evaluate f → append → repeat, with incremental Cholesky appends per new
observation.

TPU-native design [B:5]: for analytic (jnp-expressible) objectives the whole
outer loop is **one jit-compiled ``lax.scan``** over statically-shaped masked
buffers — zero host↔device traffic per iteration. The Cholesky factor is
carried in the scan state and extended by O(n²) ``linalg.chol_append`` rows;
full refactorization happens only on hyperparameter refits (cadence
``fit_every``; SURVEY.md §7.3.6). Black-box objectives use the host-side
ask/tell API in ``turbojax.api`` built from the same jitted pieces.

y-standardization constants are frozen at fit time and carried in the scan
state so the cached factor/α stay consistent between refits.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from turbojax import acq as A
from turbojax import gp as G
from turbojax import kernels as K
from turbojax import linalg as L
from turbojax import sampling as S
from turbojax import transforms as T
from turbojax.config import GPConfig

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BOConfig:
    """Loop knobs mirroring the reference constructor [R]: ``n_init``,
    ``max_evals``, ``batch_size``; plus acquisition / candidate-set /
    refit-cadence settings (SURVEY.md C15–C16)."""

    n_init: int = 10
    max_evals: int = 60
    batch_size: int = 1
    acq: str = "ei"  # "ei" | "lcb" | "ts"
    n_candidates: int = 2000
    fit_every: int = 1  # 0 = never refit (fixed hypers, pure incremental path)
    kappa: float = 2.0
    xi: float = 0.0
    local_frac: float = 0.0  # opt-in: fraction of candidates drawn around
    # the incumbent (Gaussian, ``local_sigma``) — global QMC alone caps the
    # achievable precision at the candidate spacing (~(1/n)^(1/d)).
    # 0 (default) = the pure-global reference behavior [R]; the tie-break
    # rule everywhere is reference parity wins defaults, levers stay opt-in
    # (VERDICT r4 weak #4; rover A/B measured the pool negative,
    # BASELINE.md round-3 local-pool re-measure)
    local_sigma: float = 0.05
    sobol_scramble: str = "shift"  # "shift" | "lms" — see
    # TurboConfig.sobol_scramble / sampling.sobol_sample
    ts_chunk: Optional[int] = None
    ts_sampler: str = "exact"  # "exact" (chunked joint chol [B:9]) | "rff"
    # | "pathwise" (decoupled Matheron update — globally joint, exact
    # conditioning; acq.pathwise_paths)
    ts_dtype: Optional[str] = None  # "float64": exact-law TS (acq module)
    rff_features: int = 1024
    cand_shard_min: Optional[int] = None  # distributed loop only: minimum
    # candidate count before the EI/LCB candidate axis shards over the mesh
    # (None = bo_distributed.CAND_SHARD_MIN, the measured crossover;
    # 0 forces sharding at any size — test/measurement lanes)
    chol_mode: str = "auto"  # "incremental" | "refactor" | "auto"
    # Measured on TPU v5e at N=2048: one chol_append is a latency-bound
    # single-rhs trsm (~10 ms) while a full refactorization is a parallel
    # O(n³) chol (~7 ms) — so on TPU "auto" refactorizes; on CPU the O(n²)
    # incremental path wins and "auto" keeps it (reference parity [B:7]).

    @property
    def n_iters(self) -> int:
        return max(0, (self.max_evals - self.n_init + self.batch_size - 1) // self.batch_size)

    def resolved_chol_mode(self) -> str:
        if self.chol_mode != "auto":
            return self.chol_mode
        import jax

        return "refactor" if jax.default_backend() == "tpu" else "incremental"


class BOCarry(NamedTuple):
    """Scan state: masked history buffers + cached factorization + RNG."""

    x_buf: Array  # (N_max, d), unit cube, zero-padded
    y_buf: Array  # (N_max,), original units, zero-padded
    n: Array  # active count
    chol: Array  # (N_max, N_max) identity-padded factor of K+σ²I (std space)
    raw: G.GPParams  # current hypers (warm start for the next refit)
    y_mean: Array  # frozen standardization constants (see module docstring)
    y_std: Array
    key: Array


class BOResult(NamedTuple):
    x_buf: Array  # (N_max, d) in the original box
    y_buf: Array  # (N_max,)
    n: Array
    best_x: Array
    best_y: Array
    incumbent_trace: Array  # (n_iters,) best y after each iteration


def _state_from_carry(carry: BOCarry, config: GPConfig) -> G.GPState:
    """Rebuild the posterior cache from carried buffers without refactorizing:
    α is an O(n²) cho_solve against the carried factor."""
    mask = L.row_mask(carry.x_buf.shape[0], carry.n)
    params = G.constrain_params(carry.raw, config)
    y_std_buf = jnp.where(
        mask, (T.warp_y(carry.y_buf, config.y_warp) - carry.y_mean) / carry.y_std, 0.0
    )
    resid = jnp.where(mask, y_std_buf - params["mean"], 0.0)
    alpha = L.cho_solve(carry.chol, resid)
    return G.GPState(
        x_buf=carry.x_buf, mask=mask, params=params, raw=carry.raw,
        chol=carry.chol, alpha=alpha, y_mean=carry.y_mean, y_std=carry.y_std,
    )


def _refit_carry(carry: BOCarry, config: GPConfig, fit_key: Array) -> BOCarry:
    mask = L.row_mask(carry.x_buf.shape[0], carry.n)
    state = G.fit_gp(fit_key, carry.x_buf, carry.y_buf, mask, config, warm_start=carry.raw)
    return carry._replace(chol=state.chol, raw=state.raw, y_mean=state.y_mean, y_std=state.y_std)


def _append_batch(
    carry: BOCarry, x_new: Array, y_new: Array, config: GPConfig, chol_mode: str = "incremental"
) -> BOCarry:
    """Write a q-batch into the buffers and refresh the carried factor.

    ``chol_mode="incremental"``: q O(n²) ``chol_append`` rows (SURVEY.md C5,
    [B:5]) — FLOP-optimal, wins on CPU. ``"refactor"``: one full masked
    re-factorization — wins on TPU where the single-rhs trsm inside an
    append is latency-bound (see BOConfig.chol_mode)."""
    q = x_new.shape[0]
    params = G.constrain_params(carry.raw, config)

    x_buf = lax.dynamic_update_slice(carry.x_buf, x_new, (carry.n, jnp.zeros_like(carry.n)))
    y_buf = lax.dynamic_update_slice(carry.y_buf, y_new, (carry.n,))
    n_new = carry.n + q

    if chol_mode == "refactor":
        mask = L.row_mask(x_buf.shape[0], n_new)
        chol = G._masked_kernel_chol(params, x_buf, mask, config)
    else:
        kfn = K.get_kernel(config.kernel)
        # covariance of each new point against the *post-write* buffer, so the
        # j-th append sees the previously appended points in its active prefix
        k_block = kfn(params, x_new, x_buf)  # (q, N_max)
        k_diag = K.kernel_diag(params, x_new) + params["noise"]
        chol = L.chol_append_batch(carry.chol, carry.n, k_block, k_diag, q)
    return carry._replace(x_buf=x_buf, y_buf=y_buf, n=n_new, chol=chol)


def _suggest(
    carry: BOCarry, config: GPConfig, bo: BOConfig, key: Array
) -> Array:
    """One acquisition maximization over a fresh global candidate set
    (call stack SURVEY.md §3.3); returns (q, d) unit-cube points."""
    dim = carry.x_buf.shape[-1]
    kc, kl, kt = jax.random.split(key, 3)
    n_local = int(bo.local_frac * bo.n_candidates)
    cands = S.sobol_sample(
        kc, dim, bo.n_candidates - n_local, dtype=carry.x_buf.dtype,
        scramble=bo.sobol_scramble,
    )
    if n_local:
        mask_n = L.row_mask(carry.y_buf.shape[0], carry.n)
        inc = carry.x_buf[jnp.argmin(jnp.where(mask_n, carry.y_buf, jnp.inf))]
        local = inc + bo.local_sigma * jax.random.normal(
            kl, (n_local, dim), carry.x_buf.dtype
        )
        cands = jnp.concatenate([cands, jnp.clip(local, 0.0, 1.0)], axis=0)
    state = _state_from_carry(carry, config)
    if bo.acq == "ts":
        if bo.ts_sampler == "rff":
            xs, _ = A.rff_thompson_select(kt, state, cands, bo.batch_size, config, bo.rff_features)
        elif bo.ts_sampler == "pathwise":
            xs, _ = A.pathwise_thompson_select(
                kt, state, cands, bo.batch_size, config, bo.rff_features
            )
        else:
            xs, _ = A.thompson_select(
                kt, state, cands, bo.batch_size, config, bo.ts_chunk, bo.ts_dtype
            )
        return xs
    mu, var = G.gp_posterior(state, cands, config)
    if bo.acq == "ei":
        mask = L.row_mask(carry.y_buf.shape[0], carry.n)
        # incumbent must live in the same (possibly warped) space as the
        # posterior mu/var — warp_y is monotone so min commutes with it
        best = T.warp_y(jnp.min(jnp.where(mask, carry.y_buf, jnp.inf)), config.y_warp)
        scores = -A.expected_improvement(mu, var, best, bo.xi)  # minimize −EI
    elif bo.acq == "lcb":
        scores = A.lower_confidence_bound(mu, var, bo.kappa)
    else:
        raise ValueError(f"unknown acquisition {bo.acq!r}")
    _, top_idx = lax.top_k(-scores, bo.batch_size)
    return cands[top_idx]


def run_bo(
    key: Array,
    fn: Callable[[Array], Array],
    lb: Tuple[float, ...],
    ub: Tuple[float, ...],
    bo: BOConfig,
    config: GPConfig = GPConfig(),
    n_max: Optional[int] = None,
    fixed_params: Optional[G.GPParams] = None,
    host_loop: bool = False,
    on_iteration=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
) -> BOResult:
    """Run the BO loop — as one compiled ``lax.scan`` program [B:5]
    (default) or with a single jitted step driven from the host
    (``host_loop=True``; identical math, much smaller compiled binary —
    use it when per-iteration refits make the monolithic scan program too
    large for the compiler, e.g. L-BFGS fits over 100 iterations).
    ``on_iteration`` (host mode only): per-iteration ``(it, best)`` logging
    callback (SURVEY.md §5.5).

    Checkpointing (SURVEY.md §5.4; host mode): ``checkpoint_path`` +
    ``checkpoint_every=k`` saves the loop carry every k iterations;
    ``resume=True`` restores from ``checkpoint_path`` if it exists (fresh
    start otherwise) and reproduces the uninterrupted trajectory exactly —
    the RNG key is part of the carry. Requesting checkpointing forces the
    host driver (a monolithic scan can't save mid-flight)."""
    if checkpoint_path and (checkpoint_every or resume):
        host_loop = True
    if host_loop:
        return _run_bo_host(
            key, fn, tuple(lb), tuple(ub), bo, config, n_max, fixed_params,
            on_iteration, checkpoint_path, checkpoint_every, resume,
        )
    return _run_bo_scan(key, fn, tuple(lb), tuple(ub), bo, config, n_max, fixed_params)


@partial(jax.jit, static_argnames=("fn", "bo", "config", "n_max"))
def _run_bo_scan(
    key: Array,
    fn: Callable[[Array], Array],
    lb: Tuple[float, ...],
    ub: Tuple[float, ...],
    bo: BOConfig,
    config: GPConfig = GPConfig(),
    n_max: Optional[int] = None,
    fixed_params: Optional[G.GPParams] = None,
) -> BOResult:
    """The whole loop as one device program.

    Args:
      fn: jnp-expressible objective on the original box, (q, d) -> (q,).
      lb/ub: box bounds (static tuples).
      fixed_params: when given with ``bo.fit_every == 0``, hypers are pinned
        (config 1's fixed-hyperparameter RBF GP [B:7]).
    """
    n_max = n_max or bo.n_init + bo.n_iters * bo.batch_size
    carry = _bo_init(key, fn, lb, ub, bo, config, n_max, fixed_params)
    step = _make_bo_step(fn, lb, ub, bo, config, n_max)
    carry, trace = lax.scan(step, carry, jnp.arange(bo.n_iters))
    return _bo_result(carry, lb, ub, trace, n_max)


def _run_bo_host(key, fn, lb, ub, bo, config, n_max, fixed_params, on_iteration=None,
                 checkpoint_path=None, checkpoint_every=0, resume=False) -> BOResult:
    import numpy as np

    from turbojax.checkpoint import RunCheckpointer

    n_max = n_max or bo.n_init + bo.n_iters * bo.batch_size
    ckpt = RunCheckpointer(checkpoint_path, checkpoint_every)
    carry, trace = None, []
    if resume:
        like = jax.eval_shape(
            lambda k: _bo_init(k, fn, lb, ub, bo, config, n_max, fixed_params), key
        )
        restored = ckpt.try_restore(like)
        if restored is not None:
            carry, trace = restored
    if carry is None:
        carry = jax.jit(
            lambda k: _bo_init(k, fn, lb, ub, bo, config, n_max, fixed_params)
        )(key)
    step = jax.jit(_make_bo_step(fn, lb, ub, bo, config, n_max))
    for it in range(len(trace), bo.n_iters):
        carry, best = step(carry, jnp.asarray(it))
        trace.append(best)
        if on_iteration is not None:
            on_iteration(it, float(best))
        ckpt.maybe_save(it + 1, carry, trace)
    trace_a = jnp.asarray(np.asarray(jax.device_get(trace)))
    return jax.jit(lambda c, t: _bo_result(c, lb, ub, t, n_max))(carry, trace_a)


def _bo_init(key, fn, lb, ub, bo: BOConfig, config: GPConfig, n_max: int, fixed_params) -> BOCarry:
    """Init design (LHS [R]) + first fit/factorization."""
    dim = len(lb)
    lb_a = jnp.asarray(lb, jnp.float32)
    ub_a = jnp.asarray(ub, jnp.float32)
    k_init, k_fit0, k_loop = jax.random.split(key, 3)
    x0 = S.latin_hypercube(k_init, bo.n_init, dim)
    y0 = fn(T.from_unit_cube(x0, lb_a, ub_a)).astype(x0.dtype)
    y0 = T.impute_failures(y0, jnp.zeros((1,), y0.dtype), jnp.zeros((1,), bool))
    x_buf = jnp.zeros((n_max, dim), x0.dtype).at[: bo.n_init].set(x0)
    y_buf = jnp.zeros((n_max,), y0.dtype).at[: bo.n_init].set(y0)
    n = jnp.asarray(bo.n_init)
    mask = L.row_mask(n_max, n)

    if bo.fit_every == 0:
        raw0 = fixed_params if fixed_params is not None else G.default_params(dim, config, x0.dtype)
        state0 = G.make_gp_state(x_buf, y_buf, mask, raw0, config)
    else:
        state0 = G.fit_gp(k_fit0, x_buf, y_buf, mask, config, warm_start=fixed_params)
    return BOCarry(
        x_buf=x_buf, y_buf=y_buf, n=n, chol=state0.chol, raw=state0.raw,
        y_mean=state0.y_mean, y_std=state0.y_std, key=k_loop,
    )


def _make_bo_step(fn, lb, ub, bo: BOConfig, config: GPConfig, n_max: int):
    lb_a = jnp.asarray(lb, jnp.float32)
    ub_a = jnp.asarray(ub, jnp.float32)
    chol_mode = bo.resolved_chol_mode()

    def step(carry: BOCarry, it: Array):
        k_it, k_fit, k_next = jax.random.split(carry.key, 3)
        carry = carry._replace(key=k_next)
        if bo.fit_every > 0:
            do_fit = (it % bo.fit_every) == 0
            carry = lax.cond(do_fit, lambda c: _refit_carry(c, config, k_fit), lambda c: c, carry)
        x_unit = _suggest(carry, config, bo, k_it)
        y_new = fn(T.from_unit_cube(x_unit, lb_a, ub_a)).astype(x_unit.dtype)
        y_new = T.impute_failures(y_new, carry.y_buf, L.row_mask(n_max, carry.n))
        carry = _append_batch(carry, x_unit, y_new, config, chol_mode)
        mask_now = L.row_mask(n_max, carry.n)
        best_now = jnp.min(jnp.where(mask_now, carry.y_buf, jnp.inf))
        return carry, best_now

    return step


def _bo_result(carry: BOCarry, lb, ub, trace: Array, n_max: int) -> BOResult:
    lb_a = jnp.asarray(lb, jnp.float32)
    ub_a = jnp.asarray(ub, jnp.float32)
    mask_fin = L.row_mask(n_max, carry.n)
    best_idx = jnp.argmin(jnp.where(mask_fin, carry.y_buf, jnp.inf))
    return BOResult(
        x_buf=T.from_unit_cube(carry.x_buf, lb_a, ub_a),
        y_buf=carry.y_buf,
        n=carry.n,
        best_x=T.from_unit_cube(carry.x_buf[best_idx], lb_a, ub_a),
        best_y=carry.y_buf[best_idx],
        incumbent_trace=trace,
    )
