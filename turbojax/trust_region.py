"""TuRBO-1: single trust-region Bayesian optimization (SURVEY.md C17,
call stack §3.1; named at [B:10]).

Algorithmic contract [R — Eriksson et al. 2019]: a box trust region centered
at the local incumbent with side ``length · w_i`` (ARD-lengthscale-derived
weights), Thompson-sampling candidate selection inside the box, and a
success/failure state machine — ``succ_tol`` successes double the length
(cap ``length_max``), ``fail_tol`` failures halve it, dropping below
``length_min`` restarts from a fresh Latin-hypercube design with the GP
history discarded.

TPU-native design: the whole loop is one ``lax.scan`` with the TR state as a
pytree in the carry [B:5]. Restarts inside the scan keep shapes static by
switching the proposal source (SURVEY.md §7.3.4): every step evaluates
exactly ``batch_size`` points; a TR in its **init phase** (fewer than
``n_init`` local points) draws them from a per-restart LHS stream carried in
the state, a TR in its **search phase** refits the GP (hypers warm-started)
and runs Thompson sampling over trust-region Sobol candidates.
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
from turbojax import linalg as L
from turbojax import sampling as S
from turbojax import transforms as T
from turbojax.config import GPConfig, TRConfig

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TurboConfig:
    """TuRBO loop knobs (reference constructor kwargs [R] + build knobs)."""

    n_init: int = 20
    max_evals: int = 200
    batch_size: int = 10
    n_candidates: Optional[int] = None  # default min(100 d, 5000) [R]
    fit_every: int = 1  # refit cadence in accepted batches (search phase):
    # 1 = reference-parity refit-per-iteration; k>1 reuses the carried
    # hypers and only refactorizes for k−1 of every k batches
    # (_fit_or_reuse). Honored by run_turbo1/run_turbom AND the ask/tell
    # Optimizer (api.py)
    local_frac: float = 0.0  # fraction of TR candidates drawn as Gaussian
    # perturbations around the incumbent (σ = local_sigma × TR half-width)
    # instead of uniform Sobol-in-box — densifies the pool near the center
    # where high-d Sobol spacing starves refinement (sampling.tr_candidates)
    local_sigma: float = 0.3
    sobol_scramble: str = "shift"  # candidate-stream randomization
    # (sampling.sobol_sample): "shift" = digital-shift RQMC; "lms" =
    # Matousek linear matrix scramble + shift, the scipy/reference-stack
    # stream class (see the round-5 discriminating A/B in BASELINE.md)
    ts_chunk: Optional[int] = None
    ts_sampler: str = "exact"  # "exact" (chunked joint chol) | "rff" (C13
    # option) | "pathwise" (decoupled Matheron update: globally joint draws,
    # exact conditioning through the cached factor — acq.pathwise_paths)
    ts_dtype: Optional[str] = None  # "float64": exact-law TS at deep TR
    # refinement (f64 covariance+factor+draws; needs jax_enable_x64) —
    # see acq.thompson_samples and benchmarks/exp_ts_numerics.py
    rff_features: int = 1024
    alloc_cap: Optional[int] = None  # TuRBO-m only: per-TR slot cap per
    # batch in the global Thompson allocation (turbo_m.global_allocate).
    # None = reference-parity unconstrained argmin (measured winner-takes-
    # most on rover: one TR absorbs ~1750/2000 evals); cap=k bounds every
    # TR history at n_init + n_iters·k, which also bounds the bucket
    # ladder (fit cost, executable size)
    tr: TRConfig = TRConfig()

    @property
    def n_iters(self) -> int:
        return max(0, (self.max_evals - self.n_init + self.batch_size - 1) // self.batch_size)


class TRState(NamedTuple):
    """The trust-region state machine variables (pure pytree, C17)."""

    length: Array  # ()
    succ: Array  # () int
    fail: Array  # () int
    restarts: Array  # () int — number of restarts so far
    stag: Array  # () int — consecutive search-phase batches without an
    # accepted improvement. Unlike ``fail`` it does NOT reset on shrink,
    # and it also counts batches where the TR received no allocation at
    # all (TuRBO-m starvation) — the signal ``TRConfig.stagnation_tol``
    # triggers early restarts on (BASELINE.md round-3 m-sweep diagnostic:
    # zero natural restarts at the flagship budget while four of five TRs
    # idle).


def tr_init(dtype=jnp.float32, length_init: float = 0.8) -> TRState:
    return TRState(
        length=jnp.asarray(length_init, dtype),
        succ=jnp.asarray(0),
        fail=jnp.asarray(0),
        restarts=jnp.asarray(0),
        stag=jnp.asarray(0),
    )


def tr_update(
    state: TRState, improved: Array, counted: Array, tr: TRConfig, fail_tol: int
) -> TRState:
    """One success/failure transition (table-driven-testable pure function).

    Args:
      improved: bool — did this batch improve the local incumbent by more
        than ``success_eps·|best|``?
      counted: bool — whether this step participates (False during init
        phase or for TRs that received no evaluations in TuRBO-m).
    """
    succ = jnp.where(improved, state.succ + 1, 0)
    fail = jnp.where(improved, 0, state.fail + 1)
    expand = succ >= tr.succ_tol
    shrink = fail >= fail_tol
    length = jnp.where(
        expand,
        jnp.minimum(2.0 * state.length, tr.length_max),
        jnp.where(shrink, 0.5 * state.length, state.length),
    )
    succ = jnp.where(expand, 0, succ)
    fail = jnp.where(shrink, 0, fail)
    return TRState(
        length=jnp.where(counted, length, state.length),
        succ=jnp.where(counted, succ, state.succ),
        fail=jnp.where(counted, fail, state.fail),
        restarts=state.restarts,
        stag=state.stag,  # stagnation is tracked by turbo_absorb (it also
        # counts zero-allocation batches, which are not ``counted`` here)
    )


class TurboCarry(NamedTuple):
    """Scan carry for one trust region (reused per-TR by TuRBO-m)."""

    x_buf: Array  # (N_loc, d) TR-local history, unit cube, zero-padded
    y_buf: Array  # (N_loc,)
    n: Array  # () active count (resets on restart)
    raw: G.GPParams  # warm-start hypers
    tr: TRState
    init_stream: Array  # (stream_len, d) LHS points for the current restart
    best_x: Array  # (d,) global best across restarts (unit cube)
    best_y: Array  # ()
    key: Array


def _fresh_restart(carry: TurboCarry, key: Array, dim: int, stream_len: int, tr_cfg: TRConfig) -> TurboCarry:
    """Discard local history, draw a new LHS stream, reset the TR state [R]."""
    return carry._replace(
        x_buf=jnp.zeros_like(carry.x_buf),
        y_buf=jnp.zeros_like(carry.y_buf),
        n=jnp.zeros_like(carry.n),
        tr=TRState(
            length=jnp.asarray(tr_cfg.length_init, carry.x_buf.dtype),
            succ=jnp.asarray(0),
            fail=jnp.asarray(0),
            restarts=carry.tr.restarts + 1,
            stag=jnp.asarray(0),
        ),
        init_stream=S.latin_hypercube(key, stream_len, dim, carry.x_buf.dtype),
    )


def grow_carry(carry: TurboCarry, new_cap: int) -> TurboCarry:
    """Zero-pad one TR's history buffers to a larger capacity (bucketed
    growth, docs/DESIGN.md §bucketing; identity/zero padding keeps the
    masked math exact — SURVEY.md §7.3.1)."""
    old, dim = carry.x_buf.shape
    pad_x = jnp.zeros((new_cap - old, dim), carry.x_buf.dtype)
    pad_y = jnp.zeros((new_cap - old,), carry.y_buf.dtype)
    return carry._replace(
        x_buf=jnp.concatenate([carry.x_buf, pad_x], axis=0),
        y_buf=jnp.concatenate([carry.y_buf, pad_y], axis=0),
    )


def make_turbo_carry(key: Array, dim: int, n_loc: int, cfg: TurboConfig, config: GPConfig, dtype=jnp.float32) -> TurboCarry:
    """Initial carry: empty buffers, init phase about to stream its LHS."""
    k_s, k_loop = jax.random.split(key)
    stream_len = _stream_len(cfg)
    return TurboCarry(
        x_buf=jnp.zeros((n_loc, dim), dtype),
        y_buf=jnp.zeros((n_loc,), dtype),
        n=jnp.asarray(0),
        raw=G.default_params(dim, config, dtype),
        tr=tr_init(dtype, cfg.tr.length_init),
        init_stream=S.latin_hypercube(k_s, stream_len, dim, dtype),
        best_x=jnp.zeros((dim,), dtype),
        best_y=jnp.asarray(jnp.inf, dtype),
        key=k_loop,
    )


def _stream_len(cfg: TurboConfig) -> int:
    q = cfg.batch_size
    return ((cfg.n_init + q - 1) // q) * q


def _fit_or_reuse(k_fit: Array, c: TurboCarry, mask: Array, cfg: TurboConfig,
                  config: GPConfig) -> "G.GPState":
    """Refit-cadence choke point (``TurboConfig.fit_every``, SURVEY.md
    §7.3.6): refit every ``fit_every``-th batch of accepted data, otherwise
    reuse the carried hypers and only refactorize over the grown history
    (``make_gp_state`` — the posterior must always see all data). Cadence
    is data-growth-based — ``(n − n_init)//q`` — so TuRBO-m TRs whose
    allocation share varies refit per ~``fit_every·q`` accepted points; a
    restart (n reset) refits on its first search batch. ``fit_every <= 1``
    takes the unconditional-fit path with no cond in the program (under
    TuRBO-m's per-TR vmap a cond computes both branches, so the default
    config must not pay for the skip branch)."""
    if cfg.fit_every <= 1:
        return G.fit_gp(k_fit, c.x_buf, c.y_buf, mask, config, warm_start=c.raw)
    batch_idx = (c.n - cfg.n_init) // cfg.batch_size
    return lax.cond(
        batch_idx % cfg.fit_every == 0,
        lambda: G.fit_gp(k_fit, c.x_buf, c.y_buf, mask, config, warm_start=c.raw),
        lambda: G.make_gp_state(c.x_buf, c.y_buf, mask, c.raw, config),
    )


def turbo_propose(
    carry: TurboCarry, key: Array, cfg: TurboConfig, config: GPConfig
) -> Tuple[TurboCarry, Array, Array]:
    """Propose ``batch_size`` unit-cube points for this TR.

    Init phase: slice the LHS stream. Search phase: refit (warm-started,
    vmapped restarts) and Thompson-sample TR candidates. Returns
    (carry, (q, d) proposals, in_search_phase flag). Also used per-TR by
    TuRBO-m (with this function under ``vmap``, SURVEY.md §3.4)."""
    dim = carry.x_buf.shape[-1]
    q = cfg.batch_size
    n_cand = cfg.n_candidates or S.n_candidates(dim)
    in_search = carry.n >= cfg.n_init
    k_fit, k_cand, k_ts = jax.random.split(key, 3)

    def init_proposals(c: TurboCarry):
        start = jnp.minimum(c.n, c.init_stream.shape[0] - q)
        xs = lax.dynamic_slice(c.init_stream, (start, jnp.zeros_like(start)), (q, dim))
        return c, xs

    def search_proposals(c: TurboCarry):
        mask = L.row_mask(c.x_buf.shape[0], c.n)
        state = _fit_or_reuse(k_fit, c, mask, cfg, config)
        c = c._replace(raw=state.raw)
        best_idx = jnp.argmin(jnp.where(mask, c.y_buf, jnp.inf))
        center = c.x_buf[best_idx]
        ls = jnp.broadcast_to(state.params["lengthscale"], (dim,))
        cands = S.tr_candidates(
            k_cand, center, c.tr.length, ls, n_cand, cfg.local_frac,
            cfg.local_sigma, cfg.sobol_scramble,
        )
        if cfg.ts_sampler == "rff":
            xs, _ = A.rff_thompson_select(k_ts, state, cands, q, config, cfg.rff_features)
        elif cfg.ts_sampler == "pathwise":
            xs, _ = A.pathwise_thompson_select(
                k_ts, state, cands, q, config, cfg.rff_features
            )
        else:
            xs, _ = A.thompson_select(
                k_ts, state, cands, q, config, cfg.ts_chunk, cfg.ts_dtype
            )
        return c, xs

    carry, xs = lax.cond(in_search, search_proposals, init_proposals, carry)
    return carry, xs, in_search


def turbo_absorb(
    carry: TurboCarry,
    x_new: Array,
    y_new: Array,
    accept: Array,
    in_search: Array,
    cfg: TurboConfig,
    config: GPConfig,
    fail_tol: int,
    restart_key: Array,
) -> TurboCarry:
    """Fold a batch of evaluations into the TR: masked buffer writes,
    incumbent update, counter transition, and in-scan restart.

    ``accept`` is a (q,) bool mask — TuRBO-m uses it to credit each TR only
    with the points the global Thompson selection assigned to it [B:11]."""
    n_loc = carry.x_buf.shape[0]
    q = x_new.shape[0]
    dim = carry.x_buf.shape[-1]

    mask_before = L.row_mask(n_loc, carry.n)
    local_best_before = jnp.min(jnp.where(mask_before, carry.y_buf, jnp.inf))

    def write_one(c_n, xy):
        c, n = c_n
        x_i, y_i, a_i = xy
        can_write = jnp.logical_and(a_i, n < n_loc)
        x_buf = lax.cond(
            can_write,
            lambda: lax.dynamic_update_slice(c.x_buf, x_i[None], (n, jnp.zeros_like(n))),
            lambda: c.x_buf,
        )
        y_buf = lax.cond(
            can_write,
            lambda: lax.dynamic_update_slice(c.y_buf, y_i[None], (n,)),
            lambda: c.y_buf,
        )
        n = jnp.where(can_write, n + 1, n)
        return (c._replace(x_buf=x_buf, y_buf=y_buf), n), None

    (carry, n_new), _ = lax.scan(write_one, (carry, carry.n), (x_new, y_new, accept))
    carry = carry._replace(n=n_new)

    # incumbents: global best ignores accept-masking (every evaluated point counts)
    y_masked = jnp.where(accept, y_new, jnp.inf)
    batch_best = jnp.min(y_masked)
    batch_idx = jnp.argmin(y_masked)
    better = batch_best < carry.best_y
    carry = carry._replace(
        best_y=jnp.where(better, batch_best, carry.best_y),
        best_x=jnp.where(better, x_new[batch_idx], carry.best_x),
    )

    # success/failure transition [R]: improvement beyond eps·|local best|
    thresh = local_best_before - cfg.tr.success_eps * jnp.abs(local_best_before)
    improved = batch_best < thresh
    counted = jnp.logical_and(in_search, jnp.any(accept))
    new_tr = tr_update(carry.tr, improved, counted, cfg.tr, fail_tol)
    # stagnation counter: any search-phase batch without an accepted
    # improvement — including batches where the global allocation starved
    # this TR entirely (improved is False then: batch_best = inf)
    stag = jnp.where(
        in_search, jnp.where(improved, 0, carry.tr.stag + 1), carry.tr.stag
    )
    carry = carry._replace(tr=new_tr._replace(stag=stag))

    # restart when the region collapses [R]; opt-in stagnation trigger
    # (TRConfig.stagnation_tol): re-seed after that many consecutive
    # improvement-free search batches even while the length is above
    # length_min (the flagship budget never collapses a TR naturally —
    # BASELINE.md round-3 m-sweep diagnostic)
    needs_restart = carry.tr.length < cfg.tr.length_min
    if cfg.tr.stagnation_tol is not None:
        needs_restart = jnp.logical_or(
            needs_restart, carry.tr.stag >= cfg.tr.stagnation_tol
        )
    carry = lax.cond(
        needs_restart,
        lambda c: _fresh_restart(c, restart_key, dim, _stream_len(cfg), cfg.tr),
        lambda c: c,
        carry,
    )
    return carry


def _make_t1_step(fn, lb, ub, cfg: TurboConfig, config: GPConfig, n_loc: int):
    """One TuRBO-1 iteration (shared by the monolithic scan and the
    segmented/checkpointable host driver)."""
    dim = len(lb)
    lb_a = jnp.asarray(lb, jnp.float32)
    ub_a = jnp.asarray(ub, jnp.float32)
    fail_tol = cfg.tr.resolved_fail_tol(dim, cfg.batch_size)

    def step(carry: TurboCarry, _):
        k_prop, k_restart, k_next = jax.random.split(carry.key, 3)
        carry = carry._replace(key=k_next)
        carry, xs, in_search = turbo_propose(carry, k_prop, cfg, config)
        ys = fn(T.from_unit_cube(xs, lb_a, ub_a)).astype(xs.dtype)
        ys = T.impute_failures(ys, carry.y_buf, L.row_mask(n_loc, carry.n))
        accept = jnp.ones((cfg.batch_size,), jnp.bool_)
        carry = turbo_absorb(carry, xs, ys, accept, in_search, cfg, config, fail_tol, k_restart)
        return carry, carry.best_y

    return step


@partial(jax.jit, static_argnames=("fn", "cfg", "config", "n_loc"))
def run_turbo1(
    key: Array,
    fn: Callable[[Array], Array],
    lb: Tuple[float, ...],
    ub: Tuple[float, ...],
    cfg: TurboConfig,
    config: GPConfig = GPConfig(),
    n_loc: Optional[int] = None,
):
    """TuRBO-1 as one compiled ``lax.scan`` program (config 4 [B:10]).

    Returns (carry, incumbent_trace) with the global best across restarts.
    """
    dim = len(lb)
    n_loc = n_loc or cfg.n_init + cfg.n_iters * cfg.batch_size
    carry0 = make_turbo_carry(key, dim, n_loc, cfg, config)
    step = _make_t1_step(fn, lb, ub, cfg, config, n_loc)
    carry, trace = lax.scan(step, carry0, None, length=cfg.n_iters)
    return carry, trace


def run_turbo1_host(
    key: Array,
    fn: Callable[[Array], Array],
    lb: Tuple[float, ...],
    ub: Tuple[float, ...],
    cfg: TurboConfig,
    config: GPConfig = GPConfig(),
    n_loc: Optional[int] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    on_iteration=None,
):
    """TuRBO-1 driven from the host in jitted ``lax.scan`` segments —
    identical math to ``run_turbo1`` (same step function), but the run can
    checkpoint between segments and resume deterministically (SURVEY.md
    §5.4: the RNG key lives in the carry). Segment length =
    ``checkpoint_every`` (or the whole budget when 0)."""
    import numpy as np

    from turbojax.checkpoint import RunCheckpointer

    lb, ub = tuple(lb), tuple(ub)
    dim = len(lb)
    n_loc = n_loc or cfg.n_init + cfg.n_iters * cfg.batch_size
    step = _make_t1_step(fn, lb, ub, cfg, config, n_loc)

    @partial(jax.jit, static_argnames=("length",))
    def run_seg(carry, length: int):
        return lax.scan(step, carry, None, length=length)

    ckpt = RunCheckpointer(checkpoint_path, checkpoint_every)
    carry, trace = None, []
    if resume:
        like = jax.eval_shape(lambda k: make_turbo_carry(k, dim, n_loc, cfg, config), key)
        restored = ckpt.try_restore(like)
        if restored is not None:
            carry, trace = restored
    if carry is None:
        carry = jax.jit(
            lambda k: make_turbo_carry(k, dim, n_loc, cfg, config)
        )(key)

    it = len(trace)
    seg_default = checkpoint_every or cfg.n_iters
    while it < cfg.n_iters:
        seg = min(seg_default, cfg.n_iters - it)
        carry, bests = run_seg(carry, seg)
        bests = np.asarray(jax.device_get(bests))
        for j, b in enumerate(bests):
            if on_iteration is not None:
                on_iteration(it + j, float(b))
            trace.append(b)
        it += seg
        ckpt.maybe_save(it, carry, trace)
    return carry, jnp.asarray(np.asarray(trace))
