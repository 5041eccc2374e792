"""TuRBO-m: multi-trust-region optimization with vmapped surrogates
(SURVEY.md C18, call stack §3.4; config 5 [B:11]).

Algorithmic contract [R]: m independent trust regions, **one GP per TR** fit
on that TR's own history. Each iteration every TR proposes a candidate set
with Thompson-sampling values; a **global** argmin across the union
allocates the q-batch to TRs (without replacement); each selected point's
evaluation feeds only its TR's history and counters; TRs restart
independently.

TPU-native design [B:5, B:11]: the entire per-TR pipeline — GP fit
(itself vmapped over restarts), TR candidate generation, Thompson draws —
is ``vmap``-ed over a leading m-axis, so the m surrogate fits run as one
batched device program. The only cross-TR interaction is the global top-q
selection over the (m, q, n_cand) Thompson values (SURVEY.md §3.4). When a
device mesh is available the m-axis shards across ICI via ``shard_map``
with an ``all_gather`` of the (small) TS-value tensor for the global
selection — see ``turbojax.parallel``.

Restarting TRs keep shapes static via the same init-stream device as
TuRBO-1 (SURVEY.md §7.3.4): a TR in its init phase enters its LHS points
into the global selection with −∞ Thompson values on its first q slots, so
the allocator routes evaluations to it until its design is complete; this
preserves "restart consumes budget" semantics without dynamic shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from turbojax import acq as A
from turbojax import gp as G
from turbojax import linalg as L
from turbojax import sampling as S
from turbojax import transforms as T
from turbojax.config import GPConfig
from turbojax.trust_region import TurboCarry, TurboConfig, make_turbo_carry

Array = jax.Array


def _tr_proposals_and_values(
    carry: TurboCarry, key: Array, cfg: TurboConfig, config: GPConfig, n_cand: int
) -> Tuple[TurboCarry, Array, Array]:
    """Per-TR half of the TuRBO-m iteration (mapped over the m-axis).

    Returns (carry, candidates (n_cand, d), ts_values (q, n_cand)). For a TR
    in its init phase the "candidates" are its LHS stream (padded cyclically
    to n_cand) and the q TS rows are −∞ on the first q distinct stream slots
    so the global allocator must pick them."""
    dim = carry.x_buf.shape[-1]
    q = cfg.batch_size
    in_search = carry.n >= cfg.n_init
    k_fit, k_cand, k_ts = jax.random.split(key, 3)

    def init_branch(c: TurboCarry):
        stream_len = c.init_stream.shape[0]
        start = jnp.minimum(c.n, stream_len - q)
        reps = -(-n_cand // stream_len)
        cands = jnp.tile(c.init_stream, (reps, 1))[:n_cand]
        col = jnp.arange(n_cand)
        # force-select slots start..start+q-1: row j gets a huge negative
        # value at exactly one slot. The magnitude is randomized per TR/row
        # so that when several TRs are in their init phase the allocator's
        # argmin spreads the q evaluations across them instead of always
        # feeding the lowest TR id (tie-break starvation).
        want = (col[None, :] - start) == jnp.arange(q)[:, None]
        jitter = jax.random.uniform(k_ts, (q, 1), c.x_buf.dtype)
        forced = jnp.asarray(-1e30, c.x_buf.dtype) * (1.0 + jitter)
        values = jnp.where(want, forced, jnp.asarray(jnp.inf, c.x_buf.dtype))
        return c, cands, values

    def search_branch(c: TurboCarry):
        from turbojax.trust_region import _fit_or_reuse

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
        if cfg.ts_sampler == "pathwise":
            values = A.pathwise_paths(k_ts, state, cands, q, config, cfg.rff_features)
        elif cfg.ts_sampler == "rff":
            values = A.rff_paths(k_ts, state, cands, q, config, cfg.rff_features)
        else:
            values = A.thompson_samples(
                k_ts, state, cands, q, config, cfg.ts_chunk, cfg.ts_dtype
            )
        return c, cands, values

    return lax.cond(in_search, search_branch, init_branch, carry)


_CAPB_MIN = 512  # smallest small-group fit capacity (sub-512 chols are ~ms)


def _split_cap(ns, cap: int, chunk: int, step_max: int) -> Optional[int]:
    """Static fit capacity for the m−1 smaller TRs over the next ``chunk``
    dispatched iterations, or None when splitting can't pay.

    Global Thompson allocation is winner-takes-most in practice (BASELINE.md
    round-3 allocation diagnostic: one TR absorbs ~1750 of 2000 rover
    evaluations), yet the vmapped per-TR fit runs every lane at the shared
    bucket capacity — m·cap³ Cholesky work where one lane needs cap³ and the
    rest would fit in a 512 rung. The returned capacity must bound every
    non-largest lane for the whole chunk: any such lane starts ≤ the
    2nd-largest count and gains at most ``chunk·step_max`` points (if the
    largest lane restarts mid-chunk, the overtaking lane also started ≤ n2
    and lands in the full-capacity slot — still safe). Power-of-2 rungs with
    a ``_CAPB_MIN`` floor keep the program-signature set small; None when no
    rung is at most half the full capacity (no meaningful FLOP win)."""
    if len(ns) < 2:
        return None
    n2 = int(sorted(int(v) for v in ns)[-2])
    need = n2 + chunk * step_max
    cap_b = _CAPB_MIN
    while cap_b < need:
        cap_b *= 2
    return cap_b if 2 * cap_b <= cap else None


def _split_proposals(
    carries: TurboCarry, prop_keys: Array, cfg: TurboConfig, config: GPConfig,
    n_cand: int, cap_b: int,
) -> Tuple[TurboCarry, Array, Array]:
    """Two-group per-TR proposals: the largest TR at the full buffer
    capacity, the other m−1 on ``[:cap_b]`` sliced views of their buffers.

    Masked-math invariants (SURVEY.md §7.3.1) make the slice exact: padding
    is inactive, so a lane with n active rows computes the same fit/posterior
    at any capacity ≥ n (the padding-equivalence probe measured identical
    full-budget trajectories across paddings, BASELINE.md round-3 chaos
    probe). Only ``raw`` (the warm-chain hypers) is written back: per
    ``_tr_proposals_and_values``'s contract the returned carry differs from
    its input in that field alone."""
    perm = jnp.argsort(-carries.n)  # descending by active count; stable
    cp = jax.tree.map(lambda a: a[perm], carries)
    kp = prop_keys[perm]
    big = jax.tree.map(lambda a: a[:1], cp)
    small = jax.tree.map(lambda a: a[1:], cp)
    small = small._replace(x_buf=small.x_buf[:, :cap_b], y_buf=small.y_buf[:, :cap_b])
    f = lambda c, k: _tr_proposals_and_values(c, k, cfg, config, n_cand)  # noqa: E731
    big_c, big_cands, big_vals = jax.vmap(f)(big, kp[:1])
    small_c, small_cands, small_vals = jax.vmap(f)(small, kp[1:])
    inv = jnp.argsort(perm)
    raw = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b])[inv], big_c.raw, small_c.raw
    )
    cands = jnp.concatenate([big_cands, small_cands])[inv]
    values = jnp.concatenate([big_vals, small_vals])[inv]
    return carries._replace(raw=raw), cands, values


def global_allocate(ts_values: Array, cap: Optional[int] = None) -> Tuple[Array, Array]:
    """Global q-batch argmin-without-replacement across all TRs [R, B:11].

    Args:
      ts_values: (m, q, n_cand) per-TR Thompson draws.
      cap: optional per-TR slot cap per batch (``TurboConfig.alloc_cap``,
        beyond-reference lever): once a TR holds ``cap`` of this batch's
        slots its remaining candidates are excluded, forcing the allocation
        to spread. Motivation (BASELINE.md round-3 allocation diagnostic):
        the pure global argmin is winner-takes-most on rover — one TR
        absorbs ~1750 of 2000 evaluations — which drives the per-TR history
        (and the O(n³) refit) toward the full budget while the other TRs
        idle. ``cap=k`` bounds every TR's history at n_init + n_iters·k.
        None (default) = reference-parity unconstrained argmin.

    Returns (tr_idx (q,), cand_idx (q,)): slot j takes the global minimum of
    draw row j over all (TR, candidate) pairs not yet chosen.
    """
    m, q, n_cand = ts_values.shape
    if cap is not None and cap * m < q:
        raise ValueError(f"alloc_cap ({cap}) × m ({m}) must cover the batch (q={q})")
    flat = jnp.swapaxes(ts_values, 0, 1).reshape(q, m * n_cand)
    big = jnp.asarray(jnp.finfo(flat.dtype).max, flat.dtype)
    tr_of = jnp.arange(m * n_cand) // n_cand

    def step(carry, row):
        taken, counts = carry
        # NaN-proof like acq.select_q_batch: a degenerate TR's draws rank
        # WORST (finite sentinel at big/2), so they only win a slot once
        # every finite candidate is taken or cap-blocked. Ranking them
        # last instead of hard-blocking matters when cap is set and some
        # TR's draws are all-NaN/+inf: hard-blocking made every entry
        # blocked once the healthy TRs hit their caps, and argmin over the
        # all-`big` row silently credited pair (0, 0) past TR 0's cap with
        # duplicate picks — breaking the n_init + n_iters·cap history
        # bound the cap exists to guarantee. With the sentinel, overflow
        # slots spread to the degenerate TRs' untaken candidates: picks
        # stay distinct and the cap invariant holds.
        blocked = taken
        if cap is not None:
            blocked = blocked | (counts >= cap)[tr_of]
        # last-resort tier (q > untaken-and-uncapped entries, e.g.
        # pathological cap < q/m configs): relax the cap, never duplicate
        # an untaken slot
        blocked = jnp.where(jnp.all(blocked), taken, blocked)
        ranked = jnp.where(jnp.isfinite(row), row, big * 0.5)
        masked = jnp.where(blocked, big, ranked)
        idx = jnp.argmin(masked)
        counts = counts.at[idx // n_cand].add(1)
        return (taken.at[idx].set(True), counts), idx

    (_, _), flat_idx = lax.scan(
        step, (jnp.zeros((m * n_cand,), jnp.bool_), jnp.zeros((m,), jnp.int32)), flat
    )
    return flat_idx // n_cand, flat_idx % n_cand


def run_turbom(
    key: Array,
    fn: Callable[[Array], Array],
    lb: Tuple[float, ...],
    ub: Tuple[float, ...],
    cfg: TurboConfig,
    config: GPConfig = GPConfig(),
    m: int = 5,
    n_loc: Optional[int] = None,
    host_loop: bool = False,
    on_iteration=None,
    scan_chunk: int = 16,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    split_fit: bool = True,
):
    """TuRBO-m: vmapped per-TR fits + global TS allocation (config 5
    [B:11]). Returns (carries, incumbent_trace); the run-level best is
    ``trace[-1]`` / the min over ``carries.best_y``.

    ``split_fit`` (host mode): fit the non-largest TRs at a small sliced
    capacity instead of the shared bucket cap (``_split_cap`` /
    ``_split_proposals``) — global allocation is winner-takes-most, so this
    removes most of the m·cap³ refit cost at identical masked math. On by
    default; set False to force every lane onto the uniform-capacity
    program (e.g. when comparing against the sharded TR-axis path, which
    is SPMD-uniform and never splits).

    ``host_loop=False`` compiles the whole run as one ``lax.scan`` program;
    ``host_loop=True`` jits a single iteration and drives it from the host —
    identical math, one dispatch per iteration, and a far smaller compiled
    binary (use it for very large (m, N_loc, n_cand) products where the
    monolithic scan program strains the compiler/worker). ``on_iteration``
    (host mode only): callback ``(iteration, best) -> None`` for run logging
    (SURVEY.md §5.5), e.g. ``RunLog.log``.

    Checkpointing (SURVEY.md §5.4; host mode): ``checkpoint_path`` +
    ``checkpoint_every=k`` saves the carries every ≥k iterations (at chunk
    boundaries); ``resume=True`` restores and reproduces the uninterrupted
    trajectory exactly (the per-TR RNG keys live in the carries). A
    checkpoint request forces the host driver."""
    if checkpoint_path and (checkpoint_every or resume):
        host_loop = True
    if host_loop:
        return _run_turbom_host(
            key, fn, tuple(lb), tuple(ub), cfg, config, m, n_loc, on_iteration,
            scan_chunk=scan_chunk, checkpoint_path=checkpoint_path,
            checkpoint_every=checkpoint_every, resume=resume, split_fit=split_fit,
        )
    return _run_turbom_scan(key, fn, tuple(lb), tuple(ub), cfg, config, m, n_loc)


@partial(jax.jit, static_argnames=("fn", "cfg", "config", "m", "n_loc"))
def _run_turbom_scan(
    key: Array,
    fn: Callable[[Array], Array],
    lb: Tuple[float, ...],
    ub: Tuple[float, ...],
    cfg: TurboConfig,
    config: GPConfig = GPConfig(),
    m: int = 5,
    n_loc: Optional[int] = None,
):
    dim = len(lb)
    # per-TR growth per iteration is bounded by alloc_cap when set
    step_max = min(cfg.batch_size, cfg.alloc_cap or cfg.batch_size)
    n_loc = n_loc or cfg.n_init + cfg.n_iters * step_max
    keys0 = jax.random.split(key, m)
    carries0 = jax.vmap(lambda k: make_turbo_carry(k, dim, n_loc, cfg, config))(keys0)
    step = _make_step(fn, lb, ub, cfg, config, m)
    carries, trace = lax.scan(lambda c, _: step(c), carries0, None, length=cfg.n_iters)
    return carries, trace


def _grow_carries(carries: TurboCarry, new_cap: int) -> TurboCarry:
    """Zero-pad the per-TR history buffers to a larger capacity. Masked-math
    invariants (SURVEY.md §7.3.1) make this free: padding is inactive."""
    m, old, dim = carries.x_buf.shape
    pad_x = jnp.zeros((m, new_cap - old, dim), carries.x_buf.dtype)
    pad_y = jnp.zeros((m, new_cap - old), carries.y_buf.dtype)
    return carries._replace(
        x_buf=jnp.concatenate([carries.x_buf, pad_x], axis=1),
        y_buf=jnp.concatenate([carries.y_buf, pad_y], axis=1),
    )


def _bucket_ladder(cap0: int, n_final: int):
    caps = [cap0]
    while caps[-1] < n_final:
        caps.append(min(caps[-1] * 2, n_final))
    return caps


class _AOTLadder:
    """AOT-compiled per-bucket programs for the host loop (ROADMAP item 2,
    VERDICT r1 weak #1).

    Per bucket capacity, the workhorse is ``scan`` (``chunk`` iterations
    fused into one ``lax.scan`` dispatch — amortizes the per-call
    host→device round-trip, which dominates through the axon remote
    tunnel); ``step`` (one iteration) exists only for off-grid dispatches.
    A single background thread compiles rungs one-ahead
    (``jit(...).lower().compile()``), overlapping the next bucket's
    compile with current-bucket execution; ``get`` returns the finished
    executable, blocking only if the needed program isn't ready yet
    ("properly awaited", not best-effort cache warming)."""

    def __init__(self, make_step, spec0, m: int, caps, chunk: int,
                 split_for=None):
        from concurrent.futures import ThreadPoolExecutor

        self._make_step = make_step  # cap_b -> one-iteration step function
        self._chunk = chunk
        self._spec0 = spec0
        self._m = m
        self._pool = ThreadPoolExecutor(max_workers=1)
        self._futs = {}
        self._caps = list(caps)
        # split-capacity predictor (cap -> cap_b) for prefetch keys; the
        # driver closes it over its live per-TR counts so the one-ahead
        # compile targets the program the next dispatch will actually ask
        # for (a wrong prediction only costs a lazy compile, never
        # correctness — get() keys on the exact (cap, kind, cap_b) asked).
        self._split_for = split_for or (lambda cap: None)
        # Only "scan" programs are prefetched, ONE BUCKET AHEAD: the driver
        # aligns its dispatch grid to the chunk (grow-early + divisor chunk),
        # so "step" programs are needed only off-grid (unaligned resume,
        # chunk-indivisible budgets) and compile lazily in get(). Buckets a
        # run never reaches never compile — growth follows max per-TR n, so
        # the final cap (one TR eats the whole budget) is rarely touched,
        # and its ~50 MB executable costs ~150 s to load through the axon
        # tunnel even on a persistent-cache hit (docs/DESIGN.md §4b).
        if self._caps:
            cap0 = self._caps[0]
            key = (cap0, "scan", self._split_for(cap0))
            self._futs[key] = self._pool.submit(self._compile, *key)
            self._prefetch_after(cap0)

    def _prefetch_after(self, cap: int):
        """Queue the next ladder bucket's scan program (one-ahead)."""
        try:
            nxt = self._caps[self._caps.index(cap) + 1]
        except (ValueError, IndexError):
            return
        key = (nxt, "scan", self._split_for(nxt))
        if key not in self._futs:
            self._futs[key] = self._pool.submit(self._compile, *key)

    def _grow_spec(self, cap: int):
        spec = self._spec0
        x = jax.ShapeDtypeStruct((self._m, cap) + spec.x_buf.shape[2:], spec.x_buf.dtype)
        y = jax.ShapeDtypeStruct((self._m, cap), spec.y_buf.dtype)
        return spec._replace(x_buf=x, y_buf=y)

    def _compile(self, cap: int, kind: str, cap_b):
        step_fn = self._make_step(cap_b)
        if kind == "step":
            fn = step_fn
        else:
            fn = lambda c: lax.scan(  # noqa: E731
                lambda c2, _: step_fn(c2), c, None, length=self._chunk
            )
        return jax.jit(fn).lower(self._grow_spec(cap)).compile()

    def get(self, cap: int, kind: str, cap_b=None):
        key = (cap, kind, cap_b)
        fut = self._futs.get(key)
        if fut is None:  # off-ladder capacity / lazy "step": compile now
            fut = self._pool.submit(self._compile, *key)
            self._futs[key] = fut
        if kind == "scan":
            self._prefetch_after(cap)  # overlap the next bucket's compile
        return fut.result()

    def close(self):
        """Cancel queued bucket compiles and release the worker thread.

        Without this, programs for buckets a run never reaches (short runs,
        crashes, Ctrl-C mid-checkpoint) still compile to completion —
        15–30 s each through the tunnel — and block interpreter exit."""
        self._pool.shutdown(wait=False, cancel_futures=True)


def _run_turbom_host(key, fn, lb, ub, cfg, config, m, n_loc, on_iteration=None,
                     scan_chunk: int = 16, checkpoint_path=None,
                     checkpoint_every: int = 0, resume: bool = False,
                     split_fit: bool = True):
    """Host driver with **bucketed buffer growth**: buffers start at the
    smallest power-of-2 capacity and double as histories fill. Early
    iterations then factorize 256² matrices instead of the final 2048² —
    the O(cap³) fit cost tracks the actual data size (measured ≈4× faster
    full config-5 run vs fixed buffers).

    Dispatch is chunk-aligned: the largest chunk ≤ ``scan_chunk`` dividing
    ``n_iters`` is chosen and buffers grow a full chunk early, so every
    dispatch is ONE compiled ``lax.scan`` program per bucket (no "step"
    twin — docs/DESIGN.md §4b); rungs compile one-ahead in a background
    thread (``_AOTLadder``). The persistent XLA cache makes repeat runs'
    compiles disk hits."""
    import numpy as np

    from turbojax.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from turbojax.checkpoint import RunCheckpointer

    dim = len(lb)
    q = cfg.batch_size
    # per-TR growth per iteration is bounded by alloc_cap when set — it
    # bounds both the final buffer and the bucket ladder (fit cost)
    step_max = min(q, cfg.alloc_cap or q)
    n_final = n_loc or cfg.n_init + cfg.n_iters * step_max
    # Start the bucket ladder at 512 (not the minimal power of 2): each
    # bucket costs TWO program builds (step + scan) whose trace/lower work
    # runs on the host — measured comparable to the whole run's compute on
    # a small-core host — while the compute saved by sub-512 buckets is
    # microscopic (a 512² masked chol is ~1 ms on the MXU).
    cap = 512
    while cap < max(2 * q, cfg.n_init + q):
        cap *= 2
    cap = min(cap, n_final)

    keys0 = jax.random.split(key, m)
    mk = lambda ks: jax.vmap(lambda k: make_turbo_carry(k, dim, cap, cfg, config))(ks)  # noqa: E731
    ckpt = RunCheckpointer(checkpoint_path, checkpoint_every)
    carries, trace = None, []
    if resume:
        restored = ckpt.try_restore(jax.eval_shape(mk, keys0))
        if restored is not None:
            carries, trace = restored
            cap = carries.x_buf.shape[1]  # resume inside the saved bucket
    if carries is None:
        carries = jax.jit(mk)(keys0)
    spec0 = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), carries)
    # Align the dispatch grid to the budget: pick the largest chunk ≤
    # scan_chunk that divides n_iters, so the whole run is whole-chunk
    # "scan" dispatches and the per-bucket "step" program (a second ~50 MB
    # executable per bucket at large caps, slow to load through the axon
    # tunnel) is never compiled. Falls back to lazy step compiles when no
    # divisor exists (prime budgets) or on unaligned resume.
    chunk = scan_chunk
    if scan_chunk > 1:
        for c in range(min(scan_chunk, cfg.n_iters), 1, -1):
            if cfg.n_iters % c == 0:
                chunk = c
                break
    # Split-capacity fit (see _split_cap/_split_proposals): the driver keeps
    # a live snapshot of the per-TR active counts; the ladder's prefetcher
    # reads the same snapshot so the one-ahead compile targets the program
    # the next dispatch will ask for. Margin is always a full chunk (also
    # for single-"step" dispatches) so both program kinds share one cap_b
    # per bucket.
    ns_cell = [jax.device_get(carries.n)]
    if split_fit:
        split_for = lambda c: _split_cap(ns_cell[0], c, chunk, step_max)  # noqa: E731
    else:
        split_for = lambda c: None  # noqa: E731
    ladder = _AOTLadder(
        lambda cap_b: _make_step(fn, lb, ub, cfg, config, m, cap_b), spec0, m,
        _bucket_ladder(cap, n_final), chunk, split_for=split_for,
    )

    it = len(trace)
    try:
        while it < cfg.n_iters:
            ns_cell[0] = jax.device_get(carries.n)
            n_max_now = int(ns_cell[0].max())
            # grow EARLY: make room for a full chunk before dispatching, so
            # every dispatch in a bucket is the "scan" program. Growth timing
            # is numerically free — masked padding is exactly equivalent
            # (chaos probe: bucketed vs fixed-cap identical per seed).
            if cap < n_final and (cap - n_max_now) // step_max < chunk:
                cap = min(max(cap * 2, n_max_now + chunk * step_max), n_final)
                carries = _grow_carries(carries, cap)
            # iterations guaranteed to fit in this bucket (each adds
            # ≤ min(q, alloc_cap) per TR)
            k_fit = (cap - n_max_now) // step_max if cap < n_final else cfg.n_iters - it
            cap_b = split_for(cap)
            aligned = (cfg.n_iters - it) % chunk == 0
            if chunk > 1 and aligned and min(k_fit, cfg.n_iters - it) >= chunk:
                carries, bests = ladder.get(cap, "scan", cap_b)(carries)
                bests = np.asarray(jax.device_get(bests))
                for j, b in enumerate(bests):
                    if on_iteration is not None:
                        on_iteration(it + j, float(b))
                    trace.append(b)
                it += chunk
            else:
                carries, best = ladder.get(cap, "step", cap_b)(carries)
                trace.append(best)
                if on_iteration is not None:
                    on_iteration(it, float(best))
                it += 1
            ckpt.maybe_save(it, carries, trace)
    finally:
        ladder.close()
    return carries, jnp.asarray(np.asarray(jax.device_get(trace)))


def _check_n_cand(cfg: TurboConfig, n_cand: int):
    from turbojax.trust_region import _stream_len

    # init-phase forcing writes −∞ at stream slots start..start+q−1, which
    # must exist inside the candidate set (SURVEY.md §7.3.4 restart device)
    assert n_cand >= _stream_len(cfg), (
        f"n_candidates ({n_cand}) must be >= the init stream length "
        f"({_stream_len(cfg)}) for in-loop restarts"
    )


def turbom_propose_batch(carries: TurboCarry, cfg: TurboConfig, config: GPConfig,
                         m: int, cap_b: Optional[int] = None):
    """First half of a TuRBO-m iteration: per-TR proposals (vmapped) +
    global Thompson allocation. Returns (carries, x_sel (q, d) unit cube,
    tr_idx (q,), restart_keys (m,)) — feed the evaluations plus these to
    ``turbom_absorb_batch``. Used by the compiled step and the ask/tell
    API (SURVEY.md C15 API (a) for C18).

    ``cap_b`` (static): split-capacity fit — all lanes except the largest
    run on ``[:cap_b]`` buffer slices (see ``_split_proposals``); the caller
    must guarantee every non-largest lane's active count stays ≤ cap_b
    while this program is dispatched (``_split_cap``)."""
    dim = carries.x_buf.shape[-1]
    n_cand = cfg.n_candidates or S.n_candidates(dim)
    _check_n_cand(cfg, n_cand)

    k_step = jax.random.fold_in(carries.key[0], 0)
    k_prop, k_restart = jax.random.split(k_step)
    prop_keys = jax.random.split(k_prop, m)
    restart_keys = jax.random.split(k_restart, m)
    # advance each TR's own key stream
    new_keys = jax.vmap(lambda k: jax.random.split(k, 1)[0])(carries.key)
    carries = carries._replace(key=new_keys)

    if cap_b is not None and cap_b < carries.x_buf.shape[1]:
        carries, cands, values = _split_proposals(
            carries, prop_keys, cfg, config, n_cand, cap_b
        )
    else:
        carries, cands, values = jax.vmap(
            lambda c, k: _tr_proposals_and_values(c, k, cfg, config, n_cand)
        )(carries, prop_keys)
    tr_idx, cand_idx = global_allocate(values, cfg.alloc_cap)  # (q,), (q,)
    x_sel = cands[tr_idx, cand_idx]  # (q, d)
    return carries, x_sel, tr_idx, restart_keys


def turbom_absorb_batch(
    carries: TurboCarry,
    x_sel,
    y_sel,
    tr_idx,
    restart_keys,
    cfg: TurboConfig,
    config: GPConfig,
    m: int,
    fail_tol: int,
):
    """Second half: impute failures, credit each TR with its allocated
    points, run counter transitions and restarts. Returns (carries, best)."""
    from turbojax.trust_region import turbo_absorb

    y_sel = y_sel.astype(x_sel.dtype)
    # §5.3: impute NaN/inf objective values against the global history
    flat_mask = (jnp.arange(carries.y_buf.shape[1])[None, :] < carries.n[:, None]).reshape(-1)
    y_sel = T.impute_failures(y_sel, carries.y_buf.reshape(-1), flat_mask)

    in_search = carries.n >= cfg.n_init  # (m,)
    accept = tr_idx[None, :] == jnp.arange(m)[:, None]  # (m, q)
    carries = jax.vmap(
        lambda c, acc, srch, rk: turbo_absorb(
            c, x_sel, y_sel, acc, srch, cfg, config, fail_tol, rk
        )
    )(carries, accept, in_search, restart_keys)
    return carries, jnp.min(carries.best_y)


def _make_step(fn, lb, ub, cfg: TurboConfig, config: GPConfig, m: int,
               cap_b: Optional[int] = None):
    """One TuRBO-m iteration over all m TRs (shared by the scan and
    host-loop drivers; also the unit the sharded path parallels).
    ``cap_b``: static split-fit capacity for the non-largest lanes
    (host-loop only — see ``turbom_propose_batch``)."""
    dim = len(lb)
    lb_a = jnp.asarray(lb, jnp.float32)
    ub_a = jnp.asarray(ub, jnp.float32)
    q = cfg.batch_size
    fail_tol = cfg.tr.resolved_fail_tol(dim, q)
    _check_n_cand(cfg, cfg.n_candidates or S.n_candidates(dim))

    def step(carries: TurboCarry):
        carries, x_sel, tr_idx, restart_keys = turbom_propose_batch(
            carries, cfg, config, m, cap_b
        )
        y_sel = fn(T.from_unit_cube(x_sel, lb_a, ub_a)).astype(x_sel.dtype)
        return turbom_absorb_batch(
            carries, x_sel, y_sel, tr_idx, restart_keys, cfg, config, m, fail_tol
        )

    return step
