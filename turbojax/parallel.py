"""Device-mesh parallelism over ICI (SURVEY.md §2.6, §5.8; [B:5]).

The reference is single-process BLAS; all device parallelism here is new,
TPU-native work. Three data-parallel axes map onto a ``jax.sharding.Mesh``:

  * **candidate axis** (DP analog, C14): acquisition evaluation over tens of
    thousands of candidates shards across devices; the global argmin/top-q
    reduction is a per-device top-k followed by an ``all_gather`` of the tiny
    (q per device) survivor set — O(q·n_dev) bytes over ICI instead of the
    full candidate set.
  * **restart axis** (C8): multi-restart hyperparameter fits shard across
    devices, ``vmap`` within a device [B:5].
  * **trust-region axis** (EP analog, C18): TuRBO-m's m independent
    surrogates shard across devices; the only cross-TR reduction is the
    global Thompson allocation over the (m, q, n_cand) value tensor,
    ``all_gather``-ed (≈1 MB at m=5, q=10, n_cand=5k) and reduced
    identically on every device.

All entry points are mesh-size-generic: they run unchanged on a mesh of 1
(the single axon chip), a CPU-simulated mesh of 8 (tests/test_sharding.py),
or a real pod slice. Sequence/pipeline parallelism have no counterpart in
GP-BO (SURVEY.md §2.6) — the candidate axis is the long axis.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from turbojax import acq as A
from turbojax import gp as G
from turbojax.config import GPConfig

Array = jax.Array


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    """A 1-D mesh over the first ``n_devices`` (default: all) devices."""
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devs), (axis,))


# --------------------------------------------------------------------------
# Candidate-axis sharding (C14): fused posterior+acquisition+top-q


def sharded_acq_topq(
    state: G.GPState,
    cands: Array,
    best: Array,
    q: int,
    mesh: Mesh,
    config: GPConfig,
    acq: str = "ei",
    kappa: float = 2.0,
    xi: float = 0.0,
) -> Tuple[Array, Array]:
    """Evaluate EI/LCB over a device-sharded candidate set and return the
    global top-q (points, scores). The GP state is replicated (16 MB at
    N=2000 f32 — well under HBM); candidates shard on the mesh axis.

    Global selection: per-shard ``top_k`` then ``all_gather`` of q·n_dev
    survivors — the ICI traffic is O(q·n_dev·d), not O(n_cand).
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    assert cands.shape[0] % n_dev == 0, "candidate count must divide the mesh"
    assert q <= cands.shape[0] // n_dev, "q must fit in one candidate shard"

    def local(state_rep: G.GPState, cands_loc: Array, best_rep: Array):
        mu, var = G.gp_posterior(state_rep, cands_loc, config)
        if acq == "ei":
            scores = -A.expected_improvement(mu, var, best_rep, xi)
        elif acq == "lcb":
            scores = A.lower_confidence_bound(mu, var, kappa)
        else:
            raise ValueError(f"unknown acq {acq!r}")
        top_scores, top_idx = lax.top_k(-scores, q)  # best-q locally
        survivors = cands_loc[top_idx]
        all_scores = lax.all_gather(-top_scores, axis)  # (n_dev, q)
        all_points = lax.all_gather(survivors, axis)  # (n_dev, q, d)
        flat_s = all_scores.reshape(n_dev * q)
        flat_p = all_points.reshape(n_dev * q, cands_loc.shape[-1])
        _, gidx = lax.top_k(-flat_s, q)
        return flat_p[gidx], flat_s[gidx]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(state, cands, best)


def sharded_thompson_select(
    key: Array,
    state: G.GPState,
    cands: Array,
    q: int,
    mesh: Mesh,
    config: GPConfig,
    chunk_size: Optional[int] = None,
) -> Tuple[Array, Array]:
    """Batched Thompson sampling with the candidate axis sharded (C13+C14).

    Each device draws joint samples over its candidate shard (block-diagonal
    across shards — same approximation as the chunked sampler,
    SURVEY.md §7.3.5), then the q-batch argmin-without-replacement runs on
    the all-gathered per-shard minima.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    assert cands.shape[0] % n_dev == 0

    n_cand_total = cands.shape[0]
    shard = n_cand_total // n_dev
    assert q <= shard, "q must fit in one candidate shard"

    def local(key_rep: Array, state_rep: G.GPState, cands_loc: Array):
        dev = lax.axis_index(axis)
        k_loc = jax.random.fold_in(key_rep, dev)
        draws = A.thompson_samples(k_loc, state_rep, cands_loc, q, config, chunk_size)
        # per-draw local top-q survivors (with global candidate ids), then a
        # global without-replacement pass over the gathered survivor pool
        scores, idx = lax.top_k(-draws, q)  # (q, q): top of each draw row
        gidx = dev * shard + idx  # global candidate ids
        pts = cands_loc[idx]  # (q, q, d)
        all_scores = jnp.moveaxis(lax.all_gather(-scores, axis), 1, 0).reshape(q, n_dev * q)
        all_gidx = jnp.moveaxis(lax.all_gather(gidx, axis), 1, 0).reshape(q, n_dev * q)
        all_pts = jnp.moveaxis(lax.all_gather(pts, axis), 1, 0).reshape(
            q, n_dev * q, cands_loc.shape[-1]
        )
        big = jnp.asarray(jnp.finfo(all_scores.dtype).max, all_scores.dtype)

        def step(taken, row):
            row_s, row_g, row_p = row
            masked = jnp.where(taken[row_g], big, row_s)
            i = jnp.argmin(masked)
            return taken.at[row_g[i]].set(True), (row_p[i], masked[i])

        _, (chosen, vals) = lax.scan(
            step, jnp.zeros((n_cand_total,), jnp.bool_), (all_scores, all_gidx, all_pts)
        )
        return chosen, vals

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(key, state, cands)


# --------------------------------------------------------------------------
# Restart-axis sharding (C8)


def sharded_fit_gp(
    key: Array,
    x_buf: Array,
    y_buf: Array,
    mask: Array,
    config: GPConfig,
    mesh: Mesh,
    warm_start=None,
) -> G.GPState:
    """Multi-restart fit with restarts sharded across the mesh and vmapped
    within a device [B:5 "vmap across a chip and pmap across ICI"].

    ``config.fit_restarts`` must be a multiple of the mesh size; each device
    runs its shard of restarts, then the argmin-MLL winner is selected
    globally via an all-gather of the (restarts,) loss vector.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    r = config.fit_restarts
    assert r % n_dev == 0, "fit_restarts must divide the mesh size"
    dim = x_buf.shape[-1]
    dtype = y_buf.dtype

    from turbojax import transforms as T

    # the GP models warped targets when config.y_warp is set — must match
    # gp.fit_gp/make_gp_state (which cache the posterior in warped space)
    y_std_buf, y_mean, y_sd = T.standardize(T.warp_y(y_buf, config.y_warp), mask)
    base = warm_start if warm_start is not None else G.default_params(dim, config, dtype)
    n_rand = r - 1
    if n_rand:
        rand = G.sample_restart_params(key, dim, config, n_rand, dtype)
        inits = jax.tree.map(lambda b, rr: jnp.concatenate([b[None], rr], axis=0), base, rand)
    else:
        inits = jax.tree.map(lambda b: b[None], base)

    def local(inits_loc, x_rep, y_rep, mask_rep):
        fitted, losses = jax.vmap(lambda raw: G._fit_one(raw, x_rep, y_rep, mask_rep, config))(inits_loc)
        losses = jnp.where(jnp.isfinite(losses), losses, jnp.inf)
        all_losses = lax.all_gather(losses, axis, tiled=True)  # (r,)
        all_fitted = jax.tree.map(lambda a: lax.all_gather(a, axis, tiled=True), fitted)
        best = jnp.argmin(all_losses)
        return jax.tree.map(lambda a: a[best], all_fitted)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    raw_best = fn(inits, x_buf, y_std_buf, mask)
    return G.make_gp_state(x_buf, y_buf, mask, raw_best, config)


# --------------------------------------------------------------------------
# Trust-region-axis sharding (C18, EP analog): one TuRBO-m step over a mesh


def sharded_turbom_step(
    carries,
    key: Array,
    fn,
    lb: Array,
    ub: Array,
    cfg,
    config: GPConfig,
    mesh: Mesh,
    n_cand: int,
    fail_tol: int,
):
    """One TuRBO-m iteration with the m trust regions sharded across the mesh
    [B:5 "multi-trust-region surrogates vmap across a chip and pmap across
    ICI", B:11].

    Each device runs its local TRs' full pipeline (fit → candidates → TS
    draws) under ``vmap``; the (m, q, n_cand) Thompson values and (m, n_cand,
    d) candidates are ``all_gather``-ed so every device computes the
    identical global allocation and objective evaluations; absorption is
    local to each TR's home device. ``m`` must divide the mesh size.
    """
    from turbojax.transforms import from_unit_cube
    from turbojax.turbo_m import _tr_proposals_and_values, global_allocate
    from turbojax.trust_region import turbo_absorb

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    m = carries.n.shape[0]
    assert m % n_dev == 0, "m must divide the mesh size"
    m_loc = m // n_dev
    q = cfg.batch_size

    def local(carries_loc, key_rep):
        dev = lax.axis_index(axis)
        prop_keys = jax.vmap(
            lambda i: jax.random.fold_in(key_rep, dev * m_loc + i)
        )(jnp.arange(m_loc))
        restart_keys = jax.vmap(
            lambda i: jax.random.fold_in(key_rep, m + dev * m_loc + i)
        )(jnp.arange(m_loc))

        carries_loc, cands_loc, values_loc = jax.vmap(
            lambda c, k: _tr_proposals_and_values(c, k, cfg, config, n_cand)
        )(carries_loc, prop_keys)

        values = lax.all_gather(values_loc, axis, tiled=True)  # (m, q, n_cand)
        cands = lax.all_gather(cands_loc, axis, tiled=True)  # (m, n_cand, d)
        tr_idx, cand_idx = global_allocate(values, cfg.alloc_cap)
        x_sel = cands[tr_idx, cand_idx]
        y_sel = fn(from_unit_cube(x_sel, lb, ub)).astype(x_sel.dtype)

        # §5.3: impute NaN/inf objective values against the GLOBAL history
        # (all-gathered so the penalty scope matches the unsharded driver,
        # turbo_m.py turbom_absorb_batch, at any mesh size)
        from turbojax import transforms as T

        y_all = lax.all_gather(carries_loc.y_buf, axis, tiled=True)  # (m, N_loc)
        n_all = lax.all_gather(carries_loc.n, axis, tiled=True)  # (m,)
        hist_mask = (
            jnp.arange(y_all.shape[1])[None, :] < n_all[:, None]
        ).reshape(-1)
        y_sel = T.impute_failures(y_sel, y_all.reshape(-1), hist_mask)

        local_ids = dev * m_loc + jnp.arange(m_loc)
        accept = tr_idx[None, :] == local_ids[:, None]  # (m_loc, q)
        in_search = carries_loc.n >= cfg.n_init
        carries_loc = jax.vmap(
            lambda c, acc, srch, rk: turbo_absorb(
                c, x_sel, y_sel, acc, srch, cfg, config, fail_tol, rk
            )
        )(carries_loc, accept, in_search, restart_keys)
        best = lax.pmin(jnp.min(carries_loc.best_y), axis)
        return carries_loc, best

    step = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    return step(carries, key)


def run_turbom_sharded(
    key: Array,
    fn,
    lb,
    ub,
    cfg,
    config: GPConfig,
    mesh: Mesh,
    m: Optional[int] = None,
    n_loc: Optional[int] = None,
    on_iteration=None,
):
    """Full TuRBO-m run with the trust-region axis sharded across the mesh
    (the EP analog [B:5, B:11]): a host-driven loop over
    ``sharded_turbom_step``, one jitted dispatch per iteration.

    ``m`` defaults to the mesh size (one TR per device) and must be a
    multiple of it. Buffers are fixed at the final capacity — bucketed
    growth (turbo_m._run_turbom_host) would change per-device shard shapes
    mid-run; at the multi-chip scale this driver targets, per-device HBM
    comfortably holds the full-capacity carries.

    Returns (carries, incumbent_trace) like ``turbo_m.run_turbom``.
    """
    from functools import partial as _partial

    from turbojax import sampling as S
    from turbojax.trust_region import make_turbo_carry
    from turbojax.turbo_m import _check_n_cand
    from jax.sharding import NamedSharding

    axis = mesh.axis_names[0]
    m = m or mesh.devices.size
    dim = len(lb)
    n_cand = cfg.n_candidates or S.n_candidates(dim)
    _check_n_cand(cfg, n_cand)
    n_loc = n_loc or cfg.n_init + cfg.n_iters * cfg.batch_size
    fail_tol = cfg.tr.resolved_fail_tol(dim, cfg.batch_size)

    k_carries, k_loop = jax.random.split(key)
    keys = jax.random.split(k_carries, m)
    carries = jax.jit(
        jax.vmap(lambda k: make_turbo_carry(k, dim, n_loc, cfg, config))
    )(keys)
    carries = jax.tree.map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))
        ),
        carries,
    )
    step = jax.jit(
        _partial(
            sharded_turbom_step,
            fn=fn, lb=jnp.asarray(lb, jnp.float32), ub=jnp.asarray(ub, jnp.float32),
            cfg=cfg, config=config, mesh=mesh, n_cand=n_cand, fail_tol=fail_tol,
        )
    )
    trace = []
    for it in range(cfg.n_iters):
        k_loop, k_it = jax.random.split(k_loop)
        carries, best = step(carries, k_it)
        trace.append(best)
        if on_iteration is not None:
            on_iteration(it, float(best))
    return carries, jnp.asarray(np.asarray(jax.device_get(trace)))


# --------------------------------------------------------------------------
# Multi-seed / fleet parallelism (SURVEY.md §2.6 last row, §5.8 DCN)
#
# The seed axis is embarrassingly parallel: no collectives, aggregate at the
# end. Single-host it is a vmap; multi-host each process runs its slice of
# seeds independently (DCN carries nothing but the final reduction, done by
# the caller over the returned per-seed results).


def fleet_run(run_fn, seeds, process_index: Optional[int] = None, process_count: Optional[int] = None):
    """Run ``run_fn(key)`` for a slice of seeds on this host.

    Args:
      run_fn: a (jit-compiled) function of a PRNG key returning any pytree
        (e.g. a closed-over ``run_turbo1`` call).
      seeds: full list of integer seeds for the fleet.
      process_index/process_count: this host's slot; defaults to
        ``jax.process_index()/count()`` so the same script works single- and
        multi-host. Each host owns seeds[i::count] — no communication.

    Returns (host_seeds, results) for this host's slice.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    mine = list(seeds)[pi::pc]
    results = [run_fn(jax.random.key(s)) for s in mine]
    return mine, results
