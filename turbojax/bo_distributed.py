"""Bayesian optimization at N ≫ single-chip memory (VERDICT r2 task 5:
the distributed GP as a product path, not a standalone component).

``run_bo_distributed`` is the plain BO loop (SURVEY.md C15) with the
surrogate routed through ``distributed_linalg.fit_gp_auto``: below the
memory threshold it fits the ordinary single-chip masked GP; above it, the
row-block-sharded ``DistributedGP`` (in-shard kernel build, blocked
Cholesky, distributed-MLL Adam fit — no device ever materializes N²).
Acquisition is EI or LCB over a fresh candidate set against the
(dense-or-distributed) posterior — exactly call stack §3.3 with the
training axis sharded — or batch Thompson sampling via the decoupled
pathwise sampler (Matheron's rule, ``acq.pathwise_paths`` /
``distributed_linalg.distributed_pathwise_paths``): globally-joint draws
with EXACT data conditioning at pure-matmul + one-cached-solve cost. The
chunked-Cholesky "exact" sampler is structurally unavailable here — it
factorizes chunk² candidate covariances the distributed posterior
deliberately never forms — so ``acq="ts"`` always routes to pathwise
(``ts_sampler="rff"`` is rejected: weight-space conditioning starves at
the noise floor, docs/DESIGN.md §5b).
``GPConfig.y_warp`` is honored: both routing branches model ``warp_y(y)``
and the EI incumbent is warped at the same choke point (docs/DESIGN.md
§7b), so crossing the memory threshold never changes model semantics.

Layout constraints of the unmasked row-sharded history: ``n_init`` and
``batch_size`` must be multiples of the mesh size so every history length
divides the mesh; the factorization panel is auto-sized per refit.

The loop is host-driven: at this scale one hyperparameter fit is minutes
of device time, so per-iteration dispatch overhead is irrelevant — and
history growth changes array shapes, which a compiled scan could not
carry. Each (N,) shape compiles once and caches.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from turbojax import acq as A
from turbojax import sampling as S
from turbojax import transforms as T
from turbojax.bo import BOConfig
from turbojax.config import GPConfig
from turbojax.distributed_linalg import (
    DENSE_BUDGET_BYTES,
    fit_gp_auto,
    refactor_gp_auto,
)

Array = jax.Array

CAND_SHARD_MIN = 32768
# Candidate count below which the candidate axis is NOT sharded even on a
# multi-device mesh (SURVEY.md C14 "shard candidate axis" — the product
# routing decision, VERDICT r4 missing #4). At the reference candidate cap
# min(100d, 5000) the single-chip batched posterior+acq is latency-bound
# (~6 ms at N=2000, BENCH_components), so splitting it buys nothing and
# pays shard_map dispatch + an all-gather; measured on the 8-dev CPU mesh
# (docs/DESIGN.md §8b, round 5): at 5000 candidates the route is a LOSS
# (12× work overhead, implied 0.66× at 8 chips), first pays at ~32k
# (2.9× overhead → implied 2.8×), asymptote ~2.5×. Override per run with
# BOConfig.cand_shard_min (0 forces sharding — the exact-match test lane).


class BigBOResult(NamedTuple):
    x_hist: Array  # (n, d) original box
    y_hist: Array  # (n,)
    best_x: Array
    best_y: Array
    incumbent_trace: Array


def _auto_panel(rows: int, cap: int = 128) -> int:
    p = min(rows, cap)
    while rows % p:
        p -= 1
    return p


def run_bo_distributed(
    key: Array,
    fn: Callable[[Array], Array],
    lb: Sequence[float],
    ub: Sequence[float],
    bo: BOConfig,
    config: GPConfig = GPConfig(),
    mesh: Optional[Mesh] = None,
    budget_bytes: int = DENSE_BUDGET_BYTES,
    on_iteration=None,
    fixed_params=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    runlog=None,
) -> BigBOResult:
    """BO loop with auto dense/distributed surrogate routing over ``mesh``.

    ``fn``: (q, d) -> (q,) objective on the original box (jnp or host
    callable — the loop is host-driven either way). ``bo.acq`` must be
    "ei", "lcb", or "ts" (decoupled pathwise sampler, see module doc;
    ``bo.rff_features`` sizes the prior path). Failures (NaN/inf y) are
    imputed against the history (SURVEY.md §5.3).

    Checkpoint/resume (SURVEY.md §5.4; VERDICT r3 missing #2 — N ≫ chip is
    exactly where runs take hours and a crash is most expensive):
    ``checkpoint_path`` + ``checkpoint_every=k`` saves the loop state
    ``(x_hist, y_hist, warm, key)`` + trace every ≥k iterations;
    ``resume=True`` restores and reproduces the uninterrupted trajectory
    exactly (the per-iteration keys derive from the saved loop key, and
    warm-start hypers are part of the state). ``runlog`` (§5.5): a
    ``runlog.RunLog`` receiving one record per iteration — ``best_y``,
    history size, dense/distributed route, and the surrogate wall.
    """
    if bo.acq not in ("ei", "lcb", "ts"):
        raise ValueError(
            "run_bo_distributed supports acq 'ei', 'lcb', or 'ts'"
        )
    if bo.acq == "ts" and bo.ts_sampler == "rff":
        raise ValueError(
            "ts_sampler='rff' is not supported on the distributed path: "
            "weight-space conditioning starves at the noise floor and the "
            "exact-conditioning pathwise sampler costs the same matmuls — "
            "use ts_sampler='pathwise' (or leave the default: 'ts' always "
            "routes to the pathwise sampler here)"
        )
    n_dev = mesh.devices.size if mesh is not None else 1
    if bo.n_init % n_dev or bo.batch_size % n_dev:
        raise ValueError(
            f"n_init ({bo.n_init}) and batch_size ({bo.batch_size}) must be "
            f"multiples of the mesh size ({n_dev}): the distributed history "
            "is row-sharded without masking"
        )
    dim = len(lb)
    lb_a = jnp.asarray(lb, jnp.float32)
    ub_a = jnp.asarray(ub, jnp.float32)
    q = bo.batch_size

    from turbojax import gp as G
    from turbojax.checkpoint import RunCheckpointer

    ckpt = RunCheckpointer(checkpoint_path, checkpoint_every)
    k_init, k_loop = jax.random.split(key)
    trace: list = []
    warm = None
    restored = None
    if resume and checkpoint_path:
        # `like` provides only the treedef — leaf shapes come from the file,
        # so the grown (n, d) history restores as-is. ``warm`` is always a
        # GPParams once any iteration completed (both routing branches).
        like_warm = (
            fixed_params if fixed_params is not None
            else G.default_params(dim, config, jnp.float32)
        )
        like = {
            "x": jnp.zeros((0, dim), jnp.float32),
            "y": jnp.zeros((0,), jnp.float32),
            "warm": like_warm,
            "key": k_loop,
        }
        restored = ckpt.try_restore(like)
    if restored is not None:
        state, trace = restored
        x_hist, y_hist, warm, k_loop = (
            state["x"], state["y"], state["warm"], state["key"]
        )
    else:
        x_hist = S.latin_hypercube(k_init, bo.n_init, dim)
        y_hist = jnp.asarray(
            fn(T.from_unit_cube(x_hist, lb_a, ub_a)), jnp.float32
        ).reshape(-1)
        y_hist = T.impute_failures(
            y_hist, jnp.zeros((1,), y_hist.dtype), jnp.zeros((1,), bool)
        )

    import time as _time

    g = None
    for it in range(len(trace), bo.n_iters):
        t_it = _time.perf_counter()
        k_fit, k_cand, k_loc, k_ts, k_loop = jax.random.split(k_loop, 5)
        n = x_hist.shape[0]
        panel = _auto_panel(max(n // n_dev, 1))
        if bo.fit_every == 0:
            # dense run_bo semantics (bo.py:304): 0 = NEVER fit — pin the
            # given fixed_params (or the reference defaults) and only
            # refresh the factorization as the history grows. Routing via
            # `g is None` here used to sneak one full MLL fit in at it=0,
            # so the same optimize(fit_every=0) call changed surrogate
            # semantics when mesh= was passed.
            if warm is None:
                warm = (
                    fixed_params
                    if fixed_params is not None
                    else G.default_params(dim, config, jnp.float32)
                )
            g = refactor_gp_auto(
                x_hist, y_hist, warm, config, mesh, panel=panel,
                budget_bytes=budget_bytes,
            )
        elif warm is None or it % bo.fit_every == 0:
            # `warm is None` (not `g is None`): on a resumed run g starts
            # None at an arbitrary `it`, but an off-cadence iteration must
            # refactor with the restored warm hypers — exactly what the
            # uninterrupted run did — not sneak in an extra fit
            g = fit_gp_auto(
                k_fit, x_hist, y_hist, config, mesh, panel=panel,
                budget_bytes=budget_bytes, warm_start=warm,
            )
            warm = g.raw
        else:
            # off-iteration (fit_every cadence): hypers stay pinned but the
            # factorization MUST refresh over the grown history — the
            # posterior always sees all data (trust_region._fit_or_reuse
            # semantics; a stale factor would skip the newest batches)
            g = refactor_gp_auto(
                x_hist, y_hist, warm, config, mesh, panel=panel,
                budget_bytes=budget_bytes,
            )

        n_local = int(bo.local_frac * bo.n_candidates)
        cands = S.sobol_sample(
            k_cand, dim, bo.n_candidates - n_local, jnp.float32,
            scramble=bo.sobol_scramble,
        )
        if n_local:
            inc = x_hist[jnp.argmin(y_hist)]
            loc = inc + bo.local_sigma * jax.random.normal(
                k_loc, (n_local, dim), jnp.float32
            )
            cands = jnp.concatenate([cands, jnp.clip(loc, 0.0, 1.0)], axis=0)

        if bo.acq == "ts":
            # decoupled pathwise Thompson draws: globally joint across the
            # candidate set, exact data conditioning through the cached
            # (dense or row-sharded) training factor; warped model space is
            # monotone in y, so argmin selection is unchanged
            from turbojax.distributed_linalg import DistributedGP

            if isinstance(g, DistributedGP):
                draws = g.pathwise_paths(k_ts, cands, q, bo.rff_features)
            else:
                draws = A.pathwise_paths(
                    k_ts, g.state, cands, q, config, bo.rff_features
                )
            top_idx, _ = A.select_q_batch(draws)
            x_new = cands[top_idx]
        else:
            from turbojax.distributed_linalg import DistributedGP

            # model-space rule (docs/DESIGN.md §7b): the surrogate predicts
            # warp_y(y) on both routing branches, so the EI incumbent must
            # be warped at the same choke point (monotone warp commutes
            # with min)
            best = T.warp_y(jnp.min(y_hist), config.y_warp)
            n_dev = mesh.devices.size if mesh is not None else 1
            cand_min = (bo.cand_shard_min if bo.cand_shard_min is not None
                        else CAND_SHARD_MIN)
            if (n_dev > 1 and not isinstance(g, DistributedGP)
                    and cands.shape[0] % n_dev == 0
                    and q <= cands.shape[0] // n_dev
                    and cands.shape[0] >= cand_min):
                # candidate-axis sharding (SURVEY.md C14 / §2.6 DP row):
                # the dense GP state replicates, candidates shard, and the
                # global top-q rides an all-gather of q·n_dev survivors.
                # Only above CAND_SHARD_MIN: at the reference cap
                # (min(100d, 5000)) the single-chip acquisition is
                # latency-bound (~6 ms) and sharding is pure overhead —
                # see docs/DESIGN.md §8b (round-5 measurement)
                from turbojax.parallel import sharded_acq_topq

                x_new, _ = sharded_acq_topq(
                    g.state, cands, best, q, mesh, config,
                    acq="ei" if bo.acq == "ei" else "lcb", kappa=bo.kappa,
                    xi=bo.xi,
                )
            else:
                mu, var = g.posterior(cands)
                if bo.acq == "ei":
                    scores = -A.expected_improvement(mu, var, best, bo.xi)
                else:
                    scores = A.lower_confidence_bound(mu, var, bo.kappa)
                _, top_idx = jax.lax.top_k(-scores, q)
                x_new = cands[top_idx]

        y_new = jnp.asarray(
            fn(T.from_unit_cube(x_new, lb_a, ub_a)), jnp.float32
        ).reshape(-1)
        y_new = T.impute_failures(y_new, y_hist, jnp.ones_like(y_hist, dtype=bool))
        x_hist = jnp.concatenate([x_hist, x_new], axis=0)
        y_hist = jnp.concatenate([y_hist, y_new])
        trace.append(float(jnp.min(y_hist)))
        if on_iteration is not None:
            on_iteration(it, trace[-1])
        if runlog is not None:
            from turbojax.distributed_linalg import DistributedGP

            runlog.log(
                it,
                best_y=trace[-1],
                n=int(x_hist.shape[0]),
                route="distributed" if isinstance(g, DistributedGP) else "dense",
                iter_s=round(_time.perf_counter() - t_it, 4),
            )
        ckpt.maybe_save(
            it + 1,
            {"x": x_hist, "y": y_hist, "warm": warm, "key": k_loop},
            trace,
        )

    best_i = jnp.argmin(y_hist)
    return BigBOResult(
        x_hist=T.from_unit_cube(x_hist, lb_a, ub_a),
        y_hist=y_hist,
        best_x=T.from_unit_cube(x_hist[best_i], lb_a, ub_a),
        best_y=y_hist[best_i],
        incumbent_trace=jnp.asarray(trace),
    )
