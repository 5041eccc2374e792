"""User API (SURVEY.md C21): one-shot ``optimize`` for jnp-expressible
objectives (whole loop compiled on device [B:5]) and a host-side ask/tell
``Optimizer`` for true black-box objectives (SURVEY.md C15's two APIs).

Reference parity [R]: the reference is constructor-style —
``Turbo1(f, lb, ub, n_init, max_evals, batch_size).optimize()``; both shapes
are provided here (``Optimizer(...).optimize(f)`` and the functional
``optimize(f, ...)``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from turbojax import bo as BO
from turbojax import gp as G
from turbojax import linalg as L
from turbojax import transforms as T
from turbojax import trust_region as TR
from turbojax.config import GPConfig, TRConfig

Array = jax.Array


@dataclasses.dataclass
class Result:
    best_x: np.ndarray
    best_y: float
    x_hist: np.ndarray  # (n, d) evaluated points, original box
    y_hist: np.ndarray  # (n,)
    incumbent_trace: np.ndarray  # best-so-far after each tell


def optimize(
    fn: Callable[[Array], Array],
    lb: Sequence[float],
    ub: Sequence[float],
    max_evals: int,
    method: str = "turbo1",
    n_init: Optional[int] = None,
    batch_size: Optional[int] = None,
    acq: str = "ei",
    m: int = 5,
    seed: int = 0,
    gp_config: GPConfig = GPConfig(),
    tr_config: TRConfig = TRConfig(),
    fit_every: int = 1,
    n_candidates: Optional[int] = None,
    host_loop: Optional[bool] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    mesh=None,
    budget_bytes: Optional[int] = None,
) -> Result:
    """One-shot optimization of a jnp-expressible objective, fully on device.

    ``method`` ∈ {"bo", "turbo1", "turbom"} (SURVEY.md C15/C17/C18).
    The objective must accept (q, d) arrays in the original box.

    ``host_loop=None`` auto-selects: long runs with per-iteration refits
    compile one jitted step and loop on the host (identical math; the
    monolithic scan program otherwise strains the compiler — docs/DESIGN.md).

    Checkpoint/resume (SURVEY.md §5.4): ``checkpoint_path`` +
    ``checkpoint_every=k`` saves run state every k iterations;
    ``resume=True`` restores from ``checkpoint_path`` when it exists and
    continues the exact uninterrupted trajectory (fresh start otherwise).
    Works for every method — checkpointing routes through the host/segmented
    drivers automatically.

    ``mesh`` (``jax.sharding.Mesh``): device parallelism. With
    ``method="bo"`` it runs the N ≫ single-chip workflow — the surrogate
    auto-routes between the dense single-chip GP and the row-block-sharded
    ``DistributedGP`` (``distributed_linalg.fit_gp_auto``) on a per-device
    memory threshold (``budget_bytes`` overrides it; SURVEY.md §5.7(b)).
    Requires ``acq ∈ {"ei", "lcb", "ts"}`` ("ts" routes to the decoupled
    pathwise sampler — globally-joint draws without the candidate
    covariance) and ``n_init``/``batch_size`` multiples of the mesh size
    (the distributed history is row-sharded without masking). With
    ``method="turbom"`` it shards the m trust regions across the mesh
    (``parallel.run_turbom_sharded``, the EP analog [B:5, B:11]); ``m``
    must be a multiple of the mesh size.
    """
    lb_t, ub_t = tuple(float(v) for v in lb), tuple(float(v) for v in ub)
    dim = len(lb_t)
    key = jax.random.key(seed)
    n_init = n_init or min(2 * dim, max_evals // 3) or 1
    batch_size = batch_size or (1 if method == "bo" else 10)

    if mesh is not None and method not in ("bo", "turbom"):
        raise ValueError(
            "mesh= supports method='bo' (row-block-sharded distributed "
            "surrogate) and method='turbom' (trust-region axis sharded via "
            "parallel.run_turbom_sharded); turbo1 has no device axis to "
            "shard — use the candidate-axis helpers in turbojax.parallel"
        )

    if method == "bo":
        cfg = BO.BOConfig(
            n_init=n_init, max_evals=max_evals, batch_size=batch_size, acq=acq,
            fit_every=fit_every,
            n_candidates=n_candidates or min(100 * dim, 5000),
        )
        if mesh is not None:
            from turbojax.bo_distributed import run_bo_distributed

            kw = {} if budget_bytes is None else {"budget_bytes": budget_bytes}
            dres = run_bo_distributed(
                key, fn, lb_t, ub_t, cfg, gp_config, mesh,
                checkpoint_path=checkpoint_path,
                checkpoint_every=checkpoint_every, resume=resume, **kw
            )
            return Result(
                best_x=np.asarray(dres.best_x), best_y=float(dres.best_y),
                x_hist=np.asarray(dres.x_hist), y_hist=np.asarray(dres.y_hist),
                incumbent_trace=np.asarray(dres.incumbent_trace),
            )
        hl = host_loop if host_loop is not None else (fit_every > 0 and cfg.n_iters > 40)
        res = BO.run_bo(
            key, fn, lb_t, ub_t, cfg, gp_config, host_loop=hl,
            checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every,
            resume=resume,
        )
        n = int(res.n)
        return Result(
            best_x=np.asarray(res.best_x), best_y=float(res.best_y),
            x_hist=np.asarray(res.x_buf[:n]), y_hist=np.asarray(res.y_buf[:n]),
            incumbent_trace=np.asarray(res.incumbent_trace),
        )

    cfg = TR.TurboConfig(
        n_init=n_init, max_evals=max_evals, batch_size=batch_size,
        n_candidates=n_candidates, fit_every=fit_every, tr=tr_config,
    )
    if method == "turbo1":
        if checkpoint_path and (checkpoint_every or resume):
            carry, trace = TR.run_turbo1_host(
                key, fn, lb_t, ub_t, cfg, gp_config,
                checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every,
                resume=resume,
            )
        else:
            carry, trace = TR.run_turbo1(key, fn, lb_t, ub_t, cfg, gp_config)
        n = int(carry.n)
        lb_a, ub_a = np.asarray(lb_t), np.asarray(ub_t)
        return Result(
            best_x=np.asarray(T.from_unit_cube(carry.best_x, lb_a, ub_a)),
            best_y=float(carry.best_y),
            x_hist=np.asarray(T.from_unit_cube(carry.x_buf[:n], lb_a, ub_a)),
            y_hist=np.asarray(carry.y_buf[:n]),
            incumbent_trace=np.asarray(trace),
        )
    if method == "turbom":
        if mesh is not None:
            # TR-axis sharding (the EP analog, SURVEY.md §2.6): one front
            # door for both device-parallel paths (VERDICT r3 missing #5).
            from turbojax.parallel import run_turbom_sharded

            n_dev = mesh.devices.size
            if m % n_dev != 0:
                raise ValueError(
                    f"method='turbom' with mesh= shards the m={m} trust "
                    f"regions across {n_dev} devices; m must be a multiple "
                    "of the mesh size"
                )
            if checkpoint_path:
                raise ValueError(
                    "checkpointing is not supported on the TR-sharded "
                    "turbom path; use mesh=None (the host driver) for "
                    "checkpointed runs"
                )
            carries, trace = run_turbom_sharded(
                key, fn, lb_t, ub_t, cfg, gp_config, mesh, m=m
            )
        else:
            from turbojax.turbo_m import run_turbom

            hl = host_loop if host_loop is not None else cfg.n_iters > 40
            carries, trace = run_turbom(
                key, fn, lb_t, ub_t, cfg, gp_config, m=m, host_loop=hl,
                checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every,
                resume=resume,
            )
        best_tr = int(jnp.argmin(carries.best_y))
        lb_a, ub_a = np.asarray(lb_t), np.asarray(ub_t)
        xs, ys = [], []
        for i in range(m):
            ni = int(carries.n[i])
            xs.append(np.asarray(carries.x_buf[i, :ni]))
            ys.append(np.asarray(carries.y_buf[i, :ni]))
        return Result(
            best_x=np.asarray(
                T.from_unit_cube(carries.best_x[best_tr], lb_a, ub_a)
            ),
            best_y=float(carries.best_y[best_tr]),
            x_hist=np.concatenate(xs) * (ub_a - lb_a) + lb_a,
            y_hist=np.concatenate(ys),
            incumbent_trace=np.asarray(trace),
        )
    raise ValueError(f"unknown method {method!r}")


class Turbo1:
    """Reference-style constructor API [R]:
    ``Turbo1(f, lb, ub, n_init, max_evals, batch_size).optimize()`` then read
    ``.X``, ``.fX``, ``best_x``, ``best_y`` (SURVEY.md C21, §1 L5/L6).

    ``f`` may be any host-side callable taking (q, d) numpy arrays in the
    original box; all surrogate math runs on device via the ask/tell core.
    """

    _method = "turbo1"

    def __init__(
        self,
        f: Callable[[np.ndarray], np.ndarray],
        lb: Sequence[float],
        ub: Sequence[float],
        n_init: int = 20,
        max_evals: int = 200,
        batch_size: int = 10,
        verbose: bool = False,
        seed: int = 0,
        use_ard: bool = True,
        max_cholesky_size: Optional[int] = None,
        gp_config: Optional[GPConfig] = None,
        tr_config: TRConfig = TRConfig(),
    ):
        self.f = f
        self.verbose = verbose
        gp_config = gp_config or GPConfig(use_ard=use_ard)
        self._opt = Optimizer(
            lb, ub, method=self._method, n_init=n_init, max_evals=max_evals,
            batch_size=batch_size, seed=seed, gp_config=gp_config,
            tr_config=tr_config, max_cholesky_size=max_cholesky_size,
        )
        self.X = np.zeros((0, len(lb)))
        self.fX = np.zeros((0,))

    def optimize(self) -> "Turbo1":
        n = 0
        while n < self._opt.cfg.max_evals:
            xs = self._opt.ask()
            ys = np.asarray(self.f(xs)).reshape(-1)
            self._opt.tell(xs, ys)
            n += xs.shape[0]
            if self.verbose:
                print(f"[{n:4d}] best = {self._opt.best[1]:.6f}")
        self.X = np.concatenate(self._opt._history_x)
        self.fX = np.concatenate(self._opt._history_y)
        return self

    @property
    def best_x(self) -> np.ndarray:
        return self._opt.best[0]

    @property
    def best_y(self) -> float:
        return self._opt.best[1]


class TurboM:
    """Reference-style TuRBO-m constructor [R]: runs the compiled
    multi-trust-region loop (C18 [B:11]); requires a jnp-expressible f
    (the fully-jit path — use ``Optimizer`` ask/tell for black boxes)."""

    def __init__(
        self,
        f,
        lb: Sequence[float],
        ub: Sequence[float],
        n_init: int = 20,
        max_evals: int = 200,
        batch_size: int = 10,
        n_trust_regions: int = 5,
        seed: int = 0,
        gp_config: GPConfig = GPConfig(),
        tr_config: TRConfig = TRConfig(),
    ):
        self._args = (f, lb, ub, max_evals, n_init, batch_size, n_trust_regions, seed, gp_config, tr_config)
        self.X = np.zeros((0, len(lb)))
        self.fX = np.zeros((0,))

    def optimize(self) -> "TurboM":
        f, lb, ub, max_evals, n_init, batch_size, m, seed, gp_config, tr_config = self._args
        res = optimize(
            f, lb, ub, max_evals=max_evals, method="turbom", n_init=n_init,
            batch_size=batch_size, m=m, seed=seed, gp_config=gp_config,
            tr_config=tr_config,
        )
        self.X, self.fX = res.x_hist, res.y_hist
        self.best_x, self.best_y = res.best_x, res.best_y
        self.result = res
        return self


class Optimizer:
    """Host-side ask/tell optimizer for black-box objectives
    (SURVEY.md C15 API (a)): the objective is evaluated by the caller; all
    surrogate math runs as the same jitted device programs the compiled
    loops use, so there is exactly one trace per (N_max, d, q).

    Example:
        opt = Optimizer(lb, ub, method="turbo1", batch_size=10)
        for _ in range(50):
            xs = opt.ask()
            opt.tell(xs, my_expensive_function(xs))
        print(opt.best)
    """

    def __init__(
        self,
        lb: Sequence[float],
        ub: Sequence[float],
        method: str = "turbo1",
        n_init: int = 20,
        max_evals: int = 500,
        batch_size: int = 10,
        acq: str = "ts",
        seed: int = 0,
        gp_config: GPConfig = GPConfig(),
        tr_config: TRConfig = TRConfig(),
        fit_every: int = 1,
        n_candidates: Optional[int] = None,
        max_cholesky_size: Optional[int] = None,
        checkpoint_path: Optional[str] = None,
        checkpoint_every: int = 0,
        m: int = 5,
    ):
        """``max_cholesky_size`` mirrors the reference knob [R, SURVEY.md
        §5.6]: the reference switches to iterative (Lanczos) methods beyond
        it; the TPU-idiomatic equivalent is chunking the joint-TS/posterior
        factorizations, so it maps to the TS chunk size here.

        ``checkpoint_path``/``checkpoint_every``: write the full optimizer
        state (device carry + host history + RNG) every k tells; restore by
        constructing an identically-configured ``Optimizer`` and calling
        its ``restore(path)`` method, then continue deterministically
        (SURVEY.md §5.4; ``tests/test_checkpoint.py``).

        ``method="turbom"`` runs m independent trust regions with global
        Thompson allocation (C18 [B:11]); its ``tell`` must follow the
        matching ``ask`` (the allocation maps each point to its TR)."""
        if method not in ("bo", "turbo1", "turbom"):
            raise ValueError("ask/tell supports methods 'bo', 'turbo1' and 'turbom'")
        self._ts_chunk = max_cholesky_size
        self._ckpt_path = checkpoint_path
        self._ckpt_every = checkpoint_every
        self._n_tells = 0
        self.lb = np.asarray(lb, np.float32)
        self.ub = np.asarray(ub, np.float32)
        self.dim = len(self.lb)
        self.method = method
        self.gp_config = gp_config
        self._key = jax.random.key(seed)
        self._history_x: list = []
        self._history_y: list = []
        self._trace: list = []
        self._pending: Optional[np.ndarray] = None

        if method == "turbo1":
            self.cfg = TR.TurboConfig(
                n_init=n_init, max_evals=max_evals, batch_size=batch_size,
                n_candidates=n_candidates, fit_every=fit_every, tr=tr_config,
                ts_chunk=self._ts_chunk,
            )
            self._n_loc_final = n_init + self.cfg.n_iters * batch_size
            # bucketed buffer growth (docs/DESIGN.md): start small, double as
            # history fills; the jitted propose/absorb retrace per bucket
            cap = 32
            while cap < max(2 * batch_size, n_init + batch_size):
                cap *= 2
            cap = min(cap, self._n_loc_final)
            self._fail_tol = tr_config.resolved_fail_tol(self.dim, batch_size)
            self._carry = TR.make_turbo_carry(self._next_key(), self.dim, cap, self.cfg, gp_config)
            self._propose = jax.jit(
                lambda c, k: TR.turbo_propose(c, k, self.cfg, self.gp_config)
            )
            self._absorb = jax.jit(
                lambda c, x, y, srch, k: TR.turbo_absorb(
                    c, x, y, jnp.ones(x.shape[0], jnp.bool_), srch,
                    self.cfg, self.gp_config, self._fail_tol, k,
                )
            )
        elif method == "turbom":
            from turbojax import turbo_m as TM

            self.m = m
            self.cfg = TR.TurboConfig(
                n_init=n_init, max_evals=max_evals, batch_size=batch_size,
                n_candidates=n_candidates, fit_every=fit_every, tr=tr_config,
                ts_chunk=self._ts_chunk,
            )
            self._n_loc_final = n_init + self.cfg.n_iters * batch_size
            cap = 32
            while cap < max(2 * batch_size, n_init + batch_size):
                cap *= 2
            cap = min(cap, self._n_loc_final)
            self._fail_tol = tr_config.resolved_fail_tol(self.dim, batch_size)
            keys = jax.random.split(self._next_key(), m)
            self._carry = jax.jit(
                jax.vmap(lambda k: TR.make_turbo_carry(k, self.dim, cap, self.cfg, gp_config))
            )(keys)
            self._propose = jax.jit(
                lambda c: TM.turbom_propose_batch(c, self.cfg, self.gp_config, self.m)
            )
            self._absorb = jax.jit(
                lambda c, x, y, ti, rk: TM.turbom_absorb_batch(
                    c, x, y, ti, rk, self.cfg, self.gp_config, self.m, self._fail_tol
                )
            )
        else:
            self.cfg = BO.BOConfig(
                n_init=n_init, max_evals=max_evals, batch_size=batch_size, acq=acq,
                fit_every=fit_every,
                n_candidates=n_candidates or min(100 * self.dim, 5000),
                ts_chunk=self._ts_chunk,
            )
            self._carry = None  # built lazily once n_init points are told
            self._init_x = np.asarray(
                BO.S.latin_hypercube(self._next_key(), n_init, self.dim)
            )
            self._n_told = 0
            chol_mode = self.cfg.resolved_chol_mode()
            self._suggest = jax.jit(lambda c, k: BO._suggest(c, self.gp_config, self.cfg, k))
            self._refit = jax.jit(lambda c, k: BO._refit_carry(c, self.gp_config, k))
            self._append = jax.jit(
                lambda c, x, y: BO._append_batch(c, x, y, self.gp_config, chol_mode)
            )

    def _next_key(self) -> Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    # -- ask/tell protocol --------------------------------------------------

    def ask(self) -> np.ndarray:
        """Propose the next batch of points (original box)."""
        q = self.cfg.batch_size
        if self.method == "turbo1":
            carry, xs, in_search = self._propose(self._carry, self._next_key())
            self._carry = carry
            self._pending = (np.asarray(xs), bool(in_search))
            return np.asarray(T.from_unit_cube(xs, self.lb, self.ub))
        if self.method == "turbom":
            carries, x_sel, tr_idx, restart_keys = self._propose(self._carry)
            self._carry = carries
            self._pending = (np.asarray(x_sel), np.asarray(tr_idx), restart_keys)
            return np.asarray(T.from_unit_cube(x_sel, self.lb, self.ub))
        # plain BO
        if self._carry is None:
            start = self._n_told
            xs = self._init_x[start : start + q]
            if xs.shape[0] < q:  # pad from a fresh LHS if init exhausted mid-batch
                extra = np.asarray(
                    BO.S.latin_hypercube(self._next_key(), q - xs.shape[0], self.dim)
                )
                xs = np.concatenate([xs, extra], axis=0)
            self._pending = (xs, False)
            return np.asarray(T.from_unit_cube(jnp.asarray(xs), self.lb, self.ub))
        if (len(self._trace)) % max(self.cfg.fit_every, 1) == 0 and self.cfg.fit_every > 0:
            self._carry = self._refit(self._carry, self._next_key())
        xs = self._suggest(self._carry, self._next_key())
        self._pending = (np.asarray(xs), True)
        return np.asarray(T.from_unit_cube(xs, self.lb, self.ub))

    def tell(self, x: np.ndarray, y: np.ndarray) -> None:
        """Report evaluations for the last ``ask`` (or arbitrary points)."""
        x = np.atleast_2d(np.asarray(x, np.float32))
        y = np.atleast_1d(np.asarray(y, np.float32))
        # objective-failure handling (SURVEY.md §5.3): impute NaN/inf with a
        # large penalty so the surrogate stays finite. The penalty reference
        # is the worst over the FULL history ∪ this batch with the 1e6
        # degenerate floor (transforms.impute_failures semantics): a
        # batch-only fallback here fabricated the retracted round-1 rover
        # incumbent (BASELINE.md "RETRACTION") — an all-failed early batch
        # must never produce a penalty small enough to rank as the best.
        if not np.isfinite(y).all():
            # call the jitted loops' source of truth rather than mirroring
            # its formula in numpy (drift here is the retracted-bug class)
            if self._history_y:
                hist = np.concatenate(self._history_y)
                hist_mask = np.isfinite(hist)
            else:
                # masked-out dummy row: an empty scope must fall through to
                # the 1e6 degenerate floor (BASELINE.md "RETRACTION")
                hist = np.zeros((1,), np.float32)
                hist_mask = np.zeros((1,), bool)
            y = np.asarray(
                T.impute_failures(
                    jnp.asarray(y), jnp.asarray(hist), jnp.asarray(hist_mask)
                ),
                np.float32,
            )
        x_unit = np.asarray(T.to_unit_cube(x, self.lb, self.ub), np.float32)
        # capacity guard: a clamped dynamic_update_slice would silently
        # overwrite the last buffer row past max_evals
        if self.method in ("turbo1", "turbom"):
            n_now = int(np.max(np.asarray(self._carry.n)))
            if n_now + x.shape[0] > self._n_loc_final:
                raise ValueError(
                    f"tell() exceeds max_evals capacity ({self._n_loc_final}); "
                    "construct the Optimizer with a larger max_evals"
                )
        elif self._carry is not None:
            cap = self._carry.x_buf.shape[0]
            if int(self._carry.n) + x.shape[0] > cap:
                raise ValueError(
                    f"tell() exceeds max_evals capacity ({cap}); "
                    "construct the Optimizer with a larger max_evals"
                )
        if self.method == "turbom":
            # validate before touching host history: the global Thompson
            # allocation maps each point to a TR, so tells must match asks
            if self._pending is None:
                raise ValueError(
                    "turbom tell() must follow its matching ask() — the global "
                    "Thompson allocation maps each point to a trust region"
                )
            x_pend = self._pending[0]
            if not np.allclose(
                x, np.asarray(T.from_unit_cube(jnp.asarray(x_pend), self.lb, self.ub)), atol=1e-5
            ):
                raise ValueError("turbom tell() points must be the ones ask() proposed")
        self._history_x.append(x)
        self._history_y.append(y)

        if self.method == "turbo1":
            cap = self._carry.x_buf.shape[0]
            if int(self._carry.n) + x.shape[0] > cap and cap < self._n_loc_final:
                new_cap = min(max(cap * 2, int(self._carry.n) + x.shape[0]), self._n_loc_final)
                self._carry = TR.grow_carry(self._carry, new_cap)
            in_search = self._pending[1] if self._pending is not None else True
            self._carry = self._absorb(
                self._carry, jnp.asarray(x_unit), jnp.asarray(y),
                jnp.asarray(in_search), self._next_key(),
            )
        elif self.method == "turbom":
            from turbojax.turbo_m import _grow_carries

            x_pend, tr_idx, restart_keys = self._pending
            cap = self._carry.x_buf.shape[1]
            n_now = int(np.max(np.asarray(self._carry.n)))
            if n_now + x.shape[0] > cap and cap < self._n_loc_final:
                new_cap = min(max(cap * 2, n_now + x.shape[0]), self._n_loc_final)
                self._carry = _grow_carries(self._carry, new_cap)
            self._carry, _ = self._absorb(
                self._carry, jnp.asarray(x_pend), jnp.asarray(y),
                jnp.asarray(tr_idx), restart_keys,
            )
        else:
            self._n_told += x.shape[0]
            if self._carry is None and self._n_told >= self.cfg.n_init:
                self._carry = self._build_bo_carry()
            elif self._carry is not None:
                self._carry = self._append(self._carry, jnp.asarray(x_unit), jnp.asarray(y))
        self._trace.append(self.best[1])
        self._pending = None
        self._n_tells += 1
        if self._ckpt_path and self._ckpt_every and self._n_tells % self._ckpt_every == 0:
            self.save(self._ckpt_path)

    # -- checkpoint / resume (SURVEY.md §5.4) --------------------------------

    def save(self, path: str) -> None:
        """Write the full optimizer state: device carry + key + host history."""
        from turbojax import checkpoint as CK

        state = {"carry": self._carry, "key": self._key}
        CK.save_state(
            path,
            state,
            meta={
                "method": self.method,
                "n_tells": self._n_tells,
                "history_x": [x.tolist() for x in self._history_x],
                "history_y": [y.tolist() for y in self._history_y],
                "trace": [float(t) for t in self._trace],
                "n_told": getattr(self, "_n_told", None),
                "init_x": self._init_x.tolist() if hasattr(self, "_init_x") else None,
            },
        )

    def restore(self, path: str) -> "Optimizer":
        """Load state saved by ``save`` into this (identically-configured)
        optimizer; continues deterministically (the RNG key is state)."""
        from turbojax import checkpoint as CK

        like = {"carry": self._carry, "key": self._key}
        state = CK.load_state(path, like=like)
        meta = CK.load_meta(path)
        self._carry = state["carry"]
        self._key = state["key"]
        self._n_tells = meta["n_tells"]
        self._history_x = [np.asarray(x, np.float32) for x in meta["history_x"]]
        self._history_y = [np.asarray(y, np.float32) for y in meta["history_y"]]
        self._trace = list(meta["trace"])
        if meta.get("n_told") is not None:
            self._n_told = meta["n_told"]
        if meta.get("init_x") is not None:
            self._init_x = np.asarray(meta["init_x"], np.float32)
        return self

    def _build_bo_carry(self) -> BO.BOCarry:
        xs = np.concatenate([np.asarray(T.to_unit_cube(x, self.lb, self.ub)) for x in self._history_x])
        ys = np.concatenate(self._history_y)
        n_max = self.cfg.n_init + self.cfg.n_iters * self.cfg.batch_size
        n_max = max(n_max, len(ys))
        x_buf = jnp.zeros((n_max, self.dim), jnp.float32).at[: len(ys)].set(xs)
        y_buf = jnp.zeros((n_max,), jnp.float32).at[: len(ys)].set(ys)
        mask = L.row_mask(n_max, len(ys))
        state = G.fit_gp(self._next_key(), x_buf, y_buf, mask, self.gp_config)
        return BO.BOCarry(
            x_buf=x_buf, y_buf=y_buf, n=jnp.asarray(len(ys)), chol=state.chol,
            raw=state.raw, y_mean=state.y_mean, y_std=state.y_std, key=self._next_key(),
        )

    # -- results -------------------------------------------------------------

    @property
    def best(self) -> Tuple[np.ndarray, float]:
        if not self._history_y:
            return np.full(self.dim, np.nan), float("inf")
        ys = np.concatenate(self._history_y)
        xs = np.concatenate(self._history_x)
        i = int(np.argmin(ys))
        return xs[i], float(ys[i])

    def optimize(self, f: Callable[[np.ndarray], np.ndarray], max_evals: Optional[int] = None) -> Result:
        """Reference-style convenience driver [R]: loop ask → f → tell."""
        budget = max_evals or self.cfg.max_evals
        n = 0
        while n < budget:
            xs = self.ask()
            ys = np.asarray(f(xs)).reshape(-1)
            self.tell(xs, ys)
            n += xs.shape[0]
        bx, by = self.best
        return Result(
            best_x=bx, best_y=by,
            x_hist=np.concatenate(self._history_x),
            y_hist=np.concatenate(self._history_y),
            incumbent_trace=np.asarray(self._trace),
        )
