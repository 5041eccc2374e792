"""Thompson-selection numerics experiment (VERDICT r2 task 1).

Round 2 isolated the remaining config-4 regret gap (TPU f32 median 2.14 vs
0.50 for the same code on CPU f32) to Thompson-sampling proposal quality at
deep trust-region refinement. This experiment pins down WHERE the TPU TS
path loses accuracy and which fix recovers it:

  1. ``gen``   — run config-4 (TuRBO-1 Ackley-10D) on the CPU backend to a
     mid-run state and freeze the carry to an npz. One frozen state feeds
     every backend/variant, so comparisons are from IDENTICAL conditions.
  2. ``probe`` — on the current backend: refit the GP from the frozen
     buffers, generate TR candidates with a fixed key, and measure
       (a) the TS covariance error vs an f64 numpy reference,
       (b) the covariance-factor error (does jnp.linalg.cholesky's
           TPU expansion lose the small eigendirections?),
       (c) paired proposal quality (mean best-of-batch over K shared
           z-draws) for each sampler variant:
             v0      — the product path (f32 cov, f32 chol, f32 draw)
             v1_c64  — f32 cov, f64 chol + draw (cheap: one 1000² f64 chol)
             v2_ref  — f64 reference cov + f64 chol (the true-law lane)

Usage:
    python benchmarks/exp_ts_numerics.py gen   --evals 600 --seed 0 \
        --out /tmp/ts_state_600.npz
    python benchmarks/exp_ts_numerics.py probe --state /tmp/ts_state_600.npz
    TURBOJAX_PLATFORM=cpu python benchmarks/exp_ts_numerics.py probe ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_HI = None  # set after jax import


def _setup(force_cpu: bool):
    import jax

    if force_cpu or os.environ.get("TURBOJAX_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)  # f64 variants; f32 arrays stay f32
    global _HI
    _HI = jax.lax.Precision.HIGHEST
    return jax


def cmd_gen(args):
    jax = _setup(force_cpu=True)  # the frozen state is always CPU-generated
    import jax.numpy as jnp

    from configs import get_config
    from turbojax import benchmarks as B
    from turbojax import trust_region as TR

    cfg = get_config("turbo1_ackley10")
    import dataclasses

    turbo = dataclasses.replace(cfg.turbo, max_evals=args.evals)
    if args.n_init is not None:
        turbo = dataclasses.replace(turbo, n_init=args.n_init)
    bench_name = args.benchmark or cfg.benchmark
    b = B.get_benchmark(bench_name)
    # Drive the compiled step from the host and keep the DEEPEST-refinement
    # snapshot (smallest TR length with enough local data): restarts discard
    # the local history, so the final carry can be a fresh shallow TR — the
    # regime this experiment targets is precisely the pre-restart deep one.
    n_loc = turbo.n_init + turbo.n_iters * turbo.batch_size
    step = jax.jit(TR._make_t1_step(b.fn, tuple(b.lb), tuple(b.ub), turbo, cfg.gp, n_loc))
    carry = jax.jit(
        lambda k: TR.make_turbo_carry(k, b.dim, n_loc, turbo, cfg.gp)
    )(jax.random.key(args.seed))
    snap, snap_len, snap_it = None, float("inf"), -1
    for it in range(turbo.n_iters):
        carry, _ = step(carry, None)
        length, n_now = float(carry.tr.length), int(carry.n)
        if n_now >= args.min_n and length < snap_len:
            snap, snap_len, snap_it = jax.device_get(carry), length, it
    assert snap is not None, "no snapshot met the min-n criterion"
    print(f"# snapshot at iter {snap_it}: length={snap_len:.4f} n={int(snap.n)}")
    carry, trace = snap, None
    out = {
        "x_buf": np.asarray(carry.x_buf, np.float32),
        "y_buf": np.asarray(carry.y_buf, np.float32),
        "n": np.asarray(carry.n),
        "tr_length": np.asarray(carry.tr.length, np.float32),
        "best_y": np.asarray(carry.best_y, np.float32),
        "raw_lengthscale": np.asarray(carry.raw.raw_lengthscale, np.float32),
        "raw_outputscale": np.asarray(carry.raw.raw_outputscale, np.float32),
        "raw_noise": np.asarray(carry.raw.raw_noise, np.float32),
        "raw_mean": np.asarray(carry.raw.raw_mean, np.float32),
        "seed": np.asarray(args.seed),
        "evals": np.asarray(args.evals),
        "benchmark": np.asarray(bench_name),
        "n_init": np.asarray(turbo.n_init),
    }
    np.savez(args.out, **out)
    print(
        json.dumps(
            {
                "saved": args.out,
                "n": int(out["n"]),
                "tr_length": float(out["tr_length"]),
                "best_y": float(out["best_y"]),
                "backend": jax.default_backend(),
            }
        )
    )


def _ref_posterior_cov_f64(x_act, y_act, params, cands, config):
    """f64 numpy reference of gp.posterior_cov on the ACTIVE data with the
    same fit-time diagonal (jitter × mean diag) as linalg.cholesky_jittered."""
    from oracle import numpy_gp as onp

    ls = np.asarray(params["lengthscale"], np.float64)
    s = float(params["outputscale"])
    noise = float(params["noise"])
    mean = float(params["mean"])
    y_mean, y_sd = y_act.mean(), max(y_act.std(), 1e-8)
    y_std = (y_act - y_mean) / y_sd

    k = onp.kernel_matrix(config.kernel, x_act, x_act, ls, s)
    diag_bump = noise + config.jitter * np.mean(np.diag(k) + noise)
    k[np.diag_indices_from(k)] += diag_bump
    l = np.linalg.cholesky(k)
    resid = y_std - mean
    alpha = np.linalg.solve(l.T, np.linalg.solve(l, resid))
    k_cross = onp.kernel_matrix(config.kernel, x_act, cands, ls, s)
    v = np.linalg.solve(l, k_cross)
    mu = mean + k_cross.T @ alpha
    k_ss = onp.kernel_matrix(config.kernel, cands, cands, ls, s)
    cov = k_ss - v.T @ v
    # original units
    return mu * y_sd + y_mean, cov * y_sd**2


def cmd_probe(args):
    jax = _setup(force_cpu=args.cpu)
    import jax.numpy as jnp

    from configs import get_config
    from turbojax import acq as A
    from turbojax import benchmarks as B
    from turbojax import gp as G
    from turbojax import linalg as L
    from turbojax import sampling as S
    from turbojax import transforms as T

    d = np.load(args.state)
    bench_name = str(d["benchmark"]) if "benchmark" in d else "ackley10"
    # Resolve the gp/turbo settings from the frozen state's benchmark, not a
    # hardcoded config (ADVICE r4: the lunar probe was only faithful because
    # config-5b's gp/batch fields happened to coincide with config 4's).
    cfg = get_config(
        {"ackley10": "turbo1_ackley10", "rover60": "turbom5_rover60",
         "lunar60": "turbom5_lunar60"}.get(bench_name, "turbo1_ackley10")
    )
    config = cfg.gp
    b = B.get_benchmark(bench_name)
    n = int(d["n"])
    x_buf = jnp.asarray(d["x_buf"])
    y_buf = jnp.asarray(d["y_buf"])
    mask = L.row_mask(x_buf.shape[0], jnp.asarray(n))
    tr_length = float(d["tr_length"])
    dim = x_buf.shape[1]
    q = cfg.turbo.batch_size
    n_cand = (args.n_cand if args.n_cand is not None
              else (cfg.turbo.n_candidates or S.n_candidates(dim)))

    # deterministic refit from the frozen buffers (the grid fit has no RNG)
    state = G.fit_gp(jax.random.key(0), x_buf, y_buf, mask, config)
    params = {k: np.asarray(v, np.float64) for k, v in state.params.items()}

    # fixed-key TR candidates around the frozen incumbent
    best_idx = int(np.argmin(np.where(np.asarray(mask), d["y_buf"], np.inf)))
    center = x_buf[best_idx]
    ls = jnp.broadcast_to(state.params["lengthscale"], (dim,))
    cands = S.tr_candidates(
        jax.random.key(args.cand_seed), center, jnp.asarray(tr_length), ls, n_cand,
        cfg.turbo.local_frac, cfg.turbo.local_sigma,
    )

    # --- product-path covariance + f64 reference -------------------------
    mu32, cov32 = G.posterior_cov(state, cands, config)
    mu32_np, cov32_np = np.asarray(mu32, np.float64), np.asarray(cov32, np.float64)
    x_act = np.asarray(d["x_buf"][:n], np.float64)
    y_act = np.asarray(d["y_buf"][:n], np.float64)
    mu_ref, cov_ref = _ref_posterior_cov_f64(
        x_act, y_act, params, np.asarray(cands, np.float64), config
    )

    cmax = max(float(np.max(np.diag(cov_ref))), 1e-12)
    bump = 1e-6 * cmax
    eye = np.eye(n_cand)
    l_ref = np.linalg.cholesky(cov_ref + bump * eye)

    # factor fidelity of each variant, measured as ||L L' − cov_ref|| — the
    # sampled law is N(mu, L L'), so this IS the sampler's distributional error
    def factor_err(l_np):
        e = l_np @ l_np.T - (cov_ref + bump * eye)
        return float(np.abs(e).max()), float(
            np.linalg.norm(e) / np.linalg.norm(cov_ref + bump * eye)
        )

    # v0: product chol (f32, this backend)
    cmax32 = jnp.maximum(jnp.max(jnp.diagonal(cov32)), 1e-12)
    bumped32 = cov32 + (1e-6 * cmax32) * jnp.eye(n_cand, dtype=cov32.dtype)
    l_v0 = jnp.linalg.cholesky(bumped32)
    # v1: f64 chol of the f32 covariance (this backend)
    bumped64 = bumped32.astype(jnp.float64)
    l_v1 = jnp.linalg.cholesky(bumped64)

    # v3: error-floor-scaled bump — the f32 cancellation error in the
    # STANDARDIZED covariance is O(eps·√n_acc·outputscale), independent of
    # how small the posterior cov itself gets at deep refinement; the bump
    # must dominate THAT, not the covariance scale. y-units: ×y_sd².
    y_sd2 = float(np.maximum(np.std(y_act), 1e-8)) ** 2
    s_std = float(np.asarray(state.params["outputscale"]))
    l_v3 = {}
    for beta in (3e-5, 1e-4):
        bump3 = beta * s_std * y_sd2
        l3 = jnp.linalg.cholesky(cov32 + bump3 * jnp.eye(n_cand, dtype=cov32.dtype))
        l_v3[beta] = (l3, bump3)

    # v5: full-f64 posterior path on this backend (train factor + solves +
    # cov in f64) — the accuracy ceiling; timed to judge product viability
    import time as _time

    x64 = x_buf.astype(jnp.float64)
    y64 = y_buf.astype(jnp.float64)

    def full64():
        import dataclasses as _dc

        state64 = G.make_gp_state(x64, y64, mask, jax.tree.map(
            lambda a: a.astype(jnp.float64), state.raw), config)
        mu, cov = G.posterior_cov(state64, cands.astype(jnp.float64), config)
        cmax_ = jnp.maximum(jnp.max(jnp.diagonal(cov)), 1e-12)
        l_ = jnp.linalg.cholesky(
            cov + (1e-6 * cmax_) * jnp.eye(n_cand, dtype=jnp.float64)
        )
        return mu, cov, l_

    f64_jit = jax.jit(full64)
    mu5, cov5, l_v5 = f64_jit()
    jax.block_until_ready(l_v5)
    t0 = _time.perf_counter()
    mu5, cov5, l_v5 = f64_jit()
    jax.block_until_ready(l_v5)
    t_full64 = _time.perf_counter() - t0

    eigs = np.linalg.eigvalsh(cov32_np)
    report = {
        "backend": jax.default_backend(),
        "benchmark": bench_name,
        "state": os.path.basename(args.state),
        "n": n,
        "tr_length": tr_length,
        "y_sd2": y_sd2,
        "fitted": {k: np.asarray(v).tolist() for k, v in state.params.items()},
        "cov32_vs_ref_maxabs": float(np.abs(cov32_np - cov_ref).max()),
        "cov_scale_cmax": cmax,
        "cov32_eig_min": float(eigs[0]),
        "mu32_vs_ref_maxabs": float(np.abs(mu32_np - mu_ref).max()),
        "mu_f64path_vs_ref_maxabs": float(np.abs(np.asarray(mu5, np.float64) - mu_ref).max()),
        "factor_err_v0_f32chol": factor_err(np.asarray(l_v0, np.float64)),
        "factor_err_v1_c64chol": factor_err(np.asarray(l_v1, np.float64)),
        "chol_finite_v0": bool(np.isfinite(np.asarray(l_v0)).all()),
        "chol_finite_v3": {
            str(b): bool(np.isfinite(np.asarray(l3)).all())
            for b, (l3, _) in l_v3.items()
        },
        "wall_full64_posterior_s": t_full64,
    }

    # --- paired proposal quality ----------------------------------------
    lb_a = jnp.asarray(b.lb, jnp.float32)
    ub_a = jnp.asarray(b.ub, jnp.float32)
    cands_orig = np.asarray(T.from_unit_cube(cands, lb_a, ub_a), np.float64)
    f_cands = np.asarray(b.fn(jnp.asarray(cands_orig)), np.float64)  # true f at all candidates

    rng = np.random.RandomState(123)
    mu_v = {"v0": mu32_np, "v1_c64": mu32_np, "v2_ref": mu_ref}
    l_v = {
        "v0": np.asarray(l_v0, np.float64),
        "v1_c64": np.asarray(l_v1, np.float64),
        "v2_ref": l_ref,
    }
    for beta, (l3, _) in l_v3.items():
        mu_v[f"v3_b{beta:g}"] = mu32_np
        l_v[f"v3_b{beta:g}"] = np.asarray(l3, np.float64)
    mu_v["v5_f64path"] = np.asarray(mu5, np.float64)
    l_v["v5_f64path"] = np.asarray(l_v5, np.float64)
    quality = {k: [] for k in mu_v}
    for _ in range(args.draws):
        z = rng.randn(q, n_cand)
        for name in quality:
            samples = mu_v[name][None, :] + z @ l_v[name].T
            idxs, _ = A.select_q_batch(jnp.asarray(samples, jnp.float32))
            quality[name].append(float(f_cands[np.asarray(idxs)].min()))
    for name, vals in quality.items():
        report[f"quality_{name}"] = {
            "mean_best_of_batch": float(np.mean(vals)),
            "std": float(np.std(vals)),
        }

    # v6/v7: the ACTUAL product path post-fix (robust error-floor ladder;
    # optional exact-law f64) — unpaired draws, so compare means across
    # ~args.draws keys
    import time as _time

    for name, dt in (("v6_product", None), ("v7_product_f64", "float64")):
        fsel = jax.jit(
            lambda k, _dt=dt: A.select_q_batch(
                A.thompson_samples(k, state, cands, q, config, None, _dt)
            )[0]
        )
        jax.block_until_ready(fsel(jax.random.key(999)))  # compile
        vals = []
        t0 = _time.perf_counter()
        for i in range(args.draws):
            idxs = fsel(jax.random.key(1000 + i))
            vals.append(float(f_cands[np.asarray(idxs)].min()))
        report[f"quality_{name}"] = {
            "mean_best_of_batch": float(np.mean(vals)),
            "std": float(np.std(vals)),
            "wall_per_call_s": (_time.perf_counter() - t0) / args.draws,
        }
    report["true_best_in_cand_set"] = float(f_cands.min())
    report["incumbent"] = float(d["best_y"])
    report = _sanitize(report)  # strict JSON: NaN/inf -> "nan"/"inf" strings
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


def _sanitize(obj):
    """Map non-finite floats to strings so round artifacts stay strictly
    parseable (literal NaN tokens are not valid JSON — ADVICE r4)."""
    if isinstance(obj, dict):
        return {k: _sanitize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_sanitize(v) for v in obj]
    if isinstance(obj, float) and not np.isfinite(obj):
        return repr(obj)  # 'nan' / 'inf' / '-inf'
    return obj


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("gen")
    g.add_argument("--evals", type=int, default=600)
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--min-n", type=int, default=150)
    g.add_argument("--benchmark", default=None,
                   help="objective override (e.g. lunar60 — freezes a "
                        "deep-refinement state on the second hermetic 60-D "
                        "problem; the probe reads it back from the npz)")
    g.add_argument("--n-init", type=int, default=None)
    g.add_argument("--out", default="/tmp/ts_state.npz")
    p = sub.add_parser("probe")
    p.add_argument("--state", default="/tmp/ts_state.npz")
    p.add_argument("--n-cand", type=int, default=None,
                   help="candidate-set size override — set to the config's "
                        "ts_chunk (e.g. 1000 for config 5) to probe the "
                        "product's exact per-chunk joint-TS law without the "
                        "O(n_cand³) f64 reference blowing up on 1-core numpy")
    p.add_argument("--cand-seed", type=int, default=7)
    p.add_argument("--draws", type=int, default=64)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.cmd == "gen":
        cmd_gen(args)
    else:
        cmd_probe(args)


if __name__ == "__main__":
    main()
