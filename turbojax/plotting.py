"""Plotting helpers consuming run logs / results (SURVEY.md §5.5's
"plotting helpers"; the reference communicated results via regret-curve
plots in notebooks [R §4.1]).

matplotlib is optional — import errors surface only when a plot is asked
for, keeping the core dependency-free.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError as e:  # pragma: no cover
        raise ImportError("plotting requires matplotlib") from e


def plot_regret(
    curves,
    labels: Optional[Sequence[str]] = None,
    optimum: float = 0.0,
    path: str = "regret.png",
    title: str = "simple regret",
    log_scale: bool = True,
):
    """Save incumbent-trace / regret curves. ``curves`` is one array or a
    list of arrays of best-so-far values (or regrets if optimum=0)."""
    plt = _plt()
    if np.ndim(curves[0]) == 0:
        curves = [curves]
    fig, ax = plt.subplots(figsize=(6, 4))
    for i, c in enumerate(curves):
        r = np.asarray(c, dtype=float) - optimum
        label = labels[i] if labels else None
        ax.plot(np.arange(1, len(r) + 1), np.maximum(r, 1e-12), label=label)
    if log_scale:
        ax.set_yscale("log")
    ax.set_xlabel("iteration")
    ax.set_ylabel("simple regret")
    ax.set_title(title)
    if labels:
        ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def plot_run_log(records, path: str = "run.png"):
    """Panel plot of a RunLog's records: incumbent + TR length if present."""
    plt = _plt()
    iters = [r["iter"] for r in records]
    best = [r.get("best_y") for r in records]
    has_tr = any("tr_length" in r for r in records)
    fig, axes = plt.subplots(1, 2 if has_tr else 1, figsize=(10 if has_tr else 6, 4))
    ax0 = axes[0] if has_tr else axes
    ax0.plot(iters, best)
    ax0.set_xlabel("iteration")
    ax0.set_ylabel("best y")
    if has_tr:
        axes[1].plot(iters, [r.get("tr_length", np.nan) for r in records])
        axes[1].set_xlabel("iteration")
        axes[1].set_ylabel("TR length")
        axes[1].set_yscale("log")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
