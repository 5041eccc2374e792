"""Metrics / logging / observability (SURVEY.md §5.5) and profiling hooks
(§5.1).

Reference behavior [R]: verbose stdout of the best value per batch. The
build keeps that (``verbose=True`` mirrors it) and adds a structured
per-iteration JSONL record (incumbent, TR length, MLL, timings) that the
plotting/analysis helpers consume, plus ``jax.profiler`` integration for
perfetto traces of the device programs.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import IO, Optional


class RunLog:
    """Append-only JSONL run log + reference-style verbose stdout."""

    def __init__(self, path: Optional[str] = None, verbose: bool = False):
        self.path = path
        self.verbose = verbose
        self._fh: Optional[IO] = open(path, "a") if path else None
        self._t0 = time.perf_counter()
        self.records = []

    def log(self, iteration: int, **fields) -> None:
        rec = {"iter": iteration, "t": round(time.perf_counter() - self._t0, 4), **fields}
        self.records.append(rec)
        if self._fh:
            self._fh.write(json.dumps(rec, default=float) + "\n")
            self._fh.flush()
        if self.verbose and "best_y" in fields:
            extra = ""
            if "tr_length" in fields:
                extra = f"  L={fields['tr_length']:.4f}"
            print(f"[{iteration:4d}] best = {fields['best_y']:.6f}{extra}")

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


@contextlib.contextmanager
def profile(trace_dir: Optional[str] = None):
    """Wrap a region in ``jax.profiler.trace`` (perfetto dump per run,
    SURVEY.md §5.1). No-op when ``trace_dir`` is None."""
    if trace_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named profiler region around fit/acq/select phases (§5.1)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def start_profiler_server(port: int = 9999) -> int:
    """Start the live JAX profiler server (SURVEY.md §5.1's
    ``jax.profiler.start_server`` integration): connect TensorBoard's
    profile plugin / `xprof` to ``localhost:port`` during a long run
    (e.g. a config-5 host loop) to capture traces on demand instead of
    wrapping the whole run in ``profile``. Returns the port. Idempotent
    per process (JAX raises if started twice; we swallow that)."""
    import jax

    try:
        jax.profiler.start_server(port)
    except (RuntimeError, ValueError):
        pass  # already running in this process
    return port
