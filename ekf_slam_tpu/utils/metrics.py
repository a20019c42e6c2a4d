"""Metrics, tracing and numerics guards (SURVEY.md §5).

The reference's observability is ad-hoc: wall-clock Hz prints
(close_kitti_loops.py:128-132), query-time logs (kitti_q_times.txt),
tf.summary scalars (calc2.py:365-374), a table printer (utils.py:309-322)
and tf.check_numerics NaN guards (calc2.py:311-313). Equivalents here:

* `MetricsLogger` — in-memory scalar series + console table, dumpable to
  JSONL (the kitti_q_times.txt analog).
* `check_finite`  — jittable NaN/Inf guard: returns the value and an
  error flag (debug mode can raise via jax.debug.check).
* `trace_annotation` / `step_timer` — jax.profiler named scopes and a
  block_until_ready wall-clock timer for benchmark harnesses.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List

import jax
import jax.numpy as jnp


def check_finite(x: jnp.ndarray, name: str = "", debug: bool = False):
    """Branchless finite check (tf.check_numerics parity, calc2.py:311-313).
    Returns (x, ok). With debug=True, emits a device-side diagnostic print
    when tripped (works under jit/vmap)."""
    ok = jnp.all(jnp.isfinite(x))
    if debug:
        jax.lax.cond(
            ok, lambda: None,
            lambda: jax.debug.print(
                "NaN/Inf detected in {n} (min={mn}, max={mx})",
                n=name, mn=jnp.min(x), mx=jnp.max(x)))
    return x, ok


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named profiler scope (shows up in jax.profiler traces)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def step_timer(results: Dict[str, float], name: str):
    """Wall-clock timing with device sync (the bench-harness pattern;
    replaces the reference's ad-hoc time.time() prints)."""
    t0 = time.perf_counter()
    yield
    results[name] = time.perf_counter() - t0


class MetricsLogger:
    """Scalar series logger with a console table (utils.py:309-322 style)
    and JSONL dump."""

    def __init__(self):
        self._series: Dict[str, List[float]] = {}
        self._steps: List[int] = []

    def log(self, step: int, **scalars):
        self._steps.append(step)
        for k, v in scalars.items():
            self._series.setdefault(k, []).append(float(v))

    def table(self, last_n: int = 1) -> str:
        keys = sorted(self._series)
        hdr = "step  " + "  ".join(f"{k:>12s}" for k in keys)
        lines = [hdr]
        for i in range(max(0, len(self._steps) - last_n), len(self._steps)):
            row = f"{self._steps[i]:>4d}  " + "  ".join(
                f"{self._series[k][i]:12.5g}" for k in keys)
            lines.append(row)
        return "\n".join(lines)

    def dump_jsonl(self, path: str):
        with open(path, "w") as f:
            for i, s in enumerate(self._steps):
                rec = {"step": s}
                rec.update({k: v[i] for k, v in self._series.items()})
                f.write(json.dumps(rec) + "\n")

    def series(self, key: str) -> List[float]:
        return list(self._series[key])
