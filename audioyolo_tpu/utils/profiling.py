"""Tracing / profiling helpers (SURVEY.md §5: the reference has no tracing at
all — only commented-out CUDA_LAUNCH_BLOCKING vestiges, ``train.py:190-191``).

- :func:`annotate` — named-scope context for jitted regions; the labels show
  up in XLA/TPU profiler traces (Perfetto/TensorBoard).
- :func:`profile_trace` — context manager capturing a device trace to a
  directory; pair with ``summarize_trace`` to get per-op timings without
  TensorBoard.
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import os
from typing import Dict, Iterator

import jax


def annotate(name: str):
    """Profiler annotation usable both as context manager and decorator."""
    return jax.named_scope(name)


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


def summarize_trace(log_dir: str, top: int = 20) -> Dict[str, float]:
    """Parse the newest trace.json.gz under ``log_dir`` into op-name -> total
    milliseconds, descending. Host-side python events are filtered out."""
    files = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        raise FileNotFoundError(f"no trace files under {log_dir}")
    events = json.load(gzip.open(sorted(files)[-1]))["traceEvents"]
    totals: Dict[str, float] = {}
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "")
            if name.startswith("$"):  # python frames
                continue
            totals[name] = totals.get(name, 0.0) + e["dur"] / 1000.0
    return dict(sorted(totals.items(), key=lambda kv: -kv[1])[:top])
