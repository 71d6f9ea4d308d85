"""Tracing / profiling / structured metrics (SURVEY.md §5 aux subsystems).

The reference's only observability is ``time.time()`` prints and a per-trial
CSV row. Here:

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable device trace (XLA ops, fusion, HBM traffic);
- :class:`MetricsLogger` — append-only JSONL of per-epoch/step metrics
  (machine-readable counterpart of the reference's stdout prints);
- :func:`device_memory_stats` — live HBM usage of the addressable device.
"""

from __future__ import annotations

import contextlib
import json
import os
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('/tmp/trace'): step(...)`` then inspect in TensorBoard
    or xprof. Blocks on nothing itself — wrap complete, block_until_ready'd
    regions for meaningful spans."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """Append-only JSONL metrics sink with wall-clock stamps."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._t0 = time.time()

    def log(self, **fields) -> None:
        fields.setdefault("wall_s", round(time.time() - self._t0, 4))
        with open(self.path, "a") as f:
            f.write(json.dumps(fields, default=float) + "\n")

    def read(self) -> list:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


def device_memory_stats(device=None) -> dict:
    """Live memory stats of one device (empty dict where unsupported)."""
    import jax

    dev = device or jax.devices()[0]
    try:
        return dict(dev.memory_stats() or {})
    except Exception:
        return {}
