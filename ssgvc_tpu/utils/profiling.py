"""Profiling / device-stats utilities.

The reference's observability was Lightning's DeviceStatsMonitor +
ModelSummary (trainer_seg_video_model.py:1481-1485). TPU-native equivalents:

  * ``trace`` — context manager around ``jax.profiler`` producing an xplane
    trace directory viewable in xprof/tensorboard.
  * ``device_memory_stats`` — per-device HBM usage.
  * ``timed`` — honest wall timing of a jitted fn on tunneled runtimes
    (value-fetch sync; see docs/ARCHITECTURE.md §5).
  * ``param_summary`` — ModelSummary-style parameter-count table.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Dict]:
    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:
            stats = {}
        out[str(d)] = {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }
    return out


def timed(fn: Callable, *args, iters: int = 5, fetch=None, **kwargs) -> float:
    """Median wall seconds per call. Syncs by fetching a scalar from the
    output (``fetch(out) -> scalar array``; defaults to the first leaf's
    sum), since block_until_ready can be a no-op on tunneled backends."""
    def sync(out):
        if fetch is not None:
            return float(fetch(out))
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jax.numpy.sum(leaf.astype(jax.numpy.float32)))

    out = fn(*args, **kwargs)
    sync(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        sync(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def param_summary(params, max_depth: int = 2) -> str:
    """ModelSummary(3)-style table: per-subtree param counts."""
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(params)
    groups: Dict[str, int] = {}
    total = 0
    for path, leaf in flat.items():
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        total += n
        key = "/".join(map(str, path[:max_depth]))
        groups[key] = groups.get(key, 0) + n
    lines = [f"{'module':<44s} {'params':>12s}"]
    for k, v in sorted(groups.items(), key=lambda kv: -kv[1]):
        lines.append(f"{k:<44s} {v:>12,d}")
    lines.append(f"{'TOTAL':<44s} {total:>12,d}")
    return "\n".join(lines)


class AverageMeter:
    """Running average (src/utils/common.py:76)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)
