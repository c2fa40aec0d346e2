"""Profiling/tracing utilities — the TPU equivalent of the reference's
ad-hoc wall-clock prints and psutil memory logging (SURVEY §5):

- `StepTimer`: completion-forced per-step timing (handles async dispatch)
- `trace`: context manager around jax.profiler for TensorBoard traces
- `start_server`: live profiling server for `tensorboard --logdir`.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import numpy as np


class StepTimer:
    """Wall-clock step timer that forces device completion per lap.

    On remote-tunnelled platforms block_until_ready can be a no-op, so the
    timer forces a tiny scalar readback of the supplied array instead.
    """

    def __init__(self):
        self.times = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result_leaf=None) -> float:
        if result_leaf is not None:
            # force completion via ONE element: np.asarray on the whole
            # array would D2H the full buffer (megabytes over a remote
            # tunnel), timing the transfer instead of the step
            flat = result_leaf.ravel() if hasattr(result_leaf, "ravel") \
                else np.asarray(result_leaf).ravel()
            np.asarray(flat[:1])
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"mean_s": 0.0, "p50_s": 0.0, "p95_s": 0.0, "steps": 0}
        arr = np.asarray(self.times[1:] or self.times)  # drop compile lap
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "steps": len(self.times),
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    import jax

    return jax.profiler.start_server(port)


def memory_stats() -> Dict[str, float]:
    """Host RSS + (when available) per-device memory stats."""
    from stjep_tpu.utils.misc import get_memory_alloc

    _, mem_mb, _ = get_memory_alloc()
    out = {"host_rss_mb": mem_mb}
    try:
        import jax

        for i, d in enumerate(jax.local_devices()):
            stats = d.memory_stats()
            if stats:
                out[f"device{i}_bytes_in_use"] = stats.get("bytes_in_use", 0)
    except Exception:
        pass
    return out
