"""Fast batch materialisation + device prefetch.

- `NativeLoader`: ctypes binding to the C++ fastloader (npy parse + CMVN +
  pad in a thread pool), replacing the per-utterance Python np.load loop
  (ref: utils/dataset.py:157-184). Auto-builds the .so on first use when a
  compiler is available; falls back to the numpy path otherwise.
- `prefetch_to_device`: double-buffered host->device pipeline so the TPU
  never waits on host I/O (the reference's DataLoader is synchronous,
  num_workers=0, ref: utils/dataset.py:604-611).
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from typing import Dict, Iterator, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libfastloader.so")


def _ensure_built() -> Optional[str]:
    if os.path.exists(_SO_PATH):
        return _SO_PATH
    src = os.path.join(_NATIVE_DIR, "fastloader.cpp")
    if not os.path.exists(src):
        return None
    for cxx in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cxx, "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
                 "-o", _SO_PATH, src],
                check=True, capture_output=True,
            )
            return _SO_PATH
        except (OSError, subprocess.CalledProcessError):
            continue
    return None


class NativeLoader:
    """Threaded native npy batch loader with CMVN + pad-to-T."""

    def __init__(self):
        so = _ensure_built()
        self._lib = None
        if so is not None:
            lib = ctypes.CDLL(so)
            lib.stjep_load_batch.restype = ctypes.c_int
            lib.stjep_load_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_long,
                ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p),
                ctypes.c_long, ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
                ctypes.POINTER(ctypes.c_long),
            ]
            self._lib = lib

    @property
    def available(self) -> bool:
        return self._lib is not None

    def load_batch(
        self,
        paths,
        T: int,
        D: int,
        norm_param=None,
    ) -> np.ndarray:
        """Load utterances into a zero-padded [n, T, D] float32 array."""
        n = len(paths)
        out = np.empty((n, T, D), dtype=np.float32)
        lens = (ctypes.c_long * n)()
        c_paths = (ctypes.c_char_p * n)(
            *[p.encode() for p in paths]
        )
        if norm_param is not None:
            mus_np = [np.ascontiguousarray(m[:D], dtype=np.float32)
                      for m, s in norm_param]
            stds_np = [np.ascontiguousarray(s[:D], dtype=np.float32)
                       for m, s in norm_param]
            mus = (ctypes.c_void_p * n)(
                *[m.ctypes.data_as(ctypes.c_void_p).value for m in mus_np])
            stds = (ctypes.c_void_p * n)(
                *[s.ctypes.data_as(ctypes.c_void_p).value for s in stds_np])
            stat_dim = D
        else:
            mus = None
            stds = None
            stat_dim = 0
        rc = self._lib.stjep_load_batch(
            ctypes.cast(c_paths, ctypes.POINTER(ctypes.c_char_p)),
            n,
            ctypes.cast(mus, ctypes.POINTER(ctypes.c_void_p)) if mus else None,
            ctypes.cast(stds, ctypes.POINTER(ctypes.c_void_p)) if stds else None,
            stat_dim,
            out.ctypes.data_as(ctypes.c_void_p),
            T, D,
            lens,
        )
        if rc != 0:
            raise RuntimeError(
                f"fastloader failed on utterance {rc // 100} (code {rc % 100})"
            )
        return out


_native_singleton: Optional[NativeLoader] = None


def get_native_loader() -> Optional[NativeLoader]:
    global _native_singleton
    if _native_singleton is None:
        _native_singleton = NativeLoader()
    return _native_singleton if _native_singleton.available else None


def host_prefetch(batch_iter, size: int = 2):
    """Background-thread host-side prefetch: overlaps npy I/O + batch
    assembly with device compute (the reference's loader is synchronous).
    Producer exceptions re-raise on the consumer side; abandoning the
    generator early (break / exception in the consumer) unblocks and stops
    the producer instead of leaving it parked on a full queue holding
    batches for the life of the process."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    err = []
    stop = threading.Event()

    def producer():
        try:
            for item in batch_iter:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            # deliver _END (the consumer may still be draining a full
            # queue); give up only once the consumer abandoned us
            while not stop.is_set():
                try:
                    q.put(_END, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                break
            yield item
    finally:
        stop.set()


def prefetch_to_device(
    batch_iter: Iterator[Dict[str, np.ndarray]],
    size: int = 2,
    device=None,
    sharding=None,
) -> Iterator[Dict]:
    """Background-thread prefetcher: materialises host batches and stages
    them onto the device (or sharding) ahead of consumption. Same
    error/abandonment semantics as host_prefetch — a producer exception
    re-raises on the consumer side rather than silently truncating the
    epoch."""
    import jax

    def stage(item):
        tgt = sharding if sharding is not None else device
        if tgt is not None:
            return {k: jax.device_put(v, tgt) for k, v in item.items()}
        return {k: jax.device_put(v) for k, v in item.items()}

    return host_prefetch((stage(item) for item in batch_iter), size=size)
