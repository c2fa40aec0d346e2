"""Multi-host bootstrap + cross-host checkpoint I/O conventions.

The reference is strictly single-process (SURVEY §5). TPU-natively,
multi-host SPMD needs only:

1. `jax.distributed.initialize()` on every host (coordinator address from the
   TPU runtime or explicit args),
2. a global mesh spanning all hosts' devices,
3. per-host data feeding of the host's shard of the global batch,
4. process-0-only checkpoint writes.

XLA emits the collectives over ICI within a slice and DCN across slices; no
hand-written communication layer exists or is needed.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise multi-host JAX. No-op when running single-process."""
    if num_processes is None and coordinator_address is None:
        # single-process (or TPU-pod auto-detection inside initialize)
        try:
            jax.distributed.initialize()
        except Exception:
            # only safe to swallow when nothing asked for multi-host: a
            # configured-but-failed bootstrap must not silently degrade to
            # N independent single-host jobs with diverging checkpoints
            if any(os.environ.get(k) for k in (
                    "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                    "JAX_NUM_PROCESSES")):
                raise
            return  # single host without a coordinator: fine
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """Cross-process sync point (no-op single-process). Used around
    checkpoint writes so non-primaries never read a half-written dir."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def local_batch_slice(global_batch: int) -> slice:
    """The row range of the global batch this host should feed. The global
    batch must divide evenly — per-host shards assemble one fixed-shape
    global array, so silently dropping remainder rows would lose data on
    every step."""
    n = jax.process_count()
    assert global_batch % n == 0, (
        f"global batch {global_batch} must be a multiple of "
        f"process_count {n} (pick batch_size = k * {n})")
    per_host = global_batch // n
    start = jax.process_index() * per_host
    return slice(start, start + per_host)
