"""Test config: force an 8-device virtual CPU platform so sharding tests run
without a TPU pod, and keep everything deterministic."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# parity tests against torch need full float32 matmuls
jax.config.update("jax_default_matmul_precision", "highest")
# persist CPU compiles: XLA compilation dominates suite wall-time on this
# 1-CPU host (first run ~15 min, warmed ~4 min)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)


@pytest.fixture(autouse=True)
def _reset_kernel_mesh():
    """The Trainer installs a process-global kernel mesh (parallel/spmd.py);
    clear it so mesh tests don't leak into later tests."""
    yield
    from stjep_tpu.parallel.spmd import set_kernel_mesh

    set_kernel_mesh(None)
