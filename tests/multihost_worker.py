"""Worker for the 2-process multi-host test (run as a subprocess).

Each process exposes 2 virtual CPU devices (4 global), initialises
jax.distributed against a local coordinator, builds a global data-parallel
mesh, runs one jit step over a globally-sharded batch, and exercises the
process-0-writes checkpoint path (collective gather + barrier). The reference
has no distributed support of any kind (SURVEY §2/§5); this pins the
TPU-native multi-host conventions in parallel/distributed.py.

Usage: python multihost_worker.py <coordinator> <num_procs> <pid> <workdir>
"""

import os
import sys

if __name__ == "__main__":
    coord, nprocs, pid, workdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from stjep_tpu.parallel.distributed import (
        barrier, init_distributed, is_primary, local_batch_slice,
    )

    init_distributed(coordinator_address=coord, num_processes=nprocs,
                     process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == 2 * nprocs, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stjep_tpu.parallel.mesh import make_mesh, shard_params

    mesh = make_mesh(n_model=1)  # global (data=4, model=1) mesh
    assert mesh.shape["data"] == 2 * nprocs

    # tiny "model": one weight matrix, replicated
    w = jnp.ones((4, 4), jnp.float32) * (1.0 + 0.5)
    params = {"w": w}
    params = shard_params(params, mesh)

    # global batch fed per-host: each process materialises only its slice
    GLOBAL_B = 8
    sl = local_batch_slice(GLOBAL_B)
    host_rows = np.arange(GLOBAL_B, dtype=np.float32)[sl]
    host_x = np.tile(host_rows[:, None], (1, 4))

    batch_sharding = NamedSharding(mesh, P("data", None))
    gx = jax.make_array_from_process_local_data(
        batch_sharding, host_x, (GLOBAL_B, 4)
    )

    @jax.jit
    def step(params, x):
        y = x @ params["w"]  # data-parallel matmul
        return jnp.mean(y)   # cross-host psum via the mesh

    loss = float(step(params, gx))
    # mean over rows 0..7 of x @ w: mean(x)*sum over cols of w rows... just
    # compute the expected value directly
    expect = float(np.mean(np.tile(np.arange(8, dtype=np.float32)[:, None],
                                   (1, 4)) @ np.full((4, 4), 1.5)))
    assert abs(loss - expect) < 1e-5, (loss, expect)

    # checkpoint: process-0-only write with a barrier; every process loads back
    from stjep_tpu.train.checkpoint import Checkpoint

    ck = Checkpoint(params, epoch=1, step=7)
    path = ck.save_customise(os.path.join(workdir, "ckpt"))
    barrier("after_write")
    loaded = Checkpoint.load(path)
    np.testing.assert_allclose(np.asarray(loaded.params["w"]), np.asarray(w))
    assert loaded.epoch == 1 and loaded.step == 7

    print(f"proc{pid} ok loss={loss} primary={is_primary()}")
