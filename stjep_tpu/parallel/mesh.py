"""Device mesh + sharding rules: data parallelism baseline, tensor
parallelism for the transformer.

The reference has NO distributed support of any kind (SURVEY §2: no
DP/TP/PP/NCCL/torch.distributed; its OOM story is host-side gradient
accumulation, ref: trainer_base.py:83-86). These are first-class new
components here, built the TPU way: a (data, model) `jax.sharding.Mesh`,
`NamedSharding` annotations on params and batch, and XLA emitting the
all-reduce/all-gather collectives onto ICI. No hand-written communication.

Sharding design:
- batch axis        -> 'data'
- LSTM / embeddings -> replicated (the LAS recurrence is latency-bound; an
  all-gather of h per scan step would dominate, so the pyramid and decoder
  LSTMs stay replicated and scale via 'data')
- transformer       -> 'model' tensor parallelism: QKV projections sharded on
  the head dimension, attention output proj on its input, FFN w_1 on the
  hidden dim, w_2 on its input, the vocab projection out_tgt on the vocab
  dim. This is the Megatron split expressed purely as NamedShardings; XLA
  inserts the psum where the row-sharded matmuls meet.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stjep_tpu.train.policies import map_with_path

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n % max(n_model, 1) != 0 or n_model < 1:
        # requested model-parallel degree doesn't fit: degrade to pure DP
        # rather than fail — DP is the baseline sharding (SURVEY §2).
        import logging

        logging.getLogger(__name__).warning(
            "make_mesh: n_model=%s does not divide %d devices; "
            "falling back to pure data parallelism", n_model, n)
        n_model = 1
        n_data = n
    if n_data is None:
        n_data = n // n_model
    if n_data * n_model != n:
        import logging

        logging.getLogger(__name__).warning(
            "make_mesh: (%d, %d) != %d devices; falling back to pure DP",
            n_data, n_model, n)
        n_data, n_model = n, 1
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# param-path regex -> PartitionSpec factory. Matched in order; first hit wins.
_TP_RULES = [
    # attention projections: column-parallel QKV, row-parallel output
    (re.compile(r".*\b(w_qs|w_ks|w_vs)\.w$"), P(None, MODEL_AXIS)),
    (re.compile(r".*\bfc\.w$"), P(MODEL_AXIS, None)),
    # FFN: column-parallel w_1, row-parallel w_2
    (re.compile(r".*pos_ffn\.w_1\.w$"), P(None, MODEL_AXIS)),
    (re.compile(r".*pos_ffn\.w_1\.b$"), P(MODEL_AXIS)),
    (re.compile(r".*pos_ffn\.w_2\.w$"), P(MODEL_AXIS, None)),
    # vocab projection: column-parallel over the vocabulary
    (re.compile(r"^out_tgt\.w$"), P(None, MODEL_AXIS)),
]


def param_pspec(name: str, leaf, n_model: int) -> P:
    """PartitionSpec for one parameter path."""
    if n_model > 1:
        for rx, spec in _TP_RULES:
            if rx.match(name):
                # only shard when the dimension divides evenly
                dims = np.shape(leaf)
                ok = True
                for d, axis_name in zip(dims, tuple(spec)):
                    if axis_name == MODEL_AXIS and d % n_model != 0:
                        ok = False
                if ok:
                    return spec
    return P()  # replicated


def param_shardings(params: Any, mesh: Mesh):
    """NamedSharding pytree for the model params."""
    n_model = mesh.shape[MODEL_AXIS]
    return map_with_path(
        params, lambda name, leaf: NamedSharding(mesh, param_pspec(name, leaf, n_model))
    )


def batch_sharding(mesh: Mesh, batch_axis: int = 0):
    """NamedSharding for a batch array with the batch dim on 'data'."""
    return lambda ndim: NamedSharding(
        mesh, P(*([DATA_AXIS if i == batch_axis else None for i in range(ndim)]))
    )


def shard_params(params: Any, mesh: Mesh):
    """device_put the params with the TP/replicated layout."""
    sh = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, sh)


def shard_batch(batch: Dict[str, Any], mesh: Mesh, batch_axis: int = 1):
    """device_put batch leaves with the (minibatch-)batch dim on 'data'.

    Trainer macro-batches are [n_mini, mini, ...], so the sharded axis
    defaults to 1."""
    mk = batch_sharding(mesh, batch_axis)

    def put(x):
        x = np.asarray(x)
        if x.ndim > batch_axis and x.shape[batch_axis] % mesh.shape[DATA_AXIS] == 0:
            return jax.device_put(x, mk(x.ndim))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def opt_state_shardings(tx, params, mesh: Mesh):
    """Sharding pytree for `tx.init(params)`: any state subtree that is
    param-structured (Adam mu/nu) inherits the params' TP/replicated layout;
    every other leaf (counts, injected hyperparams) is replicated.

    Needed because jit constant-folds `zeros_like` init outputs onto the
    default device regardless of input sharding — opt-state placement must
    be requested explicitly (out_shardings / device_put), not inferred."""
    shapes = jax.eval_shape(tx.init, params)
    ptree = jax.tree_util.tree_structure(params)
    psh = param_shardings(params, mesh)
    rep = NamedSharding(mesh, P())

    def rec(node):
        try:
            if jax.tree_util.tree_structure(node) == ptree:
                return psh
        except Exception:
            pass
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
            return type(node)(*(rec(getattr(node, f)) for f in node._fields))
        if isinstance(node, (list, tuple)):
            return type(node)(rec(x) for x in node)
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return rep

    return rec(shapes)
