"""SPMD dispatch for the fused Pallas kernels under multi-device meshes.

pallas_call carries no SPMD partitioning rules: under a >1-device mesh,
XLA's partitioner replicates a pallas custom call's operands and runs the
whole kernel on every device — correct but O(n_devices) wasted work.
Round 2 therefore simply disabled the fused kernels whenever a mesh was
active (STJEP_NO_FLASH). This module replaces that cliff with the
idiomatic TPU form: every LAS kernel is batch-parallel with replicated
weights, so each kernel call is wrapped in `jax.shard_map` over the
mesh's 'data' axis — each shard runs the kernel on its local batch slice,
and shard_map's transpose automatically psums the replicated weight
cotangents across shards (pinned by tests/test_spmd_kernels.py against
the single-device kernels and the dense XLA path).

The active mesh is process-global state set by the Trainer/CLIs
(`set_kernel_mesh`); model code stays pure — the wrappers close over the
mesh at trace time, and fall through to the plain kernel call when no
mesh is active or the batch does not divide the data axis (XLA then
replicates: slow but correct, and only reachable for ragged eval tails).

The transformer-side decode kernels (ops/decode_flash.py) read the
transformer weights: under a pure-DP mesh (n_model == 1) they are
replicated and dispatch through the same batch shard_map
(`greedy_decode_flash_dp`, `beam_search_flash_dp`). Under a TP mesh
(n_model > 1) the Megatron-sharded weights dispatch through a
(data, model) shard_map running the tensor-parallel kernel trio and
vocab-sharded decode head (ops/decode_flash_tp.py) — model-axis psums
join the row-parallel partials between kernel launches — whenever the
sharded dims divide (`tp_flash_ok`); otherwise the sharding-aware dense
XLA path is used.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from stjep_tpu.parallel.mesh import DATA_AXIS

_KERNEL_MESH: Optional[Mesh] = None


def set_kernel_mesh(mesh: Optional[Mesh]):
    """Install (or clear) the mesh the fused kernels shard over."""
    global _KERNEL_MESH
    _KERNEL_MESH = mesh


def kernel_mesh() -> Optional[Mesh]:
    return _KERNEL_MESH


def dp_only_mesh() -> bool:
    """True when the active mesh has no model-parallel axis (n_model == 1),
    i.e. every parameter is replicated and batch shard_map is valid for
    kernels that read transformer weights."""
    from stjep_tpu.parallel.mesh import MODEL_AXIS

    mesh = kernel_mesh()
    return mesh is not None and dict(mesh.shape).get(MODEL_AXIS, 1) == 1


def tp_flash_ok(cfg) -> bool:
    """Whether the tensor-parallel fused decode path (ops/decode_flash_tp)
    can run under the active mesh for this config: every Megatron-sharded
    dimension must divide n_model (so _TP_RULES actually sharded the
    weights) and the local head-shard cache width must stay lane-aligned
    for Mosaic on real TPUs (interpret mode has no such constraint)."""
    from stjep_tpu.parallel.mesh import MODEL_AXIS

    mesh = kernel_mesh()
    if mesh is None:
        return False
    n = dict(mesh.shape).get(MODEL_AXIS, 1)
    if n <= 1:
        return False
    if (cfg.num_heads % n or cfg.dim_model % n or cfg.dim_feedforward % n
            or cfg.dec_vocab_size % n):
        return False
    if jax.default_backend() != "cpu" and (cfg.dim_model // n) % 128 != 0:
        return False
    return True


def decode_flash_auto(cfg) -> bool:
    """Single auto-gate for routing transformer decode (greedy/beam) through
    the fused kernels: decode_flash reads the transformer weights, so batch
    shard_map needs a pure-DP mesh (weights replicated) and TP meshes need
    the tensor-parallel trio (tp_flash_ok); ACT/universal models must re-run
    the full causal prefix (no KV-cached stepping); on CPU the kernels only
    run in interpret mode when forced (STJEP_FORCE_FLASH=1, the oracle
    parity suites)."""
    import os

    from stjep_tpu.ops.decode_flash import flash_supported
    from stjep_tpu.utils.misc import flash_kernels_disabled

    from stjep_tpu.models.seq2seq import _needs_full_rerun

    return (not flash_kernels_disabled()
            and (kernel_mesh() is None or dp_only_mesh() or tp_flash_ok(cfg))
            and not _needs_full_rerun(cfg)
            and ((jax.default_backend() != "cpu"
                  and flash_supported(cfg.dim_model))
                 or os.environ.get("STJEP_FORCE_FLASH") == "1"))


def _tp_param_specs(params, n_model: int):
    """PartitionSpec pytree matching how mesh.shard_params laid params out
    (Megatron TP rules for the transformer, replicated otherwise)."""
    from stjep_tpu.parallel.mesh import param_pspec
    from stjep_tpu.train.policies import map_with_path

    return map_with_path(
        params, lambda name, leaf: param_pspec(name, leaf, n_model))


def _n_data(mesh: Mesh) -> int:
    return mesh.shape[DATA_AXIS]


def _rep(tree):
    """Replicated spec for a whole (weight) pytree."""
    return jax.tree_util.tree_map(lambda _: P(), tree)


def _b(ndim: int, axis: int) -> P:
    """Spec with the batch dim on 'data' and everything else replicated."""
    return P(*[DATA_AXIS if i == axis else None for i in range(ndim)])


def _smap(fn, mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


# ---------------------------------------------------------------------------
# BiLSTM pyramid kernels (ops/lstm_pallas.py, ops/lstm_pallas_bwd.py)
# ---------------------------------------------------------------------------

def bilstm_dp(kernel_fn, params_fwd, params_bwd, x, lengths):
    """`kernel_fn(pf, pb, x [B,T,D], lens [B]) -> [B,T,2H]`, sharded on B."""
    mesh = kernel_mesh()
    if mesh is None or x.shape[0] % _n_data(mesh) != 0:
        return kernel_fn(params_fwd, params_bwd, x, lengths)
    fn = _smap(kernel_fn, mesh,
               (_rep(params_fwd), _rep(params_bwd), _b(3, 0), _b(1, 0)),
               _b(3, 0))
    return fn(params_fwd, params_bwd, x, lengths)


# ---------------------------------------------------------------------------
# Teacher-forced LAS decoder scan (ops/las_tf_flash.py)
# ---------------------------------------------------------------------------

def las_tf_scan_dp(stack, att_w, ffn_w, pre0_steps, acous_outputs, lens_k,
                   masks):
    """Time-major fused TF decoder scan, sharded on the batch axis.

    pre0_steps [S,B,4Hd] (batch axis 1), acous_outputs [B,Tk,Ha2],
    masks (lstm_m [S,n,B,Hd], ctx_m [S,B,1,Ha2]) or None; out [S,B,Hs]."""
    from stjep_tpu.ops.las_tf_flash import las_tf_scan

    mesh = kernel_mesh()
    if mesh is None or acous_outputs.shape[0] % _n_data(mesh) != 0:
        return las_tf_scan(stack, att_w, ffn_w, pre0_steps, acous_outputs,
                           lens_k, masks)
    mask_specs = P() if masks is None else (_b(4, 2), _b(4, 1))
    fn = _smap(las_tf_scan, mesh,
               (_rep(stack), P(), P(), _b(3, 1), _b(3, 0), _b(1, 0),
                mask_specs),
               _b(3, 1))
    return fn(stack, att_w, ffn_w, pre0_steps, acous_outputs, lens_k, masks)


# ---------------------------------------------------------------------------
# Free-running LAS greedy decode (ops/las_flash.py) — eval only
# ---------------------------------------------------------------------------

def las_greedy_flash_dp(params, cfg, wk, att_values, lens_k, sym0, n_steps,
                        ref_tokens=None):
    """Fused free-running decode, sharded on the batch axis. Returns
    (embs [B,S,Hs], preds [B,S], picked [B,S])."""
    from stjep_tpu.ops.las_flash import las_greedy_flash

    mesh = kernel_mesh()
    if mesh is None or wk.shape[0] % _n_data(mesh) != 0:
        return las_greedy_flash(params, cfg, wk, att_values, lens_k, sym0,
                                n_steps, ref_tokens=ref_tokens)

    def inner(p, wk_, av, lk, s0, refs):
        return las_greedy_flash(p, cfg, wk_, av, lk, s0, n_steps,
                                ref_tokens=refs)

    refs_spec = P() if ref_tokens is None else _b(2, 0)
    fn = _smap(inner, mesh,
               (_rep(params), _b(3, 0), _b(3, 0), _b(1, 0), _b(1, 0),
                refs_spec),
               (_b(3, 0), _b(2, 0), _b(2, 0)))
    return fn(params, wk, att_values, lens_k, sym0, ref_tokens)


# ---------------------------------------------------------------------------
# Transformer decode kernels (ops/decode_flash.py / decode_flash_tp.py)
# ---------------------------------------------------------------------------

def greedy_decode_flash_dp(params, cfg, enc_outputs, mem_mask_b, length_out,
                           max_time, ref_tokens):
    """KV-cached fused greedy decode, sharded on the batch axis.

    Pure-DP meshes shard_map over 'data' with replicated weights; meshes
    with a model axis delegate to the tensor-parallel form (callers gate on
    tp_flash_ok). Per-shard all-EOS early exit matches the reference's
    per-(sub)batch exit semantics."""
    from stjep_tpu.models.seq2seq import _greedy_decode_flash

    mesh = kernel_mesh()
    if mesh is not None and not dp_only_mesh():
        return greedy_decode_flash_tp(params, cfg, enc_outputs, mem_mask_b,
                                      length_out, max_time, ref_tokens)
    if mesh is None or enc_outputs.shape[0] % _n_data(mesh) != 0:
        return _greedy_decode_flash(params, cfg, enc_outputs, mem_mask_b,
                                    length_out, max_time, ref_tokens)

    def inner(p, enc, mm, refs):
        return _greedy_decode_flash(p, cfg, enc, mm, length_out, max_time,
                                    refs)

    mm_spec = P() if mem_mask_b is None else _b(2, 0)
    fn = _smap(inner, mesh,
               (_rep(params), _b(3, 0), mm_spec, _b(2, 0)),
               (_b(2, 0), _b(2, 0)))
    return fn(params, enc_outputs, mem_mask_b, ref_tokens)


def greedy_decode_flash_tp(params, cfg, enc_outputs, mem_mask_b, length_out,
                           max_time, ref_tokens):
    """Fused greedy decode over a (data, model) mesh: batch rows shard over
    'data', and inside each shard the decoder runs the TP kernel trio +
    vocab-sharded head over 'model' (ops/decode_flash_tp.py). Ragged
    batches fall back to the unsharded call (XLA replicates)."""
    from stjep_tpu.models.seq2seq import _greedy_decode_flash
    from stjep_tpu.parallel.mesh import MODEL_AXIS

    mesh = kernel_mesh()
    if enc_outputs.shape[0] % _n_data(mesh) != 0:
        return _greedy_decode_flash(params, cfg, enc_outputs, mem_mask_b,
                                    length_out, max_time, ref_tokens)
    n_model = dict(mesh.shape)[MODEL_AXIS]

    def inner(p, enc, mm, refs):
        return _greedy_decode_flash(p, cfg, enc, mm, length_out, max_time,
                                    refs, tp_axis=MODEL_AXIS)

    mm_spec = P() if mem_mask_b is None else _b(2, 0)
    fn = _smap(inner, mesh,
               (_tp_param_specs(params, n_model), _b(3, 0), mm_spec,
                _b(2, 0)),
               (_b(2, 0), _b(2, 0)))
    return fn(params, enc_outputs, mem_mask_b, ref_tokens)


def beam_search_flash_dp(params, cfg, enc_outputs, mem_mask_b, beam_width,
                         penalty_factor, max_seq_len, cache_dtype=None,
                         weight_dtype=None):
    """Fused beam search, sharded on the utterance axis; meshes with a
    model axis delegate to the tensor-parallel form (see
    greedy_decode_flash_dp). weight_dtype='int8' (serving-latency weight
    streaming) applies per shard under pure-DP meshes; TP meshes keep f32
    weights (the TP trio has no dequant path)."""
    from stjep_tpu.infer.beam import _beam_search_flash

    mesh = kernel_mesh()
    if mesh is not None and not dp_only_mesh():
        if weight_dtype is not None:
            # same failure surface as infer.beam.beam_search's non-flash
            # check: never silently decode f32 when int8 was requested
            raise ValueError(
                "weight_dtype={!r} is not supported under a tensor-parallel "
                "mesh (the TP decode trio has no dequant path); drop "
                "--weight_dtype or use a pure data-parallel mesh".format(
                    weight_dtype))
        return beam_search_flash_tp(params, cfg, enc_outputs, mem_mask_b,
                                    beam_width, penalty_factor, max_seq_len,
                                    cache_dtype=cache_dtype)
    if mesh is None or enc_outputs.shape[0] % _n_data(mesh) != 0:
        return _beam_search_flash(params, cfg, enc_outputs, mem_mask_b,
                                  beam_width, penalty_factor, max_seq_len,
                                  cache_dtype=cache_dtype,
                                  weight_dtype=weight_dtype)

    def inner(p, enc, mm):
        return _beam_search_flash(p, cfg, enc, mm, beam_width,
                                  penalty_factor, max_seq_len,
                                  cache_dtype=cache_dtype,
                                  weight_dtype=weight_dtype)

    mm_spec = P() if mem_mask_b is None else _b(2, 0)
    fn = _smap(inner, mesh,
               (_rep(params), _b(3, 0), mm_spec),
               (_b(2, 0), _b(1, 0)))
    return fn(params, enc_outputs, mem_mask_b)


def beam_search_flash_tp(params, cfg, enc_outputs, mem_mask_b, beam_width,
                         penalty_factor, max_seq_len, cache_dtype=None):
    """Fused beam search over a (data, model) mesh — utterances shard over
    'data', the decoder/head run tensor-parallel over 'model'."""
    from stjep_tpu.infer.beam import _beam_search_flash
    from stjep_tpu.parallel.mesh import MODEL_AXIS

    mesh = kernel_mesh()
    if enc_outputs.shape[0] % _n_data(mesh) != 0:
        return _beam_search_flash(params, cfg, enc_outputs, mem_mask_b,
                                  beam_width, penalty_factor, max_seq_len,
                                  cache_dtype=cache_dtype)
    n_model = dict(mesh.shape)[MODEL_AXIS]

    def inner(p, enc, mm):
        return _beam_search_flash(p, cfg, enc, mm, beam_width,
                                  penalty_factor, max_seq_len,
                                  cache_dtype=cache_dtype,
                                  tp_axis=MODEL_AXIS)

    mm_spec = P() if mem_mask_b is None else _b(2, 0)
    fn = _smap(inner, mesh,
               (_tp_param_specs(params, n_model), _b(3, 0), mm_spec),
               (_b(2, 0), _b(1, 0)))
    return fn(params, enc_outputs, mem_mask_b)
