"""Tensor-parallel dispatch of the fused Pallas decode kernels.

Under a (data, model) mesh with n_model > 1 the transformer decoder weights
are Megatron-sharded (parallel/mesh.py _TP_RULES): QKV projections column-
parallel over heads, the attention output projection and FFN w_2 row-
parallel, FFN w_1 column-parallel over the hidden dim, and the vocab
projection column-parallel over the vocabulary. pallas_call carries no SPMD
rules, so the fused single-launch layer kernel cannot span shards — but the
TRIO form (self-attn / cross-attn / FFN as separate launches,
ops/decode_flash.py) maps exactly onto the Megatron schedule: each shard
runs its local head/hidden slice in the kernel with `residual=False`, and
one psum over the model axis joins the row-parallel partial outputs before
each residual add. Per decoder layer per decode step that is 3 kernel
launches + 3 [BK, D] psums (the same collective count XLA inserts on its
dense TP path, with the kernels' prefix-streaming cache reads kept).

The decode head is vocab-sharded: `decode_head_partial` emits each shard's
raw top-k logits plus (max, sumexp); the global log-softmax normaliser is
lse = pmax/psum over the model axis, candidates are all_gathered (n*k per
row) and re-top-k'd — tie-breaking stays identical to a dense
`jax.lax.top_k` because shard-major candidate order is global-id order.

Everything here runs INSIDE `jax.shard_map` (parallel/spmd.py provides the
wrappers); `axis` is the mesh's model axis name.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from stjep_tpu.ops.decode_flash import (
    cross_attn_step,
    decode_head_partial,
    ffn_step,
    self_attn_step,
)


def decoder_layer_step_flash_tp(
    params: Dict,  # decoder layer with model-axis weight SHARDS
    x_new: jnp.ndarray,  # [B*K, 1, D] (replicated across the model axis)
    cache_k: jnp.ndarray,  # [group, B, Lpad, D/n] local head-shard cache
    cache_v: jnp.ndarray,
    mem_k: jnp.ndarray,  # [B, Lk_pad, D/n] local cross-attn memory shard
    mem_v: jnp.ndarray,
    pos: jnp.ndarray,
    n_head_local: int,  # heads per shard = num_heads / n_model
    anc: jnp.ndarray,
    group: int,
    mem_mask: jnp.ndarray,
    self_mask_k: jnp.ndarray,
    axis: str,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decoder layer's decode step, tensor-parallel over `axis`."""
    y1p, ck, cv = self_attn_step(
        params["decslf_attn"], x_new, cache_k, cache_v, pos, n_head_local,
        anc, group, self_mask_k, residual=False)
    y1 = x_new + jax.lax.psum(y1p, axis)
    y2p = cross_attn_step(
        params["encdec_attn"], y1, mem_k, mem_v, n_head_local, group,
        mem_mask, residual=False)
    y2 = y1 + jax.lax.psum(y2p, axis)
    y3p = ffn_step(params["pos_ffn"], y2, partial_tp=True)
    y = y2 + jax.lax.psum(y3p, axis) + params["pos_ffn"]["w_2"]["b"]
    return y, ck, cv


def decode_head_tp(
    norm_params: Dict,  # final decoder LayerNorm (replicated)
    out_params: Dict,  # vocab shard of out_tgt: w [D, V/n]
    x: jnp.ndarray,  # [B*K, D]
    topk: int,
    axis: str,
    gather_ids: Optional[jnp.ndarray] = None,  # [B*K] GLOBAL token ids
):
    """Vocab-sharded decode head; same contract as decode_head[_gather].

    Returns (scores [BK, topk] global log-softmax, pred ids [BK, topk]
    GLOBAL int32[, gathered logp [BK]])."""
    v_local = out_params["w"].shape[1]
    off = jax.lax.axis_index(axis) * v_local
    if gather_ids is not None:
        sc_raw, ids, mx, se, glog = decode_head_partial(
            norm_params, out_params, x, topk,
            gather_ids=gather_ids.astype(jnp.int32) - off)
    else:
        sc_raw, ids, mx, se = decode_head_partial(
            norm_params, out_params, x, topk)
    # global logsumexp across vocab shards
    mxg = jax.lax.pmax(mx, axis)
    seg = jax.lax.psum(se * jnp.exp(mx - mxg), axis)
    lse = mxg + jnp.log(seg)  # [BK]
    # merge each shard's topk candidates: shard-major concat == global-id
    # order, so lax.top_k's lowest-index tie-break matches the dense head
    sc_all = jax.lax.all_gather(sc_raw, axis, axis=1, tiled=True)
    ids_all = jax.lax.all_gather(ids + off, axis, axis=1, tiled=True)
    val, pos_sel = jax.lax.top_k(sc_all, topk)
    sc = val - lse[:, None]
    pred = jnp.take_along_axis(ids_all, pos_sel, axis=1).astype(jnp.int32)
    if gather_ids is not None:
        glp = jax.lax.psum(glog, axis) - lse
        return sc, pred, glp
    return sc, pred
