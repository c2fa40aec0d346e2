"""Transformer decoder (ref: models/TFDec.py:19-141) + real KV-cache decode.

Full-sequence teacher-forced apply mirrors the reference. For step decoding
the reference re-runs the whole prefix every step (its decode_speedup cache is
implemented but never invoked, ref: TFDec.py:91-123 / SURVEY §2#16); here the
incremental path caches per-layer self-attention K/V projections and the
cross-attention memory projections, making each step O(1) in prefix length
with outputs identical at eval time.

Note the final LayerNorm uses torch's DEFAULT eps (1e-5) — unlike the encoder
which uses eps=1e-6 (ref: TFDec.py:58 vs TFEnc.py:61). Preserved.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from stjep_tpu.config import ModelConfig
from stjep_tpu.models.act import act_dec_apply, act_init
from stjep_tpu.ops.masks import position_signal
from stjep_tpu.ops.transformer import (
    KVCache,
    decoder_layer,
    decoder_layer_init,
    decoder_layer_step,
    layer_norm,
    layer_norm_init,
    mha_cross_precompute,
)

UPPERBOUND_SEQ_LEN = 500  # ref: TFDec.py:35


def tf_decoder_init(key, cfg: ModelConfig, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, cfg.dec_layers + 1)
    if cfg.transformer_type == "universal":
        layers = [decoder_layer_init(keys[0], cfg.dim_model, cfg.num_heads,
                                     cfg.dim_feedforward, dtype)]
        params: Dict = {"layers": layers}
        if cfg.act:
            params["act_fn"] = act_init(keys[-1], cfg.dim_model, dtype)
    elif cfg.transformer_type == "standard":
        layers = [
            decoder_layer_init(keys[i], cfg.dim_model, cfg.num_heads,
                               cfg.dim_feedforward, dtype)
            for i in range(cfg.dec_layers)
        ]
        params = {"layers": layers}
    else:
        raise ValueError(f"not implemented transformer type {cfg.transformer_type}")
    params["norm"] = layer_norm_init(cfg.dim_model, dtype)
    return params


def _layer_params(params: Dict, cfg: ModelConfig, i: int) -> Dict:
    if cfg.transformer_type == "universal":
        return params["layers"][0]
    return params["layers"][i]


def tf_decoder_forward(
    params: Dict,
    cfg: ModelConfig,
    tgt: jnp.ndarray,  # [B, L, D] embedded target
    memory: jnp.ndarray,  # [B, Lk, D] encoder outputs
    tgt_mask: Optional[jnp.ndarray] = None,  # [B, L, L]; 0 = blocked
    src_mask: Optional[jnp.ndarray] = None,  # [B, 1, Lk]
    rng: Optional[jax.Array] = None,
    is_training: bool = False,
    max_time: int = UPPERBOUND_SEQ_LEN,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full-sequence decode. Returns (out [B, L, D], att_self, att_cross)."""
    L = tgt.shape[1]
    time_sig = position_signal(max(max_time, L), cfg.dim_model)
    layer_sig = position_signal(cfg.dec_layers, cfg.dim_model)
    deterministic = not is_training

    if cfg.act and cfg.transformer_type == "universal":
        max_hop = cfg.act_max_hop or cfg.dec_layers
        x, layer_map = act_dec_apply(
            params["act_fn"], _layer_params(params, cfg, 0), cfg, tgt, memory,
            tgt_mask, src_mask, time_sig, layer_sig, max_hop,
            rng=rng, is_training=is_training,
        )
        x = layer_norm(params["norm"], x, eps=1e-5)
        return x, layer_map, layer_map

    x = tgt + time_sig[:, :L, :].astype(tgt.dtype)
    att_self = att_cross = None
    for layer in range(cfg.dec_layers):
        if cfg.transformer_type == "universal":
            x = x + jnp.broadcast_to(
                layer_sig[:, layer, :][:, None, :], x.shape
            ).astype(x.dtype)
        if rng is not None:
            rng, k = jax.random.split(rng)
        else:
            k = None
        lp = _layer_params(params, cfg, layer)
        if cfg.remat and is_training:
            def _apply(lp, x, memory, k):
                return decoder_layer(
                    lp, x, memory, cfg.num_heads, self_mask=tgt_mask,
                    cross_mask=src_mask, rng=k, dropout_rate=cfg.dropout,
                    deterministic=deterministic)

            x, att_self, att_cross = jax.checkpoint(_apply)(lp, x, memory, k)
        else:
            x, att_self, att_cross = decoder_layer(
                lp, x, memory, cfg.num_heads, self_mask=tgt_mask,
                cross_mask=src_mask, rng=k, dropout_rate=cfg.dropout,
                deterministic=deterministic,
            )
    x = layer_norm(params["norm"], x, eps=1e-5)  # torch default eps, ref:58
    return x, att_self, att_cross


# --------------------------------------------------------------------------
# Incremental decode (eval): per-layer KV caches in a while/scan carry
# --------------------------------------------------------------------------


class TFDecCache(NamedTuple):
    """Per-layer K/V caches as TUPLES of [B, n_head, L, d_k] arrays.

    Tuples (not a stacked [n_layers, ...] array) matter for speed: each
    decode step then performs one in-place dynamic_update_slice per layer
    inside the while_loop carry, instead of rewriting a whole stacked cache
    with .at[layer].set."""

    self_k: tuple
    self_v: tuple
    mem_k: tuple
    mem_v: tuple


def tf_decoder_init_cache(
    params: Dict, cfg: ModelConfig, memory: jnp.ndarray, max_len: int,
    cache_dtype=None,
) -> TFDecCache:
    """Preallocate self-attn caches and precompute cross-attn K/V.

    cache_dtype (e.g. jnp.bfloat16) halves cache HBM traffic; attention
    math still accumulates in f32."""
    B = memory.shape[0]
    n_layers = cfg.dec_layers
    d_k = cfg.d_k
    dt = cache_dtype or memory.dtype
    mem_ks, mem_vs = [], []
    for i in range(n_layers):
        kv = mha_cross_precompute(
            _layer_params(params, cfg, i)["encdec_attn"], memory, cfg.num_heads
        )
        mem_ks.append(kv.k.astype(dt))
        mem_vs.append(kv.v.astype(dt))
    zeros = jnp.zeros((B, cfg.num_heads, max_len, d_k), dt)
    return TFDecCache(
        self_k=tuple(zeros for _ in range(n_layers)),
        self_v=tuple(zeros for _ in range(n_layers)),
        mem_k=tuple(mem_ks),
        mem_v=tuple(mem_vs),
    )


def tf_decoder_init_cache_flash(
    params: Dict, cfg: ModelConfig, memory: jnp.ndarray, max_len: int,
    group: int, cache_dtype=None,
) -> TFDecCache:
    """Cache init for the fused Pallas decode path (ops/decode_flash.py).

    Self caches are HEAD-MERGED and GROUP-MAJOR [group, B, Lpad, D] (lane
    dim = D for packed VMEM tiles and contiguous DMA rows; group-major so
    the kernel addresses beam rows with static indices), length-padded to
    the stream block. Memory K/V stay UNexpanded [B, Lk_pad, D] (beam rows
    tile identical memory) and head-merged; padding rows project to zero
    (no K/V bias) and are masked at attention time."""
    from stjep_tpu.ops.attention import linear
    from stjep_tpu.ops.decode_flash import BLOCK, CROSS_BLOCK, pad_len

    B, Lk, _ = memory.shape
    Lbuf = pad_len(max_len, BLOCK)
    Lk_pad = pad_len(Lk, CROSS_BLOCK)
    mem = jnp.pad(memory, ((0, 0), (0, Lk_pad - Lk), (0, 0)))
    dt = cache_dtype or memory.dtype
    mem_ks, mem_vs = [], []
    for i in range(cfg.dec_layers):
        ca = _layer_params(params, cfg, i)["encdec_attn"]
        mem_ks.append(linear(ca["w_ks"], mem).astype(dt))
        mem_vs.append(linear(ca["w_vs"], mem).astype(dt))
    # cache width follows the K projection: dim_model normally, a D/n_model
    # head shard when the params arrive sharded inside a tensor-parallel
    # shard_map (parallel/spmd.py beam/greedy _tp wrappers)
    d_cache = _layer_params(params, cfg, 0)["decslf_attn"]["w_ks"]["w"].shape[1]
    zeros = jnp.zeros((group, B, Lbuf, d_cache), dt)
    return TFDecCache(
        self_k=tuple(zeros for _ in range(cfg.dec_layers)),
        self_v=tuple(zeros for _ in range(cfg.dec_layers)),
        mem_k=tuple(mem_ks),
        mem_v=tuple(mem_vs),
    )


def tf_decoder_step_flash(
    params: Dict,
    cfg: ModelConfig,
    x_new: jnp.ndarray,  # [B*K, 1, D] embedded token at position `pos`
    cache: TFDecCache,  # from tf_decoder_init_cache_flash
    pos: jnp.ndarray,
    anc: jnp.ndarray,  # [Lpad, B*K] int32 ancestry TRANSPOSED (0s for greedy)
    group: int,
    mem_mask_pad: jnp.ndarray,  # [Lk_pad, B] bool TRANSPOSED (False on pad)
    self_mask_k: jnp.ndarray,  # [Lpad, B*K] bool TRANSPOSED
    max_time: int = UPPERBOUND_SEQ_LEN,
    final_norm: bool = True,
    tp_axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, TFDecCache]:
    """Decode position through all layers via the fused Pallas kernels.

    Masks/ancestry are position-major ([L, rows]) so the kernels' block
    slicing stays on the sublane dimension (see ops/decode_flash.py).
    final_norm=False skips the trailing LayerNorm so the caller can fuse it
    into the decode head kernel (ops/decode_flash.decode_head).

    tp_axis names the mesh's model axis when running inside a tensor-
    parallel shard_map: params then hold Megatron weight shards and each
    layer runs the TP trio (ops/decode_flash_tp.py) — local-head kernels
    joined by psums over `tp_axis`."""
    from stjep_tpu.ops.decode_flash import decoder_layer_step_flash
    from stjep_tpu.ops.decode_flash_tp import decoder_layer_step_flash_tp

    time_sig = position_signal(max_time, cfg.dim_model)
    layer_sig = position_signal(cfg.dec_layers, cfg.dim_model)
    x = x_new + jax.lax.dynamic_slice_in_dim(time_sig, pos, 1, axis=1).astype(
        x_new.dtype
    )
    if tp_axis is not None:
        d_local = _layer_params(params, cfg, 0)["decslf_attn"]["w_qs"]["w"].shape[1]
        n_head_local = cfg.num_heads * d_local // cfg.dim_model
    self_k = list(cache.self_k)
    self_v = list(cache.self_v)
    for layer in range(cfg.dec_layers):
        if cfg.transformer_type == "universal":
            x = x + layer_sig[:, layer, :][:, None, :].astype(x.dtype)
        lp = _layer_params(params, cfg, layer)
        if tp_axis is not None:
            x, ck, cv = decoder_layer_step_flash_tp(
                lp, x, self_k[layer], self_v[layer],
                cache.mem_k[layer], cache.mem_v[layer],
                pos, n_head_local, anc, group, mem_mask_pad, self_mask_k,
                tp_axis,
            )
        else:
            x, ck, cv = decoder_layer_step_flash(
                lp, x, self_k[layer], self_v[layer],
                cache.mem_k[layer], cache.mem_v[layer],
                pos, cfg.num_heads, anc, group, mem_mask_pad, self_mask_k,
            )
        self_k[layer] = ck
        self_v[layer] = cv
    if final_norm:
        x = layer_norm(params["norm"], x, eps=1e-5)
    return x, cache._replace(self_k=tuple(self_k), self_v=tuple(self_v))


def tf_decoder_init_cache_chain(
    params: Dict, cfg: ModelConfig, memory: jnp.ndarray, max_len: int,
    group: int, cache_dtype=None,
) -> TFDecCache:
    """Cache init for the chained whole-step kernel
    (ops/decode_flash.decode_chain_step_flash): the per-layer flash-layout
    caches stacked along a leading layer axis — self [nl, group, B, Lpad, D],
    memory K/V [nl, B, Lk_pad, D] — so the kernel addresses layer `l` with
    one dynamic leading index. Fields hold the stacked arrays directly
    (not per-layer tuples). Built by stacking tf_decoder_init_cache_flash's
    outputs so the two layouts cannot drift."""
    c = tf_decoder_init_cache_flash(
        params, cfg, memory, max_len, group, cache_dtype=cache_dtype)
    return TFDecCache(
        self_k=jnp.stack(c.self_k, axis=0),
        self_v=jnp.stack(c.self_v, axis=0),
        mem_k=jnp.stack(c.mem_k, axis=0),
        mem_v=jnp.stack(c.mem_v, axis=0),
    )


def tf_decoder_chain_step(
    params: Dict,  # dec_tgt subtree (possibly int8-quantized layers)
    out_params: Dict,  # out_tgt linear
    cfg: ModelConfig,
    x_new: jnp.ndarray,  # [B*K, 1, D] embedded token at position `pos`
    cache: TFDecCache,  # stacked, from tf_decoder_init_cache_chain
    pos: jnp.ndarray,
    anc: jnp.ndarray,  # [Lpad, B*K] int32 ancestry TRANSPOSED
    group: int,
    mem_mask_pad: jnp.ndarray,  # [Lk_pad, B] bool TRANSPOSED
    self_mask_k: jnp.ndarray,  # [Lpad, B*K] bool TRANSPOSED
    topk: int,
    max_time: int = UPPERBOUND_SEQ_LEN,
    gather_ids: Optional[jnp.ndarray] = None,
):
    """Whole decode position (all layers + decode head) in ONE pallas
    launch. Returns (score_k, pred_k, [glp,] new_cache) — the head output
    contract of decode_head[_gather], so callers skip the separate head
    launch. Standard transformer only (chain_supported)."""
    from stjep_tpu.ops.decode_flash import (
        decode_chain_step_flash,
        stack_decoder_layers,
    )

    time_sig = position_signal(max_time, cfg.dim_model)
    x = x_new + jax.lax.dynamic_slice_in_dim(time_sig, pos, 1, axis=1).astype(
        x_new.dtype
    )
    stacked, quant = stack_decoder_layers(params)
    outs = decode_chain_step_flash(
        stacked, quant, params["norm"], out_params, x,
        cache.self_k, cache.self_v, cache.mem_k, cache.mem_v,
        pos, cfg.num_heads, anc, group, mem_mask_pad, self_mask_k,
        topk, gather_ids=gather_ids,
    )
    if gather_ids is not None:
        sc, ids, glp, ck, cv = outs
        return sc, ids, glp, cache._replace(self_k=ck, self_v=cv)
    sc, ids, ck, cv = outs
    return sc, ids, cache._replace(self_k=ck, self_v=cv)


def tf_decoder_step(
    params: Dict,
    cfg: ModelConfig,
    x_new: jnp.ndarray,  # [B, 1, D] embedded token at position `pos`
    cache: TFDecCache,
    pos: jnp.ndarray,  # scalar int32
    mem_mask: Optional[jnp.ndarray] = None,  # [B, Lk] True = attendable
    self_mask_k: Optional[jnp.ndarray] = None,  # [B, Lmax] True = attendable
    max_time: int = UPPERBOUND_SEQ_LEN,
) -> Tuple[jnp.ndarray, TFDecCache]:
    """One position through all layers with KV caches (eval only).

    self_mask_k masks prefix keys (e.g. PAD tokens a greedy row emitted),
    matching the reference's pad_mask over the re-embedded prefix
    (ref: Seq2seq.py:202-205). Returns (out [B, 1, D], new cache)."""
    time_sig = position_signal(max_time, cfg.dim_model)
    layer_sig = position_signal(cfg.dec_layers, cfg.dim_model)
    x = x_new + jax.lax.dynamic_slice_in_dim(time_sig, pos, 1, axis=1).astype(
        x_new.dtype
    )
    self_k = list(cache.self_k)
    self_v = list(cache.self_v)
    for layer in range(cfg.dec_layers):
        if cfg.transformer_type == "universal":
            x = x + layer_sig[:, layer, :][:, None, :].astype(x.dtype)
        lp = _layer_params(params, cfg, layer)
        layer_cache = KVCache(k=self_k[layer], v=self_v[layer])
        mem_kv = KVCache(k=cache.mem_k[layer], v=cache.mem_v[layer])
        x, layer_cache = decoder_layer_step(
            lp, x, layer_cache, mem_kv, pos, cfg.num_heads, mem_mask=mem_mask,
            self_mask_k=self_mask_k,
        )
        self_k[layer] = layer_cache.k
        self_v[layer] = layer_cache.v
    x = layer_norm(params["norm"], x, eps=1e-5)
    return x, cache._replace(self_k=tuple(self_k), self_v=tuple(self_v))
