"""Transformer building blocks (pre-LN, batch-first) + KV-cache decode path.

Faithful to the reference semantics (ref: modules/layers.py:23-253) including
its quirks, which matter for checkpoint-parity:

- LayerNorm is applied to the *query* input only; keys/values enter the
  projections un-normalised (ref: modules/layers.py:153-160).
- Attention-weight dropout is hardcoded 0.1 regardless of the configured
  dropout (ref: modules/layers.py:207,226).
- Blocked positions are filled with -1e9 where mask == 0
  (ref: modules/layers.py:222-224).
- FFN: LN -> w1 -> relu -> w2 -> dropout -> +residual (ref: layers.py:243-251).

The KV-cache incremental path is new (the reference's decode_speedup caches
layer *outputs* and is never invoked, ref: models/TFDec.py:91-123); it caches
per-layer K/V projections so greedy/beam decode is O(L) instead of O(L^2),
with identical outputs at eval time because attention is causal.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from stjep_tpu.ops.attention import linear, linear_init

ATTN_MASK_FILL = -1e9  # ref: modules/layers.py:224
ATTN_DROPOUT = 0.1  # ref: modules/layers.py:207


def dropout(key, x, rate: float, deterministic: bool):
    if deterministic or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def layer_norm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p, x, eps: float = 1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * p["scale"] + p["bias"]


# --------------------------------------------------------------------------
# Multi-head attention
# --------------------------------------------------------------------------


def mha_init(key, n_head: int, d_model: int, d_k: int, d_v: int, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "w_qs": linear_init(ks[0], d_model, n_head * d_k, bias=False, dtype=dtype),
        "w_ks": linear_init(ks[1], d_model, n_head * d_k, bias=False, dtype=dtype),
        "w_vs": linear_init(ks[2], d_model, n_head * d_v, bias=False, dtype=dtype),
        "fc": linear_init(ks[3], n_head * d_v, d_model, bias=False, dtype=dtype),
        "layer_norm": layer_norm_init(d_model, dtype),
    }


def _split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    b, l, _ = x.shape
    return x.reshape(b, l, n_head, -1).transpose(0, 2, 1, 3)  # [B, n, L, d]


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, n, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, n * d)


def scaled_dot_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    temperature: float,
    mask: Optional[jnp.ndarray] = None,
    prior_weight: Optional[jnp.ndarray] = None,
    rng=None,
    deterministic: bool = True,
):
    """q,k,v: [B, L, n, d] — heads stay where the projection reshape put
    them; the einsums carry the head axis so no [B,n,L,d] relayout is ever
    materialised (the 4 transposes cost ~10% of the decoder fwd+bwd at
    bench shapes, scripts/probe_tfdec_ablation.py). mask broadcastable to
    [B, 1, Lq, Lk]; 0 = blocked. Returns (out [B, Lq, n, d], attn
    [B, n, Lq, Lk]).

    ref: modules/layers.py:200-229 (ScaledDotProductAttention).
    """
    attn = jnp.einsum("bqnd,bknd->bnqk", q / temperature, k)
    if prior_weight is not None:
        attn = attn * prior_weight
    if mask is not None:
        attn = jnp.where(mask == 0, ATTN_MASK_FILL, attn)
    attn = jax.nn.softmax(attn, axis=-1)
    attn = dropout(rng, attn, ATTN_DROPOUT, deterministic)
    out = jnp.einsum("bnqk,bknd->bqnd", attn, v)
    return out, attn


def mha(
    params: Dict,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_head: int,
    mask: Optional[jnp.ndarray] = None,
    prior_weight: Optional[jnp.ndarray] = None,
    rng=None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
):
    """Batch-first multi-head attention (ref: modules/layers.py:120-197).

    Note: LayerNorm on q only; k, v projected from raw inputs.
    """
    d_k = params["w_qs"]["w"].shape[1] // n_head
    residual = q
    qn = layer_norm(params["layer_norm"], q, eps=1e-6)

    def heads(x):  # [B, L, n*d] -> [B, L, n, d]: reshape only, no transpose
        b, l, _ = x.shape
        return x.reshape(b, l, n_head, -1)

    qh = heads(linear(params["w_qs"], qn))
    kh = heads(linear(params["w_ks"], k))
    vh = heads(linear(params["w_vs"], v))

    if mask is not None and mask.ndim == 3:
        mask = mask[:, None, :, :]  # broadcast over heads
    if prior_weight is not None and prior_weight.ndim == 3:
        prior_weight = prior_weight[:, None, :, :]

    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    out, attn = scaled_dot_attention(
        qh, kh, vh, d_k**0.5, mask=mask, prior_weight=prior_weight,
        rng=r1, deterministic=deterministic,
    )
    b, lq = out.shape[0], out.shape[1]
    out = linear(params["fc"], out.reshape(b, lq, -1))
    out = dropout(r2, out, dropout_rate, deterministic)
    return out + residual, attn


def _sdpa_nld(q, k, v, temperature, mask=None):
    """Attention in the KV-cache layout: q,k,v [B, n, L, d] (eval step paths;
    the caches are stored head-major so the full-sequence blnd layout does
    not apply). Deterministic — decode never drops attention weights."""
    attn = jnp.einsum("bnqd,bnkd->bnqk", q / temperature, k)
    if mask is not None:
        attn = jnp.where(mask == 0, ATTN_MASK_FILL, attn)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bnqk,bnkd->bnqd", attn, v)
    return out, attn


class KVCache(NamedTuple):
    """Per-layer self-attention K/V projections, fixed max length."""

    k: jnp.ndarray  # [B, n, Lmax, d_k]
    v: jnp.ndarray  # [B, n, Lmax, d_v]


def mha_self_step(
    params: Dict,
    x_new: jnp.ndarray,  # [B, 1, D] the newest position
    cache: KVCache,
    pos: jnp.ndarray,  # scalar int32: index of the new position
    n_head: int,
    mask_k: Optional[jnp.ndarray] = None,  # [B, Lmax] bool True=attendable
) -> Tuple[jnp.ndarray, KVCache]:
    """Incremental self-attention over the cached prefix + new position.

    Equivalent (at eval) to running full-sequence mha and taking the last row.
    """
    d_k = params["w_qs"]["w"].shape[1] // n_head
    residual = x_new
    qn = layer_norm(params["layer_norm"], x_new, eps=1e-6)
    qh = _split_heads(linear(params["w_qs"], qn), n_head)  # [B, n, 1, d]
    k_new = _split_heads(linear(params["w_ks"], x_new), n_head)
    v_new = _split_heads(linear(params["w_vs"], x_new), n_head)

    # caches may be kept in a lower precision (e.g. bfloat16) to halve the
    # HBM traffic of beam-search cache reorders
    k = jax.lax.dynamic_update_slice(
        cache.k, k_new.astype(cache.k.dtype), (0, 0, pos, 0))
    v = jax.lax.dynamic_update_slice(
        cache.v, v_new.astype(cache.v.dtype), (0, 0, pos, 0))

    lmax = k.shape[2]
    valid = jnp.arange(lmax) <= pos  # causal: attend up to current pos
    if mask_k is not None:
        valid = valid[None, :] & mask_k
        mask = valid[:, None, None, :]
    else:
        mask = valid[None, None, None, :]

    out, _ = _sdpa_nld(qh, k, v, d_k**0.5, mask=mask)
    out = linear(params["fc"], _merge_heads(out))
    return out + residual, KVCache(k=k, v=v)


def mha_self_step_ancestry(
    params: Dict,
    x_new: jnp.ndarray,  # [B*K, 1, D] the newest position, beam-expanded
    cache: KVCache,  # [B*K, n, Lmax, d] — rows are NEVER physically reordered
    pos: jnp.ndarray,  # scalar int32
    n_head: int,
    anc: jnp.ndarray,  # [B*K, Lmax] int32 in-group ancestor index per position
    group: int,  # beam width K (rows s = b*K + k)
    mask_k: Optional[jnp.ndarray] = None,  # [B*K, Lmax] bool True=attendable
) -> Tuple[jnp.ndarray, KVCache]:
    """Beam self-attention with gather-at-read ancestry (ROADMAP #2).

    Instead of physically permuting the K/V caches on every beam reselection
    (read+write of the full cache per step), rows stay where they were
    written and `anc[s, l]` records which row within s's beam group holds the
    K/V of hypothesis-s's token at position l (K/V at a position depend only
    on that position's token, so sharing is exact). The permutation resolves
    at read time:

      scores[s, n, l] = q[s, n] . K[b*K + anc[s, l], n, l]

    computed as scores against ALL group rows (a K-times-larger einsum over
    otherwise-idle MXU cycles) followed by an exact take_along_axis select;
    the context gather rides the attention einsum through a one-hot factor.

    `anc[s, pos]` must already be s's own group index (the caller writes the
    current position into row s itself just below).
    """
    d_k = params["w_qs"]["w"].shape[1] // n_head
    residual = x_new
    qn = layer_norm(params["layer_norm"], x_new, eps=1e-6)
    qh = _split_heads(linear(params["w_qs"], qn), n_head)  # [BK, n, 1, d]
    k_new = _split_heads(linear(params["w_ks"], x_new), n_head)
    v_new = _split_heads(linear(params["w_vs"], x_new), n_head)

    k = jax.lax.dynamic_update_slice(
        cache.k, k_new.astype(cache.k.dtype), (0, 0, pos, 0))
    v = jax.lax.dynamic_update_slice(
        cache.v, v_new.astype(cache.v.dtype), (0, 0, pos, 0))

    BK, n, L, d = k.shape
    B = BK // group
    kg = k.reshape(B, group, n, L, d)
    vg = v.reshape(B, group, n, L, d)
    qg = (qh[:, :, 0, :] / (d_k**0.5)).reshape(B, group, n, d)
    ancg = anc.reshape(B, group, L)

    # [B, K(query), n, J(cache row), L]
    scores_all = jnp.einsum("bknd,bjnld->bknjl", qg, kg)
    idx = jnp.broadcast_to(ancg[:, :, None, None, :].astype(jnp.int32),
                           (B, group, n, 1, L))
    scores = jnp.take_along_axis(scores_all, idx, axis=3)[:, :, :, 0, :]

    valid = jnp.arange(L) <= pos
    if mask_k is not None:
        valid = valid[None, :] & mask_k
        valid = valid.reshape(B, group, 1, L)
    else:
        valid = valid[None, None, None, :]
    scores = jnp.where(valid, scores, ATTN_MASK_FILL)
    attn = jax.nn.softmax(scores, axis=-1)  # [B, K, n, L]

    onehot = (ancg[:, :, None, :] == jnp.arange(group)[:, None]).astype(attn.dtype)
    w = attn[:, :, :, None, :] * onehot[:, :, None, :, :]  # [B, K, n, J, L]
    ctx = jnp.einsum("bknjl,bjnld->bknd", w, vg)
    out = linear(params["fc"], ctx.reshape(BK, 1, n * d))
    return out + residual, KVCache(k=k, v=v)


def mha_cross_step_grouped(
    params: Dict,
    x_new: jnp.ndarray,  # [B*K, 1, D]
    mem_kv: KVCache,  # [B, n, Lk, d] — UNexpanded memory projections
    n_head: int,
    group: int,
    mem_mask_b: Optional[jnp.ndarray] = None,  # [B, Lk] bool True=attendable
) -> jnp.ndarray:
    """Cross-attention for beam decode against unexpanded memory K/V.

    The beam-expanded memory rows within a batch group are identical tiles;
    reading the [B, ...] projections once per step instead of [B*K, ...]
    cuts cross-attention HBM traffic by the beam width.
    """
    d_k = params["w_qs"]["w"].shape[1] // n_head
    residual = x_new
    qn = layer_norm(params["layer_norm"], x_new, eps=1e-6)
    qh = _split_heads(linear(params["w_qs"], qn), n_head)  # [BK, n, 1, d]
    BK = x_new.shape[0]
    B = BK // group
    qg = (qh[:, :, 0, :] / (d_k**0.5)).reshape(B, group, n_head, -1)
    scores = jnp.einsum("bknd,bnld->bknl", qg, mem_kv.k)  # [B, K, n, Lk]
    if mem_mask_b is not None:
        scores = jnp.where(mem_mask_b[:, None, None, :], scores, ATTN_MASK_FILL)
    attn = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bknl,bnld->bknd", attn, mem_kv.v)
    out = linear(params["fc"], ctx.reshape(BK, 1, -1))
    return out + residual


def decoder_layer_step_beam(
    params,
    x_new: jnp.ndarray,  # [B*K, 1, D]
    self_cache: KVCache,  # [B*K, n, L, d], never reordered
    mem_kv: KVCache,  # [B, n, Lk, d] unexpanded
    pos: jnp.ndarray,
    n_head: int,
    anc: jnp.ndarray,  # [B*K, L]
    group: int,
    mem_mask_b: Optional[jnp.ndarray] = None,  # [B, Lk]
    self_mask_k: Optional[jnp.ndarray] = None,  # [B*K, L]
) -> Tuple[jnp.ndarray, KVCache]:
    """Beam decode position through a decoder layer (eval only)."""
    y, self_cache = mha_self_step_ancestry(
        params["decslf_attn"], x_new, self_cache, pos, n_head, anc, group,
        mask_k=self_mask_k,
    )
    y = mha_cross_step_grouped(
        params["encdec_attn"], y, mem_kv, n_head, group, mem_mask_b=mem_mask_b)
    y = ffn(params["pos_ffn"], y, deterministic=True)
    return y, self_cache


def mha_cross_precompute(params: Dict, memory: jnp.ndarray, n_head: int) -> KVCache:
    """Project encoder memory K/V once for all decode steps."""
    kh = _split_heads(linear(params["w_ks"], memory), n_head)
    vh = _split_heads(linear(params["w_vs"], memory), n_head)
    return KVCache(k=kh, v=vh)


def mha_cross_step(
    params: Dict,
    x_new: jnp.ndarray,  # [B, 1, D]
    mem_kv: KVCache,
    n_head: int,
    mem_mask: Optional[jnp.ndarray] = None,  # [B, Lk] bool True=attendable
) -> jnp.ndarray:
    d_k = params["w_qs"]["w"].shape[1] // n_head
    residual = x_new
    qn = layer_norm(params["layer_norm"], x_new, eps=1e-6)
    qh = _split_heads(linear(params["w_qs"], qn), n_head)
    mask = mem_mask[:, None, None, :] if mem_mask is not None else None
    out, _ = _sdpa_nld(qh, mem_kv.k, mem_kv.v, d_k**0.5, mask=mask)
    out = linear(params["fc"], _merge_heads(out))
    return out + residual


# --------------------------------------------------------------------------
# Position-wise feed-forward
# --------------------------------------------------------------------------


def ffn_init(key, d_in: int, d_hid: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "w_1": linear_init(k1, d_in, d_hid, bias=True, dtype=dtype),
        "w_2": linear_init(k2, d_hid, d_in, bias=True, dtype=dtype),
        "layer_norm": layer_norm_init(d_in, dtype),
    }


def ffn(params, x, rng=None, dropout_rate: float = 0.0, deterministic: bool = True):
    residual = x
    y = layer_norm(params["layer_norm"], x, eps=1e-6)
    y = linear(params["w_2"], jax.nn.relu(linear(params["w_1"], y)))
    y = dropout(rng, y, dropout_rate, deterministic)
    return y + residual


# --------------------------------------------------------------------------
# Encoder / decoder layers
# --------------------------------------------------------------------------


def encoder_layer_init(key, d_model, n_head, d_ff, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    d_k = d_model // n_head
    return {
        "slf_attn": mha_init(k1, n_head, d_model, d_k, d_k, dtype),
        "pos_ffn": ffn_init(k2, d_model, d_ff, dtype),
    }


def encoder_layer(
    params, x, n_head, mask=None, prior_weight=None,
    rng=None, dropout_rate=0.0, deterministic=True,
):
    """ref: modules/layers.py:23-63 (TransformerEncoderLayer)."""
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    y, attn = mha(
        params["slf_attn"], x, x, x, n_head, mask=mask, prior_weight=prior_weight,
        rng=r1, dropout_rate=dropout_rate, deterministic=deterministic,
    )
    y = ffn(params["pos_ffn"], y, rng=r2, dropout_rate=dropout_rate,
            deterministic=deterministic)
    return y, attn


def decoder_layer_init(key, d_model, n_head, d_ff, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    d_k = d_model // n_head
    return {
        "decslf_attn": mha_init(k1, n_head, d_model, d_k, d_k, dtype),
        "encdec_attn": mha_init(k2, n_head, d_model, d_k, d_k, dtype),
        "pos_ffn": ffn_init(k3, d_model, d_ff, dtype),
    }


def decoder_layer(
    params, x, memory, n_head, self_mask=None, cross_mask=None,
    rng=None, dropout_rate=0.0, deterministic=True,
):
    """ref: modules/layers.py:66-112 (TransformerDecoderLayer)."""
    r1, r2, r3 = (jax.random.split(rng, 3) if rng is not None else (None,) * 3)
    y, att_self = mha(
        params["decslf_attn"], x, x, x, n_head, mask=self_mask,
        rng=r1, dropout_rate=dropout_rate, deterministic=deterministic,
    )
    y, att_cross = mha(
        params["encdec_attn"], y, memory, memory, n_head, mask=cross_mask,
        rng=r2, dropout_rate=dropout_rate, deterministic=deterministic,
    )
    y = ffn(params["pos_ffn"], y, rng=r3, dropout_rate=dropout_rate,
            deterministic=deterministic)
    return y, att_self, att_cross


def decoder_layer_step(
    params,
    x_new: jnp.ndarray,  # [B, 1, D]
    self_cache: KVCache,
    mem_kv: KVCache,
    pos: jnp.ndarray,
    n_head: int,
    mem_mask: Optional[jnp.ndarray] = None,
    self_mask_k: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """One incremental decode position through a decoder layer (eval only)."""
    y, self_cache = mha_self_step(
        params["decslf_attn"], x_new, self_cache, pos, n_head, mask_k=self_mask_k
    )
    y = mha_cross_step(params["encdec_attn"], y, mem_kv, n_head, mem_mask=mem_mask)
    y = ffn(params["pos_ffn"], y, deterministic=True)
    return y, self_cache
