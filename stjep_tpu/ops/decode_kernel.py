"""Pallas 'decode megakernel': one fused kernel per decoder layer per step.

Motivation (ROADMAP #1): a KV-cached decode step costs ~15 XLA fusions per
layer; at decode batch sizes the per-fusion overhead dominates the actual
weight/cache traffic. This kernel fuses one decoder layer's whole step —
pre-LN -> QKV projections -> cache append -> masked self-attention ->
output projection -> residual -> pre-LN -> cross-attention over precomputed
memory K/V -> residual -> FFN -> residual — into a single pallas_call with
x resident in VMEM throughout.

Layout notes:
- caches and memory K/V are used HEAD-MERGED here: [B, L, n*d] with the
  per-head split performed inside the kernel via reshapes of VMEM blocks.
- the cache is updated functionally via input_output_aliases (the caller
  passes the cache in and receives the updated cache back, aliased in-place).
- masks: self-attention attends to positions <= pos (and non-PAD prefix via
  kmask); cross-attention uses the [B, Lk] memory mask.

This is an eval-only kernel (no dropout). It is numerically equivalent to
ops/transformer.decoder_layer_step and is verified against it in
tests/test_decode_kernel.py.

STATUS: verified prototype. It holds the full K/V caches in VMEM, which
bounds it to B*L*D*(8 bytes) + weights <~ 16 MB — fine for small/medium
decode batches, too big for the flagship beam workload (B*K=80, L=150,
D=512 -> 30 MB of cache). The production version needs L-blocked attention
with an online softmax (flash-attention style) over HBM-resident caches;
see ROADMAP.md #1. Not yet wired into the decode path.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def _kernel(pos_ref, x_ref, kmask_ref, memmask_ref,
            ln1s_ref, ln1b_ref, wq_ref, wk_ref, wv_ref, wo_ref,
            ln2s_ref, ln2b_ref, wq2_ref, wo2_ref,
            ln3s_ref, ln3b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            ck_in_ref, cv_in_ref, mk_ref, mv_ref,
            y_ref, ck_ref, cv_ref,
            *, n_head: int):
    from jax.experimental import pallas as pl

    B, D = x_ref.shape
    L = ck_in_ref.shape[1]
    Lk = mk_ref.shape[1]
    d = D // n_head
    pos = pos_ref[0]
    f32 = jnp.float32

    def ln(x, s, b):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-6) * s + b

    x = x_ref[:]  # [B, D]

    # ---- self attention ----
    xn = ln(x, ln1s_ref[:], ln1b_ref[:])
    q = jnp.dot(xn, wq_ref[:], preferred_element_type=f32)  # [B, D]
    k_new = jnp.dot(x, wk_ref[:], preferred_element_type=f32)
    v_new = jnp.dot(x, wv_ref[:], preferred_element_type=f32)

    # append to cache (aliased output)
    ck_ref[:] = ck_in_ref[:]
    cv_ref[:] = cv_in_ref[:]
    ck_ref[:, pl.ds(pos, 1), :] = k_new[:, None, :]
    cv_ref[:, pl.ds(pos, 1), :] = v_new[:, None, :]

    # attention over the cache, per head, via reshape [B, L, n, d]
    kc = ck_ref[:].reshape(B, L, n_head, d)
    vc = cv_ref[:].reshape(B, L, n_head, d)
    qh = q.reshape(B, n_head, d)
    # scores [B, n, L]
    scores = jnp.einsum("bnd,blnd->bnl", qh / (d**0.5), kc)
    valid = (jax.lax.broadcasted_iota(jnp.int32, (B, 1, L), 2) <= pos)
    valid = valid & (kmask_ref[:][:, None, :] > 0)
    scores = jnp.where(valid, scores, -1e9)
    attn = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bnl,blnd->bnd", attn, vc).reshape(B, D)
    x = x + jnp.dot(ctx, wo_ref[:], preferred_element_type=f32)

    # ---- cross attention ----
    xn = ln(x, ln2s_ref[:], ln2b_ref[:])
    q2 = jnp.dot(xn, wq2_ref[:], preferred_element_type=f32).reshape(B, n_head, d)
    mk = mk_ref[:].reshape(B, Lk, n_head, d)
    mv = mv_ref[:].reshape(B, Lk, n_head, d)
    scores2 = jnp.einsum("bnd,blnd->bnl", q2 / (d**0.5), mk)
    mvalid = memmask_ref[:][:, None, :] > 0
    scores2 = jnp.where(mvalid, scores2, -1e9)
    attn2 = jax.nn.softmax(scores2, axis=-1)
    ctx2 = jnp.einsum("bnl,blnd->bnd", attn2, mv).reshape(B, D)
    x = x + jnp.dot(ctx2, wo2_ref[:], preferred_element_type=f32)

    # ---- FFN ----
    xn = ln(x, ln3s_ref[:], ln3b_ref[:])
    h = jnp.maximum(
        jnp.dot(xn, w1_ref[:], preferred_element_type=f32) + b1_ref[:], 0.0)
    x = x + jnp.dot(h, w2_ref[:], preferred_element_type=f32) + b2_ref[:]
    y_ref[:] = x


def decoder_layer_step_fused(
    lp: Dict,
    x_new: jnp.ndarray,  # [B, 1, D]
    cache_k: jnp.ndarray,  # [B, L, D] head-merged
    cache_v: jnp.ndarray,
    mem_k: jnp.ndarray,  # [B, Lk, D] head-merged
    mem_v: jnp.ndarray,
    pos: jnp.ndarray,
    n_head: int,
    self_mask_k: Optional[jnp.ndarray] = None,  # [B, L] bool
    mem_mask: Optional[jnp.ndarray] = None,  # [B, Lk] bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (y [B,1,D], new cache_k, new cache_v). Eval only."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import functools

    B, _, D = x_new.shape
    L = cache_k.shape[1]
    Lk = mem_k.shape[1]
    f32 = jnp.float32

    if self_mask_k is None:
        self_mask_k = jnp.ones((B, L), bool)
    if mem_mask is None:
        mem_mask = jnp.ones((B, Lk), bool)

    sa = lp["decslf_attn"]
    ca = lp["encdec_attn"]
    ff = lp["pos_ffn"]
    args = (
        jnp.asarray(pos, jnp.int32).reshape(1),
        x_new[:, 0, :].astype(f32),
        self_mask_k.astype(jnp.int32),
        mem_mask.astype(jnp.int32),
        sa["layer_norm"]["scale"], sa["layer_norm"]["bias"],
        sa["w_qs"]["w"], sa["w_ks"]["w"], sa["w_vs"]["w"], sa["fc"]["w"],
        ca["layer_norm"]["scale"], ca["layer_norm"]["bias"],
        ca["w_qs"]["w"], ca["fc"]["w"],
        ff["layer_norm"]["scale"], ff["layer_norm"]["bias"],
        ff["w_1"]["w"], ff["w_1"]["b"], ff["w_2"]["w"], ff["w_2"]["b"],
        cache_k, cache_v, mem_k, mem_v,
    )
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [smem1] + [vmem() for _ in range(len(args) - 1)]
    out_shape = (
        jax.ShapeDtypeStruct((B, D), f32),
        jax.ShapeDtypeStruct((B, L, D), cache_k.dtype),
        jax.ShapeDtypeStruct((B, L, D), cache_v.dtype),
    )
    y, ck, cv = pl.pallas_call(
        functools.partial(_kernel, n_head=n_head),
        in_specs=in_specs,
        out_specs=(vmem(), vmem(), vmem()),
        out_shape=out_shape,
        input_output_aliases={20: 1, 21: 2},  # cache_k/v aliased in-place
        interpret=jax.default_backend() == "cpu",
    )(*args)
    return y[:, None, :], ck, cv
