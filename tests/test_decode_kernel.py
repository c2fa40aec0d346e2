"""Fused decode-step kernel vs ops.transformer.decoder_layer_step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stjep_tpu.ops.decode_kernel import decoder_layer_step_fused
from stjep_tpu.ops.transformer import (
    KVCache,
    decoder_layer_init,
    decoder_layer_step,
    mha_cross_precompute,
)
from stjep_tpu.ops.attention import linear


def test_fused_step_matches_reference_path():
    B, D, n_head, L, Lk = 2, 16, 4, 8, 6
    d = D // n_head
    lp = decoder_layer_init(jax.random.PRNGKey(0), D, n_head, 32)
    rng = np.random.RandomState(0)
    mem = jnp.asarray(rng.randn(B, Lk, D).astype(np.float32))
    mem_mask = jnp.asarray(np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]],
                                    bool))

    # reference (per-head cache) path
    cache = KVCache(k=jnp.zeros((B, n_head, L, d)), v=jnp.zeros((B, n_head, L, d)))
    mem_kv = mha_cross_precompute(lp["encdec_attn"], mem, n_head)

    # fused (head-merged cache) path
    ck = jnp.zeros((B, L, D))
    cv = jnp.zeros((B, L, D))
    mem_k = linear(lp["encdec_attn"]["w_ks"], mem)
    mem_v = linear(lp["encdec_attn"]["w_vs"], mem)

    xs = rng.randn(4, B, 1, D).astype(np.float32)
    kmask = jnp.ones((B, L), bool)
    for t in range(4):
        x = jnp.asarray(xs[t])
        y_ref, cache = decoder_layer_step(
            lp, x, cache, mem_kv, jnp.int32(t), n_head, mem_mask=mem_mask,
            self_mask_k=kmask,
        )
        y_fused, ck, cv = decoder_layer_step_fused(
            lp, x, ck, cv, mem_k, mem_v, jnp.int32(t), n_head,
            self_mask_k=kmask, mem_mask=mem_mask,
        )
        np.testing.assert_allclose(
            np.asarray(y_fused), np.asarray(y_ref), rtol=1e-4, atol=1e-5,
        )
    # cache contents equivalent (fused is head-merged)
    ck_heads = np.asarray(ck).reshape(B, L, n_head, d).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(ck_heads, np.asarray(cache.k), rtol=1e-4,
                               atol=1e-5)
