"""Transformer layer parity: full-sequence apply vs a torch re-statement of
the reference math (ref: modules/layers.py:120-253), and KV-cache incremental
decode vs full-sequence recompute."""

import numpy as np
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from stjep_tpu.ops.transformer import (
    KVCache,
    decoder_layer,
    decoder_layer_init,
    decoder_layer_step,
    encoder_layer,
    encoder_layer_init,
    ffn,
    ffn_init,
    mha,
    mha_cross_precompute,
    mha_init,
)


def _np(x):
    return np.asarray(x)


def _torch_mha(params, q_in, k_in, v_in, n_head, mask=None):
    """Reference MHA semantics in torch (eval mode: no dropout).

    LayerNorm(eps=1e-6) on q only; -1e9 where mask==0; +residual.
    (ref: modules/layers.py:142-197)
    """
    d_model = q_in.shape[-1]
    ln = tF.layer_norm(
        q_in, (d_model,),
        torch.tensor(_np(params["layer_norm"]["scale"])),
        torch.tensor(_np(params["layer_norm"]["bias"])), eps=1e-6)
    wq = torch.tensor(_np(params["w_qs"]["w"]))
    wk = torch.tensor(_np(params["w_ks"]["w"]))
    wv = torch.tensor(_np(params["w_vs"]["w"]))
    fc = torch.tensor(_np(params["fc"]["w"]))
    b, lq, _ = q_in.shape
    lk = k_in.shape[1]
    d_k = wq.shape[1] // n_head
    q = (ln @ wq).view(b, lq, n_head, d_k).transpose(1, 2)
    k = (k_in @ wk).view(b, lk, n_head, d_k).transpose(1, 2)
    v = (v_in @ wv).view(b, lk, n_head, d_k).transpose(1, 2)
    attn = q / (d_k**0.5) @ k.transpose(2, 3)
    if mask is not None:
        attn = attn.masked_fill(mask.unsqueeze(1) == 0, -1e9)
    attn = tF.softmax(attn, dim=-1)
    out = (attn @ v).transpose(1, 2).contiguous().view(b, lq, -1) @ fc
    return out + q_in


def test_mha_matches_reference_math():
    d_model, n_head = 16, 4
    p = mha_init(jax.random.PRNGKey(0), n_head, d_model, 4, 4)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, d_model).astype(np.float32)
    mask = np.tril(np.ones((1, 5, 5), dtype=bool)) & np.ones((2, 1, 5), dtype=bool)

    out_j, _ = mha(p, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x), n_head,
                   mask=jnp.asarray(mask), deterministic=True)
    out_t = _torch_mha(p, torch.tensor(x), torch.tensor(x), torch.tensor(x),
                       n_head, mask=torch.tensor(mask))
    np.testing.assert_allclose(_np(out_j), out_t.numpy(), rtol=1e-4, atol=1e-5)


def test_ffn_matches_reference_math():
    p = ffn_init(jax.random.PRNGKey(1), 8, 32)
    x = np.random.RandomState(1).randn(2, 3, 8).astype(np.float32)
    out_j = ffn(p, jnp.asarray(x), deterministic=True)
    xt = torch.tensor(x)
    ln = tF.layer_norm(xt, (8,), torch.tensor(_np(p["layer_norm"]["scale"])),
                       torch.tensor(_np(p["layer_norm"]["bias"])), eps=1e-6)
    h = tF.relu(ln @ torch.tensor(_np(p["w_1"]["w"])) + torch.tensor(_np(p["w_1"]["b"])))
    y = h @ torch.tensor(_np(p["w_2"]["w"])) + torch.tensor(_np(p["w_2"]["b"])) + xt
    np.testing.assert_allclose(_np(out_j), y.numpy(), rtol=1e-4, atol=1e-5)


def test_encoder_layer_shapes():
    p = encoder_layer_init(jax.random.PRNGKey(0), 16, 4, 32)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 16).astype(np.float32))
    y, attn = encoder_layer(p, x, 4, deterministic=True)
    assert y.shape == (2, 5, 16)
    assert attn.shape == (2, 4, 5, 5)


def test_decoder_layer_step_matches_full():
    """Incremental KV-cache decode == full-sequence causal recompute (eval)."""
    d_model, n_head, L = 16, 4, 6
    p = decoder_layer_init(jax.random.PRNGKey(0), d_model, n_head, 32)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, L, d_model).astype(np.float32))
    mem = jnp.asarray(rng.randn(1, 7, d_model).astype(np.float32))
    mem_mask_b = np.ones((1, 7), dtype=bool)
    mem_mask_b[0, 5:] = False

    causal = jnp.asarray(np.tril(np.ones((1, L, L), dtype=bool)))
    cross = jnp.asarray(mem_mask_b[:, None, :])
    full, _, _ = decoder_layer(p, x, mem, n_head, self_mask=causal,
                               cross_mask=cross, deterministic=True)

    d_k = d_model // n_head
    cache = KVCache(k=jnp.zeros((1, n_head, L, d_k)), v=jnp.zeros((1, n_head, L, d_k)))
    mem_kv = mha_cross_precompute(p["encdec_attn"], mem, n_head)
    outs = []
    for t in range(L):
        y, cache = decoder_layer_step(
            p, x[:, t : t + 1], cache, mem_kv, jnp.int32(t), n_head,
            mem_mask=jnp.asarray(mem_mask_b))
        outs.append(y)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(_np(inc), _np(full), rtol=1e-4, atol=1e-5)


def test_attn_dropout_active_in_training():
    """Training mode must apply the hardcoded 0.1 attention dropout."""
    p = mha_init(jax.random.PRNGKey(0), 2, 8, 4, 4)
    x = jnp.ones((1, 4, 8))
    out1, _ = mha(p, x, x, x, 2, rng=jax.random.PRNGKey(1), deterministic=False)
    out2, _ = mha(p, x, x, x, 2, rng=jax.random.PRNGKey(2), deterministic=False)
    assert not np.allclose(_np(out1), _np(out2))


def test_beam_ancestry_step_matches_physical_reorder():
    """Gather-at-read beam attention == physically reordered caches.

    Simulates 6 beam steps with random reselections each step. The physical
    path gathers the K/V caches on every reselection (the old scheme); the
    ancestry path never moves cache rows and resolves the permutation at
    attention-read time. Outputs must match to fp tolerance every step.
    """
    from stjep_tpu.ops.transformer import decoder_layer_step_beam

    rng = np.random.RandomState(3)
    B, K, L, d_model, n_head, Lk = 2, 3, 8, 16, 4, 5
    BK = B * K
    d_k = d_model // n_head
    p = decoder_layer_init(jax.random.PRNGKey(0), d_model, n_head, d_model * 2)

    mem = jnp.asarray(rng.randn(B, Lk, d_model).astype(np.float32))
    mem_mask_b = np.ones((B, Lk), dtype=bool)
    mem_mask_b[:, 4:] = False
    mem_kv = mha_cross_precompute(p["encdec_attn"], mem, n_head)
    mem_kv_exp = KVCache(
        k=jnp.repeat(mem_kv.k, K, axis=0), v=jnp.repeat(mem_kv.v, K, axis=0))

    zeros = jnp.zeros((BK, n_head, L, d_k))
    cache_phys = KVCache(k=zeros, v=zeros)
    cache_anc = KVCache(k=zeros, v=zeros)
    anc = jnp.broadcast_to(
        (jnp.arange(BK, dtype=jnp.int32) % K)[:, None], (BK, L))
    own = (jnp.arange(BK, dtype=jnp.int32) % K)[:, None]
    mask_k = jnp.asarray(rng.rand(BK, L) > 0.2)
    mem_mask_exp = jnp.repeat(jnp.asarray(mem_mask_b), K, axis=0)

    for t in range(6):
        x_t = jnp.asarray(rng.randn(BK, 1, d_model).astype(np.float32))
        mk = mask_k.at[:, t].set(True)  # current position always attendable
        anc = jax.lax.dynamic_update_slice(anc, own, (0, jnp.int32(t)))

        y_phys, cache_phys = decoder_layer_step(
            p, x_t, cache_phys, mem_kv_exp, jnp.int32(t), n_head,
            mem_mask=mem_mask_exp, self_mask_k=mk)
        y_anc, cache_anc = decoder_layer_step_beam(
            p, x_t, cache_anc, mem_kv, jnp.int32(t), n_head, anc, K,
            mem_mask_b=jnp.asarray(mem_mask_b), self_mask_k=mk)
        np.testing.assert_allclose(_np(y_anc), _np(y_phys), rtol=2e-5, atol=2e-6)

        # random in-group reselection, as the k^2->k beam select does
        r_in = rng.randint(0, K, size=(BK,))
        r_idx = jnp.asarray(
            (np.arange(BK) // K) * K + r_in, dtype=jnp.int32)
        cache_phys = KVCache(k=cache_phys.k[r_idx], v=cache_phys.v[r_idx])
        anc = anc[r_idx]
        mask_k = mk[r_idx]
