"""Fused Pallas decode-step kernels (ops/decode_flash.py) vs the XLA path.

Runs in pallas interpret mode on CPU. Two layers of pinning:

1. decoder_layer_step_flash == decoder_layer_step_beam (the XLA ancestry
   path, itself pinned against physical reorder in test_transformer.py)
   across a simulated multi-step beam trace with random reselections.
2. End-to-end: _beam_search_flash token output == the dense XLA beam_search
   on a tiny random model.
"""

import pytest

pytestmark = pytest.mark.slow  # interpret-mode Pallas: minutes on CPU

import numpy as np

import jax
import jax.numpy as jnp

from stjep_tpu.ops.decode_flash import (
    BLOCK,
    CROSS_BLOCK,
    decoder_layer_step_flash,
    pad_len,
)
from stjep_tpu.ops.transformer import (
    KVCache,
    decoder_layer_init,
    decoder_layer_step_beam,
    mha_cross_precompute,
)
from stjep_tpu.ops.attention import linear


def _np(x):
    return np.asarray(x)


def test_flash_layer_step_matches_xla_ancestry():
    rng = np.random.RandomState(7)
    B, K, d_model, n_head, Lk = 2, 3, 16, 4, 5
    BK = B * K
    L = BLOCK  # one stream block is enough to cover 6 positions
    Lk_pad = pad_len(Lk, CROSS_BLOCK)
    d_k = d_model // n_head
    p = decoder_layer_init(jax.random.PRNGKey(0), d_model, n_head, d_model * 2)

    mem = jnp.asarray(rng.randn(B, Lk, d_model).astype(np.float32))
    mem_mask_b = np.ones((B, Lk), dtype=bool)
    mem_mask_b[:, 4:] = False

    # XLA ancestry path caches (head-split, unexpanded memory)
    mem_kv = mha_cross_precompute(p["encdec_attn"], mem, n_head)
    zeros = jnp.zeros((BK, n_head, L, d_k))
    cache_xla = KVCache(k=zeros, v=zeros)

    # flash path caches (head-merged, padded)
    mem_pad = jnp.pad(mem, ((0, 0), (0, Lk_pad - Lk), (0, 0)))
    fmem_k = linear(p["encdec_attn"]["w_ks"], mem_pad)
    fmem_v = linear(p["encdec_attn"]["w_vs"], mem_pad)
    fck = jnp.zeros((K, B, L, d_model))
    fcv = jnp.zeros((K, B, L, d_model))
    mem_mask_pad = jnp.pad(jnp.asarray(mem_mask_b),
                           ((0, 0), (0, Lk_pad - Lk)))

    anc = jnp.broadcast_to(
        (jnp.arange(BK, dtype=jnp.int32) % K)[:, None], (BK, L))
    own = (jnp.arange(BK, dtype=jnp.int32) % K)[:, None]
    mask_k = jnp.asarray(rng.rand(BK, L) > 0.2)

    for t in range(6):
        x_t = jnp.asarray(rng.randn(BK, 1, d_model).astype(np.float32))
        mk = mask_k.at[:, t].set(True)
        anc = jax.lax.dynamic_update_slice(anc, own, (0, jnp.int32(t)))

        y_xla, cache_xla = decoder_layer_step_beam(
            p, x_t, cache_xla, mem_kv, jnp.int32(t), n_head, anc, K,
            mem_mask_b=jnp.asarray(mem_mask_b), self_mask_k=mk)
        y_fl, fck, fcv = decoder_layer_step_flash(
            p, x_t, fck, fcv, fmem_k, fmem_v, jnp.int32(t), n_head, anc.T, K,
            mem_mask_pad.T, mk.T)
        np.testing.assert_allclose(
            _np(y_fl), _np(y_xla), rtol=3e-5, atol=3e-6,
            err_msg=f"step {t}")

        r_in = rng.randint(0, K, size=(BK,))
        r_idx = jnp.asarray((np.arange(BK) // K) * K + r_in, dtype=jnp.int32)
        anc = anc[r_idx]
        mask_k = mk[r_idx]
        # XLA path: the physically-indexed equivalent of the anc gather is
        # nothing at all (its ancestry is the same anc) — both paths read
        # through anc, so caches stay put in both.


def test_flash_layer_step_greedy_group1():
    """group=1 (greedy): anc is all zeros, kernel must reduce to plain
    causal cached attention."""
    from stjep_tpu.ops.transformer import decoder_layer_step

    rng = np.random.RandomState(11)
    B, d_model, n_head, Lk = 3, 16, 4, 7
    L = BLOCK
    Lk_pad = pad_len(Lk, CROSS_BLOCK)
    d_k = d_model // n_head
    p = decoder_layer_init(jax.random.PRNGKey(1), d_model, n_head, d_model * 2)

    mem = jnp.asarray(rng.randn(B, Lk, d_model).astype(np.float32))
    mem_kv = mha_cross_precompute(p["encdec_attn"], mem, n_head)
    zeros = jnp.zeros((B, n_head, L, d_k))
    cache = KVCache(k=zeros, v=zeros)

    mem_pad = jnp.pad(mem, ((0, 0), (0, Lk_pad - Lk), (0, 0)))
    fmem_k = linear(p["encdec_attn"]["w_ks"], mem_pad)
    fmem_v = linear(p["encdec_attn"]["w_vs"], mem_pad)
    fck = jnp.zeros((1, B, L, d_model))
    fcv = jnp.zeros((1, B, L, d_model))
    mem_mask_pad = jnp.pad(jnp.ones((B, Lk), bool),
                           ((0, 0), (0, Lk_pad - Lk)))
    anc = jnp.zeros((B, L), jnp.int32)
    mask_k = jnp.ones((B, L), bool)

    for t in range(5):
        x_t = jnp.asarray(rng.randn(B, 1, d_model).astype(np.float32))
        y_ref, cache = decoder_layer_step(
            p, x_t, cache, mem_kv, jnp.int32(t), n_head, self_mask_k=mask_k)
        y_fl, fck, fcv = decoder_layer_step_flash(
            p, x_t, fck, fcv, fmem_k, fmem_v, jnp.int32(t), n_head, anc.T, 1,
            mem_mask_pad.T, mask_k.T)
        np.testing.assert_allclose(
            _np(y_fl), _np(y_ref), rtol=3e-5, atol=3e-6, err_msg=f"step {t}")


def test_flash_beam_search_matches_xla_beam():
    """End-to-end token parity between the flash and XLA beam modes."""
    from stjep_tpu.config import ModelConfig
    from stjep_tpu.infer.beam import beam_search
    from stjep_tpu.models.seq2seq import init_seq2seq

    cfg = ModelConfig(
        enc_vocab_size=50, dec_vocab_size=40,
        enc_embedding_size=16, dec_embedding_size=16,
        acous_dim=8, acous_hidden_size=8,
        dim_model=16, dim_feedforward=32, num_heads=4,
        enc_layers=2, dec_layers=2, num_unilstm_dec=1,
        max_seq_len_src=12, max_seq_len_tgt=18, mode="MT",
    )
    params = init_seq2seq(jax.random.PRNGKey(2), cfg)
    rng = np.random.RandomState(5)
    B, Lk = 3, 9
    enc_out = jnp.asarray(0.3 * rng.randn(B, Lk, cfg.dim_model)
                          .astype(np.float32))
    mem_mask = np.ones((B, Lk), dtype=bool)
    mem_mask[1, 7:] = False
    mem_mask = jnp.asarray(mem_mask)

    for K in (1, 3):
        preds_x, scores_x = beam_search(
            params, cfg, enc_out, mem_mask, K, 1.0, 14, use_flash=False)
        preds_f, scores_f = beam_search(
            params, cfg, enc_out, mem_mask, K, 1.0, 14, use_flash=True)
        np.testing.assert_array_equal(_np(preds_x), _np(preds_f))
        np.testing.assert_allclose(_np(scores_x), _np(scores_f),
                                   rtol=1e-4, atol=1e-5)


def test_flash_layer_step_small_blocks(monkeypatch):
    """The big-batch block sizes (stream_blocks > 128 rows halves them)
    must produce the same numbers as the defaults."""
    import stjep_tpu.ops.decode_flash as df

    rng = np.random.RandomState(13)
    B, K, d_model, n_head, Lk = 2, 2, 16, 4, 5
    BK = B * K
    L = 2 * BLOCK
    Lk_pad = pad_len(Lk, CROSS_BLOCK)
    p = decoder_layer_init(jax.random.PRNGKey(3), d_model, n_head, d_model * 2)

    mem = jnp.asarray(rng.randn(B, Lk, d_model).astype(np.float32))
    mem_pad = jnp.pad(mem, ((0, 0), (0, Lk_pad - Lk), (0, 0)))
    fmem_k = linear(p["encdec_attn"]["w_ks"], mem_pad)
    fmem_v = linear(p["encdec_attn"]["w_vs"], mem_pad)
    mem_mask_pad = jnp.pad(jnp.ones((B, Lk), bool),
                           ((0, 0), (0, Lk_pad - Lk)))
    anc = jnp.broadcast_to(
        (jnp.arange(BK, dtype=jnp.int32) % K)[:, None], (BK, L))
    mask_k = jnp.ones((BK, L), bool)

    outs = []
    for blocks in [(BLOCK, CROSS_BLOCK), (BLOCK // 2, CROSS_BLOCK // 2)]:
        monkeypatch.setattr(df, "stream_blocks",
                            lambda n, d=512, i=4, b=blocks, **kw: b)
        fck = jnp.zeros((K, B, L, d_model))
        fcv = jnp.zeros((K, B, L, d_model))
        ys = []
        rng2 = np.random.RandomState(17)
        for t in range(BLOCK + 3):  # crosses a (halved) block boundary
            x_t = jnp.asarray(rng2.randn(BK, 1, d_model).astype(np.float32))
            y, fck, fcv = df.decoder_layer_step_flash(
                p, x_t, fck, fcv, fmem_k, fmem_v, jnp.int32(t), n_head,
                anc.T, K, mem_mask_pad.T, mask_k.T)
            ys.append(y)
        outs.append(jnp.concatenate(ys, axis=1))
    np.testing.assert_allclose(_np(outs[0]), _np(outs[1]), rtol=2e-5,
                               atol=2e-6)


def _snap_leaf_to_int8_grid(rng, leaf, s=2.0**-9):
    """Replace leaf["w"] with values EXACTLY representable under
    quantize_decoder_weights: w = q * s with integer q in [-127, 127],
    max |q| == 127 in every column (so the recomputed per-column scale is
    exactly s, a power of two -> dequantization is bit-exact)."""
    w = np.asarray(leaf["w"])
    q = rng.randint(-127, 128, size=w.shape)
    q[0, :] = 127  # pin the per-column max so scale recovers exactly s
    out = dict(leaf)
    out["w"] = jnp.asarray(q * s, jnp.float32)
    return out


def _snap_decoder_weights(params, rng):
    from stjep_tpu.ops.decode_flash import (
        QUANT_CROSS, QUANT_FFN, QUANT_SELF)

    dec = dict(params["dec_tgt"])
    layers = []
    for lp in dec["layers"]:
        nl = dict(lp)
        for sub, keys in (("decslf_attn", QUANT_SELF),
                          ("encdec_attn", QUANT_CROSS),
                          ("pos_ffn", QUANT_FFN)):
            d = dict(nl[sub])
            for k in keys:
                d[k] = _snap_leaf_to_int8_grid(rng, d[k])
            nl[sub] = d
        layers.append(nl)
    dec["layers"] = layers
    out = dict(params)
    out["dec_tgt"] = dec
    return out


def test_int8_weight_streaming_exact_on_grid():
    """weight_dtype='int8' must be TOKEN-IDENTICAL to the f32 flash path
    when the decoder weights already sit on the int8 grid: quantization is
    then lossless, so any deviation is a plumbing/kernel bug."""
    from stjep_tpu.config import ModelConfig
    from stjep_tpu.infer.beam import beam_search
    from stjep_tpu.models.seq2seq import init_seq2seq

    cfg = ModelConfig(
        enc_vocab_size=50, dec_vocab_size=40,
        enc_embedding_size=16, dec_embedding_size=16,
        acous_dim=8, acous_hidden_size=8,
        dim_model=16, dim_feedforward=32, num_heads=4,
        enc_layers=2, dec_layers=2, num_unilstm_dec=1,
        max_seq_len_src=12, max_seq_len_tgt=18, mode="MT",
    )
    params = init_seq2seq(jax.random.PRNGKey(4), cfg)
    params = _snap_decoder_weights(params, np.random.RandomState(11))
    rng = np.random.RandomState(6)
    B, Lk = 2, 9
    enc_out = jnp.asarray(0.3 * rng.randn(B, Lk, cfg.dim_model)
                          .astype(np.float32))
    mem_mask = np.ones((B, Lk), dtype=bool)
    mem_mask[1, 7:] = False
    mem_mask = jnp.asarray(mem_mask)

    for K in (1, 3):
        preds_f, scores_f = beam_search(
            params, cfg, enc_out, mem_mask, K, 1.0, 14, use_flash=True)
        preds_q, scores_q = beam_search(
            params, cfg, enc_out, mem_mask, K, 1.0, 14, use_flash=True,
            weight_dtype="int8")
        np.testing.assert_array_equal(_np(preds_f), _np(preds_q))
        np.testing.assert_allclose(_np(scores_f), _np(scores_q),
                                   rtol=1e-5, atol=1e-6)


def test_int8_weight_streaming_close_random():
    """On arbitrary weights the int8 layer step stays within quantization
    tolerance of the f32 step (per-output-channel symmetric, ~0.4% of each
    column's dynamic range per weight)."""
    import stjep_tpu.ops.decode_flash as df

    rng = np.random.RandomState(23)
    B, K, d_model, n_head, Lk = 2, 2, 16, 4, 5
    BK = B * K
    L = BLOCK
    Lk_pad = pad_len(Lk, CROSS_BLOCK)
    p = decoder_layer_init(jax.random.PRNGKey(9), d_model, n_head,
                           d_model * 2)
    pq = {"layers": [p]}
    pq = df.quantize_decoder_weights(pq)["layers"][0]

    mem = jnp.asarray(rng.randn(B, Lk, d_model).astype(np.float32))
    mem_pad = jnp.pad(mem, ((0, 0), (0, Lk_pad - Lk), (0, 0)))
    fmem_k = linear(p["encdec_attn"]["w_ks"], mem_pad)
    fmem_v = linear(p["encdec_attn"]["w_vs"], mem_pad)
    mem_mask_pad = jnp.pad(jnp.ones((B, Lk), bool),
                           ((0, 0), (0, Lk_pad - Lk)))
    anc = jnp.broadcast_to(
        (jnp.arange(BK, dtype=jnp.int32) % K)[:, None], (BK, L))
    mask_k = jnp.ones((BK, L), bool)

    fck = jnp.zeros((K, B, L, d_model))
    fcv = jnp.zeros((K, B, L, d_model))
    qck = jnp.zeros((K, B, L, d_model))
    qcv = jnp.zeros((K, B, L, d_model))
    rng2 = np.random.RandomState(29)
    for t in range(4):
        x_t = jnp.asarray(rng2.randn(BK, 1, d_model).astype(np.float32))
        y_f, fck, fcv = df.decoder_layer_step_flash(
            p, x_t, fck, fcv, fmem_k, fmem_v, jnp.int32(t), n_head,
            anc.T, K, mem_mask_pad.T, mask_k.T)
        y_q, qck, qcv = df.decoder_layer_step_flash(
            pq, x_t, qck, qcv, fmem_k, fmem_v, jnp.int32(t), n_head,
            anc.T, K, mem_mask_pad.T, mask_k.T)
        scale = float(jnp.max(jnp.abs(y_f)))
        err = float(jnp.max(jnp.abs(y_f - y_q)))
        assert err < 0.03 * scale, (t, err, scale)


def test_chain_step_matches_per_layer():
    """decode_chain_step_flash (all layers + head, ONE launch) vs the
    per-layer decoder_layer_step_flash sequence + decode_head[_gather]:
    same cores in the same order, so scores/ids/caches must agree to fp
    noise and token picks exactly — f32 and int8-quantized arms, with and
    without the gathered ref-logp output."""
    import stjep_tpu.ops.decode_flash as df
    from stjep_tpu.ops.transformer import layer_norm_init

    rng = np.random.RandomState(23)
    B, K, d_model, n_head, Lk, nl, V = 2, 3, 16, 4, 5, 2, 11
    BK = B * K
    L = BLOCK
    Lk_pad = pad_len(Lk, CROSS_BLOCK)
    layers = [
        decoder_layer_init(jax.random.PRNGKey(10 + i), d_model, n_head,
                           d_model * 2)
        for i in range(nl)
    ]
    dec_params = {"layers": layers, "norm": layer_norm_init(d_model)}
    out_params = {"w": jnp.asarray(
        0.3 * rng.randn(d_model, V).astype(np.float32))}

    mem = jnp.asarray(rng.randn(B, Lk, d_model).astype(np.float32))
    mem_pad = jnp.pad(mem, ((0, 0), (0, Lk_pad - Lk), (0, 0)))
    mem_mask_pad = jnp.pad(jnp.ones((B, Lk), bool),
                           ((0, 0), (0, Lk_pad - Lk)))
    mem_ks = [linear(lp["encdec_attn"]["w_ks"], mem_pad) for lp in layers]
    mem_vs = [linear(lp["encdec_attn"]["w_vs"], mem_pad) for lp in layers]

    for quantize, gather in [(False, False), (False, True), (True, False)]:
        dp = dec_params
        if quantize:
            dp = dict(dec_params)
            snap = np.random.RandomState(31)
            dp["layers"] = [
                {
                    "decslf_attn": {**lp["decslf_attn"], **{
                        k: _snap_leaf_to_int8_grid(snap, lp["decslf_attn"][k])
                        for k in df.QUANT_SELF}},
                    "encdec_attn": {**lp["encdec_attn"], **{
                        k: _snap_leaf_to_int8_grid(snap, lp["encdec_attn"][k])
                        for k in df.QUANT_CROSS}},
                    "pos_ffn": {**lp["pos_ffn"], **{
                        k: _snap_leaf_to_int8_grid(snap, lp["pos_ffn"][k])
                        for k in df.QUANT_FFN}},
                }
                for lp in layers
            ]
            dp_q = dict(dp)
            dp_q["layers"] = df.quantize_decoder_weights(
                {"layers": dp["layers"]})["layers"]
        stacked, got_quant = df.stack_decoder_layers(
            dp_q if quantize else dp)
        assert got_quant == quantize

        # per-layer arm state (on-grid f32 weights when quantize=True:
        # dequantization is lossless there, so the arms stay comparable)
        pl_ck = [jnp.zeros((K, B, L, d_model)) for _ in range(nl)]
        pl_cv = [jnp.zeros((K, B, L, d_model)) for _ in range(nl)]
        ch_ck = jnp.zeros((nl, K, B, L, d_model))
        ch_cv = jnp.zeros((nl, K, B, L, d_model))

        anc = jnp.broadcast_to(
            (jnp.arange(BK, dtype=jnp.int32) % K)[:, None], (BK, L))
        own = (jnp.arange(BK, dtype=jnp.int32) % K)[:, None]
        mask_k = jnp.asarray(rng.rand(BK, L) > 0.2)

        for t in range(4):
            x_t = jnp.asarray(rng.randn(BK, 1, d_model).astype(np.float32))
            mk = mask_k.at[:, t].set(True)
            anc = jax.lax.dynamic_update_slice(anc, own, (0, jnp.int32(t)))
            gid = (jnp.asarray(rng.randint(0, V, size=(BK,)), jnp.int32)
                   if gather else None)

            y = x_t
            for i in range(nl):
                y, pl_ck[i], pl_cv[i] = decoder_layer_step_flash(
                    dp["layers"][i], y, pl_ck[i], pl_cv[i],
                    mem_ks[i], mem_vs[i], jnp.int32(t), n_head, anc.T, K,
                    mem_mask_pad.T, mk.T)
            if gather:
                sc_a, id_a, glp_a = df.decode_head_gather(
                    dp["norm"], out_params, y[:, 0], K, gid)
            else:
                sc_a, id_a = df.decode_head(
                    dp["norm"], out_params, y[:, 0], K)

            outs = df.decode_chain_step_flash(
                stacked, quantize, dp["norm"], out_params, x_t,
                ch_ck, ch_cv, jnp.stack(mem_ks), jnp.stack(mem_vs),
                jnp.int32(t), n_head, anc.T, K, mem_mask_pad.T, mk.T,
                K, gather_ids=gid)
            if gather:
                sc_b, id_b, glp_b, ch_ck, ch_cv = outs
                np.testing.assert_allclose(_np(glp_a), _np(glp_b),
                                           rtol=2e-5, atol=2e-6)
            else:
                sc_b, id_b, ch_ck, ch_cv = outs

            np.testing.assert_array_equal(_np(id_a), _np(id_b),
                                          err_msg=f"step {t}")
            np.testing.assert_allclose(_np(sc_a), _np(sc_b),
                                       rtol=2e-5, atol=2e-6,
                                       err_msg=f"step {t}")
            for i in range(nl):
                np.testing.assert_allclose(
                    _np(pl_ck[i]), _np(ch_ck[i]), rtol=2e-5, atol=2e-6)
                np.testing.assert_allclose(
                    _np(pl_cv[i]), _np(ch_cv[i]), rtol=2e-5, atol=2e-6)

            r_in = rng.randint(0, K, size=(BK,))
            r_idx = jnp.asarray((np.arange(BK) // K) * K + r_in,
                                dtype=jnp.int32)
            anc = anc[r_idx]
            mask_k = mk[r_idx]
