"""Batched beam search fully on device: lax.while_loop + KV-cache reorder.

Replicates the reference's k^2 -> k beam update exactly
(ref: models/Seq2seq.py:307-393 _prep_translate/_step_translate), including
its quirks, so decode output lines match token-for-token:

- EOS freezing: a finished beam contributes exactly one candidate (column 0
  gets +0, the rest -1e9) (ref: Seq2seq.py:361-365)
- length penalty: candidates are ranked by score / len_map^penalty, then the
  kept score is multiplied back by the PRE-selection slot's len_map^penalty
  (the reference multiplies in the old beam order, ref: Seq2seq.py:371)
- len_map / eos_mask are SLOT-indexed and are NOT reordered on beam
  reselection (the reference never gathers them, ref: Seq2seq.py:383-387)
- prefix back-copy on reselection (ref: Seq2seq.py:378) becomes a gather of
  both the token buffer and the per-layer self-attention KV caches — the
  reference gets this implicitly by re-running the whole prefix every step,
  at O(L^2) cost; here each step is O(1) in prefix length.

The final output equals the reference's `preds.reshape(b, -1)[:, :max_len]`
after detokenisation (which stops at the first </s>): we return beam 0 (the
top-scoring beam) per batch, PAD-padded.

Two execution modes share the bookkeeping above:

- XLA mode (`use_flash=False`, the CPU/parity default): dense KV-cache ops,
  physical cache reorder on reselection. Token-identical to the reference.
- Flash mode (`use_flash=True`, auto-selected on TPU): the fused Pallas
  decode kernels (ops/decode_flash.py) — caches live in HBM head-merged,
  are updated in place, never reordered (gather-at-read ancestry indices
  are carried instead and resolved inside the attention kernel), and each
  step streams only the live cache prefix. ~1 ulp numerical difference from
  the XLA path (online softmax), pinned by tests/test_decode_flash.py.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from stjep_tpu.config import BOS, EOS, PAD, ModelConfig
from stjep_tpu.models.tf_decoder import (
    TFDecCache,
    tf_decoder_init_cache,
    tf_decoder_init_cache_flash,
    tf_decoder_step_flash,
)


class BeamState(NamedTuple):
    i: jnp.ndarray  # next slot to write (starts 1)
    preds: jnp.ndarray  # [B*K, L] tokens; [:,0]=BOS, rest init PAD
    scores: jnp.ndarray  # [B*K] cumulative scores (scores_expand)
    eos_mask: jnp.ndarray  # [B*K] bool, slot-indexed
    len_map: jnp.ndarray  # [B*K] float, slot-indexed
    cache: TFDecCache


def _expand_beam(x: jnp.ndarray, beam_width: int) -> jnp.ndarray:
    """a b c -> aaa bbb ccc on the batch axis (ref: Seq2seq.py:318-331)."""
    B = x.shape[0]
    reps = (1, beam_width) + (1,) * (x.ndim - 1)
    return jnp.tile(x[:, None], reps).reshape((B * beam_width,) + x.shape[1:])


def beam_search(
    params: Dict,
    cfg: ModelConfig,
    enc_outputs: jnp.ndarray,  # [B, Lk, D]
    mem_mask_b: Optional[jnp.ndarray],  # [B, Lk] bool True=attend, or None
    beam_width: int,
    penalty_factor: float,
    max_seq_len: int,
    cache_dtype=None,
    use_flash: Optional[bool] = None,
    weight_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (preds [B, max_seq_len] best-beam tokens BOS-first PAD-padded,
    scores [B]). use_flash=None auto-selects the fused Pallas kernels on
    TPU and the dense XLA path elsewhere (STJEP_FORCE_FLASH=1 forces the
    kernels in interpret mode on CPU, used by the oracle parity suite).
    weight_dtype='int8' streams quantized decoder weights in the flash
    path (serving-latency mode; see ops/decode_flash.py) — it requires the
    fused kernels and raises otherwise."""
    if use_flash is None:
        from stjep_tpu.parallel.spmd import decode_flash_auto

        use_flash = decode_flash_auto(cfg)
    if weight_dtype in ("int8", jnp.int8) and not use_flash:
        raise ValueError(
            "weight_dtype='int8' needs the fused decode kernels "
            "(dim_model %% 128 == 0 and flash not disabled)")
    if use_flash:
        from stjep_tpu.parallel.spmd import beam_search_flash_dp

        return beam_search_flash_dp(
            params, cfg, enc_outputs, mem_mask_b, beam_width, penalty_factor,
            max_seq_len, cache_dtype=cache_dtype, weight_dtype=weight_dtype)
    B = enc_outputs.shape[0]
    K = beam_width
    BK = B * K

    from stjep_tpu.models.seq2seq import _decode_pos, _needs_full_rerun

    enc_expand = _expand_beam(enc_outputs, K)  # [B*K, Lk, D]
    mem_mask = _expand_beam(mem_mask_b, K) if mem_mask_b is not None else None
    max_time = max(max_seq_len, 500)

    full_rerun = _needs_full_rerun(cfg)
    # ACT models never read the cache (full causal re-run per step): skip
    # allocating, carrying, and reordering the per-layer K/V buffers
    cache = (None if full_rerun else tf_decoder_init_cache(
        params["dec_tgt"], cfg, enc_expand, max_seq_len,
        cache_dtype=cache_dtype))
    preds = jnp.full((BK, max_seq_len), PAD, jnp.int32).at[:, 0].set(BOS)
    batch_offset = (jnp.arange(B) * (K * K))[:, None]  # [B,1]

    def topk_step(state: BeamState):
        logp, cache = _decode_pos(
            params, cfg, state.preds, state.cache, state.i - 1, mem_mask,
            max_time, enc_memory=enc_expand,
        )
        score_k, pred_k = jax.lax.top_k(logp, K)  # [B*K, K]
        return score_k, pred_k.astype(jnp.int32), cache

    def finish_step(state, pred_select, scores, preds, cache):
        """Common tail: eos/len bookkeeping (ref: Seq2seq.py:382-391)."""
        eos_mask = state.eos_mask | (pred_select == EOS)
        len_map = state.len_map + jnp.where(eos_mask, 0.0, 1.0)
        return BeamState(
            i=state.i + 1, preds=preds, scores=scores, eos_mask=eos_mask,
            len_map=len_map, cache=cache,
        )

    # ---- step i == 1: keep beam 0's K candidates (ref: Seq2seq.py:349-356)
    state = BeamState(
        i=jnp.int32(1), preds=preds,
        scores=jnp.zeros((BK,), jnp.float32),
        eos_mask=jnp.zeros((BK,), bool),
        len_map=jnp.ones((BK,), jnp.float32),
        cache=cache,
    )
    score_k, pred_k, cache1 = topk_step(state)
    score_sel = score_k.reshape(B, -1)[:, :K].reshape(-1)
    pred_sel = pred_k.reshape(B, -1)[:, :K].reshape(-1)
    scores = state.scores + score_sel
    preds1 = state.preds.at[:, 1].set(pred_sel)
    state = finish_step(state, pred_sel, scores, preds1, cache1)

    # ---- steps i >= 2
    def cond(s: BeamState):
        return (s.i < max_seq_len) & (~jnp.all(s.eos_mask))

    def body(s: BeamState):
        score_k, pred_k, cache = topk_step(s)

        # k^2 -> k selection (ref: Seq2seq.py:358-380)
        eos_col = jnp.zeros((BK, K), bool).at[:, 1:].set(s.eos_mask[:, None])
        score_masked = jnp.where(s.eos_mask[:, None], 0.0, score_k)
        score_masked = jnp.where(eos_col, -1e9, score_masked)
        score_temp = s.scores[:, None] + score_masked
        score_temp = score_temp / (s.len_map[:, None] ** penalty_factor)

        score_sel, pos = jax.lax.top_k(score_temp.reshape(B, K * K), K)  # [B,K]
        # the reference multiplies back by the OLD slot-order penalty
        # (ref: Seq2seq.py:371)
        scores = score_sel.reshape(-1) * (s.len_map**penalty_factor)

        pos_g = pos + batch_offset  # global candidate index [B,K]
        r_idx = (pos_g // K).reshape(-1)  # source row in [B*K)
        c_idx = (pos_g % K).reshape(-1)
        pred_sel = pred_k[r_idx, c_idx]

        # prefix back-copy + KV-cache reorder
        preds = s.preds[r_idx]
        preds = jax.lax.dynamic_update_index_in_dim(preds, pred_sel, s.i, axis=1)
        if full_rerun:
            pass  # no cache to reorder (full causal re-run reads s.preds)
        elif cache.self_k[0].dtype == jnp.bfloat16:
            # XLA's row gather is slow here (~15 GB/s effective); a one-hot
            # matmul rides the otherwise-idle MXU at ~3x the speed. For bf16
            # caches the matmul (f32 accumulate, cast back) reproduces each
            # value exactly, so this is still an exact permutation.
            onehot = (r_idx[:, None] == jnp.arange(BK)[None, :])

            def _mm(c):
                return jnp.einsum("sr,r...->s...", onehot.astype(c.dtype), c)

            cache = cache._replace(
                self_k=tuple(_mm(k) for k in cache.self_k),
                self_v=tuple(_mm(v) for v in cache.self_v),
            )
        else:
            # f32 parity mode: exact gather (token-identical to the
            # reference; a one-hot matmul would round through bf16)
            cache = cache._replace(
                self_k=tuple(k[r_idx] for k in cache.self_k),
                self_v=tuple(v[r_idx] for v in cache.self_v),
            )
        return finish_step(s, pred_sel, scores, preds, cache)

    final = jax.lax.while_loop(cond, body, state)

    preds_out = final.preds.reshape(B, K, max_seq_len)[:, 0, :]
    scores_out = final.scores.reshape(B, K)[:, 0]
    return preds_out, scores_out


class FlashBeamState(NamedTuple):
    i: jnp.ndarray
    preds: jnp.ndarray  # [B*K, Lbuf]
    scores: jnp.ndarray
    eos_mask: jnp.ndarray
    len_map: jnp.ndarray
    anc: jnp.ndarray  # [Lbuf, B*K] int32 gather-at-read ancestry (transposed)
    cache: TFDecCache  # head-merged flash layout, never reordered


class _MegaState(NamedTuple):
    """Carry of the single-launch beam megastep (ops/decode_flash.
    decode_beam_step_flash): kernel-friendly layouts so the while body is
    exactly one pallas_call plus carry threading."""
    i: jnp.ndarray
    preds: jnp.ndarray  # [B*K, Lbuf] i32
    anc: jnp.ndarray  # [Lbuf, B*K] i32
    maskk: jnp.ndarray  # [Lbuf, B*K] i32 == (preds != PAD).T
    last_tok: jnp.ndarray  # [B*K, 1] i32
    scores: jnp.ndarray  # [B*K, 1] f32
    eos: jnp.ndarray  # [B*K, 1] i32
    lenm: jnp.ndarray  # [B*K, 1] f32
    flag: jnp.ndarray  # [1, 1] i32 all-EOS
    cache: TFDecCache


def _beam_search_flash(
    params: Dict,
    cfg: ModelConfig,
    enc_outputs: jnp.ndarray,
    mem_mask_b: Optional[jnp.ndarray],
    beam_width: int,
    penalty_factor: float,
    max_seq_len: int,
    cache_dtype=None,
    tp_axis: Optional[str] = None,
    weight_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam search over the fused Pallas decode kernels.

    Identical k^2->k bookkeeping to the XLA path above; differences are all
    in the cache plumbing: buffers are padded to the kernel stream block,
    the KV caches are never reordered (the `anc` carry records each
    hypothesis's per-position ancestor row and the attention kernel resolves
    it at read time), and cross-attention memory stays unexpanded.

    tp_axis (inside a tensor-parallel shard_map, parallel/spmd.py) runs the
    per-layer TP kernel trio and the vocab-sharded decode head; the beam
    bookkeeping operates on psum-joined quantities identical on every model
    shard, so selection/EOS control flow stays in lockstep."""
    from stjep_tpu.models.seq2seq import _embed_tgt_token
    from stjep_tpu.ops.decode_flash import BLOCK, CROSS_BLOCK, pad_len

    if weight_dtype in ("int8", jnp.int8):
        # serving-latency mode: quantize the per-step-streamed decoder
        # weights once (outside the while_loop), quartering the dominant
        # weight HBM traffic at small batches. Beams are no longer
        # guaranteed line-identical to the f32 oracle — opt-in only.
        assert tp_axis is None, "int8 weight streaming: TP meshes keep f32"
        from stjep_tpu.ops.decode_flash import quantize_decoder_weights

        params = dict(params)
        params["dec_tgt"] = quantize_decoder_weights(params["dec_tgt"])

    B, Lk, _ = enc_outputs.shape
    K = beam_width
    BK = B * K
    Lbuf = pad_len(max_seq_len, BLOCK)
    Lk_pad = pad_len(Lk, CROSS_BLOCK)
    max_time = max(max_seq_len, 500)

    if mem_mask_b is None:
        mem_mask_b = jnp.ones((B, Lk), bool)
    mem_mask_t = jnp.pad(mem_mask_b, ((0, 0), (0, Lk_pad - Lk))).T

    from stjep_tpu.ops.decode_flash import chain_supported

    use_chain = tp_axis is None and chain_supported(cfg)
    if use_chain:
        from stjep_tpu.models.tf_decoder import (
            tf_decoder_chain_step,
            tf_decoder_init_cache_chain,
        )

        cache = tf_decoder_init_cache_chain(
            params["dec_tgt"], cfg, enc_outputs, max_seq_len, K,
            cache_dtype=cache_dtype)
    else:
        cache = tf_decoder_init_cache_flash(
            params["dec_tgt"], cfg, enc_outputs, max_seq_len, K,
            cache_dtype=cache_dtype)
    preds = jnp.full((BK, Lbuf), PAD, jnp.int32).at[:, 0].set(BOS)
    batch_offset = (jnp.arange(B) * (K * K))[:, None]
    own_row = (jnp.arange(BK, dtype=jnp.int32) % K)[None, :]  # [1, BK]

    def decode_pos(s: FlashBeamState):
        from stjep_tpu.ops.decode_flash import decode_head
        from stjep_tpu.ops.decode_flash_tp import decode_head_tp

        pos = s.i - 1
        tok = jax.lax.dynamic_index_in_dim(s.preds, pos, axis=1, keepdims=False)
        emb = _embed_tgt_token(params, cfg, tok)[:, None, :]
        if use_chain:
            # whole position (all layers + head) in ONE pallas launch
            return tf_decoder_chain_step(
                params["dec_tgt"], params["out_tgt"], cfg, emb, s.cache,
                pos, s.anc, K, mem_mask_t, (s.preds != PAD).T, K,
                max_time=max_time)
        dec_out, cache = tf_decoder_step_flash(
            params["dec_tgt"], cfg, emb, s.cache, pos, s.anc, K,
            mem_mask_t, (s.preds != PAD).T, max_time=max_time,
            final_norm=False, tp_axis=tp_axis)
        # fused head: final LN + out projection + log_softmax + top-k
        if tp_axis is not None:
            score_k, pred_k = decode_head_tp(
                params["dec_tgt"]["norm"], params["out_tgt"], dec_out[:, 0],
                K, tp_axis)
        else:
            score_k, pred_k = decode_head(
                params["dec_tgt"]["norm"], params["out_tgt"], dec_out[:, 0],
                K)
        return score_k, pred_k, cache

    def finish_step(state, pred_select, scores, preds, anc, cache):
        eos_mask = state.eos_mask | (pred_select == EOS)
        len_map = state.len_map + jnp.where(eos_mask, 0.0, 1.0)
        return FlashBeamState(
            i=state.i + 1, preds=preds, scores=scores, eos_mask=eos_mask,
            len_map=len_map, anc=anc, cache=cache,
        )

    # step i == 1: keep beam 0's K candidates; ancestry stays all-self
    # (every row's position-0 BOS K/V is identical within its group)
    state = FlashBeamState(
        i=jnp.int32(1), preds=preds,
        scores=jnp.zeros((BK,), jnp.float32),
        eos_mask=jnp.zeros((BK,), bool),
        len_map=jnp.ones((BK,), jnp.float32),
        anc=jnp.broadcast_to(own_row, (Lbuf, BK)),
        cache=cache,
    )
    score_k, pred_k, cache1 = decode_pos(state)
    score_sel = score_k.reshape(B, -1)[:, :K].reshape(-1)
    pred_sel = pred_k.reshape(B, -1)[:, :K].reshape(-1)
    scores = state.scores + score_sel
    preds1 = state.preds.at[:, 1].set(pred_sel)
    state = finish_step(state, pred_sel, scores, preds1, state.anc, cache1)

    # beam megastep: the whole while body (embed -> layers -> head ->
    # k^2->k bookkeeping) in ONE pallas launch — at B=1 the inter-launch
    # XLA glue dominates the step. Gated to chain mode, no dec-side
    # embedding projection (the in-kernel one-hot lookup IS nn.Embedding),
    # and a VMEM-friendly target table (char-level vocabs; big word-level
    # tables would be re-streamed every launch).
    from stjep_tpu.ops.decode_flash import (
        decode_beam_step_flash,
        stack_decoder_layers,
    )
    from stjep_tpu.models.seq2seq import _dec_embedder

    emb_table = _dec_embedder(params, cfg)
    use_mega = (use_chain and not cfg.dec_emb_proj_flag
                and emb_table.size * 4 <= 4 * 1024 * 1024)
    if use_mega:
        from stjep_tpu.ops.masks import position_signal

        stacked, quant = stack_decoder_layers(params["dec_tgt"])
        tsig = position_signal(max_time, cfg.dim_model)[0]
        mm_i = mem_mask_t.astype(jnp.int32)

        ms = _MegaState(
            i=state.i,
            preds=state.preds,
            anc=state.anc,
            maskk=(state.preds != PAD).T.astype(jnp.int32),
            last_tok=pred_sel[:, None].astype(jnp.int32),
            scores=state.scores[:, None],
            eos=state.eos_mask[:, None].astype(jnp.int32),
            lenm=state.len_map[:, None],
            flag=jnp.min(state.eos_mask.astype(jnp.int32)).reshape(1, 1),
            cache=state.cache,
        )

        def mcond(s: _MegaState):
            return (s.i < max_seq_len) & (s.flag[0, 0] == 0)

        def mbody(s: _MegaState):
            (preds_n, anc_n, maskk_n, tok_n, sc_n, eos_n, lenm_n, flag_n,
             ck, cv) = decode_beam_step_flash(
                stacked, quant, params["dec_tgt"]["norm"],
                params["out_tgt"], emb_table, tsig, s.i, s.last_tok,
                s.preds, s.anc, s.maskk, mm_i, s.scores, s.eos, s.lenm,
                s.cache.self_k, s.cache.self_v,
                s.cache.mem_k, s.cache.mem_v,
                cfg.num_heads, K, penalty_factor)
            return _MegaState(
                i=s.i + 1, preds=preds_n, anc=anc_n, maskk=maskk_n,
                last_tok=tok_n, scores=sc_n, eos=eos_n, lenm=lenm_n,
                flag=flag_n,
                cache=s.cache._replace(self_k=ck, self_v=cv))

        mfinal = jax.lax.while_loop(mcond, mbody, ms)
        preds_out = mfinal.preds.reshape(B, K, Lbuf)[:, 0, :max_seq_len]
        scores_out = mfinal.scores[:, 0].reshape(B, K)[:, 0]
        return preds_out, scores_out

    def cond(s: FlashBeamState):
        return (s.i < max_seq_len) & (~jnp.all(s.eos_mask))

    def body(s: FlashBeamState):
        # position i-1's K/V is written into each row itself this step
        anc = jax.lax.dynamic_update_slice(s.anc, own_row, (s.i - 1, 0))
        s = s._replace(anc=anc)
        score_k, pred_k, cache = decode_pos(s)

        eos_col = jnp.zeros((BK, K), bool).at[:, 1:].set(s.eos_mask[:, None])
        score_masked = jnp.where(s.eos_mask[:, None], 0.0, score_k)
        score_masked = jnp.where(eos_col, -1e9, score_masked)
        score_temp = s.scores[:, None] + score_masked
        score_temp = score_temp / (s.len_map[:, None] ** penalty_factor)

        score_sel, pos = jax.lax.top_k(score_temp.reshape(B, K * K), K)
        scores = score_sel.reshape(-1) * (s.len_map**penalty_factor)

        pos_g = pos + batch_offset
        r_idx = (pos_g // K).reshape(-1)
        c_idx = (pos_g % K).reshape(-1)
        pred_sel = pred_k[r_idx, c_idx]

        # prefix back-copy: tokens + ancestry only; the caches stay put
        preds = s.preds[r_idx]
        preds = jax.lax.dynamic_update_index_in_dim(preds, pred_sel, s.i, axis=1)
        anc = anc[:, r_idx]
        return finish_step(s, pred_sel, scores, preds, anc, cache)

    final = jax.lax.while_loop(cond, body, state)

    preds_out = final.preds.reshape(B, K, Lbuf)[:, 0, :max_seq_len]
    scores_out = final.scores.reshape(B, K)[:, 0]
    return preds_out, scores_out
