"""Composite Seq2seq: LAS (ASR) + Transformer (MT) with embedding passing.

Rebuild of the reference Seq2seq (ref: models/Seq2seq.py:23-914):

- src/tgt embedders, optional shared embedder
- the static+dynamic concat projection `enc_emb_proj` — ALWAYS created and
  applied; the reference's flag is dead because the ctor overwrites it with
  the module (ref: Seq2seq.py:123-125). Preserved as always-on.
- LAS submodel iff ASR/ST in mode-loadmode; transformer enc/dec + out_tgt iff
  ST/MT (ref: Seq2seq.py:143-180); AE head shares the LAS output layer
  (ref: Seq2seq.py:172-173) so it needs no extra params here.
- EMB_DYN_AVE: the precomputed average dynamic embedding the reference loads
  from a hardcoded npy path at ctor time (ref: Seq2seq.py:64-66) is an
  explicit, checkpointed buffer `params['emb_dyn_ave']` here, settable from
  the gather_emb artifact (translate CLI mode 3).

Each mode's forward is a pure function of (params, batch, rng), jit-compiled
once per mode; greedy eval runs as a lax.while_loop over a KV-cached
transformer decoder instead of the reference's O(L^2) full-prefix re-runs
(ref: Seq2seq.py:577-586).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from stjep_tpu.config import BOS, EOS, PAD, ModelConfig
from stjep_tpu.models.las import las_forward, las_init
from stjep_tpu.models.las_decoder import embed, embedding_init
from stjep_tpu.models.tf_decoder import (
    UPPERBOUND_SEQ_LEN,
    tf_decoder_forward,
    tf_decoder_init,
    tf_decoder_init_cache,
    tf_decoder_step,
)
from stjep_tpu.models.tf_encoder import tf_encoder_forward, tf_encoder_init
from stjep_tpu.ops.attention import linear, linear_init
from stjep_tpu.ops.masks import pad_mask, subsequent_mask
from stjep_tpu.ops.transformer import dropout


def init_seq2seq(key, cfg: ModelConfig, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, 8)
    params: Dict = {}

    params["enc_embedder"] = embedding_init(
        keys[0], cfg.enc_vocab_size, cfg.enc_embedding_size, dtype
    )
    if cfg.share_embedder:
        assert cfg.enc_vocab_size == cfg.dec_vocab_size
        # the reference aliases enc_embedder = dec_embedder — ONE parameter
        # receiving the summed gradient (ref: Seq2seq.py:119-121). Pytrees
        # can't alias, so _dec_embedder() reads the enc leaf at apply time;
        # this dec leaf is kept only for checkpoint/converter layout
        # stability (unused, untrained — zero grads).
        # jnp.copy: a distinct buffer, not the same Array object — the
        # donating train step cannot donate one buffer through two leaves
        params["dec_embedder"] = jnp.copy(params["enc_embedder"])
    else:
        params["dec_embedder"] = embedding_init(
            keys[1], cfg.dec_vocab_size, cfg.dec_embedding_size, dtype
        )

    # static+dynamic -> dim_model, always created (ref: Seq2seq.py:123-125)
    params["enc_emb_proj"] = linear_init(
        keys[2], cfg.enc_embedding_size + cfg.dim_model, cfg.dim_model,
        bias=False, dtype=dtype,
    )
    if cfg.dec_emb_proj_flag:
        params["dec_emb_proj"] = linear_init(
            keys[3], cfg.dec_embedding_size, cfg.dim_model, bias=False, dtype=dtype
        )

    if cfg.has_las:
        params["las"] = las_init(keys[4], cfg, dtype)

    if cfg.has_transformer:
        params["enc_src"] = tf_encoder_init(keys[5], cfg, dtype)
        params["dec_tgt"] = tf_decoder_init(keys[6], cfg, dtype)
        params["out_tgt"] = linear_init(
            keys[7], cfg.dim_model, cfg.dec_vocab_size, bias=False, dtype=dtype
        )

    # average dynamic embedding buffer (ref: Seq2seq.py:64-66); non-trainable
    params["emb_dyn_ave"] = jnp.zeros((cfg.dim_model,), dtype)
    return params


# --------------------------------------------------------------------------
# shared helpers (ref: Seq2seq.py:183-257)
# --------------------------------------------------------------------------


def _get_src_emb(params, cfg: ModelConfig, src, emb_src_dyn, rng=None,
                 is_training: bool = False):
    """(src_mask [B,L,L], emb_src [B,L,D], src_mask_input [B,1,L]).

    ref: Seq2seq.py:183-199. emb_src = proj([static ; dynamic])."""
    src_mask_input = pad_mask(src)  # [B, 1, L]
    src_mask = src_mask_input & subsequent_mask(src.shape[-1])  # [B, L, L]
    emb_static = embed(params["enc_embedder"], src)
    # the fused LAS kernels emit f32 dynamic-embedding streams; under bf16
    # params an f32 half here would promote the concat — and with it every
    # downstream transformer activation — back to f32 (measured: f32 attn
    # probs/dropout masks in the "bf16" train profile). Match the static
    # half's dtype; a no-op in f32 mode.
    emb_comb = jnp.concatenate(
        [emb_static, emb_src_dyn.astype(emb_static.dtype)], axis=2)
    if is_training and cfg.embedding_dropout > 0.0 and rng is not None:
        emb_comb = dropout(rng, emb_comb, cfg.embedding_dropout, False)
    emb_src = linear(params["enc_emb_proj"], emb_comb)
    return src_mask, emb_src, src_mask_input


def _dec_embedder(params, cfg: ModelConfig):
    """Target embedding table. With share_embedder the reference ties
    enc/dec to ONE nn.Embedding (summed gradients, ref: Seq2seq.py:119-121);
    reading the enc leaf here keeps that tying under plain optax — the
    duplicated dec leaf exists only for checkpoint layout."""
    return params["enc_embedder"] if cfg.share_embedder else params["dec_embedder"]


def _get_tgt_emb(params, cfg: ModelConfig, tgt, rng=None, is_training=False):
    """(tgt_mask [B,L,L], emb_tgt [B,L,D]) — ref: Seq2seq.py:202-211."""
    tgt_mask = pad_mask(tgt) & subsequent_mask(tgt.shape[-1])
    e = embed(_dec_embedder(params, cfg), tgt)
    if is_training and cfg.embedding_dropout > 0.0 and rng is not None:
        e = dropout(rng, e, cfg.embedding_dropout, False)
    if cfg.dec_emb_proj_flag:
        e = linear(params["dec_emb_proj"], e)
    return tgt_mask, e


def _embed_tgt_token(params, cfg: ModelConfig, token):
    """Single-position target embedding for incremental decode."""
    e = embed(_dec_embedder(params, cfg), token)
    if cfg.dec_emb_proj_flag:
        e = linear(params["dec_emb_proj"], e)
    return e


def _pre_proc_src(src):
    """Drop initial BOS to align with LAS decoder output
    (ref: Seq2seq.py:214-219)."""
    return src[:, 1:]


def _encoder_acous(params, cfg: ModelConfig, acous_feats, acous_lens,
                   tgt=None, is_training=False, teacher_forcing=False,
                   teacher_forcing_ratio=None, rng=None, max_seq_len=None,
                   lm_fuse=None, ref_tokens=None, want_logps=True,
                   flash_ok=False):
    """LAS pass -> (dynamic embs, logps, preds, lengths)
    (ref: Seq2seq.py:222-230). teacher_forcing_ratio, when given, overrides
    the static bool with the reference's per-batch coin (ref: Dec.py:196).
    ref_tokens/want_logps: see las_decoder_forward (picked logps in the
    logps slot / pruned logps + fused free-running kernel on TPU)."""
    return las_forward(
        params["las"], cfg, acous_feats, acous_lens=acous_lens, tgt=tgt,
        use_teacher_forcing=teacher_forcing,
        teacher_forcing_ratio=teacher_forcing_ratio, max_seq_len=max_seq_len,
        rng=rng, is_training=is_training, lm_fuse=lm_fuse,
        ref_tokens=ref_tokens, want_logps=want_logps, flash_ok=flash_ok,
    )


def _encoder_en(params, cfg, emb_src, src_mask=None, rng=None,
                is_training=False, max_time: int = UPPERBOUND_SEQ_LEN):
    out, _ = tf_encoder_forward(
        params["enc_src"], cfg, emb_src, src_mask=src_mask, rng=rng,
        is_training=is_training, max_time=max_time,
    )
    return out


def _decoder_de(params, cfg, emb_tgt, enc_outputs, tgt_mask=None,
                src_mask=None, rng=None, is_training=False,
                max_time: int = UPPERBOUND_SEQ_LEN, ref_pick_ids=None):
    """(dec_outputs, logits, logps, preds) — ref: Seq2seq.py:249-257.

    ref_pick_ids [B, L-1] (the shifted targets): the logps slot instead
    returns picked [B, L-1] — the log-softmax of logits[:, :-1] at the
    reference id — via gather - logsumexp with in-reduce f32 casts, never
    materialising the [B, L, V] log-probability tensor (the training NLL's
    only per-vocab read; same construction as the LAS head, see
    models/las_decoder.py)."""
    dec_out, _, _ = tf_decoder_forward(
        params["dec_tgt"], cfg, emb_tgt, enc_outputs, tgt_mask=tgt_mask,
        src_mask=src_mask, rng=rng, is_training=is_training, max_time=max_time,
    )
    logits = linear(params["out_tgt"], dec_out)
    if ref_pick_ids is not None:
        preds = jnp.argmax(logits, axis=2)  # == argmax of log_softmax
        lg = logits[:, :-1, :]
        m32 = jnp.max(lg, axis=-1).astype(jnp.float32)
        se = jnp.sum(jnp.exp(lg.astype(jnp.float32) - m32[..., None]),
                     axis=-1)
        lse = m32 + jnp.log(se)
        pickedl = jnp.take_along_axis(
            lg, ref_pick_ids.astype(jnp.int32)[:, :, None],
            axis=2)[:, :, 0].astype(jnp.float32)
        return dec_out, logits, pickedl - lse, preds
    logps = jax.nn.log_softmax(logits, axis=2)
    preds = jnp.argmax(logps, axis=2)
    return dec_out, logits, logps, preds


def _decoder_en(params, emb):
    """AE head sharing the LAS output layer (ref: Seq2seq.py:240-246,172-173)."""
    logits = linear(params["las"]["decoder"]["acous_out"], emb)
    logps = jax.nn.log_softmax(logits, axis=2)
    preds = jnp.argmax(logps, axis=2)
    return logits, logps, preds


def _length_src_mask(lengths, max_len):
    """[B] -> [B,1,max_len] bool (ref: Seq2seq.py:494-497)."""
    return (jnp.arange(max_len)[None, :] < lengths[:, None])[:, None, :]


# --------------------------------------------------------------------------
# forward_train (ref: Seq2seq.py:396-509)
# --------------------------------------------------------------------------


def forward_train(
    params: Dict,
    cfg: ModelConfig,
    mode: str,
    src: jnp.ndarray,
    tgt: Optional[jnp.ndarray] = None,
    acous_feats: Optional[jnp.ndarray] = None,
    acous_lens: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    is_training: bool = True,
    ref_pick: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Teacher-forced training forward for mode in {ASR, MT, ST, ASR_ST, AE
    combinations}. Returns the reference's out_dict keys.

    is_training controls dropout/spec-aug determinism (the reference
    equivalent of model.train() vs model.eval() around forward_train);
    the teacher-forcing structure is unaffected.

    ref_pick=True returns `picked_asr` [B, Lsrc-1] — the ASR head's
    log-softmax at the reference source token — INSTEAD of the full
    `logps_asr` [B, Lsrc-1, V]: the only per-vocab quantity the masked
    training NLL reads, computed gather-minus-logsumexp so the [.., 30k]
    f32 log-probability tensor never materialises (the trainer/bench train
    path; ~2.4 ms of the B=32 flagship step,
    benchmarks/train_profile_b32.json)."""
    mode = mode.upper()
    assert src is not None
    if "ST" in mode or "ASR" in mode:
        assert acous_feats is not None
    if "ST" in mode or "MT" in mode:
        assert tgt is not None
    if rng is None:
        rng = jax.random.PRNGKey(0)
    out: Dict[str, jnp.ndarray] = {}

    if "ASR" in mode:
        rng, k = jax.random.split(rng)
        emb_src, logps_src, preds_src, lengths = _encoder_acous(
            params, cfg, acous_feats, acous_lens, tgt=src,
            is_training=is_training, teacher_forcing=True, rng=k,
            ref_tokens=src[:, 1:] if ref_pick else None,
        )
        out["emb_asr"] = emb_src
        out["preds_asr"] = preds_src
        if ref_pick:
            out["picked_asr"] = logps_src
        else:
            out["logps_asr"] = logps_src
        out["lengths_asr"] = lengths

    if "AE" in mode:
        # autoencoder head over the dynamic embedding (ref: Seq2seq.py:240-246)
        if "ASR" in mode:
            emb_ae = out["emb_asr"]
        else:
            # src-only AE: combined static+avg-dynamic embedding (the only
            # text-derived embedding; see forward_eval's AE note)
            src_trim_ae = _pre_proc_src(src)
            Bae, Lae = src_trim_ae.shape
            dyn_ae = jax.lax.stop_gradient(params["emb_dyn_ave"])
            emb_dyn_ae = jnp.broadcast_to(
                dyn_ae[None, None, :], (Bae, Lae, cfg.dim_model)
            )
            rng, k_ae = jax.random.split(rng)
            # embedding dropout like the sibling MT branch — the source
            # embedding feeds a trained head either way
            _, emb_ae, _ = _get_src_emb(params, cfg, src_trim_ae, emb_dyn_ae,
                                        rng=k_ae, is_training=is_training)
        logits_ae, logps_ae, preds_ae = _decoder_en(params, emb_ae)
        out["logps_ae"] = logps_ae
        out["preds_ae"] = preds_ae

    if "MT" in mode:
        rng, k1, k2, k3, k4 = jax.random.split(rng, 5)
        tgt_mask, emb_tgt = _get_tgt_emb(params, cfg, tgt, rng=k1,
                                         is_training=is_training)
        src_trim = _pre_proc_src(src)
        B, Ls = src_trim.shape
        dyn = jax.lax.stop_gradient(params["emb_dyn_ave"])
        emb_dyn = jnp.broadcast_to(dyn[None, None, :], (B, Ls, cfg.dim_model))
        src_mask, emb_src, src_mask_input = _get_src_emb(
            params, cfg, src_trim, emb_dyn, rng=k2, is_training=is_training
        )
        enc_out = _encoder_en(params, cfg, emb_src, src_mask=src_mask_input,
                              rng=k3, is_training=is_training)
        _, _, logps_tgt, preds_tgt = _decoder_de(
            params, cfg, emb_tgt, enc_out, tgt_mask=tgt_mask,
            src_mask=src_mask_input, rng=k4, is_training=is_training,
            ref_pick_ids=tgt[:, 1:] if ref_pick else None,
        )
        out["emb_mt"] = emb_src
        out["preds_mt"] = preds_tgt
        if ref_pick:
            out["picked_mt"] = logps_tgt
        else:
            out["logps_mt"] = logps_tgt

    if "ST" in mode:
        rng, k1, k2, k3, k4, k5 = jax.random.split(rng, 6)
        tgt_mask, emb_tgt = _get_tgt_emb(params, cfg, tgt, rng=k1,
                                         is_training=is_training)
        if "ASR" in mode:
            emb_src_dyn = out["emb_asr"]
            lengths = out["lengths_asr"]
        else:
            # free-running LAS when training ST without the ASR head
            # (ref: Seq2seq.py:484-487)
            emb_src_dyn, _, _, lengths = _encoder_acous(
                params, cfg, acous_feats, acous_lens, tgt=src,
                is_training=False, teacher_forcing=False, rng=k5,
            )
        src_trim = _pre_proc_src(src)
        _, emb_src, _ = _get_src_emb(
            params, cfg, src_trim, emb_src_dyn, rng=k2, is_training=is_training
        )
        src_mask_input = _length_src_mask(lengths, emb_src.shape[1])
        enc_out = _encoder_en(params, cfg, emb_src, src_mask=src_mask_input,
                              rng=k3, is_training=is_training)
        _, _, logps_tgt, preds_tgt = _decoder_de(
            params, cfg, emb_tgt, enc_out, tgt_mask=tgt_mask,
            src_mask=src_mask_input, rng=k4, is_training=is_training,
            ref_pick_ids=tgt[:, 1:] if ref_pick else None,
        )
        out["emb_st"] = emb_src
        out["preds_st"] = preds_tgt
        if ref_pick:
            out["picked_st"] = logps_tgt
        else:
            out["logps_st"] = logps_tgt

    return out


# --------------------------------------------------------------------------
# forward_eval: free-running greedy with KV cache (ref: Seq2seq.py:512-638)
# --------------------------------------------------------------------------


def _needs_full_rerun(cfg: ModelConfig) -> bool:
    """ACT halting cannot be KV-cached: the halting loop re-applies the
    shared layer over the whole prefix with per-position halting state
    (models/act.py), so incremental per-position stepping would skip it.
    Decode steps for ACT models therefore re-run the full causal-masked
    buffer — the compiled equivalent of the reference's prefix re-run
    (ref: Seq2seq.py:577-586)."""
    return bool(cfg.act) and cfg.transformer_type == "universal"


def _decode_logits_full(params, cfg: ModelConfig, tokens, enc_outputs,
                        mem_mask_b, pos, max_time):
    """Logits at `pos` by re-running the whole token buffer through the
    full decoder (causal + pad masks). Causal masking makes slot `pos`
    independent of the PAD garbage beyond it, and ACT's halting is
    per-position, so this equals the reference's prefix-only re-run."""
    tgt_mask, emb = _get_tgt_emb(params, cfg, tokens)
    src_mask = mem_mask_b[:, None, :] if mem_mask_b is not None else None
    dec_out, _, _ = tf_decoder_forward(
        params["dec_tgt"], cfg, emb, enc_outputs, tgt_mask=tgt_mask,
        src_mask=src_mask, is_training=False, max_time=max_time)
    out_t = jax.lax.dynamic_index_in_dim(dec_out, pos, axis=1, keepdims=False)
    return linear(params["out_tgt"], out_t)


class _GreedyState(NamedTuple):
    i: jnp.ndarray  # loop position (writes slot i, reads token i-1)
    tokens: jnp.ndarray  # [B, L] emitted prefix; [:,0]=BOS, rest init PAD
    logps: jnp.ndarray  # [B, L, V] init log(1/V)
    eos_mask: jnp.ndarray  # [B]
    cache: object


def _decode_pos(params, cfg: ModelConfig, state_tokens, cache, pos, mem_mask,
                max_time, enc_memory=None):
    """One decode position: embed the token at `pos`, run a KV-cached
    decoder step, return (logp [B', V], cache). Shared by the greedy
    while_loop and the dense beam path (infer/beam.py).

    ACT models (universal + act) re-run the whole causal-masked buffer
    instead — halting cannot be KV-cached (_needs_full_rerun); matches the
    reference's prefix re-run (ref: Seq2seq.py:725-729). `cache` passes
    through untouched (callers skip building one)."""
    if _needs_full_rerun(cfg):
        logits = _decode_logits_full(
            params, cfg, state_tokens, enc_memory, mem_mask, pos, max_time)
        return jax.nn.log_softmax(logits, axis=-1), cache
    tok = jax.lax.dynamic_index_in_dim(state_tokens, pos, axis=1,
                                       keepdims=False)
    emb = _embed_tgt_token(params, cfg, tok)[:, None, :]  # [B',1,D]
    # prefix PAD keys are blocked like the reference's pad_mask over the
    # re-embedded prefix (ref: Seq2seq.py:579, 202-205)
    self_mask_k = state_tokens != PAD
    dec_out, cache = tf_decoder_step(
        params["dec_tgt"], cfg, emb, cache, pos, mem_mask=mem_mask,
        self_mask_k=self_mask_k, max_time=max_time,
    )
    logits = linear(params["out_tgt"], dec_out[:, 0])  # [B', V]
    return jax.nn.log_softmax(logits, axis=-1), cache


def _greedy_decode(params, cfg: ModelConfig, enc_outputs, mem_mask_b,
                   length_out: int, max_time: int):
    """Greedy transformer decode as lax.while_loop with KV cache.

    Replicates _prep_eval/_step_eval buffer semantics
    (ref: Seq2seq.py:260-304): logps init log(1/V); tokens init PAD with
    BOS at slot 0; early exit when every row has emitted EOS.
    """
    B = enc_outputs.shape[0]
    V = cfg.dec_vocab_size
    full_rerun = _needs_full_rerun(cfg)
    # ACT models never read the cache (full causal re-run per step) — skip
    # allocating and carrying the per-layer K/V buffers entirely
    cache = (None if full_rerun else tf_decoder_init_cache(
        params["dec_tgt"], cfg, enc_outputs, length_out))
    tokens = jnp.full((B, length_out), PAD, dtype=jnp.int32).at[:, 0].set(BOS)
    logps0 = jnp.full((B, length_out, V), jnp.log(1.0 / V), enc_outputs.dtype)

    init = _GreedyState(
        i=jnp.int32(1),
        tokens=tokens,
        logps=logps0,
        eos_mask=jnp.zeros((B,), bool),
        cache=cache,
    )

    def cond(s: _GreedyState):
        return (s.i < length_out) & (~jnp.all(s.eos_mask))

    def body(s: _GreedyState):
        logp, cache = _decode_pos(
            params, cfg, s.tokens, s.cache, s.i - 1, mem_mask_b, max_time,
            enc_memory=enc_outputs,
        )
        pred = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_index_in_dim(s.tokens, pred, s.i, axis=1)
        logps = jax.lax.dynamic_update_index_in_dim(
            s.logps, logp.astype(s.logps.dtype), s.i, axis=1
        )
        eos_mask = s.eos_mask | (pred == EOS)
        return _GreedyState(i=s.i + 1, tokens=tokens, logps=logps,
                            eos_mask=eos_mask, cache=cache)

    final = jax.lax.while_loop(cond, body, init)
    return final.tokens, final.logps


class _FlashGreedyState(NamedTuple):
    i: jnp.ndarray
    tokens: jnp.ndarray  # [B, Lbuf]
    picked: jnp.ndarray  # [B, Lbuf] logp at the reference token per slot
    eos_mask: jnp.ndarray
    cache: object


def _greedy_decode_flash(params, cfg: ModelConfig, enc_outputs, mem_mask_b,
                         length_out: int, max_time: int, ref_tokens,
                         tp_axis=None):
    """_greedy_decode over the fused Pallas decode kernels (group == 1).

    Same buffer semantics (BOS slot 0, PAD fill, all-EOS early exit), but
    instead of materialising the [B, L, V] logp buffer it returns the
    log-softmax value at `ref_tokens[:, i]` for each written slot i — the
    only per-vocab quantity dev evaluation reads (trainer NLL at the
    reference token); unwritten slots keep the dense path's log(1/V) init
    (ref: Seq2seq.py:280-304)."""
    from stjep_tpu.models.tf_decoder import (
        tf_decoder_init_cache_flash,
        tf_decoder_step_flash,
    )
    from stjep_tpu.ops.decode_flash import (
        BLOCK,
        CROSS_BLOCK,
        decode_head_gather,
        pad_len,
    )

    B, Lk, _ = enc_outputs.shape
    V = cfg.dec_vocab_size
    Lbuf = pad_len(length_out, BLOCK)
    Lk_pad = pad_len(Lk, CROSS_BLOCK)
    if mem_mask_b is None:
        mem_mask_b = jnp.ones((B, Lk), bool)
    mem_mask_t = jnp.pad(mem_mask_b, ((0, 0), (0, Lk_pad - Lk))).T
    refs = jnp.pad(ref_tokens.astype(jnp.int32),
                   ((0, 0), (0, max(0, Lbuf - ref_tokens.shape[1]))))
    anc = jnp.zeros((Lbuf, B), jnp.int32)  # greedy: every row is its own group

    from stjep_tpu.ops.decode_flash import chain_supported

    use_chain = tp_axis is None and chain_supported(cfg)
    if use_chain:
        from stjep_tpu.models.tf_decoder import (
            tf_decoder_chain_step,
            tf_decoder_init_cache_chain,
        )

        cache = tf_decoder_init_cache_chain(
            params["dec_tgt"], cfg, enc_outputs, length_out, 1)
    else:
        cache = tf_decoder_init_cache_flash(
            params["dec_tgt"], cfg, enc_outputs, length_out, 1)
    init = _FlashGreedyState(
        i=jnp.int32(1),
        tokens=jnp.full((B, Lbuf), PAD, jnp.int32).at[:, 0].set(BOS),
        picked=jnp.full((B, Lbuf), jnp.log(1.0 / V), jnp.float32),
        eos_mask=jnp.zeros((B,), bool),
        cache=cache,
    )

    def cond(s: _FlashGreedyState):
        return (s.i < length_out) & (~jnp.all(s.eos_mask))

    def body(s: _FlashGreedyState):
        pos = s.i - 1
        tok = jax.lax.dynamic_index_in_dim(s.tokens, pos, axis=1, keepdims=False)
        emb = _embed_tgt_token(params, cfg, tok)[:, None, :]
        gid = jax.lax.dynamic_index_in_dim(refs, s.i, axis=1, keepdims=False)
        if use_chain:
            # whole position (all layers + gathered head) in ONE launch
            _, pred1, ref_lp, cache = tf_decoder_chain_step(
                params["dec_tgt"], params["out_tgt"], cfg, emb, s.cache,
                pos, anc, 1, mem_mask_t, (s.tokens != PAD).T, 1,
                max_time=max_time, gather_ids=gid)
        elif tp_axis is not None:
            from stjep_tpu.ops.decode_flash_tp import decode_head_tp

            dec_out, cache = tf_decoder_step_flash(
                params["dec_tgt"], cfg, emb, s.cache, pos, anc, 1,
                mem_mask_t, (s.tokens != PAD).T, max_time=max_time,
                final_norm=False, tp_axis=tp_axis)
            _, pred1, ref_lp = decode_head_tp(
                params["dec_tgt"]["norm"], params["out_tgt"], dec_out[:, 0],
                1, tp_axis, gather_ids=gid)
        else:
            dec_out, cache = tf_decoder_step_flash(
                params["dec_tgt"], cfg, emb, s.cache, pos, anc, 1,
                mem_mask_t, (s.tokens != PAD).T, max_time=max_time,
                final_norm=False, tp_axis=tp_axis)
            _, pred1, ref_lp = decode_head_gather(
                params["dec_tgt"]["norm"], params["out_tgt"], dec_out[:, 0],
                1, gid)
        pred = pred1[:, 0]
        tokens = jax.lax.dynamic_update_index_in_dim(s.tokens, pred, s.i,
                                                     axis=1)
        picked = jax.lax.dynamic_update_index_in_dim(s.picked, ref_lp, s.i,
                                                     axis=1)
        return _FlashGreedyState(
            i=s.i + 1, tokens=tokens, picked=picked,
            eos_mask=s.eos_mask | (pred == EOS), cache=cache,
        )

    final = jax.lax.while_loop(cond, body, init)
    return final.tokens[:, :length_out], final.picked[:, :length_out]


def forward_eval(
    params: Dict,
    cfg: ModelConfig,
    mode: str,
    src: Optional[jnp.ndarray] = None,
    acous_feats: Optional[jnp.ndarray] = None,
    acous_lens: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    ref_src: Optional[jnp.ndarray] = None,
    ref_tgt: Optional[jnp.ndarray] = None,
    use_flash: Optional[bool] = None,
    lm_fuse=None,
) -> Dict[str, jnp.ndarray]:
    """Free-running greedy eval (beam_width=1) — ref: Seq2seq.py:512-638.
    lm_fuse applies n-gram shallow fusion inside the LAS pass, as the
    reference's lm_mode/lm_model args do (ref: Seq2seq.py:548,607).

    ref_src/ref_tgt (optional reference token ids) switch the per-vocab
    outputs to `picked_*` [B, L-1]: the free-running logp at the reference
    token, aligned with targets[:, 1:] — exactly what dev NLL reads
    (ref: trainer_asr.py:_evaluate_batches) without shipping [B, L, V]
    buffers to the host. With refs given, use_flash (None = auto on TPU,
    or STJEP_FORCE_FLASH=1) routes the MT/ST greedy loop through the fused
    Pallas decode kernels."""
    mode = mode.upper()
    out: Dict[str, jnp.ndarray] = {}
    length_out_tgt = cfg.max_seq_len_tgt
    max_time = max(UPPERBOUND_SEQ_LEN, length_out_tgt)
    if use_flash is None:
        from stjep_tpu.parallel.spmd import decode_flash_auto

        use_flash = decode_flash_auto(cfg)

    def _pick(logps, refs):
        # logps [B, L', V] aligned with refs[:, 1:] (the host previously did
        # this take_along after a [B, L', V] device_get)
        tgt = refs[:, 1:]
        lp = logps[:, : tgt.shape[1]]
        return jnp.take_along_axis(
            lp, tgt.astype(jnp.int32)[:, :, None], axis=2)[:, :, 0]

    if "ST" in mode or "ASR" in mode:
        assert acous_feats is not None
    if "MT" in mode or "AE" in mode:
        assert src is not None

    if "ASR" in mode:
        # with refs, the LAS pass returns picked logps directly (and on TPU
        # runs through the fused free-running decode kernel)
        emb_src, lp_or_picked, preds_src, lengths = _encoder_acous(
            params, cfg, acous_feats, acous_lens, tgt=None, is_training=False,
            teacher_forcing=False, rng=rng, max_seq_len=cfg.max_seq_len_src,
            ref_tokens=ref_src[:, 1:] if ref_src is not None else None,
            want_logps=ref_src is None, flash_ok=True, lm_fuse=lm_fuse,
        )
        out["emb_asr"] = emb_src
        out["preds_asr"] = preds_src
        out["lengths_asr"] = lengths
        if ref_src is not None:
            out["picked_asr"] = lp_or_picked
        else:
            out["logps_asr"] = lp_or_picked

    if "AE" in mode:
        # AE head eval. The reference's forward_eval asserts src for AE
        # (ref: Seq2seq.py:532) but never produces the preds_ae/logps_ae its
        # own (archived) AE trainer reads (trainer/archive/trainer_ae_mt.py:158)
        # — the branch was lost; `_decoder_en` (ref: Seq2seq.py:240-246) is
        # dead code. Reconstructed intent: project the available embedding
        # through the shared LAS output layer (ref: Seq2seq.py:172-173).
        # With ASR in the mode the free-running dynamic embedding is used
        # (mirrors forward_train's AE branch); src-only AE (e.g. AE_MT)
        # projects the combined static+avg-dynamic embedding, the only
        # text-derived embedding in the current model.
        if "ASR" in mode:
            emb_ae = out["emb_asr"]
        else:
            src_trim = _pre_proc_src(src)
            B, Ls = src_trim.shape
            emb_dyn = jnp.broadcast_to(
                params["emb_dyn_ave"][None, None, :], (B, Ls, cfg.dim_model)
            )
            _, emb_ae, _ = _get_src_emb(params, cfg, src_trim, emb_dyn)
        _, logps_ae, preds_ae = _decoder_en(params, emb_ae)
        out["logps_ae"] = logps_ae
        out["preds_ae"] = preds_ae

    def _greedy_head(enc_out, src_mask_input, key):
        """Shared MT/ST greedy decode: fused kernel when refs are given and
        the flash gate is on, dense while_loop otherwise; emits preds_<key>
        plus picked_<key> (with refs) or logps_<key>."""
        if ref_tgt is not None and use_flash:
            from stjep_tpu.parallel.spmd import greedy_decode_flash_dp

            preds, picked = greedy_decode_flash_dp(
                params, cfg, enc_out, src_mask_input[:, 0, :], length_out_tgt,
                max_time, ref_tgt)
            out["preds_" + key] = preds
            out["picked_" + key] = picked[:, 1:][:, : ref_tgt.shape[1] - 1]
        else:
            preds, logps = _greedy_decode(
                params, cfg, enc_out, src_mask_input[:, 0, :], length_out_tgt,
                max_time)
            out["preds_" + key] = preds
            if ref_tgt is not None:
                out["picked_" + key] = _pick(logps[:, 1:], ref_tgt)
            else:
                out["logps_" + key] = logps

    if "MT" in mode:
        src_trim = _pre_proc_src(src)
        B, Ls = src_trim.shape
        emb_dyn = jnp.broadcast_to(
            params["emb_dyn_ave"][None, None, :], (B, Ls, cfg.dim_model)
        )
        _, emb_src, src_mask_input = _get_src_emb(params, cfg, src_trim, emb_dyn)
        enc_out = _encoder_en(params, cfg, emb_src, src_mask=src_mask_input)
        out["emb_mt"] = emb_src
        _greedy_head(enc_out, src_mask_input, "mt")

    if "ST" in mode:
        if "ASR" in mode:
            preds_src = out["preds_asr"]
            emb_src_dyn = out["emb_asr"]
            lengths = out["lengths_asr"]
        else:
            emb_src_dyn, _, preds_src, lengths = _encoder_acous(
                params, cfg, acous_feats, acous_lens, tgt=None,
                is_training=False, teacher_forcing=False, rng=rng,
                max_seq_len=cfg.max_seq_len_src, want_logps=False,
                flash_ok=True, lm_fuse=lm_fuse,
            )
        # static embeddings looked up from ASR *hypotheses* (ref: Seq2seq.py:608)
        _, emb_src, _ = _get_src_emb(params, cfg, preds_src, emb_src_dyn)
        src_mask_input = _length_src_mask(lengths, emb_src.shape[1])
        enc_out = _encoder_en(params, cfg, emb_src, src_mask=src_mask_input)
        out["emb_st"] = emb_src
        _greedy_head(enc_out, src_mask_input, "st")

    return out
