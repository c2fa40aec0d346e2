"""forward_translate / forward_translate_refen: beam-search inference modes.

Rebuild of ref: models/Seq2seq.py:641-903. Modes:
- ASR      : pure LAS greedy (beam search not used, ref: Seq2seq.py:655-658)
- MT       : average-dynamic-embedding source, beam decode
- ST       : LAS dynamic embeddings + static embs from ASR hypotheses
- ST_BASE  : LAS hypotheses + average dynamic embedding (pre-finetune decode,
             ref: Seq2seq.py:741-794)
The *_refen variant feeds the LAS with the reference source history
(teacher-forced) and uses reference static embeddings (ref: Seq2seq.py:799-903).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from stjep_tpu.config import ModelConfig
from stjep_tpu.infer.beam import beam_search
from stjep_tpu.models.seq2seq import (
    _encoder_acous,
    _encoder_en,
    _get_src_emb,
    _length_src_mask,
    _pre_proc_src,
)


def _encode_for_mode(params, cfg: ModelConfig, mode: str, src, acous_feats,
                     acous_lens, rng, refen: bool, lm_fuse=None):
    """Build encoder memory + source mask for each translate mode. The
    reference threads lm_mode/lm_model into every LAS pass — ST
    (ref: Seq2seq.py:702), ST_BASE (:752), refen ST (:863) — so the ASR
    hypotheses feeding the static embeddings are LM-fused too."""
    if mode == "MT":
        src_trim = _pre_proc_src(src)
        B, Ls = src_trim.shape
        emb_dyn = jnp.broadcast_to(
            params["emb_dyn_ave"][None, None, :], (B, Ls, cfg.dim_model)
        )
        _, emb_src, src_mask_input = _get_src_emb(params, cfg, src_trim, emb_dyn)
        enc_out = _encoder_en(params, cfg, emb_src, src_mask=src_mask_input)
        return enc_out, src_mask_input[:, 0, :]

    if mode == "ST":
        if refen:
            # teacher-forced LAS on the reference source (ref: Seq2seq.py:861-865)
            emb_dyn, _, preds_src, lengths = _encoder_acous(
                params, cfg, acous_feats, acous_lens, tgt=src,
                is_training=False, teacher_forcing=True, rng=rng,
                lm_fuse=lm_fuse,
            )
            static_ids = _pre_proc_src(src)
        else:
            emb_dyn, _, preds_src, lengths = _encoder_acous(
                params, cfg, acous_feats, acous_lens, tgt=None,
                is_training=False, teacher_forcing=False, rng=rng,
                max_seq_len=cfg.max_seq_len_src, want_logps=False,
                flash_ok=True, lm_fuse=lm_fuse,
            )
            static_ids = preds_src  # hypotheses (ref: Seq2seq.py:703)
        _, emb_src, _ = _get_src_emb(params, cfg, static_ids, emb_dyn)
        src_mask_input = _length_src_mask(lengths, emb_src.shape[1])
        enc_out = _encoder_en(params, cfg, emb_src, src_mask=src_mask_input)
        return enc_out, src_mask_input[:, 0, :]

    if mode == "ST_BASE":
        _, _, preds_src, lengths = _encoder_acous(
            params, cfg, acous_feats, acous_lens, tgt=None,
            is_training=False, teacher_forcing=False, rng=rng,
            max_seq_len=cfg.max_seq_len_src, want_logps=False, flash_ok=True,
            lm_fuse=lm_fuse,
        )
        B, Lp = preds_src.shape
        emb_dyn = jnp.broadcast_to(
            params["emb_dyn_ave"][None, None, :], (B, Lp, cfg.dim_model)
        )
        _, emb_src, _ = _get_src_emb(params, cfg, preds_src, emb_dyn)
        src_mask_input = _length_src_mask(lengths, emb_src.shape[1])
        enc_out = _encoder_en(params, cfg, emb_src, src_mask=src_mask_input)
        return enc_out, src_mask_input[:, 0, :]

    raise ValueError(f"unknown translate mode {mode}")


def forward_translate(
    params: Dict,
    cfg: ModelConfig,
    mode: str,
    src: Optional[jnp.ndarray] = None,
    acous_feats: Optional[jnp.ndarray] = None,
    acous_lens: Optional[jnp.ndarray] = None,
    beam_width: int = 1,
    penalty_factor: float = 1.0,
    max_seq_len: int = 900,
    rng: Optional[jax.Array] = None,
    refen: bool = False,
    lm_fuse=None,
    cache_dtype=None,
    weight_dtype=None,
) -> jnp.ndarray:
    """Beam-search inference (ref: Seq2seq.py:641-796). Returns preds ids.

    ASR mode returns [B, max_seq_len_src-1] LAS tokens; other modes return
    [B, max_seq_len] best-beam tokens with leading BOS, PAD-padded."""
    if mode == "ASR" and weight_dtype is not None:
        # same failure surface as beam_search's explicit check: the LAS
        # greedy path has no weight-streaming mode, so the flag must never
        # be a silent no-op here
        raise ValueError(
            "weight_dtype={!r} only applies to the fused transformer beam "
            "decode; ASR (LAS greedy) has no weight-streaming mode".format(
                weight_dtype))
    if mode == "ASR":
        if refen:
            # the reference LM-fuses even the teacher-forced refen pass —
            # emitted symbols are fused though inputs come from the
            # reference history (ref: Seq2seq.py:816)
            _, _, preds_src, _ = _encoder_acous(
                params, cfg, acous_feats, acous_lens, tgt=src,
                is_training=False, teacher_forcing=True, rng=rng,
                lm_fuse=lm_fuse,
            )
        else:
            _, _, preds_src, _ = _encoder_acous(
                params, cfg, acous_feats, acous_lens, tgt=None,
                is_training=False, teacher_forcing=False, rng=rng,
                max_seq_len=cfg.max_seq_len_src, lm_fuse=lm_fuse,
                want_logps=False, flash_ok=True,
            )
        return preds_src

    enc_out, mem_mask_b = _encode_for_mode(
        params, cfg, mode, src, acous_feats, acous_lens, rng, refen,
        lm_fuse=lm_fuse,
    )
    beam_width = max(1, beam_width)
    if beam_width == 1:
        # beam width 1 emits exactly the greedy argmax sequence (the k^2->k
        # selection degenerates to argmax, ref: Seq2seq.py:349-356). On TPU
        # the fused flash decode path (a width-1 beam) is fastest; on CPU
        # use the cheaper dense greedy while_loop.
        import jax as _jax

        if _jax.default_backend() != "cpu":
            preds, _ = beam_search(
                params, cfg, enc_out, mem_mask_b, 1, penalty_factor,
                max_seq_len, cache_dtype=cache_dtype,
                weight_dtype=weight_dtype,
            )
            return preds
        if weight_dtype is not None:
            # keep the failure surface consistent with beam_search: the
            # dense CPU greedy while_loop has no weight-streaming mode
            raise ValueError(
                "weight_dtype={!r} needs the fused decode kernels; the CPU "
                "greedy fallback has no weight-streaming mode".format(
                    weight_dtype))
        from stjep_tpu.models.seq2seq import _greedy_decode

        preds, _ = _greedy_decode(
            params, cfg, enc_out, mem_mask_b, max_seq_len,
            max(max_seq_len, 500),
        )
        return preds
    preds, scores = beam_search(
        params, cfg, enc_out, mem_mask_b, beam_width, penalty_factor,
        max_seq_len, cache_dtype=cache_dtype, weight_dtype=weight_dtype,
    )
    return preds


def forward_translate_refen(params, cfg, mode, **kw):
    """ref: Seq2seq.py:799-903."""
    return forward_translate(params, cfg, mode, refen=True, **kw)
