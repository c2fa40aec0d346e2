"""LAS = pyramidal encoder + attention decoder (ref: models/Las.py:17-123).

Seq2seq constructs LAS with fixed hyperparameters: bilinear attention,
3 decoder layers, pyramid encoder, spec_aug=True, hidden sizes = dim_model
(ref: models/Seq2seq.py:145-169).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from stjep_tpu.config import ModelConfig
from stjep_tpu.models.las_decoder import las_decoder_forward, las_decoder_init
from stjep_tpu.models.las_encoder import las_encoder_forward, las_encoder_init


def las_init(key, cfg: ModelConfig, dtype=jnp.float32) -> Dict:
    k1, k2 = jax.random.split(key)
    return {
        "encoder": las_encoder_init(k1, cfg, dtype),
        "decoder": las_decoder_init(k2, cfg, dtype),
    }


def las_forward(
    params: Dict,
    cfg: ModelConfig,
    acous_feats: jnp.ndarray,
    acous_lens: Optional[jnp.ndarray] = None,
    tgt: Optional[jnp.ndarray] = None,
    use_teacher_forcing: bool = False,
    teacher_forcing_ratio: Optional[float] = None,
    max_seq_len: Optional[int] = None,
    rng: Optional[jax.Array] = None,
    is_training: bool = False,
    lm_fuse=None,
    ref_tokens: Optional[jnp.ndarray] = None,
    want_logps: bool = True,
    flash_ok: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(sequence_embs, logps, symbols, lengths) — ref: models/Las.py:91-123.

    ref_tokens / want_logps: see las_decoder_forward — with ref_tokens the
    logps slot holds the per-token picked logps [B, L-1]; with
    want_logps=False (and no refs) it is None, which also unlocks the fused
    free-running decode kernel on TPU.

    Teacher forcing follows the reference's per-batch coin flip
    `random.random() < ratio` (ref: Dec.py:196): pass
    `teacher_forcing_ratio` to get that behavior (1.0/0.0 are static
    branches, anything between draws one bernoulli from `rng`), or the
    static `use_teacher_forcing` bool when the caller decides (the recipe
    only ever uses ratio 1.0 or 0.0).
    """
    if use_teacher_forcing or (
        teacher_forcing_ratio is not None and teacher_forcing_ratio > 0.1
    ):
        assert tgt is not None  # ref: Las.py:107, Las.py:106
    if rng is not None:
        rng_enc, rng_dec = jax.random.split(rng)
    else:
        rng_enc = rng_dec = None
    acous_outputs, _ = las_encoder_forward(
        params["encoder"], cfg, acous_feats, acous_lens=acous_lens,
        rng=rng_enc, is_training=is_training,
    )
    return las_decoder_forward(
        params["decoder"], cfg, acous_outputs, acous_lens=acous_lens, tgt=tgt,
        use_teacher_forcing=use_teacher_forcing,
        teacher_forcing_ratio=teacher_forcing_ratio, max_seq_len=max_seq_len,
        rng=rng_dec, is_training=is_training, lm_fuse=lm_fuse,
        ref_tokens=ref_tokens, want_logps=want_logps, flash_ok=flash_ok,
    )
