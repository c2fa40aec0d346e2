"""Pyramidal BiLSTM acoustic encoder (the 'listener').

TPU-native rebuild of the reference Enc (ref: models/Enc.py:16-223):
4 bidirectional LSTM layers; after each, adjacent frame pairs are concatenated
halving time, for a total 8x reduction. torch's pack/unpack is replaced by the
length-masked scan in ops/lstm.py (identical outputs at valid positions, zeros
beyond). SpecAugment (2x random time+freq zero-masks, ref: Enc.py:87-117) uses
explicit PRNG keys and fixed-shape iota masks so it stays inside jit.

Layer dims (ref: Enc.py:51-66):
    l1: acous_dim -> H (x2 dirs) ; l2..l4: 4H -> H (x2 dirs)
Output: [B, T/8, 2H].
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from stjep_tpu.config import ModelConfig
from stjep_tpu.ops.lstm import bilstm, bilstm_init
from stjep_tpu.ops.masks import round_up8
from stjep_tpu.ops.transformer import dropout

# Use the fused Pallas BiLSTM kernels on TPU: lstm_pallas.py (inference) and
# lstm_pallas_bwd.py (training, with the fused reverse-scan backward).
USE_PALLAS_LSTM = True


def las_encoder_init(key, cfg: ModelConfig, dtype=jnp.float32) -> Dict:
    H = cfg.acous_hidden_size
    keys = jax.random.split(key, cfg.num_pyramid_layers)
    params: Dict = {}
    in_dim = cfg.acous_dim
    for i in range(cfg.num_pyramid_layers):
        params[f"acous_enc_l{i + 1}"] = bilstm_init(keys[i], in_dim, H, dtype)
        in_dim = 4 * H  # concat of adjacent 2H frames
    return params


def spec_augment(key, acous_feats: jnp.ndarray) -> jnp.ndarray:
    """SpecAugment with the reference's exact bounds (ref: Enc.py:99-117):
    REPEAT=2 draws of t in [0, min(40, 0.2*T)], f in [0, 7], zeroing
    [t0, t0+t) in time and [f0, f0+f) in channels for the whole batch."""
    max_time = acous_feats.shape[1]
    max_channel = acous_feats.shape[2]
    const_t = int(min(40, 0.2 * max_time))
    const_f = 7

    time_idx = jnp.arange(max_time)
    chan_idx = jnp.arange(max_channel)

    for rkey in jax.random.split(key, 2):  # REPEAT = 2
        kt, kf, kt0, kf0 = jax.random.split(rkey, 4)
        # python random.randint is inclusive on both ends
        t = jax.random.randint(kt, (), 0, const_t + 1)
        f = jax.random.randint(kf, (), 0, const_f + 1)
        t0 = jax.random.randint(kt0, (), 0, jnp.maximum(max_time - t - 1, 0) + 1)
        f0 = jax.random.randint(kf0, (), 0, jnp.maximum(max_channel - f - 1, 0) + 1)
        tmask = (time_idx >= t0) & (time_idx < t0 + t)  # [T]
        fmask = (chan_idx >= f0) & (chan_idx < f0 + f)  # [C]
        keep = (~tmask[None, :, None]) & (~fmask[None, None, :])
        acous_feats = acous_feats * keep.astype(acous_feats.dtype)
    return acous_feats


def las_encoder_forward(
    params: Dict,
    cfg: ModelConfig,
    acous_feats: jnp.ndarray,
    acous_lens: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    is_training: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Faithful pyramid: LSTM -> dropout -> reshape between layers, final
    layer output NOT reshaped (ref: Enc.py:146-217). Returns
    (acous_outputs [B, T/8, 2H], lens8 [B])."""
    B, T, _ = acous_feats.shape
    assert T % 8 == 0, "acoustic frames must be padded to a multiple of 8"

    if is_training and cfg.spec_aug:
        assert rng is not None
        rng, k = jax.random.split(rng)
        acous_feats = spec_augment(k, acous_feats)

    if acous_lens is None:
        lens = jnp.full((B,), T, dtype=jnp.int32)
    else:
        lens = jnp.minimum(round_up8(acous_lens.astype(jnp.int32)), T)

    # the fused kernel pays a large (cached) compile; for toy sizes the XLA
    # scan is already fast, so gate by hidden size
    import os

    from stjep_tpu.utils.misc import flash_kernels_disabled

    use_pallas = (
        USE_PALLAS_LSTM
        and (jax.default_backend() in ("tpu", "axon")
             or os.environ.get("STJEP_FORCE_FLASH") == "1")
        and cfg.acous_hidden_size >= 64
        and not flash_kernels_disabled()
    )

    x = acous_feats
    cur_lens = lens
    n = cfg.num_pyramid_layers
    for i in range(n):
        p = params[f"acous_enc_l{i + 1}"]
        if use_pallas and is_training:
            from stjep_tpu.ops.lstm_pallas_bwd import bilstm_pallas_trainable
            from stjep_tpu.parallel.spmd import bilstm_dp

            out = bilstm_dp(bilstm_pallas_trainable, p["fwd"], p["bwd"], x,
                            cur_lens)
        elif use_pallas:
            from stjep_tpu.ops.lstm_pallas import bilstm_pallas
            from stjep_tpu.parallel.spmd import bilstm_dp

            out = bilstm_dp(bilstm_pallas, p["fwd"], p["bwd"], x, cur_lens)
        else:
            out = bilstm(p["fwd"], p["bwd"], x, lengths=cur_lens)
        if is_training and cfg.dropout > 0.0:
            rng, k = jax.random.split(rng)
            out = dropout(k, out, cfg.dropout, deterministic=False)
        if i < n - 1:
            b, t, d = out.shape
            x = out.reshape(b, t // 2, 2 * d)
            cur_lens = cur_lens // 2
        else:
            x = out
    return x, cur_lens
