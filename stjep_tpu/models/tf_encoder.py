"""Transformer text encoder (ref: models/TFEnc.py:19-100).

Standard type: N independently-parameterised pre-LN layers; universal type:
one shared layer applied N times with a per-layer sinusoidal 'layer signal'
added; optional ACT halting (ref: TFEnc.py:53-59, models/Act.py).

The sinusoidal time signal is added once before the stack
(ref: TFEnc.py:82-83); the positional table defaults to 500 positions and can
be expanded for long decodes (ref: TFEnc.py:35, 64-66) — here the table is a
pure function of a `max_time` argument so expansion is just passing a bigger
number (a new jit specialisation, no mutable state).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from stjep_tpu.config import ModelConfig
from stjep_tpu.models.act import act_enc_apply, act_init
from stjep_tpu.ops.masks import position_signal
from stjep_tpu.ops.transformer import encoder_layer, encoder_layer_init, layer_norm, layer_norm_init

UPPERBOUND_SEQ_LEN = 500  # ref: TFEnc.py:35


def tf_encoder_init(key, cfg: ModelConfig, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, cfg.enc_layers + 1)
    if cfg.transformer_type == "universal":
        # one shared layer (ref: TFEnc.py:53-54)
        layers = [encoder_layer_init(keys[0], cfg.dim_model, cfg.num_heads,
                                     cfg.dim_feedforward, dtype)]
        params: Dict = {"layers": layers}
        if cfg.act:
            params["act_fn"] = act_init(keys[-1], cfg.dim_model, dtype)
    elif cfg.transformer_type == "standard":
        layers = [
            encoder_layer_init(keys[i], cfg.dim_model, cfg.num_heads,
                               cfg.dim_feedforward, dtype)
            for i in range(cfg.enc_layers)
        ]
        params = {"layers": layers}
    else:
        raise ValueError(f"not implemented transformer type {cfg.transformer_type}")
    params["norm"] = layer_norm_init(cfg.dim_model, dtype)
    return params


def _layer_params(params: Dict, cfg: ModelConfig, i: int) -> Dict:
    if cfg.transformer_type == "universal":
        return params["layers"][0]
    return params["layers"][i]


def tf_encoder_forward(
    params: Dict,
    cfg: ModelConfig,
    src: jnp.ndarray,  # [B, L, dim_model] (already embedded+projected)
    src_mask: Optional[jnp.ndarray] = None,  # [B, 1, L] or [B, L, L]; 0=block
    rng: Optional[jax.Array] = None,
    is_training: bool = False,
    max_time: int = UPPERBOUND_SEQ_LEN,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (encoded [B, L, D], last attention or ACT layer map)."""
    L = src.shape[1]
    time_sig = position_signal(max(max_time, L), cfg.dim_model)
    layer_sig = position_signal(cfg.enc_layers, cfg.dim_model)

    deterministic = not is_training
    x = src
    if cfg.act and cfg.transformer_type == "universal":
        max_hop = cfg.act_max_hop or cfg.enc_layers
        x, layer_map = act_enc_apply(
            params["act_fn"], _layer_params(params, cfg, 0), cfg, x, src_mask,
            time_sig, layer_sig, max_hop,
            rng=rng, is_training=is_training,
        )
        x = layer_norm(params["norm"], x, eps=1e-6)
        return x, layer_map

    x = x + time_sig[:, :L, :].astype(x.dtype)
    att = None
    for layer in range(cfg.enc_layers):
        if cfg.transformer_type == "universal":
            x = x + jnp.broadcast_to(
                layer_sig[:, layer, :][:, None, :], x.shape
            ).astype(x.dtype)
        if rng is not None:
            rng, k = jax.random.split(rng)
        else:
            k = None
        lp = _layer_params(params, cfg, layer)
        if cfg.remat and is_training:
            def _apply(lp, x, k):
                return encoder_layer(
                    lp, x, cfg.num_heads, mask=src_mask, rng=k,
                    dropout_rate=cfg.dropout, deterministic=deterministic)

            x, att = jax.checkpoint(_apply)(lp, x, k)
        else:
            x, att = encoder_layer(
                lp, x, cfg.num_heads, mask=src_mask, rng=k,
                dropout_rate=cfg.dropout, deterministic=deterministic,
            )
    x = layer_norm(params["norm"], x, eps=1e-6)  # ref: TFEnc.py:61,89
    return x, att
