"""Adaptive Computation Time for the universal transformer.

Rebuild of the reference ACT (ref: models/Act.py:10-172) as a lax.while_loop
with a halting mask — which also fixes the reference's latent bug of reading
a `device` global that is never set in that module (ref: Act.py:28).

Semantics preserved: sigmoid halting probability with bias init 1, threshold
0.9, per-position weighted state accumulation, layer map recording the
effective depth.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from stjep_tpu.ops.attention import linear, linear_init
from stjep_tpu.ops.transformer import decoder_layer, encoder_layer

ACT_THRESHOLD = 1.0 - 0.1  # ref: Act.py:18


def act_init(key, hidden_size: int, dtype=jnp.float32) -> Dict:
    p = linear_init(key, hidden_size, 1, bias=True, dtype=dtype)
    p["b"] = jnp.ones_like(p["b"])  # ref: Act.py:17 bias init 1
    return {"p": p}


def _act_loop(
    act_params: Dict,
    transform,  # state -> new_state  (the shared enc/dec layer)
    state: jnp.ndarray,  # [B, L, D]
    time_sig: jnp.ndarray,
    layer_sig: jnp.ndarray,
    max_hop: int,
):
    B, L, _ = state.shape
    zeros = jnp.zeros((B, L), state.dtype)

    def cond(carry):
        state, prev_state, halting_p, remainders, n_updates, layer_map, step = carry
        return jnp.any((halting_p < ACT_THRESHOLD) & (n_updates < max_hop))

    def body(carry):
        state, prev_state, halting_p, remainders, n_updates, layer_map, step = carry
        state = state + time_sig[:, :L, :].astype(state.dtype)
        state = state + jnp.broadcast_to(
            jnp.take(layer_sig, step, axis=1)[:, None, :], state.shape
        ).astype(state.dtype)

        p = jax.nn.sigmoid(linear(act_params["p"], state))[..., 0]  # [B, L]
        still_running = (halting_p < 1.0).astype(state.dtype)
        new_halted = (
            (halting_p + p * still_running) > ACT_THRESHOLD
        ).astype(state.dtype) * still_running
        still_running = (
            (halting_p + p * still_running) <= ACT_THRESHOLD
        ).astype(state.dtype) * still_running
        halting_p = halting_p + p * still_running
        remainders = remainders + new_halted * (1 - halting_p)
        halting_p = halting_p + new_halted * remainders
        n_updates = n_updates + still_running + new_halted
        update_weights = p * still_running + remainders * new_halted

        state = transform(state)
        prev_state = (
            state * update_weights[..., None]
            + prev_state * (1 - update_weights[..., None])
        )
        step = step + 1
        layer_map = layer_map + new_halted * step
        return (state, prev_state, halting_p, remainders, n_updates, layer_map, step)

    init = (state, jnp.zeros_like(state), zeros, zeros, zeros, zeros, jnp.int32(0))
    state, prev_state, halting_p, remainders, n_updates, layer_map, step = (
        jax.lax.while_loop(cond, body, init)
    )
    # positions that never halted are assigned max_hop (ref: Act.py:95)
    still_running = (halting_p < 1.0).astype(state.dtype)
    layer_map = layer_map + still_running * max_hop
    return prev_state, layer_map


def act_enc_apply(
    act_params: Dict,
    layer_params: Dict,
    cfg,
    state: jnp.ndarray,
    src_mask,
    time_sig,
    layer_sig,
    max_hop: int,
    rng=None,
    is_training: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ref: Act.py:21-97 (forward_enc)."""

    def transform(x):
        y, _ = encoder_layer(
            layer_params, x, cfg.num_heads, mask=src_mask,
            deterministic=True,  # while_loop body must be deterministic
        )
        return y

    return _act_loop(act_params, transform, state, time_sig, layer_sig, max_hop)


def act_dec_apply(
    act_params: Dict,
    layer_params: Dict,
    cfg,
    state: jnp.ndarray,
    memory: jnp.ndarray,
    tgt_mask,
    src_mask,
    time_sig,
    layer_sig,
    max_hop: int,
    rng=None,
    is_training: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ref: Act.py:100-172 (forward_dec)."""

    def transform(x):
        y, _, _ = decoder_layer(
            layer_params, x, memory, cfg.num_heads,
            self_mask=tgt_mask, cross_mask=src_mask, deterministic=True,
        )
        return y

    return _act_loop(act_params, transform, state, time_sig, layer_sig, max_hop)
