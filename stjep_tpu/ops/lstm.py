"""LSTM recurrences as lax.scan with packed-sequence semantics.

TPU-first design notes:
- The input projection `x @ W_ih` for ALL timesteps is hoisted out of the
  scan into one large [B*T, D] x [D, 4H] matmul that tiles onto the MXU; the
  scan body only performs the unavoidable [B, H] x [H, 4H] recurrent matmul
  plus VPU gate math.
- torch's pack_padded_sequence semantics (the reference packs before every
  pyramid layer, ref: models/Enc.py:150-151) are reproduced with a validity
  mask: outside the valid region the carry is passed through unchanged and
  the output is zero. For a reversed scan this makes the recurrence start at
  the last *valid* frame exactly like packing does.
- Gate order is torch's (i, f, g, o) so the PyTorch checkpoint converter is a
  transpose away (ref layout: torch.nn.LSTM weight_ih_l0 [4H, D]).

A fused Pallas kernel for this scan lives in ops/lstm_pallas.py; this module
is the XLA reference implementation and the fallback path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def lstm_init(key, input_size: int, hidden_size: int, dtype=jnp.float32):
    """Uniform(-1/sqrt(H), 1/sqrt(H)) init matching torch.nn.LSTM defaults."""
    k = 1.0 / jnp.sqrt(jnp.asarray(hidden_size, dtype=jnp.float32))
    keys = jax.random.split(key, 4)
    u = lambda kk, shape: jax.random.uniform(kk, shape, dtype, -k, k)
    return {
        # stored math-major: [D, 4H] / [H, 4H] (torch stores the transpose)
        "w_ih": u(keys[0], (input_size, 4 * hidden_size)),
        "w_hh": u(keys[1], (hidden_size, 4 * hidden_size)),
        "b_ih": u(keys[2], (4 * hidden_size,)),
        "b_hh": u(keys[3], (4 * hidden_size,)),
    }


def lstm_gates(pre: jnp.ndarray, c: jnp.ndarray, hidden_size: int,
               with_gates: bool = False):
    """(i, f, g, o) gate nonlinearities in cuDNN gate order — the
    torch-checkpoint parity contract (train/convert.py maps weights in this
    order). THE single definition: the Pallas kernels (lstm_pallas,
    lstm_pallas_bwd, las_flash, las_tf_flash) all call it, so a gate-order
    or numerics change lands everywhere at once. pre: [B, 4H].
    Returns (h_new, c_new) or, with_gates=True, (h_new, c_new,
    concat(i,f,g,o)) for kernels that save gate residuals."""
    i = jax.nn.sigmoid(pre[:, 0 * hidden_size : 1 * hidden_size])
    f = jax.nn.sigmoid(pre[:, 1 * hidden_size : 2 * hidden_size])
    g = jnp.tanh(pre[:, 2 * hidden_size : 3 * hidden_size])
    o = jax.nn.sigmoid(pre[:, 3 * hidden_size : 4 * hidden_size])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    if with_gates:
        return h_new, c_new, jnp.concatenate([i, f, g, o], axis=-1)
    return h_new, c_new


def _gates(pre: jnp.ndarray, c: jnp.ndarray, hidden_size: int):
    return lstm_gates(pre, c, hidden_size)


def lstm_cell_step(
    params, x_t: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single LSTM step. x_t: [B, D], h/c: [B, H] -> (h', c')."""
    hidden_size = h.shape[-1]
    pre = (
        x_t @ params["w_ih"]
        + h @ params["w_hh"]
        + params["b_ih"]
        + params["b_hh"]
    )
    return _gates(pre, c, hidden_size)


def lstm_scan(
    params,
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    reverse: bool = False,
) -> jnp.ndarray:
    """Run an LSTM over time with packed-sequence semantics.

    Args:
        params: dict from lstm_init.
        x: [B, T, D] inputs.
        lengths: [B] int valid lengths; None means all T valid.
        reverse: process t = T-1 .. 0 (outputs still in original order).

    Returns:
        outputs: [B, T, H]; zero at positions t >= lengths.
    """
    B, T, _ = x.shape
    hidden_size = params["w_hh"].shape[0]

    # hoist the input projection out of the recurrence (one big MXU matmul)
    x_proj = x @ params["w_ih"] + (params["b_ih"] + params["b_hh"])  # [B,T,4H]
    x_proj = jnp.swapaxes(x_proj, 0, 1)  # [T, B, 4H] scan-major

    if lengths is None:
        valid = jnp.ones((T, B, 1), dtype=bool)
    else:
        valid = (jnp.arange(T)[:, None] < lengths[None, :])[:, :, None]

    w_hh = params["w_hh"]
    # carry dtype = the PROMOTED compute dtype (x_proj), not the raw input's:
    # bf16-staged features with f32 params (translate/train --feat_dtype
    # bfloat16 on an f32 checkpoint) make x bf16 while the recurrence runs
    # f32 — a bf16 h0 would break the scan's carry-type invariance.
    h0 = jnp.zeros((B, hidden_size), dtype=x_proj.dtype)
    c0 = jnp.zeros((B, hidden_size), dtype=x_proj.dtype)

    def step(carry, inp):
        h, c = carry
        pre_x, v = inp
        pre = pre_x + h @ w_hh
        h_new, c_new = _gates(pre, c, hidden_size)
        h = jnp.where(v, h_new, h)
        c = jnp.where(v, c_new, c)
        out = jnp.where(v, h_new, jnp.zeros_like(h_new))
        return (h, c), out

    _, outs = jax.lax.scan(step, (h0, c0), (x_proj, valid), reverse=reverse)
    return jnp.swapaxes(outs, 0, 1)  # [B, T, H]


def bilstm(
    params_fwd,
    params_bwd,
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Bidirectional LSTM: concat(forward, backward) -> [B, T, 2H].

    Matches torch.nn.LSTM(bidirectional=True) output layout
    (ref: models/Enc.py:51-66).
    """
    out_f = lstm_scan(params_fwd, x, lengths=lengths, reverse=False)
    out_b = lstm_scan(params_bwd, x, lengths=lengths, reverse=True)
    return jnp.concatenate([out_f, out_b], axis=-1)


def bilstm_init(key, input_size: int, hidden_size: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fwd": lstm_init(k1, input_size, hidden_size, dtype),
        "bwd": lstm_init(k2, input_size, hidden_size, dtype),
    }
