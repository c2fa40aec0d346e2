"""RNN-decoder attention score functions + weighted-context attention.

Pure-function equivalents of the reference AttentionLayer
(ref: modules/attention.py:8-289) with the four score modes:

- 'bilinear'  score = q @ (W k)^T                (ref: attention.py:190-193)
- 'dot_prod'  score = q @ k^T                    (ref: attention.py:195-198)
- 'bahdanau'  score = w^T tanh(U q + V k + b)    (ref: attention.py:120-126)
- 'hybrid'    a * exp(-b (c - j)^2), c cumulative (ref: attention.py:128-188)

All are expressed as einsums/broadcast adds so XLA fuses them; the expensive
key-side projections are meant to be precomputed once per utterance and
reused by every decode step (see models/las_decoder.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

MASK_FILL = -1e12  # ref: modules/attention.py:252


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True, dtype=jnp.float32):
    """torch.nn.Linear default init: kaiming-uniform weights, uniform bias."""
    k1, k2 = jax.random.split(key)
    bound_w = jnp.sqrt(1.0 / in_dim) * jnp.sqrt(3.0)  # kaiming_uniform(a=sqrt5)
    p = {"w": jax.random.uniform(k1, (in_dim, out_dim), dtype, -bound_w, bound_w)}
    if bias:
        bound_b = 1.0 / jnp.sqrt(jnp.asarray(in_dim, jnp.float32))
        p["b"] = jax.random.uniform(k2, (out_dim,), dtype, -bound_b, bound_b)
    return p


def linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def attention_init(
    key,
    query_size: int,
    key_size: int,
    mode: str = "bilinear",
    hidden_size: int = 1,
    dtype=jnp.float32,
):
    """Parameters for one AttentionLayer (ref: modules/attention.py:50-68)."""
    ks = jax.random.split(key, 9)
    if mode == "bilinear":
        return {"linear_att_w": linear_init(ks[0], key_size, query_size, bias=False, dtype=dtype)}
    if mode == "dot_prod":
        return {}
    if mode == "bahdanau":
        return {
            "linear_att_q": linear_init(ks[0], query_size, hidden_size, dtype=dtype),
            "linear_att_k": linear_init(ks[1], key_size, hidden_size, dtype=dtype),
            "linear_att_o": linear_init(ks[2], hidden_size, 1, dtype=dtype),
        }
    if mode == "hybrid":
        p = {}
        names = ["a", "b", "c"]
        for i, n in enumerate(names):
            p[f"linear_att_{n}q"] = linear_init(ks[3 * i], query_size, hidden_size, dtype=dtype)
            p[f"linear_att_{n}k"] = linear_init(ks[3 * i + 1], key_size, hidden_size, dtype=dtype)
            p[f"linear_att_{n}o"] = linear_init(ks[3 * i + 2], hidden_size, 1, dtype=dtype)
        return p
    raise ValueError(f"unknown attention mode {mode}")


def precompute_keys(params: Dict, keys: jnp.ndarray, mode: str) -> Dict[str, jnp.ndarray]:
    """Hoist all key-side projections out of the decode loop.

    For bilinear this turns every decode step's score into a single
    [B, 1, Hq] x [B, Hq, Tk] batched matmul.
    """
    if mode == "bilinear":
        return {"wk": linear(params["linear_att_w"], keys)}  # [B, Tk, Hq]
    if mode == "dot_prod":
        return {"wk": keys}
    if mode == "bahdanau":
        return {"uk": linear(params["linear_att_k"], keys)}  # [B, Tk, Hh]
    if mode == "hybrid":
        return {
            "a_uk": linear(params["linear_att_ak"], keys),
            "b_uk": linear(params["linear_att_bk"], keys),
            "c_uk": linear(params["linear_att_ck"], keys),
        }
    raise ValueError(f"unknown attention mode {mode}")


def calc_score(
    params: Dict,
    pre: Dict[str, jnp.ndarray],
    query: jnp.ndarray,
    mode: str,
    prev_c: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Scores [B, Tq, Tk] from query [B, Tq, Hq] and precomputed keys.

    prev_c / c_out only participate in 'hybrid' single-query (decode) mode
    (ref: modules/attention.py:182-188).
    """
    if mode in ("bilinear", "dot_prod"):
        return jnp.einsum("bqh,bkh->bqk", query, pre["wk"]), None

    if mode == "bahdanau":
        wq = linear(params["linear_att_q"], query)  # [B, Tq, Hh]
        s = jnp.tanh(wq[:, :, None, :] + pre["uk"][:, None, :, :])  # [B,Tq,Tk,Hh]
        return linear(params["linear_att_o"], s)[..., 0], None

    if mode == "hybrid":
        def head(tag):
            wq = linear(params[f"linear_att_{tag}q"], query)
            s = jnp.tanh(wq[:, :, None, :] + pre[f"{tag}_uk"][:, None, :, :])
            return jnp.exp(linear(params[f"linear_att_{tag}o"], s)[..., 0])

        a_out, b_out, c_out = head("a"), head("b"), head("c")
        t_q = query.shape[1]
        t_k = pre["a_uk"].shape[1]
        key_idx = jnp.arange(t_k, dtype=query.dtype)[None, None, :]
        if t_q == 1:
            # decode mode: c accumulates across steps via prev_c carry
            c_cum = (prev_c if prev_c is not None else 0.0) + c_out
        else:
            # teacher-forcing mode: cumulative sum over query positions
            # (ref: modules/attention.py:171-180)
            c_cum = jnp.cumsum(c_out, axis=1)
        out = a_out * jnp.exp(-b_out * (c_cum - key_idx) ** 2)
        return out, c_cum

    raise ValueError(f"unknown attention mode {mode}")


def attend(
    params: Dict,
    pre: Dict[str, jnp.ndarray],
    query: jnp.ndarray,
    values: jnp.ndarray,
    mode: str,
    mask: Optional[jnp.ndarray] = None,
    prev_c: Optional[jnp.ndarray] = None,
    hard_att: bool = False,
):
    """Full attention: scores -> mask -> softmax -> weighted values.

    mask: [B, Tk] bool, True = MASKED OUT (trailing pad), matching the
    reference's set_mask convention (ref: modules/attention.py:250-252).

    Returns (context [B, Tq, Dv], attn [B, Tq, Tk], c_out).
    """
    scores, c_out = calc_score(params, pre, query, mode, prev_c=prev_c)
    if mask is not None:
        scores = jnp.where(mask[:, None, :], MASK_FILL, scores)
    if hard_att:
        # argmax one-hot attention (ref: modules/attention.py:255-265)
        mx = jnp.max(scores, axis=2, keepdims=True)
        hard = (scores == mx).astype(scores.dtype)
        attn = hard / jnp.sum(hard, axis=2, keepdims=True)
    else:
        attn = jax.nn.softmax(scores, axis=2)
    context = jnp.einsum("bqk,bkv->bqv", attn, values)
    return context, attn, c_out
