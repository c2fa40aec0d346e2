"""Pure-function losses with masked accumulation semantics.

Equivalents of the reference's accumulating Loss objects
(ref: modules/loss.py:12-249): each function returns the *summed* loss over
selected (masked) elements plus the norm term, so callers can reproduce
`eval_batch_with_mask` + `normalise` + grad-accumulation scaling exactly
(ref: trainer/trainer_asr.py:257-274).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def nll_loss_masked(
    logps: jnp.ndarray,  # [N, V] log-probabilities
    targets: jnp.ndarray,  # [N] int ids
    mask: jnp.ndarray,  # [N] bool, True = counted
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked NLL sum + norm term (ref: modules/loss.py:130-132, 82-83).

    Returns (sum_loss, norm) where norm = number of True mask entries; the
    reference normalises by this count when `normalise_loss` is on
    (ref: trainer/trainer_asr.py:262-264).
    """
    picked = jnp.take_along_axis(logps, targets[:, None], axis=1)[:, 0]
    losses = -picked * mask.astype(logps.dtype)
    return jnp.sum(losses), jnp.sum(mask.astype(logps.dtype))


def nll_loss(logps: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Unmasked NLL sum (ref: modules/loss.py:127-128)."""
    picked = jnp.take_along_axis(logps, targets[:, None], axis=1)[:, 0]
    return -jnp.sum(picked)


def cross_entropy_masked(
    logits: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked cross-entropy from raw logits (ref: modules/loss.py:166-194)."""
    logps = logits - jnp.max(logits, axis=-1, keepdims=True)
    logps = logps - jnp.log(jnp.sum(jnp.exp(logps), axis=-1, keepdims=True))
    return nll_loss_masked(logps, targets, mask)


def bce_masked(
    probs: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray,
    eps: float = 1e-12,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked binary cross-entropy sum (ref: modules/loss.py:135-163)."""
    p = jnp.clip(probs, eps, 1.0 - eps)
    losses = -(targets * jnp.log(p) + (1.0 - targets) * jnp.log(1.0 - p))
    m = mask.astype(losses.dtype)
    return jnp.sum(losses * m), jnp.sum(m)


def kldiv_masked(
    logq: jnp.ndarray, logp: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked KL(p || q) summed over the vocab axis then masked rows
    (ref: modules/loss.py:197-223: inputs logq, target p=exp(logp))."""
    p = jnp.exp(logp)
    elem = p * (logp - logq)  # torch KLDivLoss pointwise form
    rows = jnp.sum(elem, axis=-1)
    m = mask.astype(rows.dtype)
    return jnp.sum(rows * m), jnp.sum(m)


def mse_masked(
    inputs: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked MSE summed over feature axis then masked rows
    (ref: modules/loss.py:226-249)."""
    rows = jnp.sum(jnp.square(inputs - targets), axis=-1)
    m = mask.astype(rows.dtype)
    return jnp.sum(rows * m), jnp.sum(m)


def normalise(sum_loss: jnp.ndarray, norm: jnp.ndarray) -> jnp.ndarray:
    """ref: modules/loss.py:82-83 (divide accumulated loss by norm term)."""
    return sum_loss / (1.0 * jnp.maximum(norm, 1.0))


def token_accuracy(
    preds: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(match_count, total_count) over masked positions
    (ref: trainer/trainer_asr.py:166-170)."""
    m = mask.astype(jnp.int32)
    match = jnp.sum((preds == targets).astype(jnp.int32) * m)
    return match, jnp.sum(m)
