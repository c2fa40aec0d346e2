"""Masks and sinusoidal position signals, built inside jit.

Semantics match the reference (ref: modules/layers.py:260-309). Masks use the
convention True/1 = attend, False/0 = blocked, and are combined by logical
AND exactly as the reference does with uint8 `&` (ref: models/Seq2seq.py:185-187).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from stjep_tpu.config import PAD


def round_up8(x):
    """Length bump to the next multiple of 8, always adding at least 1.

    The reference computes `x + 8 - x % 8` which maps 8 -> 16 (not 8 -> 8);
    this exact (quirky) behavior is preserved because the dataset pads
    acoustics with the same formula (ref: models/Enc.py:142,
    utils/dataset.py:179-182, models/Dec.py:175).
    Works on Python ints and jnp arrays.
    """
    return x + 8 - x % 8


def bucket_length(n: int, bucket: int = 256) -> int:
    """Round n up to a multiple of `bucket`.

    TPU-native addition: XLA compiles one program per distinct shape, so
    feeding every batch at its exact round_up8 length would recompile per
    batch. Bucketing the padded time axis to coarse multiples keeps the
    number of compiled programs tiny; validity masks make the extra padding
    semantically inert."""
    return ((int(n) + bucket - 1) // bucket) * bucket


def pad_mask(seq: jnp.ndarray) -> jnp.ndarray:
    """[b, len] ids -> [b, 1, len] bool; True where not PAD.

    ref: modules/layers.py:269-275 (_get_pad_mask).
    """
    return (seq != PAD)[:, None, :]


def zero_mask(seq: jnp.ndarray) -> jnp.ndarray:
    """[b, len] -> [b, 1, len] bool; True where non-zero.

    ref: modules/layers.py:260-266 (_get_zero_mask).
    """
    return (seq != 0)[:, None, :]


def subsequent_mask(max_length: int) -> jnp.ndarray:
    """[1, L, L] lower-triangular bool causal mask.

    ref: modules/layers.py:278-290 (_get_subsequent_mask).
    """
    return jnp.tril(jnp.ones((1, max_length, max_length), dtype=bool))


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[b] lengths -> [b, 1, max_len] bool; True inside the valid region.

    Matches the reference's src_mask_input built from LAS lengths
    (ref: models/Seq2seq.py:494-497).
    """
    ar = jnp.arange(max_len)[None, :]
    return (ar < lengths[:, None])[:, None, :]


def position_signal(max_len: int, d_model: int) -> jnp.ndarray:
    """[1, max_len, d_model] sinusoidal signal.

    Even feature indices get sin, odd get cos, with the torch half-table
    layout (ref: modules/layers.py:293-309 _gen_position_signal). Computed in
    float64-free numpy then cast, so it is a compile-time constant under jit.
    """
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(0, max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * (-np.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    # torch writes cos into the odd slots; when d_model is odd the cos half
    # is one column narrower.
    pe[:, 1::2] = np.cos(position * div_term)[:, : pe[:, 1::2].shape[1]]
    return jnp.asarray(pe)[None, :, :]
