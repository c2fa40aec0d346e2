import numpy as np
import jax.numpy as jnp

from stjep_tpu.config import PAD
from stjep_tpu.ops.masks import (
    length_mask,
    pad_mask,
    position_signal,
    round_up8,
    subsequent_mask,
    zero_mask,
)


def test_round_up8_quirk():
    # the reference formula x + 8 - x % 8 bumps exact multiples too
    assert round_up8(8) == 16
    assert round_up8(7) == 8
    assert round_up8(0) == 8
    assert round_up8(15) == 16
    out = round_up8(jnp.array([8, 7, 0]))
    assert out.tolist() == [16, 8, 8]


def test_pad_mask():
    seq = jnp.array([[2, 5, 3, PAD, PAD]])
    m = pad_mask(seq)
    assert m.shape == (1, 1, 5)
    assert m[0, 0].tolist() == [True, True, True, False, False]


def test_zero_mask():
    seq = jnp.array([[0, 1, 0]])
    assert zero_mask(seq)[0, 0].tolist() == [False, True, False]


def test_subsequent_mask():
    m = subsequent_mask(3)
    assert m.shape == (1, 3, 3)
    expect = np.tril(np.ones((3, 3))).astype(bool)
    np.testing.assert_array_equal(np.asarray(m[0]), expect)


def test_length_mask():
    m = length_mask(jnp.array([2, 4]), 4)
    assert m.shape == (2, 1, 4)
    assert m[0, 0].tolist() == [True, True, False, False]
    assert m[1, 0].tolist() == [True, True, True, True]


def test_position_signal_matches_torch_formula():
    import math

    max_len, d = 10, 8
    pe = np.zeros((max_len, d), dtype=np.float32)
    position = np.arange(0, max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d, 2).astype(np.float32) * (-math.log(10000.0) / d))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    got = np.asarray(position_signal(max_len, d))[0]
    np.testing.assert_allclose(got, pe, rtol=1e-6)


def test_position_signal_odd_dim():
    # must not crash for odd d_model
    sig = position_signal(5, 7)
    assert sig.shape == (1, 5, 7)


def test_bucket_length():
    from stjep_tpu.ops.masks import bucket_length

    assert bucket_length(1, 256) == 256
    assert bucket_length(256, 256) == 256
    assert bucket_length(257, 256) == 512
    assert bucket_length(60, 32) == 64
