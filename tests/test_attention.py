"""Score-mode parity for the RNN-decoder attention against the reference
formulas (ref: modules/attention.py:92-200), recomputed in numpy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stjep_tpu.ops.attention import (
    attend,
    attention_init,
    calc_score,
    precompute_keys,
)


def _np(x):
    return np.asarray(x)


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


@pytest.fixture
def qk():
    rng = np.random.RandomState(0)
    q = rng.randn(2, 3, 4).astype(np.float32)  # [B, Tq, Hq]
    k = rng.randn(2, 5, 6).astype(np.float32)  # [B, Tk, Hk]
    return jnp.asarray(q), jnp.asarray(k)


def test_bilinear_score(qk):
    q, k = qk
    p = attention_init(jax.random.PRNGKey(0), 4, 6, mode="bilinear")
    pre = precompute_keys(p, k, "bilinear")
    s, c = calc_score(p, pre, q, "bilinear")
    assert c is None
    # reference: out = bmm(q, (k @ W^T)^T)  (ref: attention.py:190-193)
    wk = _np(k) @ _np(p["linear_att_w"]["w"])
    expect = np.einsum("bqh,bkh->bqk", _np(q), wk)
    np.testing.assert_allclose(_np(s), expect, rtol=1e-5, atol=1e-6)


def test_dot_prod_score():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(2, 3, 6).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 5, 6).astype(np.float32))
    pre = precompute_keys({}, k, "dot_prod")
    s, _ = calc_score({}, pre, q, "dot_prod")
    expect = np.einsum("bqh,bkh->bqk", _np(q), _np(k))
    np.testing.assert_allclose(_np(s), expect, rtol=1e-5, atol=1e-6)


def test_bahdanau_score(qk):
    q, k = qk
    p = attention_init(jax.random.PRNGKey(0), 4, 6, mode="bahdanau", hidden_size=7)
    pre = precompute_keys(p, k, "bahdanau")
    s, _ = calc_score(p, pre, q, "bahdanau")
    # reference: W tanh(Uq + Vk + b) (ref: attention.py:120-126)
    wq = _np(q) @ _np(p["linear_att_q"]["w"]) + _np(p["linear_att_q"]["b"])
    uk = _np(k) @ _np(p["linear_att_k"]["w"]) + _np(p["linear_att_k"]["b"])
    t = np.tanh(wq[:, :, None, :] + uk[:, None, :, :])
    expect = (t @ _np(p["linear_att_o"]["w"]) + _np(p["linear_att_o"]["b"]))[..., 0]
    np.testing.assert_allclose(_np(s), expect, rtol=1e-5, atol=1e-6)


def test_hybrid_teacher_forcing_cumsum(qk):
    q, k = qk
    p = attention_init(jax.random.PRNGKey(0), 4, 6, mode="hybrid", hidden_size=3)
    pre = precompute_keys(p, k, "hybrid")
    s, c_cum = calc_score(p, pre, q, "hybrid")
    assert s.shape == (2, 3, 5)
    # c is a cumulative sum over query steps (ref: attention.py:177-180)
    def head(tag):
        wq = _np(q) @ _np(p[f"linear_att_{tag}q"]["w"]) + _np(p[f"linear_att_{tag}q"]["b"])
        uk = _np(k) @ _np(p[f"linear_att_{tag}k"]["w"]) + _np(p[f"linear_att_{tag}k"]["b"])
        t = np.tanh(wq[:, :, None, :] + uk[:, None, :, :])
        o = (t @ _np(p[f"linear_att_{tag}o"]["w"]) + _np(p[f"linear_att_{tag}o"]["b"]))[..., 0]
        return np.exp(o)

    a, b, c = head("a"), head("b"), head("c")
    c_curr = np.cumsum(c, axis=1)
    j = np.arange(5)[None, None, :]
    expect = a * np.exp(-b * (c_curr - j) ** 2)
    np.testing.assert_allclose(_np(s), expect, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_np(c_cum), c_curr, rtol=1e-4, atol=1e-5)


def test_hybrid_decode_mode_prev_c(qk):
    _, k = qk
    q1 = jnp.asarray(np.random.RandomState(3).randn(2, 1, 4).astype(np.float32))
    p = attention_init(jax.random.PRNGKey(0), 4, 6, mode="hybrid", hidden_size=3)
    pre = precompute_keys(p, k, "hybrid")
    prev_c = jnp.ones((2, 1, 5))
    _, c_out = calc_score(p, pre, q1, "hybrid", prev_c=prev_c)
    # c accumulates on prev_c in decode mode (ref: attention.py:187)
    _, c_out0 = calc_score(p, pre, q1, "hybrid", prev_c=jnp.zeros((2, 1, 5)))
    np.testing.assert_allclose(_np(c_out), _np(c_out0) + 1.0, rtol=1e-5)


def test_attend_masking_and_softmax(qk):
    q, k = qk
    p = attention_init(jax.random.PRNGKey(0), 4, 6, mode="bilinear")
    pre = precompute_keys(p, k, "bilinear")
    mask = jnp.asarray(np.array([[False, False, False, True, True],
                                 [False, True, True, True, True]]))
    ctx, attn, _ = attend(p, pre, q, k, "bilinear", mask=mask)
    a = _np(attn)
    # masked keys get ~zero attention
    assert a[0, :, 3:].max() < 1e-9
    assert a[1, :, 1:].max() < 1e-9
    np.testing.assert_allclose(a.sum(-1), 1.0, rtol=1e-5)
    # context = attn-weighted values
    expect = np.einsum("bqk,bkv->bqv", a, _np(k))
    np.testing.assert_allclose(_np(ctx), expect, rtol=1e-5, atol=1e-6)


def test_hard_attention_one_hot(qk):
    q, k = qk
    p = attention_init(jax.random.PRNGKey(0), 4, 6, mode="bilinear")
    pre = precompute_keys(p, k, "bilinear")
    _, attn, _ = attend(p, pre, q, k, "bilinear", hard_att=True)
    a = _np(attn)
    # one-hot rows (ref: attention.py:255-265)
    np.testing.assert_allclose(a.sum(-1), 1.0, rtol=1e-6)
    assert ((a == 0) | (a == 1)).all() or (a.max(-1) == 1).all()
