"""Numerical parity of the lax.scan LSTM against torch.nn.LSTM, including
packed-sequence semantics (the reference packs before every pyramid layer,
ref: models/Enc.py:150-151)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stjep_tpu.ops.lstm import bilstm, bilstm_init, lstm_init, lstm_scan


def _copy_torch_lstm_to_params(tl: torch.nn.LSTM, reverse: bool = False):
    sfx = "_reverse" if reverse else ""
    return {
        "w_ih": jnp.asarray(getattr(tl, f"weight_ih_l0{sfx}").detach().numpy().T),
        "w_hh": jnp.asarray(getattr(tl, f"weight_hh_l0{sfx}").detach().numpy().T),
        "b_ih": jnp.asarray(getattr(tl, f"bias_ih_l0{sfx}").detach().numpy()),
        "b_hh": jnp.asarray(getattr(tl, f"bias_hh_l0{sfx}").detach().numpy()),
    }


@pytest.mark.parametrize("bidirectional", [False, True])
def test_lstm_matches_torch_packed(bidirectional):
    torch.manual_seed(0)
    B, T, D, H = 3, 8, 5, 6
    lengths = [8, 5, 3]

    tl = torch.nn.LSTM(D, H, num_layers=1, batch_first=True,
                       bidirectional=bidirectional)
    x = torch.randn(B, T, D)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        x, lengths, batch_first=True, enforce_sorted=False)
    out_packed, _ = tl(packed)
    out_torch, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out_packed, batch_first=True, total_length=T)

    xj = jnp.asarray(x.numpy())
    lj = jnp.asarray(np.array(lengths))
    if bidirectional:
        pf = _copy_torch_lstm_to_params(tl, reverse=False)
        pb = _copy_torch_lstm_to_params(tl, reverse=True)
        out_jax = bilstm(pf, pb, xj, lengths=lj)
    else:
        pf = _copy_torch_lstm_to_params(tl)
        out_jax = lstm_scan(pf, xj, lengths=lj)

    np.testing.assert_allclose(
        np.asarray(out_jax), out_torch.detach().numpy(), rtol=1e-5, atol=1e-5)


def test_lstm_full_length_no_mask_equals_masked():
    key = jax.random.PRNGKey(0)
    p = lstm_init(key, 4, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 4))
    a = lstm_scan(p, x)
    b = lstm_scan(p, x, lengths=jnp.array([6, 6]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_bilstm_init_shapes():
    p = bilstm_init(jax.random.PRNGKey(0), 10, 7)
    assert p["fwd"]["w_ih"].shape == (10, 28)
    assert p["bwd"]["w_hh"].shape == (7, 28)


def test_lstm_zero_after_length():
    key = jax.random.PRNGKey(0)
    p = lstm_init(key, 4, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 4))
    out = lstm_scan(p, x, lengths=jnp.array([3, 6]))
    assert np.allclose(np.asarray(out)[0, 3:], 0.0)
    assert not np.allclose(np.asarray(out)[1, 5], 0.0)
