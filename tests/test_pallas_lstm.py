"""Pallas fused BiLSTM kernel parity (interpreter mode on CPU)."""

import pytest

pytestmark = pytest.mark.slow  # interpret-mode Pallas: minutes on CPU

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stjep_tpu.ops.lstm import bilstm, bilstm_init
from stjep_tpu.ops.lstm_pallas import bilstm_pallas


def test_pallas_bilstm_matches_scan():
    B, T, D, H = 4, 16, 8, 8
    p = bilstm_init(jax.random.PRNGKey(0), D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
    lens = jnp.array([16, 11, 8, 3])
    ref = bilstm(p["fwd"], p["bwd"], x, lengths=lens)
    pal = bilstm_pallas(p["fwd"], p["bwd"], x, lens)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_bilstm_full_length():
    B, T, D, H = 2, 8, 4, 8
    p = bilstm_init(jax.random.PRNGKey(2), D, H)
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, D))
    ref = bilstm(p["fwd"], p["bwd"], x, lengths=None)
    pal = bilstm_pallas(p["fwd"], p["bwd"], x, None)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_bilstm_batch_blocks(monkeypatch):
    """Large batches chunk over a leading grid dimension (serving B>64
    would exceed scoped VMEM in one block); force 2-row blocks and check
    parity across block boundaries, including ragged lengths."""
    import stjep_tpu.ops.lstm_pallas as lp

    monkeypatch.setattr(lp, "_batch_block", lambda B, limit=2: 2)
    B, T, D, H = 6, 8, 4, 8
    p = bilstm_init(jax.random.PRNGKey(6), D, H)
    x = jax.random.normal(jax.random.PRNGKey(7), (B, T, D))
    lens = jnp.array([8, 5, 3, 8, 1, 6])
    ref = bilstm(p["fwd"], p["bwd"], x, lengths=lens)
    pal = lp.bilstm_pallas(p["fwd"], p["bwd"], x, lens)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_bilstm_gradients():
    """custom_vjp backward (remat through scan) must match scan gradients."""
    B, T, D, H = 2, 6, 4, 8
    p = bilstm_init(jax.random.PRNGKey(4), D, H)
    x = jax.random.normal(jax.random.PRNGKey(5), (B, T, D))
    lens = jnp.array([6, 4])

    def loss_pal(pf, pb, x):
        return jnp.sum(bilstm_pallas(pf, pb, x, lens) ** 2)

    def loss_ref(pf, pb, x):
        return jnp.sum(bilstm(pf, pb, x, lengths=lens) ** 2)

    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(p["fwd"], p["bwd"], x)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(p["fwd"], p["bwd"], x)
    for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
