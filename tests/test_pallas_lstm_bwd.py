"""Fused Pallas BiLSTM backward: gradients must match the XLA scan VJP."""

import pytest

pytestmark = pytest.mark.slow  # interpret-mode Pallas: minutes on CPU

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stjep_tpu.ops.lstm import bilstm, bilstm_init
from stjep_tpu.ops.lstm_pallas_bwd import bilstm_pallas_trainable


@pytest.mark.parametrize("lens", [[16, 11, 8, 3], None])
def test_trainable_forward_matches_scan(lens):
    B, T, D, H = 4, 16, 8, 8
    p = bilstm_init(jax.random.PRNGKey(0), D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
    lj = jnp.asarray(lens) if lens is not None else None
    ref = bilstm(p["fwd"], p["bwd"], x, lengths=lj)
    got = bilstm_pallas_trainable(p["fwd"], p["bwd"], x, lj)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_trainable_gradients_match_scan():
    B, T, D, H = 3, 10, 5, 8
    p = bilstm_init(jax.random.PRNGKey(2), D, H)
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, D))
    lens = jnp.array([10, 7, 4])
    w = jax.random.normal(jax.random.PRNGKey(4), (B, T, 2 * H))

    def loss_pal(pf, pb, x):
        return jnp.sum(w * bilstm_pallas_trainable(pf, pb, x, lens) ** 2)

    def loss_ref(pf, pb, x):
        return jnp.sum(w * bilstm(pf, pb, x, lengths=lens) ** 2)

    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(p["fwd"], p["bwd"], x)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(p["fwd"], p["bwd"], x)
    flat_pal = jax.tree_util.tree_leaves(g_pal)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    assert len(flat_pal) == len(flat_ref)
    for a, b in zip(flat_pal, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_trainable_batch_blocks(monkeypatch):
    """Train batches >32 rows chunk over a leading grid dimension (B=64
    single-block overflowed scoped VMEM at the Din=1024 pyramid layers);
    force 2-row blocks and check forward AND gradients across block
    boundaries with ragged lengths."""
    import stjep_tpu.ops.lstm_pallas as lp

    monkeypatch.setattr(lp, "_batch_block", lambda B, limit=2: 2)
    B, T, D, H = 6, 8, 4, 8
    p = bilstm_init(jax.random.PRNGKey(7), D, H)
    x = jax.random.normal(jax.random.PRNGKey(8), (B, T, D))
    lens = jnp.array([8, 5, 3, 8, 1, 6])

    def loss_pal(pf, pb, x):
        return jnp.sum(bilstm_pallas_trainable(pf, pb, x, lens) ** 2)

    def loss_ref(pf, pb, x):
        return jnp.sum(bilstm(pf, pb, x, lengths=lens) ** 2)

    got = bilstm_pallas_trainable(p["fwd"], p["bwd"], x, lens)
    ref = bilstm(p["fwd"], p["bwd"], x, lengths=lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(p["fwd"], p["bwd"], x)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(p["fwd"], p["bwd"], x)
    for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_trainable_gradients_full_length():
    B, T, D, H = 2, 6, 4, 8
    p = bilstm_init(jax.random.PRNGKey(5), D, H)
    x = jax.random.normal(jax.random.PRNGKey(6), (B, T, D))

    def loss_pal(x):
        return jnp.sum(bilstm_pallas_trainable(p["fwd"], p["bwd"], x, None))

    def loss_ref(x):
        return jnp.sum(bilstm(p["fwd"], p["bwd"], x, lengths=None))

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_pal)(x)), np.asarray(jax.grad(loss_ref)(x)),
        rtol=1e-4, atol=1e-5,
    )


def test_trainable_gradients_bf16_dtypes():
    """bf16 params must get bf16 cotangents: the trainer's grad-accum scan
    carries zeros_like(params), so an f32 weight grad would flip the carry
    dtype mid-scan (TypeError). Values are checked loosely vs the f32 path;
    the dtype contract is the point."""
    B, T, D, H = 2, 6, 4, 8
    p = bilstm_init(jax.random.PRNGKey(7), D, H, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(8), (B, T, D), jnp.bfloat16)
    lens = jnp.array([6, 4])

    def loss(pf, pb, x):
        return jnp.sum(
            bilstm_pallas_trainable(pf, pb, x, lens).astype(jnp.float32))

    gf, gb, gx = jax.grad(loss, argnums=(0, 1, 2))(p["fwd"], p["bwd"], x)
    for g, prim in ((gf, p["fwd"]), (gb, p["bwd"])):
        for k in prim:
            assert g[k].dtype == prim[k].dtype, k
    assert gx.dtype == x.dtype
    for leaf in jax.tree_util.tree_leaves((gf, gb, gx)):
        assert np.isfinite(np.asarray(leaf, dtype=np.float32)).all()
