"""Fused Pallas kernels under multi-device meshes (parallel/spmd.py).

Round 2 disabled the fused kernels whenever a mesh was active; these tests
pin the shard_map dispatch that replaced that cliff: each LAS kernel runs
per-shard over the mesh's 'data' axis and must match (a) the same kernel on
a single device and (b) the dense XLA path — forward AND gradients (the
replicated weight cotangents are psum'd by shard_map's transpose)."""

import os

import pytest

pytestmark = pytest.mark.slow  # interpret-mode Pallas: minutes on CPU

import numpy as np

import jax
import jax.numpy as jnp

from stjep_tpu.config import BOS, ModelConfig
from stjep_tpu.models.seq2seq import forward_eval, forward_train, init_seq2seq
from stjep_tpu.ops.lstm import bilstm, bilstm_init
from stjep_tpu.ops.lstm_pallas_bwd import bilstm_pallas_trainable
from stjep_tpu.parallel.mesh import make_mesh
from stjep_tpu.parallel.spmd import bilstm_dp, set_kernel_mesh


@pytest.fixture
def force_flash():
    os.environ["STJEP_FORCE_FLASH"] = "1"
    yield
    os.environ.pop("STJEP_FORCE_FLASH", None)


def _mesh42():
    return make_mesh(n_data=4, n_model=2)


def test_bilstm_dp_forward_and_grads_match():
    B, T, D, H = 8, 8, 4, 8
    p = bilstm_init(jax.random.PRNGKey(0), D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
    lens = jnp.array([8, 6, 5, 3, 8, 8, 2, 7])

    def loss(pf, pb, x):
        return jnp.sum(bilstm_dp(bilstm_pallas_trainable, pf, pb, x, lens) ** 2)

    def loss_ref(pf, pb, x):
        return jnp.sum(bilstm(pf, pb, x, lengths=lens) ** 2)

    out_single = bilstm_dp(bilstm_pallas_trainable, p["fwd"], p["bwd"], x, lens)
    g_single = jax.grad(loss, argnums=(0, 1, 2))(p["fwd"], p["bwd"], x)
    g_xla = jax.grad(loss_ref, argnums=(0, 1, 2))(p["fwd"], p["bwd"], x)

    set_kernel_mesh(_mesh42())
    out_mesh = jax.jit(
        lambda pf, pb, x: bilstm_dp(bilstm_pallas_trainable, pf, pb, x, lens)
    )(p["fwd"], p["bwd"], x)
    g_mesh = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(p["fwd"], p["bwd"], x)

    np.testing.assert_allclose(np.asarray(out_mesh), np.asarray(out_single),
                               rtol=1e-5, atol=1e-5)
    for gm, gs, gx in zip(jax.tree_util.tree_leaves(g_mesh),
                          jax.tree_util.tree_leaves(g_single),
                          jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(gm), np.asarray(gs),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gm), np.asarray(gx),
                                   rtol=1e-4, atol=1e-5)


def _kernel_cfg():
    """Smallest config that passes every fused-kernel support gate:
    dim_model % 128 == 0, 2*acous_hidden % 128 == 0, acous_hidden >= 64."""
    return ModelConfig(
        enc_vocab_size=24, dec_vocab_size=20, enc_embedding_size=8,
        dec_embedding_size=16, acous_dim=8, acous_hidden_size=64,
        dim_model=128, dim_feedforward=64, num_heads=4, enc_layers=1,
        dec_layers=1, num_unilstm_dec=3, spec_aug=False, dropout=0.0,
        max_seq_len_src=10, max_seq_len_tgt=12, mode="ASR",
    )


def _asr_batch(cfg, B=8, T=16):
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, T, cfg.acous_dim).astype(np.float32))
    lens = jnp.asarray(rng.randint(T // 2, T + 1, size=(B,)).astype(np.int32))
    src = jnp.asarray(rng.randint(
        5, cfg.enc_vocab_size, size=(B, cfg.max_seq_len_src)).astype(np.int32))
    src = src.at[:, 0].set(BOS)
    return feats, lens, src


def test_train_forward_on_mesh_matches_single_device(force_flash):
    """ASR forward_train (pyramid bilstm kernels + fused TF decoder scan)
    under the (4, 2) mesh vs single-device kernels vs dense XLA."""
    cfg = _kernel_cfg()
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    feats, lens, src = _asr_batch(cfg)

    def run(params):
        out = forward_train(params, cfg, "ASR", src, acous_feats=feats,
                            acous_lens=lens, is_training=False)
        return out["logps_asr"]

    ref_kernel = jax.jit(run)(params)

    os.environ.pop("STJEP_FORCE_FLASH", None)
    ref_xla = jax.jit(run)(params)
    os.environ["STJEP_FORCE_FLASH"] = "1"

    set_kernel_mesh(_mesh42())
    mesh_out = jax.jit(run)(params)

    np.testing.assert_allclose(np.asarray(mesh_out), np.asarray(ref_kernel),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mesh_out), np.asarray(ref_xla),
                               rtol=1e-3, atol=1e-4)


def test_train_grads_on_mesh_match_single_device(force_flash):
    """Gradients through the shard_map-dispatched kernels (the psum of the
    replicated weight cotangents) must match the single-device kernels."""
    cfg = _kernel_cfg()
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    feats, lens, src = _asr_batch(cfg)

    def loss(params):
        out = forward_train(params, cfg, "ASR", src, acous_feats=feats,
                            acous_lens=lens, is_training=True,
                            rng=jax.random.PRNGKey(7))
        lp = out["logps_asr"]
        mask = (src[:, 1:] != 0).astype(lp.dtype)
        picked = jnp.take_along_axis(
            lp, src[:, 1:, None].astype(jnp.int32), axis=2)[:, :, 0]
        return -jnp.sum(picked * mask) / jnp.sum(mask)

    g_single = jax.jit(jax.grad(loss))(params)
    set_kernel_mesh(_mesh42())
    g_mesh = jax.jit(jax.grad(loss))(params)

    from stjep_tpu.train.policies import iter_paths, path_str

    flat_s = {path_str(p): v for p, v in iter_paths(g_single)}
    for p, v in iter_paths(g_mesh):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_s[path_str(p)]),
            rtol=2e-4, atol=1e-5, err_msg=path_str(p))


def test_eval_greedy_on_mesh_matches_single_device(force_flash):
    """Free-running fused LAS decode (las_greedy_flash_dp) under the mesh:
    token-identical preds, matching picked logps."""
    cfg = _kernel_cfg()
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    feats, lens, src = _asr_batch(cfg)

    def run(params):
        out = forward_eval(params, cfg, "ASR", acous_feats=feats,
                           acous_lens=lens, ref_src=src)
        return out["preds_asr"], out["picked_asr"]

    preds_s, picked_s = jax.jit(run)(params)
    set_kernel_mesh(_mesh42())
    preds_m, picked_m = jax.jit(run)(params)

    np.testing.assert_array_equal(np.asarray(preds_m), np.asarray(preds_s))
    np.testing.assert_allclose(np.asarray(picked_m), np.asarray(picked_s),
                               rtol=1e-4, atol=1e-5)


def _mask_after_eos(preds):
    """Slots after a row's first EOS depend on when the whole (sub)batch
    exits the decode loop — a batch-composition effect, not model output.
    Zero them before comparing across batch partitionings."""
    from stjep_tpu.config import EOS

    p = np.asarray(preds).copy()
    for r in p:
        hit = np.where(r == EOS)[0]
        if hit.size:
            r[hit[0] + 1:] = 0
    return p


def test_mt_greedy_decode_flash_on_dp_mesh(force_flash):
    """KV-cached fused transformer greedy decode under a pure-DP (8, 1)
    mesh (greedy_decode_flash_dp) vs single device."""
    cfg = ModelConfig(
        enc_vocab_size=24, dec_vocab_size=20, enc_embedding_size=8,
        dec_embedding_size=16, acous_dim=8, acous_hidden_size=64,
        dim_model=128, dim_feedforward=64, num_heads=4, enc_layers=1,
        dec_layers=1, num_unilstm_dec=3, spec_aug=False, dropout=0.0,
        max_seq_len_src=10, max_seq_len_tgt=12, mode="MT",
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(3)
    B = 8
    src = jnp.asarray(rng.randint(
        5, cfg.enc_vocab_size, size=(B, cfg.max_seq_len_src)).astype(np.int32))
    src = src.at[:, 0].set(BOS)
    tgt = jnp.asarray(rng.randint(
        5, cfg.dec_vocab_size, size=(B, cfg.max_seq_len_tgt)).astype(np.int32))
    tgt = tgt.at[:, 0].set(BOS)

    def run(params):
        out = forward_eval(params, cfg, "MT", src=src, ref_tgt=tgt)
        return out["preds_mt"], out["picked_mt"]

    preds_s, picked_s = jax.jit(run)(params)
    set_kernel_mesh(make_mesh(n_data=8, n_model=1))
    preds_m, picked_m = jax.jit(run)(params)

    np.testing.assert_array_equal(_mask_after_eos(preds_m),
                                  _mask_after_eos(preds_s))
    np.testing.assert_allclose(np.asarray(picked_m), np.asarray(picked_s),
                               rtol=1e-4, atol=1e-5)


def test_beam_search_flash_on_dp_mesh(force_flash):
    """Fused beam search under a pure-DP (8, 1) mesh (beam_search_flash_dp)
    vs single device; the (4, 2) TP mesh branch dispatches the tensor-
    parallel kernels (dims divide here — see test_tp_decode.py) and must
    still match."""
    from stjep_tpu.infer.beam import beam_search

    cfg = ModelConfig(
        enc_vocab_size=24, dec_vocab_size=20, enc_embedding_size=8,
        dec_embedding_size=16, acous_dim=8, acous_hidden_size=64,
        dim_model=128, dim_feedforward=64, num_heads=4, enc_layers=1,
        dec_layers=1, num_unilstm_dec=3, spec_aug=False, dropout=0.0,
        max_seq_len_src=10, max_seq_len_tgt=12, mode="MT",
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(4)
    B, Lk = 8, 8
    enc = jnp.asarray(rng.randn(B, Lk, cfg.dim_model).astype(np.float32))
    mem = jnp.asarray(rng.rand(B, Lk) > 0.2)

    def run(params):
        return beam_search(params, cfg, enc, mem, beam_width=2,
                           penalty_factor=1.0, max_seq_len=10)

    preds_s, scores_s = jax.jit(run)(params)
    set_kernel_mesh(make_mesh(n_data=8, n_model=1))
    preds_m, scores_m = jax.jit(run)(params)

    np.testing.assert_array_equal(_mask_after_eos(preds_m),
                                  _mask_after_eos(preds_s))
    np.testing.assert_allclose(np.asarray(scores_m), np.asarray(scores_s),
                               rtol=1e-4, atol=1e-5)

    # TP mesh: kernels off, dense XLA path, still correct
    set_kernel_mesh(make_mesh(n_data=4, n_model=2))
    preds_tp, scores_tp = jax.jit(run)(params)
    np.testing.assert_array_equal(_mask_after_eos(preds_tp),
                                  _mask_after_eos(preds_s))
    np.testing.assert_allclose(np.asarray(scores_tp), np.asarray(scores_s),
                               rtol=1e-4, atol=1e-5)


def test_non_divisible_batch_falls_through(force_flash):
    """B=6 does not divide the 4-wide data axis: the wrapper must fall back
    to the plain kernel call and still be correct."""
    cfg = _kernel_cfg()
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    feats, lens, src = _asr_batch(cfg, B=6)

    def run(params):
        out = forward_train(params, cfg, "ASR", src, acous_feats=feats,
                            acous_lens=lens, is_training=False)
        return out["logps_asr"]

    ref = jax.jit(run)(params)
    set_kernel_mesh(_mesh42())
    mesh_out = jax.jit(run)(params)
    np.testing.assert_allclose(np.asarray(mesh_out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
