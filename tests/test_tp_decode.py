"""Tensor-parallel fused decode (ops/decode_flash_tp.py, parallel/spmd.py).

Under a mesh with a model axis the Megatron-sharded decoder weights used to
gate the fused decode kernels off entirely (dense XLA fallback). These
tests pin the TP dispatch that replaced that: the per-layer kernel trio
with model-axis psums and the vocab-sharded decode head must reproduce the
single-device fused path — token-identical predictions, matching scores —
on (data, model) meshes of 2- and 4-way tensor parallelism."""

import os

import pytest

pytestmark = pytest.mark.slow  # interpret-mode Pallas: minutes on CPU

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from stjep_tpu.config import BOS, ModelConfig
from stjep_tpu.models.seq2seq import forward_eval, init_seq2seq
from stjep_tpu.parallel.mesh import make_mesh
from stjep_tpu.parallel.spmd import set_kernel_mesh, tp_flash_ok


@pytest.fixture
def force_flash():
    os.environ["STJEP_FORCE_FLASH"] = "1"
    yield
    os.environ.pop("STJEP_FORCE_FLASH", None)
    set_kernel_mesh(None)


def _mt_cfg(**kw):
    d = dict(
        enc_vocab_size=24, dec_vocab_size=20, enc_embedding_size=8,
        dec_embedding_size=16, acous_dim=8, acous_hidden_size=64,
        dim_model=128, dim_feedforward=64, num_heads=4, enc_layers=1,
        dec_layers=2, num_unilstm_dec=3, spec_aug=False, dropout=0.0,
        max_seq_len_src=10, max_seq_len_tgt=12, mode="MT",
    )
    d.update(kw)
    return ModelConfig(**d)


def test_decode_head_tp_matches_dense():
    """Vocab-sharded head: global log-softmax top-k + gathered logp must
    equal the dense fused head (exact ids, fp-close scores)."""
    from stjep_tpu.ops.decode_flash import decode_head, decode_head_gather
    from stjep_tpu.ops.decode_flash_tp import decode_head_tp

    rng = np.random.RandomState(0)
    BK, D, V, k = 8, 16, 12, 3
    x = jnp.asarray(rng.randn(BK, D).astype(np.float32))
    norm = {"scale": jnp.asarray(rng.rand(D).astype(np.float32) + 0.5),
            "bias": jnp.asarray(rng.randn(D).astype(np.float32) * 0.1)}
    out_p = {"w": jnp.asarray(rng.randn(D, V).astype(np.float32))}
    gids = jnp.asarray(rng.randint(0, V, size=(BK,)).astype(np.int32))

    sc_ref, id_ref = decode_head(norm, out_p, x, k)
    _, _, glp_ref = decode_head_gather(norm, out_p, x, k, gids)

    mesh = make_mesh(n_data=1, n_model=2, devices=jax.devices()[:2])

    def inner(x, s, b, w, g):
        sc, ids = decode_head_tp({"scale": s, "bias": b}, {"w": w}, x, k,
                                 "model")
        _, _, glp = decode_head_tp({"scale": s, "bias": b}, {"w": w}, x, k,
                                   "model", gather_ids=g)
        return sc, ids, glp

    fn = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(), P(), P(), P(None, "model"), P()),
        out_specs=(P(), P(), P()), check_vma=False)
    sc_tp, id_tp, glp_tp = fn(x, norm["scale"], norm["bias"], out_p["w"],
                              gids)

    np.testing.assert_array_equal(np.asarray(id_tp), np.asarray(id_ref))
    np.testing.assert_allclose(np.asarray(sc_tp), np.asarray(sc_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(glp_tp), np.asarray(glp_ref),
                               rtol=1e-5, atol=1e-5)


def _mt_inputs(cfg, B=8, seed=3):
    rng = np.random.RandomState(seed)
    src = jnp.asarray(rng.randint(
        5, cfg.enc_vocab_size, size=(B, cfg.max_seq_len_src)).astype(np.int32))
    src = src.at[:, 0].set(BOS)
    tgt = jnp.asarray(rng.randint(
        5, cfg.dec_vocab_size, size=(B, cfg.max_seq_len_tgt)).astype(np.int32))
    tgt = tgt.at[:, 0].set(BOS)
    return src, tgt


def _mask_after_eos(preds):
    from stjep_tpu.config import EOS

    p = np.asarray(preds).copy()
    for r in p:
        hit = np.where(r == EOS)[0]
        if hit.size:
            r[hit[0] + 1:] = 0
    return p


@pytest.mark.parametrize("n_model", [2, 4])
def test_mt_greedy_decode_flash_on_tp_mesh(force_flash, n_model):
    """KV-cached fused greedy decode with the TP trio + vocab-sharded head
    vs the single-device fused path: identical tokens, matching picked."""
    cfg = _mt_cfg()
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    src, tgt = _mt_inputs(cfg)

    def run(params):
        out = forward_eval(params, cfg, "MT", src=src, ref_tgt=tgt)
        return out["preds_mt"], out["picked_mt"]

    preds_s, picked_s = jax.jit(run)(params)
    set_kernel_mesh(make_mesh(n_data=8 // n_model, n_model=n_model))
    assert tp_flash_ok(cfg)
    preds_m, picked_m = jax.jit(run)(params)

    np.testing.assert_array_equal(_mask_after_eos(preds_m),
                                  _mask_after_eos(preds_s))
    np.testing.assert_allclose(np.asarray(picked_m), np.asarray(picked_s),
                               rtol=1e-4, atol=1e-5)


def test_beam_search_flash_on_tp_mesh(force_flash):
    """Fused beam search with 2-way tensor parallelism vs single device."""
    from stjep_tpu.infer.beam import beam_search

    cfg = _mt_cfg()
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(4)
    B, Lk = 8, 8
    enc = jnp.asarray(rng.randn(B, Lk, cfg.dim_model).astype(np.float32))
    mem = jnp.asarray(rng.rand(B, Lk) > 0.2)

    def run(params):
        return beam_search(params, cfg, enc, mem, beam_width=2,
                           penalty_factor=1.0, max_seq_len=10)

    preds_s, scores_s = jax.jit(run)(params)
    set_kernel_mesh(make_mesh(n_data=4, n_model=2))
    preds_m, scores_m = jax.jit(run)(params)

    np.testing.assert_array_equal(_mask_after_eos(preds_m),
                                  _mask_after_eos(preds_s))
    np.testing.assert_allclose(np.asarray(scores_m), np.asarray(scores_s),
                               rtol=1e-4, atol=1e-5)


def test_tp_flash_gate_requires_divisible_dims(force_flash):
    """Indivisible head/vocab dims must fail the TP gate (dense fallback),
    and the decode must still be correct there."""
    cfg = _mt_cfg(dec_vocab_size=21, num_heads=4)  # 21 % 2 != 0
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    src, tgt = _mt_inputs(cfg, seed=5)

    def run(params):
        out = forward_eval(params, cfg, "MT", src=src, ref_tgt=tgt)
        return out["preds_mt"], out["picked_mt"]

    preds_s, picked_s = jax.jit(run)(params)
    set_kernel_mesh(make_mesh(n_data=4, n_model=2))
    assert not tp_flash_ok(cfg)
    preds_m, picked_m = jax.jit(run)(params)
    np.testing.assert_array_equal(_mask_after_eos(preds_m),
                                  _mask_after_eos(preds_s))
    np.testing.assert_allclose(np.asarray(picked_m), np.asarray(picked_s),
                               rtol=1e-3, atol=1e-4)
