"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from stjep_tpu.config import BOS, ModelConfig
from stjep_tpu.models.seq2seq import forward_train, init_seq2seq
from stjep_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    shard_batch,
    shard_params,
)
from stjep_tpu.train.policies import iter_paths, path_str


def _tiny_cfg():
    return ModelConfig(
        enc_vocab_size=32, dec_vocab_size=24, enc_embedding_size=8,
        dec_embedding_size=16, acous_dim=8, acous_hidden_size=8,
        dim_model=16, dim_feedforward=32, num_heads=4, enc_layers=2,
        dec_layers=2, num_unilstm_dec=3, spec_aug=False, dropout=0.0,
        max_seq_len_src=12, max_seq_len_tgt=16, mode="ASR_ST",
    )


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    mesh = make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh()  # all data-parallel
    assert dict(mesh.shape) == {"data": 8, "model": 1}


def test_param_shardings_tp_rules():
    cfg = _tiny_cfg()
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_data=4, n_model=2)
    sh = param_shardings(params, mesh)
    flat = {path_str(p): s for p, s in iter_paths(sh)}
    # qkv column-parallel
    assert flat["enc_src.layers.0.slf_attn.w_qs.w"].spec == P(None, "model")
    # output proj row-parallel
    assert flat["enc_src.layers.0.slf_attn.fc.w"].spec == P("model", None)
    # ffn
    assert flat["dec_tgt.layers.1.pos_ffn.w_1.w"].spec == P(None, "model")
    assert flat["dec_tgt.layers.1.pos_ffn.w_2.w"].spec == P("model", None)
    # vocab projection
    assert flat["out_tgt.w"].spec == P(None, "model")
    # LSTM stays replicated
    assert flat["las.encoder.acous_enc_l1.fwd.w_ih"].spec == P()


def test_sharded_forward_matches_single_device():
    """DP x TP sharded forward must be numerically identical to unsharded."""
    cfg = _tiny_cfg()
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, T = 8, 16
    feats = rng.randn(B, T, cfg.acous_dim).astype(np.float32)
    lens = np.full((B,), T - 2, np.int32)
    src = rng.randint(5, cfg.enc_vocab_size, size=(B, 12)).astype(np.int32)
    src[:, 0] = BOS
    tgt = rng.randint(5, cfg.dec_vocab_size, size=(B, 16)).astype(np.int32)
    tgt[:, 0] = BOS

    def run(params, feats, lens, src, tgt):
        out = forward_train(
            params, cfg, "ASR_ST", src, tgt=tgt, acous_feats=feats,
            acous_lens=lens, is_training=False,
        )
        return out["logps_asr"], out["logps_st"]

    ref_a, ref_s = jax.jit(run)(params, jnp.asarray(feats), jnp.asarray(lens),
                                jnp.asarray(src), jnp.asarray(tgt))

    mesh = make_mesh(n_data=4, n_model=2)
    with mesh:
        sp = shard_params(params, mesh)
        data_sh = NamedSharding(mesh, P("data"))
        sharded = jax.jit(run)(
            sp,
            jax.device_put(feats, NamedSharding(mesh, P("data", None, None))),
            jax.device_put(lens, data_sh),
            jax.device_put(src, NamedSharding(mesh, P("data", None))),
            jax.device_put(tgt, NamedSharding(mesh, P("data", None))),
        )
    np.testing.assert_allclose(np.asarray(sharded[0]), np.asarray(ref_a),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded[1]), np.asarray(ref_s),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow  # heavy integration: slow lane
def test_trainer_step_on_mesh_matches_single_device(tmp_path):
    """A full Trainer_ASR_ST step on the (4, 2) mesh must produce the same
    losses and updated params as the plain single-device jit step."""
    from stjep_tpu.train.optim import make_optimizer
    from stjep_tpu.train.policies import trainable_mask
    from stjep_tpu.train.trainer import Trainer_ASR_ST

    cfg = _tiny_cfg()
    rng = np.random.RandomState(1)
    B, T = 8, 16
    item = {
        "srcid": rng.randint(5, cfg.enc_vocab_size,
                             size=(B, cfg.max_seq_len_src)).astype(np.int32),
        "tgtid": rng.randint(5, cfg.dec_vocab_size,
                             size=(B, cfg.max_seq_len_tgt)).astype(np.int32),
        "acous_feat": rng.randn(B, T, cfg.acous_dim).astype(np.float32),
        "acouslen": np.full((B,), T - 2, np.int32),
    }
    item["srcid"][:, 0] = BOS
    item["tgtid"][:, 0] = BOS

    def one_step(n_model, use_mesh, tag):
        t = Trainer_ASR_ST(
            expt_dir=str(tmp_path / tag), batch_size=B, minibatch_partition=2,
            lr_warmup_steps=0, learning_rate=1e-3, learning_rate_init=1e-3,
            seed=0,
        )
        params = init_seq2seq(jax.random.PRNGKey(0), cfg)
        t._tx = make_optimizer(1.0, trainable_mask(params, lambda n: False))
        if use_mesh:
            t.n_model = n_model
            t._setup_mesh()
            assert dict(t._mesh.shape) == {"data": 8 // n_model,
                                           "model": n_model}
            params = t._place(params)
        opt_state = t._init_opt(params)
        params, opt_state, losses = t._train_batch(
            cfg, params, opt_state, {k: v.copy() for k, v in item.items()}, 1
        )
        return losses, jax.device_get(params)

    ref_losses, ref_params = one_step(1, False, "single")
    for n_model in (1, 2):
        losses, params = one_step(n_model, True, f"mesh{n_model}")
        for k in ref_losses:
            np.testing.assert_allclose(losses[k], ref_losses[k],
                                       rtol=1e-5, atol=1e-6)
        from stjep_tpu.train.policies import iter_paths

        flat_ref = dict(iter_paths(ref_params))
        for p, leaf in iter_paths(params):
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_ref[p]),
                rtol=1e-5, atol=1e-6, err_msg=str(p))


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(jnp.sum(out["logps_st"])))


def test_decode_flash_auto_gate(monkeypatch):
    """The single auto-gate used by beam_search and forward_eval
    (parallel/spmd.decode_flash_auto): honours STJEP_NO_FLASH, needs a
    DP-only or TP-capable mesh, refuses ACT models, and on CPU only runs
    when forced (interpret mode, used by the oracle parity suites)."""
    from stjep_tpu.parallel.mesh import make_mesh
    from stjep_tpu.parallel.spmd import decode_flash_auto, set_kernel_mesh

    cfg = _tiny_cfg()  # dim_model not a multiple of 128 -> needs force on CPU
    monkeypatch.delenv("STJEP_NO_FLASH", raising=False)
    monkeypatch.delenv("STJEP_FORCE_FLASH", raising=False)

    assert not decode_flash_auto(cfg)  # CPU backend, not forced

    monkeypatch.setenv("STJEP_FORCE_FLASH", "1")
    assert decode_flash_auto(cfg)  # forced, no mesh

    monkeypatch.setenv("STJEP_NO_FLASH", "1")
    assert not decode_flash_auto(cfg)  # kill-switch wins over force
    monkeypatch.delenv("STJEP_NO_FLASH")

    try:
        set_kernel_mesh(make_mesh(n_data=8, n_model=1))
        assert decode_flash_auto(cfg)  # pure-DP mesh: weights replicated

        set_kernel_mesh(make_mesh(n_data=4, n_model=2))
        # TP mesh with every sharded dim divisible by n_model: TP kernels ok
        assert decode_flash_auto(cfg)

        import dataclasses

        # heads don't divide n_model -> _TP_RULES never sharded them ->
        # dense fallback
        cfg_odd = dataclasses.replace(cfg, num_heads=3)
        assert not decode_flash_auto(cfg_odd)

        # ACT/universal models must re-run the full causal prefix
        # (no KV cache) under any mesh
        cfg_act = dataclasses.replace(
            cfg, act=True, transformer_type="universal")
        assert not decode_flash_auto(cfg_act)
    finally:
        set_kernel_mesh(None)

    import dataclasses

    cfg_act = dataclasses.replace(cfg, act=True, transformer_type="universal")
    assert not decode_flash_auto(cfg_act)  # and with no mesh at all
