"""Device-side picked-logp eval outputs and the flash greedy eval path.

The trainer's dev evaluation scores the reference token under the model's
free-running distribution (ref: trainer_asr.py:_evaluate_batches). These
tests pin (a) picked_* == host take_along of the dense logps buffer, and
(b) the fused-Pallas greedy (interpret mode, STJEP_FORCE_FLASH) producing
token-identical preds and matching picked logps."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stjep_tpu.config import BOS, ModelConfig
from stjep_tpu.models.seq2seq import forward_eval, init_seq2seq


def _mk(mode="ASR_ST", **kw):
    base = dict(
        enc_vocab_size=20, dec_vocab_size=20, enc_embedding_size=8,
        dec_embedding_size=16, acous_dim=8, acous_hidden_size=8, dim_model=16,
        dim_feedforward=32, num_heads=4, enc_layers=2, dec_layers=2,
        num_unilstm_dec=3, spec_aug=False, dropout=0.0,
        max_seq_len_src=12, max_seq_len_tgt=16, mode=mode,
    )
    base.update(kw)
    return ModelConfig(**base)


def _batch(cfg, B=2, T=16):
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, T, cfg.acous_dim).astype(np.float32))
    lens = jnp.asarray([T - 2, T // 2])
    src = jnp.asarray(rng.randint(5, cfg.enc_vocab_size,
                                  size=(B, cfg.max_seq_len_src))).at[:, 0].set(BOS)
    tgt = jnp.asarray(rng.randint(5, cfg.dec_vocab_size,
                                  size=(B, cfg.max_seq_len_tgt))).at[:, 0].set(BOS)
    return feats, lens, src, tgt


def _host_pick(logps, refs):
    tgt = np.asarray(refs)[:, 1:]
    lp = np.asarray(logps)[:, : tgt.shape[1]]
    return np.take_along_axis(lp, tgt[:, :, None], axis=2)[:, :, 0]


@pytest.mark.slow  # heavy integration: slow lane (r5 re-budget)
def test_picked_matches_host_gather_asr_st():
    cfg = _mk("ASR_ST")
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    feats, lens, src, tgt = _batch(cfg)
    dense = forward_eval(params, cfg, "ASR_ST", acous_feats=feats,
                         acous_lens=lens, use_flash=False)
    picked = forward_eval(params, cfg, "ASR_ST", acous_feats=feats,
                          acous_lens=lens, ref_src=src, ref_tgt=tgt,
                          use_flash=False)
    assert "logps_asr" not in picked and "logps_st" not in picked
    np.testing.assert_array_equal(np.asarray(dense["preds_st"]),
                                  np.asarray(picked["preds_st"]))
    np.testing.assert_allclose(
        _host_pick(dense["logps_asr"], src), np.asarray(picked["picked_asr"]),
        rtol=0, atol=0)
    np.testing.assert_allclose(
        _host_pick(np.asarray(dense["logps_st"])[:, 1:], tgt),
        np.asarray(picked["picked_st"]), rtol=0, atol=0)


def test_picked_matches_host_gather_mt():
    cfg = _mk("MT")
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    _, _, src, tgt = _batch(cfg)
    dense = forward_eval(params, cfg, "MT", src=src, use_flash=False)
    picked = forward_eval(params, cfg, "MT", src=src, ref_tgt=tgt,
                          use_flash=False)
    np.testing.assert_allclose(
        _host_pick(np.asarray(dense["logps_mt"])[:, 1:], tgt),
        np.asarray(picked["picked_mt"]), rtol=0, atol=0)


@pytest.mark.slow
def test_flash_greedy_eval_matches_dense():
    """Fused-kernel greedy eval (interpret mode): token-identical preds,
    picked logps equal to the dense path to fp tolerance."""
    os.environ["STJEP_FORCE_FLASH"] = "1"
    try:
        cfg = _mk("ASR_ST")
        params = init_seq2seq(jax.random.PRNGKey(0), cfg)
        feats, lens, src, tgt = _batch(cfg)
        dense = forward_eval(params, cfg, "ASR_ST", acous_feats=feats,
                             acous_lens=lens, ref_src=src, ref_tgt=tgt,
                             use_flash=False)
        flash = forward_eval(params, cfg, "ASR_ST", acous_feats=feats,
                             acous_lens=lens, ref_src=src, ref_tgt=tgt)
        np.testing.assert_array_equal(np.asarray(dense["preds_st"]),
                                      np.asarray(flash["preds_st"]))
        np.testing.assert_allclose(np.asarray(dense["picked_st"]),
                                   np.asarray(flash["picked_st"]),
                                   rtol=0, atol=2e-5)
    finally:
        os.environ.pop("STJEP_FORCE_FLASH", None)


@pytest.mark.slow
def test_las_greedy_flash_matches_dense():
    """Fused free-running LAS decode kernel (interpret mode): identical
    greedy tokens/lengths, matching embs and picked logps vs the XLA scan."""
    from stjep_tpu.models.las_decoder import las_decoder_forward, las_decoder_init

    os.environ["STJEP_FORCE_FLASH"] = "1"
    try:
        cfg = _mk("ASR", dim_model=128, acous_hidden_size=64,
                  enc_vocab_size=50, enc_embedding_size=16)
        params = las_decoder_init(jax.random.PRNGKey(3), cfg)
        rng = np.random.RandomState(1)
        B, Tk = 2, 12
        acous_out = jnp.asarray(rng.randn(B, Tk, 128).astype(np.float32))
        lens = jnp.asarray([Tk * 8, Tk * 8 // 2])
        refs = jnp.asarray(rng.randint(5, 50, size=(B, 11)).astype(np.int32))

        dense = las_decoder_forward(
            params, cfg, acous_out, acous_lens=lens, max_seq_len=12,
            ref_tokens=refs, want_logps=False, flash_ok=False)
        flash = las_decoder_forward(
            params, cfg, acous_out, acous_lens=lens, max_seq_len=12,
            ref_tokens=refs, want_logps=False, flash_ok=True)
        np.testing.assert_array_equal(np.asarray(dense[2]), np.asarray(flash[2]))
        np.testing.assert_array_equal(np.asarray(dense[3]), np.asarray(flash[3]))
        np.testing.assert_allclose(np.asarray(dense[0]), np.asarray(flash[0]),
                                   rtol=0, atol=2e-5)
        np.testing.assert_allclose(np.asarray(dense[1]), np.asarray(flash[1]),
                                   rtol=0, atol=2e-5)
    finally:
        os.environ.pop("STJEP_FORCE_FLASH", None)


@pytest.mark.slow
def test_las_tf_flash_forward_and_grad_match():
    """Fused teacher-forced scan kernel pair (interpret mode): forward embs
    and full parameter gradients match the XLA scan path, with and without
    dropout (the hoisted masks are shared, so paths are comparable)."""
    from stjep_tpu.models.las_decoder import las_decoder_forward, las_decoder_init

    cfg = _mk("ASR", dim_model=128, acous_hidden_size=64,
              enc_vocab_size=50, enc_embedding_size=16)
    params = las_decoder_init(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(1)
    B, Tk = 2, 12
    acous_out = jnp.asarray(rng.randn(B, Tk, 128).astype(np.float32))
    lens = jnp.asarray([Tk * 8, Tk * 8 // 2])
    tgt = jnp.asarray(rng.randint(5, 50, size=(B, 10)).astype(np.int32)
                      ).at[:, 0].set(BOS)

    def run(p, training, key):
        os_flag = os.environ.get("STJEP_FORCE_FLASH")
        embs, logps, preds, lengths = las_decoder_forward(
            p, cfg, acous_out, acous_lens=lens, tgt=tgt,
            use_teacher_forcing=True, rng=key, is_training=training)
        return embs, logps, preds, lengths

    for training, drop in ((False, 0.0), (True, 0.2)):
        c = cfg
        if drop != cfg.dropout:
            import dataclasses
            c = dataclasses.replace(cfg, dropout=drop)
        key = jax.random.PRNGKey(7)

        def fwd(p, flash):
            if flash:
                os.environ["STJEP_FORCE_FLASH"] = "1"
            else:
                os.environ.pop("STJEP_FORCE_FLASH", None)
            try:
                return las_decoder_forward(
                    p, c, acous_out, acous_lens=lens, tgt=tgt,
                    use_teacher_forcing=True, rng=key, is_training=training)
            finally:
                os.environ.pop("STJEP_FORCE_FLASH", None)

        d = fwd(params, False)
        f = fwd(params, True)
        np.testing.assert_allclose(np.asarray(d[0]), np.asarray(f[0]),
                                   rtol=0, atol=3e-5)
        np.testing.assert_array_equal(np.asarray(d[2]), np.asarray(f[2]))

        def loss(p, flash):
            embs, logps, preds, lengths = fwd(p, flash)
            pick = jnp.take_along_axis(
                logps, tgt[:, 1:].astype(jnp.int32)[:, :, None], axis=2)
            return -jnp.sum(pick)

        gd = jax.grad(lambda p: loss(p, False))(params)
        gf = jax.grad(lambda p: loss(p, True))(params)
        flat_d, _ = jax.tree_util.tree_flatten(gd)
        flat_f, _ = jax.tree_util.tree_flatten(gf)
        for a, b in zip(flat_d, flat_f):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)
