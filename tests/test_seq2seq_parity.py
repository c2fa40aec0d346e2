"""Seq2seq composite parity vs the reference oracle: teacher-forced
forward_train (ASR_ST, MT) and token-identical greedy forward_eval (MT, ST)
through the KV-cached decoder."""

from unittest import mock

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from stjep_tpu.config import BOS, EOS, PAD, ModelConfig
from stjep_tpu.models.seq2seq import forward_eval, forward_train
from stjep_tpu.train.convert import convert_torch_model

from tests.reference_oracle import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

DIM = 16


def _make_cfg(mode="ASR_ST"):
    return ModelConfig(
        enc_vocab_size=20,
        dec_vocab_size=18,
        enc_embedding_size=8,
        dec_embedding_size=DIM,  # == dim_model -> no dec_emb_proj (like ref char setup)
        acous_dim=6,
        acous_hidden_size=5,
        dim_model=DIM,
        dim_feedforward=32,
        num_heads=4,
        enc_layers=2,
        dec_layers=2,
        num_unilstm_dec=3,
        spec_aug=False,
        dropout=0.0,
        embedding_dropout=0.0,
        max_seq_len_src=10,
        max_seq_len_tgt=12,
        mode=mode,
    )


@pytest.fixture(scope="module")
def setup():
    cfg = _make_cfg()
    load_reference()
    torch.manual_seed(1)
    emb_dyn_ave = np.random.RandomState(9).randn(DIM).astype(np.float32)
    with mock.patch("numpy.load", return_value=emb_dyn_ave):
        from models.Seq2seq import Seq2seq

        ref = Seq2seq(
            cfg.enc_vocab_size, cfg.dec_vocab_size, share_embedder=False,
            enc_embedding_size=cfg.enc_embedding_size,
            dec_embedding_size=cfg.dec_embedding_size,
            max_seq_len_src=cfg.max_seq_len_src,
            max_seq_len_tgt=cfg.max_seq_len_tgt,
            num_heads=cfg.num_heads, dim_model=cfg.dim_model,
            dim_feedforward=cfg.dim_feedforward,
            enc_layers=cfg.enc_layers, dec_layers=cfg.dec_layers,
            embedding_dropout=0.0, dropout=0.0, act=False,
            transformer_type="standard",
            acous_dim=cfg.acous_dim, acous_hidden_size=cfg.acous_hidden_size,
            mode=cfg.mode, load_mode="null",
        )
    ref.las.encoder.spec_aug = False  # deterministic oracle
    ref.eval()
    params = convert_torch_model(ref, cfg)

    rng = np.random.RandomState(0)
    B, T = 2, 24
    feats = rng.randn(B, T, cfg.acous_dim).astype(np.float32)
    lens = np.array([23, 15])
    src = rng.randint(5, cfg.enc_vocab_size, size=(B, cfg.max_seq_len_src)).astype(np.int64)
    src[:, 0] = BOS
    src[:, 6] = EOS
    src[:, 7:] = PAD
    tgt = rng.randint(5, cfg.dec_vocab_size, size=(B, cfg.max_seq_len_tgt)).astype(np.int64)
    tgt[:, 0] = BOS
    tgt[:, 9] = EOS
    tgt[:, 10:] = PAD
    return cfg, ref, params, feats, lens, src, tgt


def test_forward_train_asr_st_parity(setup):
    cfg, ref, params, feats, lens, src, tgt = setup
    tlens = [torch.tensor([int(l)]) for l in lens]
    with torch.no_grad():
        ref_out = ref.forward_train(
            torch.tensor(src), tgt=torch.tensor(tgt),
            acous_feats=torch.tensor(feats), acous_lens=tlens,
            mode="ASR_ST", use_gpu=False,
        )
    out = forward_train(
        params, cfg, "ASR_ST", jnp.asarray(src), tgt=jnp.asarray(tgt),
        acous_feats=jnp.asarray(feats), acous_lens=jnp.asarray(lens),
        is_training=False,
    )
    np.testing.assert_allclose(
        np.asarray(out["logps_asr"]), ref_out["logps_asr"].numpy(),
        rtol=1e-3, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(out["lengths_asr"]), np.asarray(ref_out["lengths_asr"])
    )
    np.testing.assert_allclose(
        np.asarray(out["emb_st"]), ref_out["emb_st"].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["logps_st"]), ref_out["logps_st"].numpy(),
        rtol=1e-3, atol=1e-5,
    )


def test_forward_train_mt_parity(setup):
    cfg, ref, params, feats, lens, src, tgt = setup
    with torch.no_grad():
        ref_out = ref.forward_train(
            torch.tensor(src), tgt=torch.tensor(tgt), mode="MT", use_gpu=False
        )
    out = forward_train(
        params, cfg, "MT", jnp.asarray(src), tgt=jnp.asarray(tgt),
        is_training=False,
    )
    np.testing.assert_allclose(
        np.asarray(out["logps_mt"]), ref_out["logps_mt"].numpy(),
        rtol=1e-3, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(out["preds_mt"]), ref_out["preds_mt"].squeeze(-1).numpy()
    )


def test_forward_eval_mt_token_identical(setup):
    cfg, ref, params, feats, lens, src, tgt = setup
    with torch.no_grad():
        ref_out = ref.forward_eval(src=torch.tensor(src), mode="MT", use_gpu=False)
    out = forward_eval(params, cfg, "MT", src=jnp.asarray(src))
    ref_preds = ref_out["preds_mt"].numpy()
    got = np.asarray(out["preds_mt"])[:, : ref_preds.shape[1]]
    np.testing.assert_array_equal(got, ref_preds)


def test_forward_eval_asr_st_token_identical(setup):
    cfg, ref, params, feats, lens, src, tgt = setup
    tlens = [torch.tensor([int(l)]) for l in lens]
    with torch.no_grad():
        ref_out = ref.forward_eval(
            acous_feats=torch.tensor(feats), acous_lens=tlens,
            mode="ASR_ST", use_gpu=False,
        )
    out = forward_eval(
        params, cfg, "ASR_ST", acous_feats=jnp.asarray(feats),
        acous_lens=jnp.asarray(lens),
    )
    np.testing.assert_array_equal(
        np.asarray(out["preds_asr"]), ref_out["preds_asr"].squeeze(-1).numpy()
    )
    ref_preds = ref_out["preds_st"].numpy()
    got = np.asarray(out["preds_st"])[:, : ref_preds.shape[1]]
    np.testing.assert_array_equal(got, ref_preds)


def test_ae_head_logps_match_reference(setup):
    """AE head oracle: the only executable AE piece in the reference is the
    shared output layer `out_src = las.decoder.acous_out` + log_softmax
    (ref: Seq2seq.py:172-173, 240-246; `_decoder_en` itself has no caller —
    the eval branch was lost upstream). Pin our _decoder_en to torch's math
    on the converted weights."""
    cfg, ref, params, feats, lens, src, tgt = setup
    from stjep_tpu.models.seq2seq import _decoder_en

    rng = np.random.RandomState(7)
    emb = rng.randn(2, 5, cfg.dim_model).astype(np.float32)
    with torch.no_grad():
        logits_t = ref.las.decoder.acous_out(torch.tensor(emb))
        logps_t = torch.log_softmax(logits_t, dim=2).numpy()
    _, logps, preds = _decoder_en(params, jnp.asarray(emb))
    np.testing.assert_allclose(np.asarray(logps), logps_t, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(preds), logps_t.argmax(-1))


def test_shared_embedder_mt_parity():
    """share_embedder=True through the converter: the reference rebinds
    enc_embedder = dec_embedder to ONE module (ref: Seq2seq.py:119-121);
    the rebuild reads the enc leaf for both sides (_dec_embedder). MT
    teacher-forced logps and greedy preds must match the oracle."""
    load_reference()
    torch.manual_seed(3)
    emb_dyn_ave = np.random.RandomState(11).randn(DIM).astype(np.float32)
    with mock.patch("numpy.load", return_value=emb_dyn_ave):
        from models.Seq2seq import Seq2seq

        ref = Seq2seq(
            20, 20, share_embedder=True,
            enc_embedding_size=DIM, dec_embedding_size=DIM,
            max_seq_len_src=10, max_seq_len_tgt=12,
            num_heads=4, dim_model=DIM, dim_feedforward=32,
            enc_layers=2, dec_layers=2, embedding_dropout=0.0, dropout=0.0,
            act=False, transformer_type="standard",
            acous_dim=6, acous_hidden_size=5, mode="MT", load_mode="null",
        )
    ref.eval()
    assert ref.enc_embedder is ref.dec_embedder  # truly one module

    cfg = ModelConfig(
        enc_vocab_size=20, dec_vocab_size=20, share_embedder=True,
        enc_embedding_size=DIM, dec_embedding_size=DIM,
        acous_dim=6, acous_hidden_size=5, dim_model=DIM, dim_feedforward=32,
        num_heads=4, enc_layers=2, dec_layers=2, num_unilstm_dec=3,
        spec_aug=False, dropout=0.0, embedding_dropout=0.0,
        max_seq_len_src=10, max_seq_len_tgt=12, mode="MT",
    )
    params = convert_torch_model(ref, cfg)
    np.testing.assert_array_equal(
        np.asarray(params["enc_embedder"]), np.asarray(params["dec_embedder"])
    )

    rng = np.random.RandomState(4)
    src = rng.randint(5, 20, size=(2, 10)).astype(np.int64)
    src[:, 0] = BOS
    src[:, 7] = EOS
    src[:, 8:] = PAD
    tgt = rng.randint(5, 20, size=(2, 12)).astype(np.int64)
    tgt[:, 0] = BOS
    tgt[:, 9] = EOS
    tgt[:, 10:] = PAD
    with torch.no_grad():
        ref_out = ref.forward_train(
            torch.tensor(src), tgt=torch.tensor(tgt), mode="MT", use_gpu=False
        )
    out = forward_train(
        params, cfg, "MT", jnp.asarray(src), tgt=jnp.asarray(tgt),
        is_training=False,
    )
    np.testing.assert_allclose(
        np.asarray(out["logps_mt"]), ref_out["logps_mt"].numpy(),
        rtol=1e-3, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(out["preds_mt"]), ref_out["preds_mt"].squeeze(-1).numpy()
    )
