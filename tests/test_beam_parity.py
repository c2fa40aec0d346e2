"""Beam-search parity vs the reference oracle: decoded text lines must match
for MT / ST / ST_BASE at several beam widths."""

from unittest import mock

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stjep_tpu.config import BOS, EOS, PAD, ModelConfig
from stjep_tpu.infer.forward import forward_translate, forward_translate_refen
from stjep_tpu.train.convert import convert_torch_model
from stjep_tpu.utils.misc import detok_words

from tests.reference_oracle import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

DIM = 16
MAX_DECODE = 16


def _detok_ids(ids_row, id2word):
    words = [id2word.get(int(t), "<unk>") for t in ids_row]
    return detok_words(words, use_type="word")


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        enc_vocab_size=20, dec_vocab_size=18, enc_embedding_size=8,
        dec_embedding_size=DIM, acous_dim=6, acous_hidden_size=5,
        dim_model=DIM, dim_feedforward=32, num_heads=4, enc_layers=2,
        dec_layers=2, num_unilstm_dec=3, spec_aug=False, dropout=0.0,
        embedding_dropout=0.0, max_seq_len_src=10, max_seq_len_tgt=16,
        mode="ASR_ST",
    )
    load_reference()
    torch.manual_seed(2)
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
    ref.las.encoder.spec_aug = False
    ref.eval()
    params = convert_torch_model(ref, cfg)

    rng = np.random.RandomState(4)
    B, T = 3, 24
    feats = rng.randn(B, T, cfg.acous_dim).astype(np.float32)
    lens = np.array([23, 15, 18])
    src = rng.randint(5, cfg.enc_vocab_size, size=(B, cfg.max_seq_len_src)).astype(np.int64)
    src[:, 0] = BOS
    src[:, 7] = EOS
    src[:, 8:] = PAD
    id2word = {i: f"w{i}" for i in range(cfg.dec_vocab_size)}
    id2word[PAD] = "<pad>"
    id2word[EOS] = "</s>"
    return cfg, ref, params, feats, lens, src, id2word


def _ref_translate(ref, mode, feats=None, lens=None, src=None, beam=3,
                   refen=False):
    kw = dict(beam_width=beam, penalty_factor=1.0, use_gpu=False,
              max_seq_len=MAX_DECODE, mode=mode)
    if feats is not None:
        kw["acous_feats"] = torch.tensor(feats)
        kw["acous_lens"] = [torch.tensor([int(l)]) for l in lens]
    if src is not None:
        kw["src"] = torch.tensor(src)
    with torch.no_grad():
        if refen:
            return ref.forward_translate_refen(**kw)
        return ref.forward_translate(**kw)


@pytest.mark.parametrize("beam", [1, 2, 3])
def test_beam_mt_parity(setup, beam):
    cfg, ref, params, feats, lens, src, id2word = setup
    ref_preds = _ref_translate(ref, "MT", src=src, beam=beam).numpy()
    got = np.asarray(forward_translate(
        params, cfg, "MT", src=jnp.asarray(src), beam_width=beam,
        penalty_factor=1.0, max_seq_len=MAX_DECODE,
    ))
    for b in range(src.shape[0]):
        assert _detok_ids(got[b, 1:], id2word) == _detok_ids(
            ref_preds[b, 1:], id2word
        ), (b, got[b], ref_preds[b])


@pytest.mark.parametrize("mode", ["ST", "ST_BASE"])
def test_beam_st_parity(setup, mode):
    cfg, ref, params, feats, lens, src, id2word = setup
    ref_preds = _ref_translate(ref, mode, feats=feats, lens=lens, beam=3).numpy()
    got = np.asarray(forward_translate(
        params, cfg, mode, acous_feats=jnp.asarray(feats),
        acous_lens=jnp.asarray(lens), beam_width=3, penalty_factor=1.0,
        max_seq_len=MAX_DECODE,
    ))
    for b in range(feats.shape[0]):
        assert _detok_ids(got[b, 1:], id2word) == _detok_ids(
            ref_preds[b, 1:], id2word
        ), (mode, b, got[b], ref_preds[b])


def test_beam_asr_is_greedy_las(setup):
    cfg, ref, params, feats, lens, src, id2word = setup
    ref_preds = _ref_translate(ref, "ASR", feats=feats, lens=lens, beam=3)
    got = np.asarray(forward_translate(
        params, cfg, "ASR", acous_feats=jnp.asarray(feats),
        acous_lens=jnp.asarray(lens), beam_width=3, max_seq_len=MAX_DECODE,
    ))
    np.testing.assert_array_equal(got, ref_preds.squeeze(-1).numpy())


def test_beam_refen_st_parity(setup):
    cfg, ref, params, feats, lens, src, id2word = setup
    ref_preds = _ref_translate(ref, "ST", feats=feats, lens=lens, src=src,
                               beam=2, refen=True).numpy()
    got = np.asarray(forward_translate_refen(
        params, cfg, "ST", acous_feats=jnp.asarray(feats),
        acous_lens=jnp.asarray(lens), src=jnp.asarray(src), beam_width=2,
        penalty_factor=1.0, max_seq_len=MAX_DECODE,
    ))
    for b in range(feats.shape[0]):
        assert _detok_ids(got[b, 1:], id2word) == _detok_ids(
            ref_preds[b, 1:], id2word
        )


@pytest.mark.slow  # interpret-mode Pallas: the forced-kernel oracle arm
@pytest.mark.parametrize("mode,beam", [("MT", 2), ("MT", 3), ("ST", 3),
                                       ("ST_BASE", 3)])
def test_beam_parity_kernels_forced(setup, monkeypatch, mode, beam):
    """The fused decode path (the chain/megastep kernels — the default on
    TPU) pinned LINE-IDENTICAL against the live torch reference, not just
    against the dense XLA arm: STJEP_FORCE_FLASH runs the kernels in
    interpret mode on CPU, where their f32 arithmetic must reproduce the
    reference beams exactly (ref: models/Seq2seq.py:337-393)."""
    monkeypatch.setenv("STJEP_FORCE_FLASH", "1")
    cfg, ref, params, feats, lens, src, id2word = setup
    kw_ref = dict(beam=beam)
    kw_jax = dict(beam_width=beam, penalty_factor=1.0,
                  max_seq_len=MAX_DECODE)
    if mode == "MT":
        ref_preds = _ref_translate(ref, "MT", src=src, **kw_ref).numpy()
        got = np.asarray(forward_translate(
            params, cfg, "MT", src=jnp.asarray(src), **kw_jax))
    else:
        ref_preds = _ref_translate(ref, mode, feats=feats, lens=lens,
                                   **kw_ref).numpy()
        got = np.asarray(forward_translate(
            params, cfg, mode, acous_feats=jnp.asarray(feats),
            acous_lens=jnp.asarray(lens), **kw_jax))
    for b in range(ref_preds.shape[0]):
        assert _detok_ids(got[b, 1:], id2word) == _detok_ids(
            ref_preds[b, 1:], id2word
        ), (mode, beam, b, got[b], ref_preds[b])
