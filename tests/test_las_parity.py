"""LAS parity against the reference PyTorch implementation (eval mode):
pyramid encoder outputs, teacher-forced decode, and token-identical greedy."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stjep_tpu.config import BOS, ModelConfig
from stjep_tpu.models.las import las_forward
from stjep_tpu.models.las_encoder import las_encoder_forward
from stjep_tpu.train.convert import convert_named_params

from tests.reference_oracle import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def _make_ref_las(cfg: ModelConfig):
    load_reference()
    from models.Las import LAS

    m = LAS(
        vocab_size=cfg.enc_vocab_size,
        embedding_size=cfg.enc_embedding_size,
        acous_dim=cfg.acous_dim,
        acous_hidden_size=cfg.acous_hidden_size,
        acous_att_mode=cfg.acous_att_mode,
        hidden_size_dec=cfg.dim_model,
        hidden_size_shared=cfg.dim_model,
        num_unilstm_dec=cfg.num_unilstm_dec,
        acous_norm=True,
        spec_aug=False,
        batch_norm=False,
        enc_mode="pyramid",
        dropout=0.0,
        residual=True,
        max_seq_len=cfg.max_seq_len_src,
    )
    m.eval()
    return m


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        enc_vocab_size=20,
        dec_vocab_size=20,
        enc_embedding_size=8,
        acous_dim=6,
        acous_hidden_size=5,
        dim_model=12,
        num_unilstm_dec=3,
        spec_aug=False,
        dropout=0.0,
        max_seq_len_src=10,
        mode="ASR",
    )
    torch.manual_seed(0)
    ref = _make_ref_las(cfg)
    named = {"las." + n: p.detach().numpy() for n, p in ref.named_parameters()}
    params = convert_named_params(named, cfg)["las"]

    rng = np.random.RandomState(0)
    B, T = 3, 24
    feats = rng.randn(B, T, cfg.acous_dim).astype(np.float32)
    lens = np.array([16, 11, 23])
    tgt = rng.randint(5, cfg.enc_vocab_size, size=(B, 8)).astype(np.int64)
    tgt[:, 0] = BOS
    return cfg, ref, params, feats, lens, tgt


def _run_ref(ref, feats, lens, tgt, tf_ratio):
    tlens = [torch.tensor([int(l)]) for l in lens]
    with torch.no_grad():
        return ref(
            torch.tensor(feats), acous_lens=tlens,
            tgt=torch.tensor(tgt) if tgt is not None else None,
            is_training=False, teacher_forcing_ratio=tf_ratio, use_gpu=False,
        )


def test_pyramid_encoder_parity(setup):
    cfg, ref, params, feats, lens, _ = setup
    with torch.no_grad():
        tlens = [torch.tensor([int(l)]) for l in lens]
        ref_out = ref.encoder(torch.tensor(feats), acous_lens=tlens,
                              is_training=False, use_gpu=False)
    out, lens8 = las_encoder_forward(
        params["encoder"], cfg, jnp.asarray(feats), jnp.asarray(lens),
        is_training=False,
    )
    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(lens8) * 8,
                                  np.array([24, 16, 24]))


def test_las_teacher_forced_parity(setup):
    cfg, ref, params, feats, lens, tgt = setup
    embs_t, logps_t, syms_t, lengths_t = _run_ref(ref, feats, lens, tgt, 1.0)
    embs, logps, syms, lengths = las_forward(
        params, cfg, jnp.asarray(feats), jnp.asarray(lens), tgt=jnp.asarray(tgt),
        use_teacher_forcing=True, is_training=False,
    )
    np.testing.assert_allclose(np.asarray(embs), embs_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logps), logps_t.numpy(), rtol=1e-3, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(syms), syms_t.squeeze(-1).numpy()
    )
    np.testing.assert_array_equal(np.asarray(lengths), np.asarray(lengths_t))


def test_las_greedy_token_identical(setup):
    cfg, ref, params, feats, lens, _ = setup
    embs_t, logps_t, syms_t, lengths_t = _run_ref(ref, feats, lens, None, 0.0)
    embs, logps, syms, lengths = las_forward(
        params, cfg, jnp.asarray(feats), jnp.asarray(lens), tgt=None,
        use_teacher_forcing=False, max_seq_len=cfg.max_seq_len_src,
        is_training=False,
    )
    np.testing.assert_array_equal(np.asarray(syms), syms_t.squeeze(-1).numpy())
    np.testing.assert_array_equal(np.asarray(lengths), np.asarray(lengths_t))
    np.testing.assert_allclose(np.asarray(embs), embs_t.numpy(), rtol=1e-4, atol=1e-5)
