"""End-to-end torch-checkpoint conversion: pickle a reference model the way
the reference Checkpoint does, convert with the CLI script, and verify
token-identical greedy decode through the converted checkpoint."""

import os
import subprocess
import sys
from unittest import mock

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from stjep_tpu.config import BOS, ModelConfig

from tests.reference_oracle import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIM = 16


@pytest.mark.slow  # heavy integration: slow lane
def test_convert_cli_roundtrip(tmp_path):
    load_reference()
    import dill

    torch.manual_seed(7)
    emb_dyn_ave = np.random.RandomState(3).randn(DIM).astype(np.float32)
    with mock.patch("numpy.load", return_value=emb_dyn_ave):
        from models.Seq2seq import Seq2seq

        ref = Seq2seq(
            20, 18, share_embedder=False, enc_embedding_size=8,
            dec_embedding_size=DIM, max_seq_len_src=10, max_seq_len_tgt=12,
            num_heads=4, dim_model=DIM, dim_feedforward=32, enc_layers=2,
            dec_layers=2, embedding_dropout=0.0, dropout=0.0, act=False,
            transformer_type="standard", acous_dim=6, acous_hidden_size=5,
            mode="ASR_ST", load_mode="null",
        )
    ref.las.encoder.spec_aug = False
    ref.eval()

    # save in the reference's on-disk layout (ref: modules/checkpoint.py:54-83)
    tdir = tmp_path / "torch_ckpt"
    os.makedirs(tdir)
    torch.save(ref, os.path.join(tdir, "model.pt"))
    with open(os.path.join(tdir, "input_vocab.pt"), "wb") as f:
        dill.dump([f"w{i}" for i in range(20)], f)
    with open(os.path.join(tdir, "output_vocab.pt"), "wb") as f:
        dill.dump([f"c{i}" for i in range(18)], f)
    np.save(tmp_path / "dyn.npy", emb_dyn_ave)

    out = str(tmp_path / "converted")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    r = subprocess.run(
        [sys.executable, "scripts/convert_torch_checkpoint.py",
         "--torch_ckpt", str(tdir), "--out", out,
         "--emb_dyn_ave", str(tmp_path / "dyn.npy")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-3000:]

    # load via the translate-CLI loader and compare greedy decode
    sys.path.insert(0, REPO)
    import importlib

    translate_cli = importlib.import_module("translate")
    cfg, params, ckpt = translate_cli._load_model(out)
    assert ckpt.input_vocab[3] == "w3"
    np.testing.assert_allclose(
        np.asarray(params["emb_dyn_ave"]), emb_dyn_ave, rtol=1e-6)

    rng = np.random.RandomState(1)
    feats = rng.randn(2, 24, 6).astype(np.float32)
    lens = [torch.tensor([23]), torch.tensor([15])]
    with torch.no_grad():
        ref_out = ref.forward_eval(
            acous_feats=torch.tensor(feats), acous_lens=lens, mode="ASR_ST",
            use_gpu=False,
        )
    from stjep_tpu.models.seq2seq import forward_eval

    got = forward_eval(params, cfg, "ASR_ST", acous_feats=jnp.asarray(feats),
                       acous_lens=jnp.asarray([23, 15]))
    np.testing.assert_array_equal(
        np.asarray(got["preds_asr"]), ref_out["preds_asr"].squeeze(-1).numpy())
    ref_preds = ref_out["preds_st"].numpy()
    np.testing.assert_array_equal(
        np.asarray(got["preds_st"])[:, : ref_preds.shape[1]], ref_preds)
