"""Universal transformer + ACT halting parity vs the reference oracle.

The reference ACT reads a module-global `device` that is never set
(ref: models/Act.py:28 — latent bug); the oracle injects it, our
implementation needs no such global by construction.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stjep_tpu.config import ModelConfig
from stjep_tpu.models.tf_decoder import tf_decoder_forward, tf_decoder_init
from stjep_tpu.models.tf_encoder import tf_encoder_forward, tf_encoder_init
from stjep_tpu.train.convert import convert_named_params

from tests.reference_oracle import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def _cfg(act=True):
    return ModelConfig(
        enc_vocab_size=16, dec_vocab_size=16, dim_model=16, dim_feedforward=32,
        num_heads=4, enc_layers=3, dec_layers=3, dropout=0.0,
        transformer_type="universal", act=act, mode="MT",
    )


@pytest.fixture(scope="module")
def oracle_enc():
    load_reference()
    import models.Act as ref_act

    ref_act.device = torch.device("cpu")  # fix the ref's unset global
    from models.TFEnc import Encoder

    torch.manual_seed(3)
    cfg = _cfg()
    enc = Encoder(dim_model=cfg.dim_model, dim_feedforward=cfg.dim_feedforward,
                  num_heads=cfg.num_heads, num_layers=cfg.enc_layers,
                  act=True, dropout=0.0, transformer_type="universal")
    enc.eval()
    return cfg, enc


def test_act_encoder_parity(oracle_enc):
    cfg, ref = oracle_enc
    named = {"enc_src." + n: p.detach().numpy() for n, p in ref.named_parameters()}
    params = convert_named_params(named, cfg)["enc_src"]

    x = np.random.RandomState(0).randn(2, 5, cfg.dim_model).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_map = ref(torch.tensor(x), src_mask=None)
    out, layer_map = tf_encoder_forward(params, cfg, jnp.asarray(x),
                                        is_training=False)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(layer_map), ref_map.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_act_decoder_runs():
    cfg = _cfg()
    params = tf_decoder_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 4, 16).astype(np.float32))
    mem = jnp.asarray(np.random.RandomState(2).randn(2, 6, 16).astype(np.float32))
    out, layer_map, _ = tf_decoder_forward(params, cfg, x, mem,
                                           is_training=False)
    assert out.shape == (2, 4, 16)
    lm = np.asarray(layer_map)
    assert (lm >= 1).all() and (lm <= cfg.dec_layers).all()


def test_universal_no_act_layer_signal():
    """Universal type without ACT adds the per-layer signal each layer."""
    cfg = _cfg(act=False)
    params = tf_encoder_init(jax.random.PRNGKey(0), cfg)
    assert len(params["layers"]) == 1  # shared layer
    x = jnp.asarray(np.random.RandomState(3).randn(2, 5, 16).astype(np.float32))
    out, _ = tf_encoder_forward(params, cfg, x, is_training=False)
    assert out.shape == (2, 5, 16)


@pytest.mark.slow  # heavy integration: slow lane
def test_act_greedy_decode_matches_prefix_rerun():
    """ACT models decode via full-buffer causal re-runs (halting cannot be
    KV-cached). Pin it against the reference algorithm: literally re-run
    the decoder on each growing TRUE prefix (ref: Seq2seq.py:577-586) and
    greedy-pick — tokens must be identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stjep_tpu.config import BOS, PAD, ModelConfig
    from stjep_tpu.models.seq2seq import (
        _get_tgt_emb,
        _needs_full_rerun,
        forward_eval,
        init_seq2seq,
    )
    from stjep_tpu.models.tf_decoder import tf_decoder_forward
    from stjep_tpu.ops.attention import linear

    cfg = ModelConfig(
        enc_vocab_size=20, dec_vocab_size=20, enc_embedding_size=8,
        dec_embedding_size=16, acous_dim=8, acous_hidden_size=8, dim_model=16,
        dim_feedforward=32, num_heads=4, enc_layers=2, dec_layers=2,
        num_unilstm_dec=3, spec_aug=False, dropout=0.0,
        max_seq_len_src=10, max_seq_len_tgt=12, mode="MT",
        transformer_type="universal", act=True,
    )
    assert _needs_full_rerun(cfg)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randint(5, 20, size=(2, 10)).astype(np.int32)
                      ).at[:, 0].set(BOS)

    out = forward_eval(params, cfg, "MT", src=src)
    got = np.asarray(out["preds_mt"])

    # reference algorithm: grow the true prefix, full decoder re-run each step
    from stjep_tpu.models.seq2seq import (
        _encoder_en,
        _get_src_emb,
        _pre_proc_src,
    )

    src_trim = _pre_proc_src(src)
    B, Ls = src_trim.shape
    emb_dyn = jnp.broadcast_to(params["emb_dyn_ave"][None, None, :],
                               (B, Ls, cfg.dim_model))
    _, emb_src, src_mask_input = _get_src_emb(params, cfg, src_trim, emb_dyn)
    enc_out = _encoder_en(params, cfg, emb_src, src_mask=src_mask_input)

    L = cfg.max_seq_len_tgt
    toks = np.full((B, L), PAD, np.int32)
    toks[:, 0] = BOS
    done = np.zeros((B,), bool)
    for i in range(1, L):
        prefix = jnp.asarray(toks[:, :i])
        tgt_mask, emb = _get_tgt_emb(params, cfg, prefix)
        dec_out, _, _ = tf_decoder_forward(
            params["dec_tgt"], cfg, emb, enc_out, tgt_mask=tgt_mask,
            src_mask=src_mask_input, is_training=False,
            max_time=max(500, L))
        logits = linear(params["out_tgt"], dec_out[:, -1])
        pred = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int32)
        toks[:, i] = pred
        from stjep_tpu.config import EOS

        if bool(np.all(done | (pred == EOS))):
            done |= pred == EOS
            break
        done |= pred == EOS

    # compare up to the emitted region (forward_eval stops early on all-EOS)
    n = min(got.shape[1], toks.shape[1])
    # positions after each row's first EOS are PAD in both representations
    for b_ in range(B):
        row_ref = toks[b_, :n]
        row_got = got[b_, :n]
        stop = np.where(row_ref == 3)[0]
        upto = int(stop[0]) + 1 if len(stop) else n
        np.testing.assert_array_equal(row_got[:upto], row_ref[:upto])
