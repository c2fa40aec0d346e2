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
