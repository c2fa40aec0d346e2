"""bfloat16 compute path: init, forward, gradients, and a train step.

One jitted value_and_grad program is compiled once (module-scope fixture)
and shared by the forward / train-step assertions — eager op-by-op
execution of the joint forward+backward took ~75 s of suite time on the
1-CPU CI host.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from stjep_tpu.config import BOS, ModelConfig
from stjep_tpu.models.seq2seq import forward_eval, forward_train, init_seq2seq
from stjep_tpu.train.optim import make_optimizer, set_lr
from stjep_tpu.train.policies import iter_paths


def _cfg():
    # deliberately minimal (1+1 transformer layers, 2 LSTM dec layers,
    # seq lens 8): the file asserts dtype flow, not capacity, and the
    # fwd+bwd XLA compile dominates its wall time on the 1-CPU host
    return ModelConfig(
        enc_vocab_size=20, dec_vocab_size=16, enc_embedding_size=8,
        dec_embedding_size=16, acous_dim=8, acous_hidden_size=8, dim_model=16,
        dim_feedforward=32, num_heads=4, enc_layers=1, dec_layers=1,
        num_unilstm_dec=2, spec_aug=True, dropout=0.1,
        max_seq_len_src=8, max_seq_len_tgt=8, mode="ASR_ST",
    )


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    params = init_seq2seq(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    B, T = 2, 16
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, T, 8), jnp.bfloat16)
    lens = jnp.array([14, 8])
    src = jax.random.randint(jax.random.PRNGKey(2), (B, 8), 5, 20).at[:, 0].set(BOS)
    tgt = jax.random.randint(jax.random.PRNGKey(3), (B, 8), 5, 16).at[:, 0].set(BOS)
    return cfg, params, feats, lens, src, tgt


@pytest.fixture(scope="module")
def vag_run(setup):
    """One compiled loss+grad program, reused across tests (and across the
    post-update loss evaluation)."""
    cfg, params, feats, lens, src, tgt = setup

    def loss_fn(p):
        o = forward_train(p, cfg, "ASR_ST", src, tgt=tgt, acous_feats=feats,
                          acous_lens=lens, rng=jax.random.PRNGKey(5),
                          is_training=True)
        la = -jnp.mean(jnp.take_along_axis(
            o["logps_asr"].astype(jnp.float32), src[:, 1:, None], axis=2))
        ld = -jnp.mean(jnp.take_along_axis(
            o["logps_st"][:, :-1].astype(jnp.float32), tgt[:, 1:, None], axis=2))
        return la + ld, o

    vag = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    (l0, out), grads = vag(params)
    return vag, l0, out, grads


def test_bf16_params(setup):
    cfg, params, *_ = setup
    for path, leaf in iter_paths(params):
        assert leaf.dtype == jnp.bfloat16, path


@pytest.mark.slow  # heavy integration: slow lane
def test_bf16_forward_train(vag_run):
    _, _, out, _ = vag_run
    assert out["logps_st"].dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out["logps_st"], dtype=np.float32)).all()


@pytest.mark.slow  # heavy integration: slow lane
def test_bf16_train_step_updates(setup, vag_run):
    cfg, params, *_ = setup
    vag, l0, _, grads = vag_run
    tx = make_optimizer(1.0)
    opt_state = set_lr(tx.init(params), 1e-2)
    updates, opt_state = tx.update(grads, opt_state, params)
    new = optax.apply_updates(params, updates)
    (l1, _), _ = vag(new)
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
    assert float(l1) < float(l0)
    # dtype preserved through the update
    assert new["enc_emb_proj"]["w"].dtype == jnp.bfloat16


@pytest.mark.slow  # heavy integration: slow lane
def test_bf16_greedy_eval_runs(setup):
    cfg, params, feats, lens, src, tgt = setup
    out = forward_eval(params, cfg, "ASR_ST", acous_feats=feats, acous_lens=lens)
    assert out["preds_st"].shape == (2, cfg.max_seq_len_tgt)


@pytest.mark.slow  # heavy integration: slow lane (r5 re-budget)
def test_bf16_features_with_f32_params(setup):
    """bf16-STAGED features on an f32 checkpoint (translate/train
    --feat_dtype bfloat16 without --dtype bfloat16): the recurrences must
    run in the promoted f32 compute dtype — a carry initialised from the
    raw input dtype broke lax.scan's carry-type invariance (caught by the
    round-4 TPU CLI drive). Predictions must match the all-f32 run exactly
    (the first consumer is an MXU matmul that reads bf16 operands anyway)."""
    cfg, _, feats, lens, src, tgt = setup
    params32 = init_seq2seq(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    out_mixed = forward_eval(
        params32, cfg, "ASR_ST",
        acous_feats=feats.astype(jnp.bfloat16), acous_lens=lens)
    out_f32 = forward_eval(
        params32, cfg, "ASR_ST",
        acous_feats=feats.astype(jnp.float32), acous_lens=lens)
    assert out_mixed["logps_st"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out_mixed["preds_asr"]),
                                  np.asarray(out_f32["preds_asr"]))
