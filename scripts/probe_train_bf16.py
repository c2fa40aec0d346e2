"""Probe: why is the bf16 train step ~300x slower than f32?

Prints per-step wall times with compile logging on, at reduced shapes
first so the log is quick to read.
"""

import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_log_compiles", True)

import jax.numpy as jnp

from stjep_tpu.config import BOS, ModelConfig
from stjep_tpu.models.seq2seq import forward_train, init_seq2seq
from stjep_tpu.train.optim import make_optimizer, set_lr
import optax

cfg = ModelConfig(
    enc_vocab_size=30000, dec_vocab_size=200,
    enc_embedding_size=200, dec_embedding_size=512,
    acous_dim=40, acous_hidden_size=256,
    dim_model=512, dim_feedforward=1024,
    num_heads=8, enc_layers=6, dec_layers=6,
    num_unilstm_dec=3, spec_aug=True, dropout=0.2,
    max_seq_len_src=90, max_seq_len_tgt=150,
    mode="ASR_ST",
)
B, frames = 4, 512
rng = np.random.RandomState(0)
feats = jnp.asarray(rng.randn(B, frames, 40).astype(np.float32))
lens = jnp.asarray(np.full((B,), frames - 8, np.int32))
src = jnp.asarray(rng.randint(5, 30000, size=(B, 90)).astype(np.int32)
                  ).at[:, 0].set(BOS)
tgt = jnp.asarray(rng.randint(5, 200, size=(B, 150)).astype(np.int32)
                  ).at[:, 0].set(BOS)

tx = make_optimizer(1.0)


def train_step(params, opt_state, feats, lens, src, tgt, rng):
    def loss_fn(p):
        o = forward_train(p, cfg, "ASR_ST", src, tgt=tgt, acous_feats=feats,
                          acous_lens=lens, rng=rng, is_training=True)
        la = -jnp.mean(jnp.take_along_axis(
            o["logps_asr"], src[:, 1:, None], axis=2))
        ld = -jnp.mean(jnp.take_along_axis(
            o["logps_st"][:, :-1], tgt[:, 1:, None], axis=2))
        return la + ld

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
    params = init_seq2seq(jax.random.PRNGKey(0), cfg, dtype=dtype)
    opt_state = set_lr(tx.init(params), 1e-4)
    step = jax.jit(train_step, donate_argnums=(0, 1))
    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, feats, lens, src, tgt,
                                   jax.random.PRNGKey(1))
    print(f"[{tag}] compile+first: {time.perf_counter()-t0:.1f}s "
          f"loss={float(loss):.4f}", flush=True)
    for i in range(3):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, feats, lens, src,
                                       tgt, jax.random.PRNGKey(i))
        _ = float(loss)
        print(f"[{tag}] step {i}: {time.perf_counter()-t0*1:.3f}s"
              if False else
              f"[{tag}] step {i}: {time.perf_counter()-t0:.3f}s", flush=True)
