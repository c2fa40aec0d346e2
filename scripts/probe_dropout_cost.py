"""How much of the train step is threefry dropout-mask generation?
Times the TF decoder fwd+bwd with (a) dropout on, (b) dropout off,
(c) dropout on but rbg PRNG keys (TPU hardware RNG)."""

import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import dataclasses

from stjep_tpu.config import BOS, ModelConfig
from stjep_tpu.models.seq2seq import init_seq2seq, _get_tgt_emb
from stjep_tpu.models.tf_decoder import tf_decoder_forward

cfg = ModelConfig(
    enc_vocab_size=30000, dec_vocab_size=200,
    enc_embedding_size=200, dec_embedding_size=512,
    acous_dim=40, acous_hidden_size=256,
    dim_model=512, dim_feedforward=1024,
    num_heads=8, enc_layers=6, dec_layers=6,
    num_unilstm_dec=3, spec_aug=True, dropout=0.2,
    max_seq_len_src=90, max_seq_len_tgt=150, mode="ASR_ST",
)
params = init_seq2seq(jax.random.PRNGKey(0), cfg)
B = 16
rng = np.random.RandomState(0)
tgt = jnp.asarray(rng.randint(5, 200, size=(B, 150)).astype(np.int32)
                  ).at[:, 0].set(BOS)
enc_out = jnp.asarray(rng.randn(B, 89, 512).astype(np.float32))
src_mask = jnp.ones((B, 1, 89), bool)
tgt_mask, emb_tgt = _get_tgt_emb(params, cfg, tgt)


def timeit(fn, *args, n=20, warm=2):
    def drain(out):
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    for _ in range(warm):
        drain(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        drain(out)
        ts.append((time.perf_counter() - t0) / n * 1000)
    return sorted(ts)[1]


def bench(tag, c, key):
    g = jax.jit(jax.grad(lambda p: jnp.sum(tf_decoder_forward(
        p, c, emb_tgt, enc_out, tgt_mask=tgt_mask, src_mask=src_mask,
        rng=key, is_training=True)[0])))
    print(f"tf dec fwd+bwd [{tag:12s}]: {timeit(g, params['dec_tgt']):6.1f} ms",
          flush=True)


key_tf = jax.random.PRNGKey(1)
key_rbg = jax.random.key(1, impl="rbg")
bench("dropout 0.2", cfg, key_tf)
bench("no dropout", dataclasses.replace(cfg, dropout=0.0, attn_dropout=0.0),
      key_tf)
bench("rbg dropout", cfg, key_rbg)
