"""Break down the flagship ASR_ST train step: where do the ~84 ms go?

Times fwd-eval, fwd-train (dropout+specaug), value_and_grad, grad+adam,
and ablations (no dropout, no spec_aug) at bench shapes.
"""

import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
from functools import partial

from stjep_tpu.config import BOS, ModelConfig
from stjep_tpu.models.seq2seq import forward_train, init_seq2seq
from stjep_tpu.train.optim import make_optimizer, set_lr
import optax

import dataclasses


def make_cfg(**over):
    base = dict(
        enc_vocab_size=30000, dec_vocab_size=200,
        enc_embedding_size=200, dec_embedding_size=512,
        acous_dim=40, acous_hidden_size=256,
        dim_model=512, dim_feedforward=1024,
        num_heads=8, enc_layers=6, dec_layers=6,
        num_unilstm_dec=3, spec_aug=True, dropout=0.2,
        max_seq_len_src=90, max_seq_len_tgt=150, mode="ASR_ST",
    )
    base.update(over)
    return ModelConfig(**base)


B, frames = 16, 1504
rng = np.random.RandomState(0)
feats = jnp.asarray(rng.randn(B, frames, 40).astype(np.float32))
lens_np = rng.randint(frames // 2, frames - 8, size=(B,)).astype(np.int32)
lens_np[0] = frames - 8
lens = jnp.asarray(lens_np)
src = jnp.asarray(rng.randint(5, 30000, size=(B, 90)).astype(np.int32)
                  ).at[:, 0].set(BOS)
tgt = jnp.asarray(rng.randint(5, 200, size=(B, 150)).astype(np.int32)
                  ).at[:, 0].set(BOS)


def timeit(fn, *args, n=5, warm=2):
    for i in range(warm):
        out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / n * 1000


def loss_of(cfg, p, rng_, training=True):
    o = forward_train(p, cfg, "ASR_ST", src, tgt=tgt, acous_feats=feats,
                      acous_lens=lens, rng=rng_, is_training=training)
    la = -jnp.mean(jnp.take_along_axis(o["logps_asr"], src[:, 1:, None], 2))
    ld = -jnp.mean(jnp.take_along_axis(o["logps_st"][:, :-1],
                                       tgt[:, 1:, None], 2))
    return la + ld


def report(tag, cfg):
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)

    f_eval = jax.jit(lambda p: loss_of(cfg, p, key, training=False))
    f_train = jax.jit(lambda p: loss_of(cfg, p, key, training=True))
    g = jax.jit(lambda p: jax.value_and_grad(
        lambda q: loss_of(cfg, q, key, True))(p)[1])

    tx = make_optimizer(1.0)
    opt_state = set_lr(tx.init(params), 1e-4)

    def full(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda q: loss_of(cfg, q, key, True))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    fullj = jax.jit(full)
    print(f"[{tag}] fwd eval : {timeit(f_eval, params):8.1f} ms", flush=True)
    print(f"[{tag}] fwd train: {timeit(f_train, params):8.1f} ms", flush=True)
    print(f"[{tag}] grad     : {timeit(g, params):8.1f} ms", flush=True)
    print(f"[{tag}] full step: {timeit(fullj, params, opt_state):8.1f} ms",
          flush=True)


report("base", make_cfg())
report("nodrop", make_cfg(dropout=0.0))
report("nospec", make_cfg(spec_aug=False))
