"""Probe train-step samples/s scaling with per-device minibatch (B=16..64).

The LSTM recurrences are latency-bound on their dependent chains (README
perf analysis), so larger per-device minibatches amortise the serial cost.
This probe measures where that stops paying (or OOMs). Run one-at-a-time on
the single-tenant axon TPU:
  PYTHONPATH=/root/repo:/root/.axon_site nohup python scripts/probe_train_batch.py &
"""

import time
from functools import partial

import numpy as np

import jax

from stjep_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
import optax

from bench import BENCH, analytic_train_flops, V5E_PEAK_FLOPS
from stjep_tpu.config import BOS, ModelConfig
from stjep_tpu.models.seq2seq import forward_train, init_seq2seq
from stjep_tpu.train.optim import make_optimizer, set_lr
from stjep_tpu.utils.misc import root_key

b = BENCH
cfg = ModelConfig(
    enc_vocab_size=b["enc_vocab"], dec_vocab_size=b["dec_vocab"],
    enc_embedding_size=200, dec_embedding_size=b["dim_model"],
    acous_dim=b["acous_dim"], acous_hidden_size=b["acous_hidden"],
    dim_model=b["dim_model"], dim_feedforward=b["dim_ff"],
    num_heads=b["heads"], enc_layers=b["layers"], dec_layers=b["layers"],
    num_unilstm_dec=3, spec_aug=True, dropout=0.2,
    max_seq_len_src=b["max_src"], max_seq_len_tgt=b["decode_len"],
    mode="ASR_ST",
)
tx = make_optimizer(1.0)


def train_step(params, opt_state, feats, lens, src, tgt, rng):
    def loss_fn(p):
        o = forward_train(p, cfg, "ASR_ST", src, tgt=tgt, acous_feats=feats,
                          acous_lens=lens, rng=rng, is_training=True)
        la = -jnp.mean(jnp.take_along_axis(o["logps_asr"], src[:, 1:, None], axis=2))
        ld = -jnp.mean(jnp.take_along_axis(o["logps_st"][:, :-1], tgt[:, 1:, None], axis=2))
        return la + ld

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def make_batch(B):
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, b["frames"], b["acous_dim"]).astype(np.float32))
    lens_np = rng.randint(b["frames"] // 2, b["frames"] - 8, size=(B,)).astype(np.int32)
    lens_np[0] = b["frames"] - 8
    lens = jnp.asarray(lens_np)
    src = jnp.asarray(
        rng.randint(5, b["enc_vocab"], size=(B, b["max_src"])).astype(np.int32)
    ).at[:, 0].set(BOS)
    tgt = jnp.asarray(
        rng.randint(5, b["dec_vocab"], size=(B, b["decode_len"])).astype(np.int32)
    ).at[:, 0].set(BOS)
    return feats, lens, src, tgt


def measure(B, dtype, iters=10, repeats=3):
    params = init_seq2seq(jax.random.PRNGKey(0), cfg, dtype=dtype)
    opt_state = set_lr(tx.init(params), 1e-4)
    args = make_batch(B)
    if dtype == jnp.bfloat16:
        args = (args[0].astype(jnp.bfloat16),) + args[1:]
    step = jax.jit(train_step, donate_argnums=(0, 1))
    for w in (1, 2):
        params, opt_state, loss = step(params, opt_state, *args, root_key(w))
        _ = float(loss)
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for i in range(iters):
            params, opt_state, loss = step(params, opt_state, *args, root_key(i))
        _ = float(loss)
        rates.append(iters / (time.perf_counter() - t0))
    r = float(np.median(rates))
    flops = analytic_train_flops(cfg, B, b["frames"], b["max_src"], b["decode_len"])
    mfu = flops * r / V5E_PEAK_FLOPS
    name = "bf16" if dtype == jnp.bfloat16 else "f32"
    print(f"B={B:3d} {name}: {r:7.3f} steps/s  {B * r:8.1f} samples/s  mfu={mfu:.4f}",
          flush=True)


if __name__ == "__main__":
    import os
    batches = tuple(int(x) for x in
                    os.environ.get("PROBE_BATCHES", "16,32,64").split(","))
    for B in batches:
        for dtype in (jnp.float32, jnp.bfloat16):
            try:
                measure(B, dtype)
            except Exception as e:  # OOM etc.: report and continue
                print(f"B={B} {dtype.__name__}: FAILED {type(e).__name__}: {e}",
                      flush=True)
