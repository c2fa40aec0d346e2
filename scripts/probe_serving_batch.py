"""Serving-batch sweep: bf16-cache beam decode throughput at B = 16 x
{1, 2, 4, 8}. The decode kernels' per-step cost is dominated by weight
streaming and the [Hs, V] head, both flat in batch up to MXU row
occupancy, so serving throughput rises with batch until the KV-cache
working set or the head saturates. bench.py reports the B=64 point;
this probe finds where the curve bends. Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_serving_batch.py
"""

import os
import time

import numpy as np

import jax

from stjep_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
from functools import partial

from stjep_tpu.config import BOS, ModelConfig
from stjep_tpu.infer.forward import forward_translate
from stjep_tpu.models.seq2seq import init_seq2seq

b = dict(enc_vocab=30000, dec_vocab=200, batch=16, frames=1504, acous_dim=40,
         acous_hidden=256, dim_model=512, dim_ff=1024, heads=8, layers=6,
         max_src=90, decode_len=150, beam=5)

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
params = init_seq2seq(jax.random.PRNGKey(0), cfg)
rng = np.random.RandomState(0)
B0 = b["batch"]
feats0 = rng.randn(B0, b["frames"], b["acous_dim"]).astype(np.float32)
lens0 = rng.randint(b["frames"] // 2, b["frames"] - 8, size=(B0,)).astype(np.int32)
lens0[0] = b["frames"] - 8

for mult in (1, 2, 4, 8):
    B = B0 * mult
    feats = jnp.asarray(np.tile(feats0, (mult, 1, 1)))
    lens = jnp.asarray(np.tile(lens0, (mult,)))
    dec = jax.jit(partial(
        forward_translate, cfg=cfg, mode="ST", beam_width=b["beam"],
        penalty_factor=1.0, max_seq_len=b["decode_len"],
        cache_dtype=jnp.bfloat16,
    ))
    try:
        for _ in range(2):
            out = dec(params, acous_feats=feats, acous_lens=lens)
            _ = int(np.asarray(out[0, 0]))
        rates = []
        for _r in range(6):
            t0 = time.perf_counter()
            for _i in range(5):
                out = dec(params, acous_feats=feats, acous_lens=lens)
            _ = int(np.asarray(out[0, 1]))
            rates.append(5 * B / (time.perf_counter() - t0))
        print(f"B={B:4d}: {float(np.median(rates)):8.1f} utt/s "
              f"(min {min(rates):.1f}, max {max(rates):.1f})", flush=True)
    except Exception as e:
        print(f"B={B:4d}: FAILED {type(e).__name__}: {e}", flush=True)
        break
