"""Single-request serving latency: blocking per-call beam decode at small B.

Throughput rows (bench.py, probe_serving_batch.py) pipeline windows of
requests; an online serving deployment also cares about per-request wall
latency. This probe times BLOCKING calls (dispatch -> readback) for
B in {1, 2, 4, 8} at the flagship shapes, bf16 KV caches, reporting
median / p90. On axon every call carries the tunnel's ~28 ms round-trip,
which a directly-attached host would not pay; the printed `rtt-` row
subtracts the measured no-op round-trip as the device-side estimate.

  PYTHONPATH=/root/repo:/root/.axon_site nohup python scripts/probe_serving_latency.py &
"""

import time
from functools import partial

import numpy as np

import jax

from stjep_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from bench import BENCH as b  # the flagship workload, one definition
from stjep_tpu.config import ModelConfig
from stjep_tpu.infer.forward import forward_translate
from stjep_tpu.models.seq2seq import init_seq2seq

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

# measure the bare tunnel round-trip with a warm no-op readback
_tiny = jax.jit(lambda x: x + 1)
for _ in range(3):
    _ = int(np.asarray(_tiny(jnp.int32(0))))
rtts = []
for _ in range(20):
    t0 = time.perf_counter()
    _ = int(np.asarray(_tiny(jnp.int32(0))))
    rtts.append(time.perf_counter() - t0)
RTT = float(np.median(rtts)) * 1000
print(f"tunnel rtt: {RTT:.1f} ms", flush=True)

for B in (1, 2, 4, 8):
    feats = jnp.asarray(rng.randn(B, b["frames"], b["acous_dim"]).astype(np.float32))
    lens = jnp.full((B,), b["frames"] - 8, jnp.int32)
    dec = jax.jit(partial(
        forward_translate, cfg=cfg, mode="ST", beam_width=b["beam"],
        penalty_factor=1.0, max_seq_len=b["decode_len"],
        cache_dtype=jnp.bfloat16,
    ))
    for _ in range(2):
        out = dec(params, acous_feats=feats, acous_lens=lens)
        _ = int(np.asarray(out[0, 0]))
    lats = []
    for _ in range(30):
        t0 = time.perf_counter()
        out = dec(params, acous_feats=feats, acous_lens=lens)
        _ = int(np.asarray(out[0, 1]))  # block: full request latency
        lats.append((time.perf_counter() - t0) * 1000)
    lats = np.sort(np.asarray(lats))
    med = float(np.median(lats))
    p90 = float(lats[int(np.ceil(0.9 * len(lats))) - 1])  # nearest-rank
    print(f"B={B}: median {med:7.1f} ms  p90 {p90:7.1f} ms  "
          f"rtt- {med - RTT:7.1f} ms  ({B / (med / 1000):6.1f} utt/s blocking)",
          flush=True)
