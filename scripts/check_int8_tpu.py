"""On-hardware parity check for int8 decoder weight streaming.

The interpret-mode tests (tests/test_decode_flash.py) pin the int8 path on
CPU; this script repeats the decisive criterion on the REAL Mosaic kernels:
with decoder weights snapped onto an int8 grid with power-of-two per-column
scales, quantization is LOSSLESS (dequant q*s is exact in f32), so the
`--weight_dtype int8` beam must be TOKEN-IDENTICAL to the f32 flash beam —
even on-chip, where floating-point noise normally forbids token gates
(see scripts/check_flash_tpu.py's XLA-vs-XLA control). Any deviation here
is an int8 kernel/plumbing bug, not rounding.

Semantics anchor: the beam bookkeeping of ref models/Seq2seq.py:337-393 is
shared by both arms; only the weight-streaming dtype differs.

Run (single-tenant TPU, no timeout(1)):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_int8_tpu.py
Writes benchmarks/int8_decode_tpu.json; non-zero exit on failure.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from stjep_tpu.config import BOS, ModelConfig
from stjep_tpu.infer.forward import forward_translate
from stjep_tpu.models.seq2seq import init_seq2seq
from stjep_tpu.ops.decode_flash import QUANT_CROSS, QUANT_FFN, QUANT_SELF

b = dict(enc_vocab=30000, dec_vocab=200, batch=16, dim_model=512,
         dim_ff=1024, heads=8, layers=6, max_src=90, decode_len=150, beam=5)
cfg = ModelConfig(
    enc_vocab_size=b["enc_vocab"], dec_vocab_size=b["dec_vocab"],
    enc_embedding_size=200, dec_embedding_size=b["dim_model"],
    acous_dim=40, acous_hidden_size=256,
    dim_model=b["dim_model"], dim_feedforward=b["dim_ff"],
    num_heads=b["heads"], enc_layers=b["layers"], dec_layers=b["layers"],
    num_unilstm_dec=3, max_seq_len_src=b["max_src"],
    max_seq_len_tgt=b["decode_len"], mode="ASR_ST",
)
params = init_seq2seq(jax.random.PRNGKey(0), cfg)


def snap(dec_params, rng, s=2.0 ** -12):
    """Snap the streamed decoder matrices onto the int8 grid: w = q*s with
    integer q, max |q| == 127 per column, s a power of two — so
    quantize_decoder_weights recovers (q, s) exactly and dequantization is
    bit-exact. Magnitude 127*2^-12 ~ 0.031 matches Xavier init scale."""
    out = dict(dec_params)
    layers = []
    for lp in dec_params["layers"]:
        nl = dict(lp)
        for sub, keys in (("decslf_attn", QUANT_SELF),
                          ("encdec_attn", QUANT_CROSS),
                          ("pos_ffn", QUANT_FFN)):
            d = dict(nl[sub])
            for k in keys:
                w = np.asarray(d[k]["w"])
                q = rng.randint(-127, 128, size=w.shape)
                q[0, :] = 127
                leaf = dict(d[k])
                leaf["w"] = jnp.asarray(q * s, jnp.float32)
                d[k] = leaf
            nl[sub] = d
        layers.append(nl)
    out["layers"] = layers
    return out


params = dict(params)
params["dec_tgt"] = snap(params["dec_tgt"], np.random.RandomState(3))

rng = np.random.RandomState(0)
src_np = rng.randint(5, b["enc_vocab"],
                     size=(b["batch"], b["max_src"])).astype(np.int32)
src_np[:, 0] = BOS
src = jnp.asarray(src_np)


def run(weight_dtype, n_iters=3):
    dec = jax.jit(partial(
        forward_translate, cfg=cfg, mode="MT", beam_width=b["beam"],
        penalty_factor=1.0, max_seq_len=b["decode_len"],
        weight_dtype=weight_dtype,
    ))
    t0 = time.perf_counter()
    out = np.asarray(dec(params, src=src))
    print(f"  compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        o = dec(params, src=src)
        _ = int(np.asarray(o[0, 1]))
    rate = b["batch"] / ((time.perf_counter() - t0) / n_iters)
    return out, rate


print("backend:", jax.default_backend(), flush=True)
print("flash beam-5 (MT), f32 weights, grid-snapped params:", flush=True)
toks_f, rate_f = run(None)
print(f"  {rate_f:.2f} utt/s", flush=True)
print("flash beam-5 (MT), int8 weight streaming:", flush=True)
toks_q, rate_q = run("int8")
print(f"  {rate_q:.2f} utt/s", flush=True)

identical = bool(np.array_equal(toks_f, toks_q))
diverging = int((toks_f != toks_q).any(axis=1).sum())
print(f"tokens identical={identical} diverging_rows={diverging} "
      f"{'PASS' if identical else 'FAIL'}", flush=True)

result = {
    "platform": str(jax.devices()[0]),
    "backend": jax.default_backend(),
    "config": b,
    "criterion": "decoder weights snapped to the int8 grid (power-of-two "
                 "per-column scales) -> quantization lossless -> int8 beam "
                 "must be token-identical to the f32 flash beam on-chip",
    "tokens_identical": identical,
    "diverging_rows": diverging,
    "f32_utt_s": round(rate_f, 2),
    "int8_utt_s": round(rate_q, 2),
    "rate_note": "parity is the purpose of this artifact; rates are "
                 "incidental. The f32 arm on SNAPPED weights measures "
                 "reproducibly ~4x slower (37-43 utt/s) than the same "
                 "program on real-init weights (156 utt/s, flash_tpu.json "
                 "tf_beam), while the int8 arm matches the real-init f32 "
                 "rate — a value-dependent f32 slowdown on the synthetic "
                 "grid weights, not an int8 throughput claim. The honest "
                 "int8 perf numbers are the B=1 latency rows in "
                 "serving_latency_b1.json.",
    "pass": identical,
}
path = os.path.join(ROOT, "benchmarks", "int8_decode_tpu.json")
with open(path, "w") as f:
    json.dump(result, f, indent=2)
print("wrote", path, flush=True)
if not identical:
    sys.exit(1)
