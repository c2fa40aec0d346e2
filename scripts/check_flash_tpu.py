"""One-off TPU check: flash beam vs XLA beam at flagship shapes.

Verifies token equality (the flash kernels' online softmax may differ by
~1 ulp; this checks whether that ever flips a token on the bench workload)
and compares wall-clock. Run with:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_flash_tpu.py
"""

import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
from functools import partial

from stjep_tpu.config import BOS, ModelConfig
from stjep_tpu.infer.forward import forward_translate
from stjep_tpu.models.seq2seq import init_seq2seq

SMALL = "--small" in sys.argv

b = dict(enc_vocab=30000, dec_vocab=200, batch=4 if SMALL else 16,
         frames=512 if SMALL else 1504, acous_dim=40, acous_hidden=256,
         dim_model=512, dim_ff=1024, heads=8, layers=6, max_src=90,
         decode_len=32 if SMALL else 150, beam=5)

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
B = b["batch"]
rng = np.random.RandomState(0)
feats = jnp.asarray(rng.randn(B, b["frames"], b["acous_dim"]).astype(np.float32))
lens_np = rng.randint(b["frames"] // 2, b["frames"] - 8, size=(B,)).astype(np.int32)
lens_np[0] = b["frames"] - 8
lens = jnp.asarray(lens_np)


def run(use_flash, cache_dtype=None, n_iters=3):
    import stjep_tpu.infer.beam as beam_mod
    orig = beam_mod.beam_search

    def patched(*a, **kw):
        kw["use_flash"] = use_flash
        return orig(*a, **kw)

    beam_mod.beam_search = patched
    import stjep_tpu.infer.forward as fwd_mod
    fwd_mod.beam_search = patched
    try:
        dec = jax.jit(partial(
            forward_translate, cfg=cfg, mode="ST", beam_width=b["beam"],
            penalty_factor=1.0, max_seq_len=b["decode_len"],
            cache_dtype=cache_dtype,
        ))
        t0 = time.perf_counter()
        out = dec(params, acous_feats=feats, acous_lens=lens)
        first = np.asarray(out)
        print(f"  compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = dec(params, acous_feats=feats, acous_lens=lens)
            _ = int(np.asarray(out[0, 1]))
        dt = (time.perf_counter() - t0) / n_iters
        return first, B / dt
    finally:
        beam_mod.beam_search = orig
        fwd_mod.beam_search = orig


print("backend:", jax.default_backend(), flush=True)
print("XLA beam f32:", flush=True)
toks_x, rate_x = run(False)
print(f"  {rate_x:.2f} utt/s", flush=True)
print("flash beam f32:", flush=True)
toks_f, rate_f = run(True)
print(f"  {rate_f:.2f} utt/s", flush=True)
eq = np.array_equal(toks_x, toks_f)
print(f"tokens identical: {eq}")
if not eq:
    diff = (toks_x != toks_f)
    rows = np.where(diff.any(axis=1))[0]
    print(f"  differing rows: {rows[:5]} ... first diffs:")
    for r in rows[:3]:
        c = np.where(diff[r])[0][0]
        print(f"   row {r} col {c}: {toks_x[r, c-2:c+3]} vs {toks_f[r, c-2:c+3]}")
print("flash beam bf16 cache:", flush=True)
toks_fb, rate_fb = run(True, cache_dtype=jnp.bfloat16)
print(f"  {rate_fb:.2f} utt/s", flush=True)
