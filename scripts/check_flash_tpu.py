"""On-hardware kernel-parity check: every fused Pallas path vs its XLA
reference at flagship shapes, committed as benchmarks/flash_tpu.json.

The interpret-mode suites (tests/test_*_parity.py) pin kernel semantics on
CPU; this script exercises the REAL Mosaic-compiled kernels on the chip and
records the evidence the repo keeps (VERDICT r3 missing #2) — a Mosaic
compiler regression flips one of these booleans/deviations:

  1. beam decode: flash engine vs XLA beam — token identity in f32
     (decode semantics anchor: ref models/Seq2seq.py:337-393)
  2. greedy decode: flash path vs XLA greedy — token identity in f32
     (ref models/Seq2seq.py:260-304)
  3. teacher-forced LAS decoder: fused scan kernel (ops/las_tf_flash.py,
     custom_vjp) vs the lax.scan baseline — forward + full parameter
     gradient deviations (training-path numerics)

Run (single-tenant TPU, no timeout(1)):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_flash_tpu.py
Options: --small (tiny shapes), --no-artifact (print only).

Exit status is non-zero if a token-identity check fails, AFTER writing the
artifact, so run_tpu_revalidation.sh fails loudly but keeps the evidence.
"""

import json
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

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from stjep_tpu.config import BOS, ModelConfig
from stjep_tpu.infer.forward import forward_translate
from stjep_tpu.models.seq2seq import forward_eval, forward_train, init_seq2seq

SMALL = "--small" in sys.argv
WRITE = "--no-artifact" not in sys.argv

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
src_np = rng.randint(5, b["enc_vocab"], size=(B, b["max_src"])).astype(np.int32)
src_np[:, 0] = BOS
src = jnp.asarray(src_np)

RESULT = {
    "platform": str(jax.devices()[0]),
    "backend": jax.default_backend(),
    "config": b,
    "checks": {},
}


def run_beam(use_flash, cache_dtype=None, n_iters=3):
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


def run_greedy(no_flash, n_iters=3):
    """ST greedy via forward_eval; the flash auto-gate is trace-time, so
    toggling STJEP_NO_FLASH around a fresh jit selects the path."""
    old = os.environ.pop("STJEP_NO_FLASH", None)
    if no_flash:
        os.environ["STJEP_NO_FLASH"] = "1"
    try:
        fn = jax.jit(partial(forward_eval, cfg=cfg, mode="ST"))
        t0 = time.perf_counter()
        out = fn(params, acous_feats=feats, acous_lens=lens)
        preds = np.asarray(out["preds_st"])
        print(f"  compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn(params, acous_feats=feats, acous_lens=lens)
            _ = int(np.asarray(out["preds_st"][0, 1]))
        dt = (time.perf_counter() - t0) / n_iters
        return preds, B / dt
    finally:
        os.environ.pop("STJEP_NO_FLASH", None)
        if old is not None:
            os.environ["STJEP_NO_FLASH"] = old


def run_las_grad(no_flash, n_iters=3):
    """Teacher-forced LAS (the training hot path) forward + grad:
    fused las_tf_flash custom_vjp vs the lax.scan baseline. is_training
    False keeps both arms dropout-free and deterministic while still
    exercising the fused reverse-time backward."""
    old = os.environ.pop("STJEP_NO_FLASH", None)
    if no_flash:
        os.environ["STJEP_NO_FLASH"] = "1"
    try:
        def loss_fn(p):
            out = forward_train(
                p, cfg, "ASR", src, acous_feats=feats, acous_lens=lens,
                is_training=False,
            )
            lp = out["logps_asr"]  # [B, L-1, V]
            tok = src[:, 1:lp.shape[1] + 1]
            picked = jnp.take_along_axis(lp, tok[..., None], axis=-1)
            mask = (tok != 0).astype(lp.dtype)
            return -jnp.sum(picked[..., 0] * mask) / jnp.sum(mask)

        vag = jax.jit(jax.value_and_grad(loss_fn))
        t0 = time.perf_counter()
        val, grads = vag(params)
        val = float(val)
        print(f"  compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            v, grads = vag(params)
            _ = float(v)
        ms = (time.perf_counter() - t0) / n_iters * 1000.0
        return val, jax.device_get(grads), ms
    finally:
        os.environ.pop("STJEP_NO_FLASH", None)
        if old is not None:
            os.environ["STJEP_NO_FLASH"] = old


def grad_deviation(g_flash, g_xla):
    """max |a-b| and max |a-b|/(|b|+1e-6) over every parameter leaf."""
    leaves_f = jax.tree_util.tree_leaves(g_flash)
    leaves_x = jax.tree_util.tree_leaves(g_xla)
    max_abs = max_rel = 0.0
    for a, c in zip(leaves_f, leaves_x):
        a = np.asarray(a, np.float64)
        c = np.asarray(c, np.float64)
        d = np.abs(a - c)
        max_abs = max(max_abs, float(d.max()) if d.size else 0.0)
        rel = d / (np.abs(c) + 1e-6)
        max_rel = max(max_rel, float(rel.max()) if rel.size else 0.0)
    return max_abs, max_rel


failures = []
print("backend:", jax.default_backend(), flush=True)

# ---- 1. beam: flash vs XLA ------------------------------------------------
print("XLA beam f32:", flush=True)
toks_x, rate_x = run_beam(False)
print(f"  {rate_x:.2f} utt/s", flush=True)
print("flash beam f32:", flush=True)
toks_f, rate_f = run_beam(True)
print(f"  {rate_f:.2f} utt/s", flush=True)
beam_eq = bool(np.array_equal(toks_x, toks_f))
print(f"beam tokens identical: {beam_eq}", flush=True)
if not beam_eq:
    diff = (toks_x != toks_f)
    rows = np.where(diff.any(axis=1))[0]
    print(f"  differing rows: {rows[:5]} ... first diffs:")
    for r in rows[:3]:
        c = np.where(diff[r])[0][0]
        print(f"   row {r} col {c}: {toks_x[r, c-2:c+3]} vs {toks_f[r, c-2:c+3]}")
    failures.append("beam tokens differ")
print("flash beam bf16 cache:", flush=True)
toks_fb, rate_fb = run_beam(True, cache_dtype=jnp.bfloat16)
print(f"  {rate_fb:.2f} utt/s", flush=True)
RESULT["checks"]["beam"] = {
    "tokens_identical_f32": beam_eq,
    "xla_utt_s": round(rate_x, 2),
    "flash_utt_s": round(rate_f, 2),
    "flash_bf16_cache_utt_s": round(rate_fb, 2),
    "bf16_rows_differing_from_f32": int(
        (toks_fb != toks_f).any(axis=1).sum()),
}

# ---- 2. greedy: flash vs XLA ----------------------------------------------
print("XLA greedy (STJEP_NO_FLASH=1):", flush=True)
g_x, grate_x = run_greedy(no_flash=True)
print(f"  {grate_x:.2f} utt/s", flush=True)
print("flash greedy:", flush=True)
g_f, grate_f = run_greedy(no_flash=False)
print(f"  {grate_f:.2f} utt/s", flush=True)
greedy_eq = bool(np.array_equal(g_x, g_f))
print(f"greedy tokens identical: {greedy_eq}", flush=True)
if not greedy_eq:
    failures.append("greedy tokens differ")
RESULT["checks"]["greedy"] = {
    "tokens_identical_f32": greedy_eq,
    "xla_utt_s": round(grate_x, 2),
    "flash_utt_s": round(grate_f, 2),
}

# ---- 3. fused LAS training kernel: forward + grad vs scan ------------------
print("LAS teacher-forced fwd+grad, lax.scan baseline:", flush=True)
val_x, grads_x, ms_x = run_las_grad(no_flash=True)
print(f"  loss {val_x:.6f}  {ms_x:.1f} ms", flush=True)
print("LAS teacher-forced fwd+grad, fused kernel:", flush=True)
val_f, grads_f, ms_f = run_las_grad(no_flash=False)
print(f"  loss {val_f:.6f}  {ms_f:.1f} ms", flush=True)
max_abs, max_rel = grad_deviation(grads_f, grads_x)
fwd_dev = abs(val_f - val_x)
print(f"fwd |dev| {fwd_dev:.3e}; grad max abs {max_abs:.3e} "
      f"max rel {max_rel:.3e}", flush=True)
RESULT["checks"]["las_tf_grad"] = {
    "loss_scan": val_x,
    "loss_fused": val_f,
    "fwd_abs_dev": fwd_dev,
    "grad_max_abs_dev": max_abs,
    "grad_max_rel_dev": max_rel,
    "scan_fwd_bwd_ms": round(ms_x, 2),
    "fused_fwd_bwd_ms": round(ms_f, 2),
    "note": "fused kernel streams bf16 residuals/gradients (ROADMAP #10); "
            "deviations are the recorded bf16-stream envelope, not a bug "
            "threshold",
}

RESULT["failures"] = failures
if WRITE:
    path = os.path.join(ROOT, "benchmarks", "flash_tpu.json")
    with open(path, "w") as f:
        json.dump(RESULT, f, indent=2)
    print("wrote", path, flush=True)
print(json.dumps({"failures": failures}), flush=True)
if failures:
    sys.exit(1)
