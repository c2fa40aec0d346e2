"""On-hardware kernel-parity check: every fused Pallas path vs its XLA
reference at flagship shapes, committed as benchmarks/flash_tpu.json.

The interpret-mode suites (tests/test_*_parity.py) pin kernel semantics
exactly on CPU, where both arms compute true f32. On the chip that gate is
unattainable BY ANY IMPLEMENTATION: XLA's DEFAULT TPU matmul precision
rounds f32 operands to bf16 on the MXU, the fused kernels hold VMEM
weights in bf16 (documented envelope, ops/las_flash.py), and with ~1e-3
logit noise a random-init near-uniform head flips argmax ties — one flip
cascades down a 150-step sequential decode. The recorded control makes
this concrete: XLA-vs-XLA (DEFAULT vs HIGHEST precision, no Pallas
anywhere) already disagrees on tokens on the chip.

So the on-hardware regression signal is MARGIN-BASED, staged so a
divergence in one stage can't contaminate the next (the ST pipeline
cascades LAS hyps into the TF memory):

  1. tf_greedy (MT mode, shared src): flash decode engine vs XLA decode.
     At each row's FIRST token divergence the two chosen tokens' logps —
     under an independent dense HIGHEST-precision teacher-forced scorer
     over the shared prefix — must differ by <= eps (a tie-flip). A real
     selection/cache/softmax bug picks tokens with material score gaps.
     (decode semantics anchor: ref models/Seq2seq.py:260-304)
  2. tf_beam (MT mode, width 5): both arms' best beams re-scored by the
     same independent scorer with the reference length penalty; the flash
     beam must score no worse than the XLA beam minus eps per row.
     (ref models/Seq2seq.py:337-393)
  3. las_greedy (ASR mode): fused free-running LAS kernel vs the XLA scan,
     same first-divergence margin rule (wider eps: the kernel's bf16
     VMEM weights are a documented envelope, not a bug).
  4. las_tf_grad: fused teacher-forced LAS training kernel
     (ops/las_tf_flash.py custom_vjp) vs the lax.scan baseline — forward
     and full parameter-gradient deviations.

Run (single-tenant TPU, no timeout(1)):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_flash_tpu.py
Options: --small (tiny shapes), --no-artifact (print only).

Exit status is non-zero if a margin/deviation check fails, AFTER writing
the artifact, so run_tpu_revalidation.sh fails loudly but keeps evidence.
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

from stjep_tpu.config import BOS, EOS, PAD, ModelConfig
from stjep_tpu.infer.forward import forward_translate
from stjep_tpu.models.seq2seq import forward_train, init_seq2seq

SMALL = "--small" in sys.argv
WRITE = "--no-artifact" not in sys.argv

# Tie-flip envelopes (independent-scorer logp units). Measured on TPU v5
# lite: observed first-divergence margins are <=9.6e-3 (tf greedy, f32
# path) and <=2.4e-4 (las greedy, bf16-weight kernel); thresholds sit
# well above so they trip on real selection bugs (wrong token => margins
# of 0.1-10) and not rounding noise.
EPS_TF = float(os.environ.get("STJEP_EPS_TF", "0.05"))
EPS_LAS = float(os.environ.get("STJEP_EPS_LAS", "0.05"))
# Beam search is a discrete branching process: a tie-flip early changes
# the explored set, so per-row rescored scores legitimately swing BOTH
# ways (measured: flash-vs-XLA min -3.0e-2 / mean +7.4e-3; the XLA-vs-XLA
# precision control swings on the same scale). A real cache/selection bug
# is a SYSTEMATIC deficit: gate the mean tightly and the per-row worst
# loosely (|score| scale is ~5.3 = log 1/200 per token).
EPS_BEAM_MEAN = float(os.environ.get("STJEP_EPS_BEAM_MEAN", "0.02"))
EPS_BEAM_ROW = float(os.environ.get("STJEP_EPS_BEAM_ROW", "0.1"))

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
    "thresholds": {"eps_tf": EPS_TF, "eps_las": EPS_LAS,
                   "eps_beam_mean": EPS_BEAM_MEAN,
                   "eps_beam_row": EPS_BEAM_ROW},
    "checks": {},
}
failures = []


def _flash_patch(use_flash):
    """Route beam_search (greedy is its width-1 form) through one arm."""
    import stjep_tpu.infer.beam as beam_mod
    import stjep_tpu.infer.forward as fwd_mod
    orig = beam_mod.beam_search

    def patched(*a, **kw):
        kw["use_flash"] = use_flash
        return orig(*a, **kw)

    return beam_mod, fwd_mod, orig, patched


def run_mt_decode(use_flash, width, highest=False, n_iters=3):
    """MT-mode decode (avg-dyn-emb memory, shared src in both arms) so the
    TF decode kernels are isolated from LAS divergence."""
    beam_mod, fwd_mod, orig, patched = _flash_patch(use_flash)
    beam_mod.beam_search = patched
    fwd_mod.beam_search = patched
    try:
        dec = jax.jit(partial(
            forward_translate, cfg=cfg, mode="MT", beam_width=width,
            penalty_factor=1.0, max_seq_len=b["decode_len"],
        ))
        ctx = (jax.default_matmul_precision("highest") if highest
               else _nullcontext())
        with ctx:
            t0 = time.perf_counter()
            out = dec(params, src=src)
            first = np.asarray(out)
            print(f"  compile+run: {time.perf_counter()-t0:.1f}s",
                  flush=True)
            t0 = time.perf_counter()
            for _ in range(n_iters):
                out = dec(params, src=src)
                _ = int(np.asarray(out[0, 1]))
            dt = (time.perf_counter() - t0) / n_iters
        return first, B / dt
    finally:
        beam_mod.beam_search = orig
        fwd_mod.beam_search = orig


def run_las_greedy(no_flash, highest=False, n_iters=3):
    """ASR free-running greedy; STJEP_NO_FLASH is a trace-time gate, so
    toggling it around a fresh jit selects the path."""
    old = os.environ.pop("STJEP_NO_FLASH", None)
    if no_flash:
        os.environ["STJEP_NO_FLASH"] = "1"
    try:
        fn = jax.jit(partial(forward_translate, cfg=cfg, mode="ASR",
                             beam_width=0, max_seq_len=b["decode_len"]))
        ctx = (jax.default_matmul_precision("highest") if highest
               else _nullcontext())
        with ctx:
            t0 = time.perf_counter()
            out = fn(params, acous_feats=feats, acous_lens=lens)
            preds = np.asarray(out)
            print(f"  compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
            t0 = time.perf_counter()
            for _ in range(n_iters):
                out = fn(params, acous_feats=feats, acous_lens=lens)
                _ = int(np.asarray(out[0, 1]))
            dt = (time.perf_counter() - t0) / n_iters
        return preds, B / dt
    finally:
        os.environ.pop("STJEP_NO_FLASH", None)
        if old is not None:
            os.environ["STJEP_NO_FLASH"] = old


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def score_mt(tgt_tokens):
    """Independent scorer: dense XLA, HIGHEST matmul precision, no Pallas.
    Returns logps [B, L-1, V]; logps[:, i] is the distribution over
    position i+1 given tgt[:, :i+1] (causal teacher forcing)."""
    old = os.environ.pop("STJEP_NO_FLASH", None)
    os.environ["STJEP_NO_FLASH"] = "1"
    try:
        with jax.default_matmul_precision("highest"):
            fn = jax.jit(lambda p, t: forward_train(
                p, cfg, "MT", src, tgt=t, is_training=False)["logps_mt"])
            return np.asarray(fn(params, jnp.asarray(tgt_tokens)))
    finally:
        os.environ.pop("STJEP_NO_FLASH", None)
        if old is not None:
            os.environ["STJEP_NO_FLASH"] = old


def score_asr(emitted):
    """Independent LAS scorer (teacher-forced on the emitted tokens):
    logps [B, Ls-1, V]; logps[:, i] is the distribution over emitted[:, i]
    given BOS + emitted[:, :i]."""
    tgt_full = np.concatenate(
        [np.full((B, 1), BOS, np.int32),
         np.asarray(emitted)[:, :b["max_src"] - 1].astype(np.int32)], axis=1)
    old = os.environ.pop("STJEP_NO_FLASH", None)
    os.environ["STJEP_NO_FLASH"] = "1"
    try:
        with jax.default_matmul_precision("highest"):
            fn = jax.jit(lambda p, t: forward_train(
                p, cfg, "ASR", t, acous_feats=feats, acous_lens=lens,
                is_training=False)["logps_asr"])
            return np.asarray(fn(params, jnp.asarray(tgt_full)))
    finally:
        os.environ.pop("STJEP_NO_FLASH", None)
        if old is not None:
            os.environ["STJEP_NO_FLASH"] = old


def first_divergence_margins(toks_a, toks_b, logps, col_offset):
    """For each row where the arms differ, the independent scorer's logp
    gap between the two chosen tokens at the FIRST divergence (where the
    consumed prefix is still shared, so the distribution is valid for
    both arms). logps[:, c - col_offset] scores column c."""
    diff = np.asarray(toks_a) != np.asarray(toks_b)
    margins, rows = [], []
    for r in np.where(diff.any(axis=1))[0]:
        c = int(np.where(diff[r])[0][0])
        i = c - col_offset
        if i < 0 or i >= logps.shape[1]:
            continue
        m = float(abs(logps[r, i, int(toks_a[r, c])]
                      - logps[r, i, int(toks_b[r, c])]))
        margins.append(m)
        rows.append({"row": int(r), "col": c, "margin": round(m, 6),
                     "tok_a": int(toks_a[r, c]), "tok_b": int(toks_b[r, c])})
    return margins, rows


def seq_scores(tokens, logps, penalty_factor=1.0):
    """Reference-style length-penalised sequence score per row: sum of the
    emitted tokens' logps over the live prefix / len^penalty
    (ref: Seq2seq.py:367). tokens are BOS-first; live = through first EOS."""
    tokens = np.asarray(tokens)
    Bn, L = tokens.shape
    out = np.zeros((Bn,), np.float64)
    for r in range(Bn):
        total, n = 0.0, 0
        for c in range(1, min(L, logps.shape[1] + 1)):
            t = int(tokens[r, c])
            total += float(logps[r, c - 1, t])
            n += 1
            if t == EOS or t == PAD:
                break
        out[r] = total / max(n, 1) ** penalty_factor
    return out


print("backend:", jax.default_backend(), flush=True)

# ---- 1. tf_greedy: flash decode engine vs XLA, MT mode ---------------------
print("XLA tf greedy (MT):", flush=True)
g_x, grate_x = run_mt_decode(False, width=1)
print(f"  {grate_x:.2f} utt/s", flush=True)
print("flash tf greedy (MT):", flush=True)
g_f, grate_f = run_mt_decode(True, width=1)
print(f"  {grate_f:.2f} utt/s", flush=True)
greedy_eq = bool(np.array_equal(g_x, g_f))
logps_gx = score_mt(g_x)
margins, detail = first_divergence_margins(g_x, g_f, logps_gx, 1)
max_m = max(margins, default=0.0)
ok = max_m <= EPS_TF
print(f"tf greedy identical={greedy_eq} diverging_rows={len(margins)} "
      f"max_first_divergence_margin={max_m:.2e} (eps {EPS_TF}) "
      f"{'PASS' if ok else 'FAIL'}", flush=True)
if not ok:
    failures.append(f"tf_greedy margin {max_m:.3e} > {EPS_TF}")
RESULT["checks"]["tf_greedy"] = {
    "tokens_identical": greedy_eq,
    "diverging_rows": len(margins),
    "max_first_divergence_margin": max_m,
    "margin_pass": ok,
    "xla_utt_s": round(grate_x, 2),
    "flash_utt_s": round(grate_f, 2),
    "divergences": detail[:8],
}

# ---- 2. tf_beam: flash beam vs XLA beam, rescored --------------------------
print("XLA tf beam-5 (MT):", flush=True)
bm_x, brate_x = run_mt_decode(False, width=b["beam"])
print(f"  {brate_x:.2f} utt/s", flush=True)
print("flash tf beam-5 (MT):", flush=True)
bm_f, brate_f = run_mt_decode(True, width=b["beam"])
print(f"  {brate_f:.2f} utt/s", flush=True)
beam_eq = bool(np.array_equal(bm_x, bm_f))
sc_x = seq_scores(bm_x, score_mt(bm_x))
sc_f = seq_scores(bm_f, score_mt(bm_f))
worst = float((sc_f - sc_x).min())  # <0 where flash found a worse beam
mean_d = float((sc_f - sc_x).mean())
ok = mean_d >= -EPS_BEAM_MEAN and worst >= -EPS_BEAM_ROW
print(f"tf beam identical={beam_eq} rescored score diff "
      f"min={worst:.2e} mean={mean_d:.2e} "
      f"(eps mean {EPS_BEAM_MEAN} / row {EPS_BEAM_ROW}) "
      f"{'PASS' if ok else 'FAIL'}", flush=True)
if not ok:
    failures.append(
        f"tf_beam rescored deficit mean {mean_d:.3e} / worst {worst:.3e}")
# control: the same deficit distribution XLA-vs-XLA (DEFAULT vs HIGHEST,
# no Pallas) — beam branching noise without any kernel in the loop
print("control: XLA tf beam-5 at HIGHEST matmul precision:", flush=True)
bm_hi, _ = run_mt_decode(False, width=b["beam"], highest=True, n_iters=1)
sc_hi = seq_scores(bm_hi, score_mt(bm_hi))
ctl_min = float((sc_hi - sc_x).min())
ctl_mean = float((sc_hi - sc_x).mean())
print(f"  rescored diff vs DEFAULT: min={ctl_min:.2e} mean={ctl_mean:.2e} "
      f"diverging_rows="
      f"{int((np.asarray(bm_x) != np.asarray(bm_hi)).any(axis=1).sum())}",
      flush=True)
RESULT["checks"]["tf_beam"] = {
    "tokens_identical": beam_eq,
    "diverging_rows": int((np.asarray(bm_x) != np.asarray(bm_f))
                          .any(axis=1).sum()),
    "rescored_score_diff_min": worst,
    "rescored_score_diff_mean": mean_d,
    "margin_pass": ok,
    "xla_utt_s": round(brate_x, 2),
    "flash_utt_s": round(brate_f, 2),
    "control_xla_default_vs_highest": {
        "rescored_score_diff_min": ctl_min,
        "rescored_score_diff_mean": ctl_mean,
        "diverging_rows": int((np.asarray(bm_x) != np.asarray(bm_hi))
                              .any(axis=1).sum()),
        "note": "per-row branching noise scale with no Pallas anywhere",
    },
}

# ---- 3. las_greedy: fused free-running kernel vs XLA scan ------------------
print("XLA LAS greedy (STJEP_NO_FLASH=1):", flush=True)
l_x, lrate_x = run_las_greedy(no_flash=True)
print(f"  {lrate_x:.2f} utt/s", flush=True)
print("flash LAS greedy:", flush=True)
l_f, lrate_f = run_las_greedy(no_flash=False)
print(f"  {lrate_f:.2f} utt/s", flush=True)
las_eq = bool(np.array_equal(l_x, l_f))
logps_lx = score_asr(l_x)
margins, detail = first_divergence_margins(l_x, l_f, logps_lx, 0)
max_m = max(margins, default=0.0)
ok = max_m <= EPS_LAS
print(f"las greedy identical={las_eq} diverging_rows={len(margins)} "
      f"max_first_divergence_margin={max_m:.2e} (eps {EPS_LAS}) "
      f"{'PASS' if ok else 'FAIL'}", flush=True)
if not ok:
    failures.append(f"las_greedy margin {max_m:.3e} > {EPS_LAS}")
RESULT["checks"]["las_greedy"] = {
    "tokens_identical": las_eq,
    "diverging_rows": len(margins),
    "max_first_divergence_margin": max_m,
    "margin_pass": ok,
    "xla_utt_s": round(lrate_x, 2),
    "flash_utt_s": round(lrate_f, 2),
    "divergences": detail[:8],
}

# ---- control: XLA DEFAULT vs XLA HIGHEST (no Pallas anywhere) --------------
print("control: XLA LAS greedy at HIGHEST matmul precision:", flush=True)
l_hi, _ = run_las_greedy(no_flash=True, highest=True, n_iters=1)
ctl_eq = bool(np.array_equal(l_x, l_hi))
ctl_rows = int((np.asarray(l_x) != np.asarray(l_hi)).any(axis=1).sum())
print(f"  identical={ctl_eq} diverging_rows={ctl_rows}  "
      "(token identity fails even XLA-vs-XLA on chip => margin-based "
      "criterion above)", flush=True)
RESULT["checks"]["control_xla_default_vs_highest"] = {
    "las_greedy_tokens_identical": ctl_eq,
    "las_greedy_diverging_rows": ctl_rows,
    "note": "both arms dense XLA, no Pallas: DEFAULT TPU matmul precision "
            "(bf16 MXU operands) vs HIGHEST. Token divergence here bounds "
            "what any kernel can promise on-chip.",
}


# ---- 4. fused LAS training kernel: forward + grad vs scan ------------------
def run_las_grad(no_flash, n_iters=3):
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


print("LAS teacher-forced fwd+grad, lax.scan baseline:", flush=True)
val_x, grads_x, ms_x = run_las_grad(no_flash=True)
print(f"  loss {val_x:.6f}  {ms_x:.1f} ms", flush=True)
print("LAS teacher-forced fwd+grad, fused kernel:", flush=True)
val_f, grads_f, ms_f = run_las_grad(no_flash=False)
print(f"  loss {val_f:.6f}  {ms_f:.1f} ms", flush=True)
max_abs, max_rel = grad_deviation(grads_f, grads_x)
fwd_dev = abs(val_f - val_x)
ok = fwd_dev <= 1e-3 and max_abs <= 1e-4
print(f"fwd |dev| {fwd_dev:.3e}; grad max abs {max_abs:.3e} "
      f"max rel {max_rel:.3e}  {'PASS' if ok else 'FAIL'}", flush=True)
if not ok:
    failures.append(
        f"las_tf_grad fwd {fwd_dev:.3e} (<=1e-3) abs {max_abs:.3e} (<=1e-4)")
RESULT["checks"]["las_tf_grad"] = {
    "loss_scan": val_x,
    "loss_fused": val_f,
    "fwd_abs_dev": fwd_dev,
    "grad_max_abs_dev": max_abs,
    "grad_max_rel_dev": max_rel,
    "pass": ok,
    "scan_fwd_bwd_ms": round(ms_x, 2),
    "fused_fwd_bwd_ms": round(ms_f, 2),
    "note": "fused kernel streams bf16 residuals/gradients (ROADMAP #10); "
            "max_rel spikes where the true gradient ~0 (abs bound is the "
            "gate); thresholds fwd 1e-3 / abs 1e-4 sit ~30x above measured",
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
