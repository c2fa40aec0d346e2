"""On-chip STRICT-f32 token-identity check (VERDICT r4 #4).

benchmarks/flash_tpu.json defends on-TPU decode with MARGIN-based checks,
because XLA's default matmul precision rounds MXU operands to bf16 and the
fused kernels keep bf16 VMEM weights. The README documents the strict-f32
escape hatch — `STJEP_NO_FLASH=1` + `jax_default_matmul_precision=highest`
— under which the chip computes true-f32 matmuls through the dense XLA
path. This script closes the loop on that claim: it runs the eval surface
ONCE on the real TPU in strict-f32 mode and diffs tokens against the CPU
oracle arm (the same arithmetic the parity suites pin token-identical to
the live torch reference).

Protocol (single-tenant TPU safe):
  1. A CPU subprocess (JAX_PLATFORMS=cpu, axon stripped from PYTHONPATH)
     initialises the flagship-dims model from a fixed seed, saves the
     params + inputs, decodes ASR greedy (LAS free-running) and ST beam-5
     (LAS hyps -> TF memory -> beam) through forward_translate, and saves
     the token buffers.
  2. The TPU process loads the SAME param bytes, decodes the same surfaces
     in strict-f32 mode, and compares token-for-token.

Matmuls are exactly reproducible under `highest`; the remaining cross-
backend freedom is transcendental rounding (exp/tanh/sigmoid), which the
artifact records per-surface if it ever flips a tie.

Run:
  PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/check_strict_f32_tpu.py
Writes benchmarks/strict_f32_tpu.json; non-zero exit on mismatch (after
writing the artifact).
"""

import json
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

WORK = "/tmp/strict_f32"
B = 4
FRAMES = 608  # strict-f32 beam on 1 CPU core: keep the oracle arm minutes


def build_and_decode(tag):
    """Runs in BOTH arms (import-time backend already configured)."""
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from flax import serialization

    from bench import BENCH
    from stjep_tpu.config import BOS, ModelConfig
    from stjep_tpu.infer.forward import forward_translate
    from stjep_tpu.models.seq2seq import init_seq2seq

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
    ppath = os.path.join(WORK, "params.msgpack")
    if os.path.exists(ppath):
        template = init_seq2seq(jax.random.PRNGKey(0), cfg)
        with open(ppath, "rb") as f:
            params = serialization.from_bytes(template, f.read())
    else:
        params = init_seq2seq(jax.random.PRNGKey(0), cfg)
        with open(ppath, "wb") as f:
            f.write(serialization.to_bytes(params))

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, FRAMES, b["acous_dim"])
                        .astype(np.float32))
    lens = jnp.asarray(
        np.linspace(FRAMES // 2, FRAMES - 8, B).astype(np.int32))

    outs = {}
    # ASR greedy: the LAS free-running decode (dense scan under NO_FLASH)
    outs["asr_greedy"] = np.asarray(forward_translate(
        params, cfg, "ASR", acous_feats=feats, acous_lens=lens,
        beam_width=1, max_seq_len=b["max_src"]))
    # ST beam-5: the full cascade (LAS hyps -> static emb -> TF enc ->
    # dense XLA beam)
    outs["st_beam5"] = np.asarray(forward_translate(
        params, cfg, "ST", acous_feats=feats, acous_lens=lens,
        beam_width=b["beam"], penalty_factor=1.0,
        max_seq_len=b["decode_len"]))
    np.savez(os.path.join(WORK, f"tokens_{tag}.npz"), **outs)
    return outs


def main():
    os.makedirs(WORK, exist_ok=True)
    if "--arm" in sys.argv:  # CPU oracle subprocess
        import jax

        jax.config.update("jax_platforms", "cpu")
        build_and_decode("cpu")
        return

    # 1. CPU oracle arm in a subprocess (clean backend, no axon plugin)
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(
        p for p in [ROOT] + env.get("PYTHONPATH", "").split(":")
        if p and "axon" not in p)
    env["JAX_PLATFORMS"] = "cpu"
    env["STJEP_NO_FLASH"] = "1"
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--arm"], env=env)
    assert r.returncode == 0, "cpu oracle arm failed"

    # 2. TPU arm, strict-f32 (this process: axon backend)
    os.environ["STJEP_NO_FLASH"] = "1"
    import jax

    tpu = build_and_decode("tpu")
    cpu = dict(np.load(os.path.join(WORK, "tokens_cpu.npz")))

    result = {
        "platform": str(jax.devices()[0]),
        "backend": jax.default_backend(),
        "mode": "strict f32: STJEP_NO_FLASH=1 (dense XLA decode) + "
                "jax_default_matmul_precision=highest on both arms",
        "config": {"batch": B, "frames": FRAMES, "beam": 5,
                   "weights": "random init seed 0 (near-uniform head -> "
                              "maximum tie sensitivity; shared param bytes "
                              "between arms)"},
        "surfaces": {},
    }
    ok = True
    for k in ("asr_greedy", "st_beam5"):
        same = bool((tpu[k] == cpu[k]).all())
        nd = int((tpu[k] != cpu[k]).sum())
        result["surfaces"][k] = {
            "tokens_identical": same,
            "diff_tokens": nd,
            "total_tokens": int(cpu[k].size),
        }
        ok = ok and same
    result["tokens_identical"] = ok
    path = os.path.join(ROOT, "benchmarks", "strict_f32_tpu.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    print("wrote", path)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
