"""Speed-of-light decomposition of the flagship ASR_ST train step.

One reproducible table (benchmarks/sol_decomposition.json) backing the
"latency-bound, near the hardware floor" MFU claim (VERDICT r3 weak #4):
for each component of the B=32 step — pyramid BiLSTM, teacher-forced LAS
decoder (incl. its vocab head), transformer encoder, transformer decoder,
ST head + losses, optimizer — the MEASURED fwd+bwd wall-clock vs its
ANALYTIC floor:

  floor = max(matmul FLOPs / MXU peak, weight traffic / HBM bandwidth)

plus, for the recurrent components, the length of the serial dependent
chain (sequential cell steps fwd+bwd) and the implied per-chain-step
latency (slack / chain length) — the quantity fusion cannot shrink; it is
~the MXU issue+VPU gate latency of one dependent step. Components sum to
the measured full step (residual = embeddings/masks/loss glue + grad-accum
plumbing). Timing is the pipelined-window protocol of
scripts/profile_components.py (dispatch amortised; ROADMAP #14).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/measure_sol_decomposition.py [batch=32] [dtype=bfloat16]
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

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import BENCH, V5E_PEAK_FLOPS, analytic_train_flop_parts
from stjep_tpu.config import BOS, ModelConfig
from stjep_tpu.models.las_decoder import las_decoder_forward
from stjep_tpu.models.las_encoder import las_encoder_forward
from stjep_tpu.models.seq2seq import (_get_src_emb, _get_tgt_emb,
                                      _pre_proc_src, forward_train,
                                      init_seq2seq)
from stjep_tpu.models.tf_decoder import tf_decoder_forward
from stjep_tpu.models.tf_encoder import tf_encoder_forward
from stjep_tpu.ops.losses import nll_loss_masked
from stjep_tpu.train.optim import make_optimizer
from stjep_tpu.train.policies import trainable_mask
from stjep_tpu.utils.misc import root_key

HBM_BW = 819e9  # v5e HBM bandwidth, bytes/s

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
DTYPE_NAME = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
DTYPE = jnp.bfloat16 if DTYPE_NAME == "bfloat16" else jnp.float32
# f32 matmuls still read bf16 MXU operands under the default precision
# (ROADMAP #8), so the bf16 peak is the right denominator for both dtypes.
PEAK = V5E_PEAK_FLOPS

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
params = init_seq2seq(jax.random.PRNGKey(0), cfg, dtype=DTYPE)
rng = np.random.RandomState(0)
T = b["frames"]
feats = jnp.asarray(
    rng.randn(B, T, b["acous_dim"]).astype(np.float32)).astype(DTYPE)
lens_np = rng.randint(T // 2, T - 8, size=(B,)).astype(np.int32)
lens_np[0] = T - 8
lens = jnp.asarray(lens_np)
src = jnp.asarray(rng.randint(5, b["enc_vocab"], size=(B, b["max_src"]))
                  .astype(np.int32)).at[:, 0].set(BOS)
tgt = jnp.asarray(rng.randint(5, b["dec_vocab"], size=(B, b["decode_len"]))
                  .astype(np.int32)).at[:, 0].set(BOS)
key = root_key(1)


def nll_loss_with_mask(lp, tok):
    """flatten + PAD-mask wrapper over ops.losses.nll_loss_masked."""
    V = lp.shape[-1]
    flat = lp.reshape(-1, V)
    t = tok.reshape(-1)
    return nll_loss_masked(flat, t, t != 0)


def timeit(fn, *args, n=20, warm=2):
    """Pipelined-window timing, median of 3 (profile_components protocol)."""
    def drain(out):
        _ = float(jnp.sum(
            jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    for _ in range(warm):
        drain(fn(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        drain(out)
        times.append((time.perf_counter() - t0) / n * 1000)
    return sorted(times)[1]


# ---- full train step (fwd+bwd+adam), the bench protocol --------------------
tx = make_optimizer(1.0, trainable_mask(params, lambda nm: False))
opt_state = tx.init(params)


def loss_fn(p, k):
    out = forward_train(p, cfg, "ASR_ST", src, tgt=tgt, acous_feats=feats,
                        acous_lens=lens, is_training=True, rng=k)
    lp_a = out["logps_asr"]
    tok_a = src[:, 1:lp_a.shape[1] + 1]
    la, na = nll_loss_with_mask(lp_a, tok_a)
    lp_s = out["logps_st"][:, :-1, :]
    tok_s = tgt[:, 1:]
    ls, ns = nll_loss_with_mask(lp_s, tok_s)
    return la / jnp.maximum(na, 1.0) + ls / jnp.maximum(ns, 1.0)


@jax.jit
def full_step(p, o, k):
    k, sub = jax.random.split(k)
    loss, grads = jax.value_and_grad(loss_fn)(p, sub)
    updates, o = tx.update(grads, o, p)
    import optax

    p = optax.apply_updates(p, updates)
    return p, o, loss, k


def run_full(p, o, k):
    p2, o2, loss, k2 = full_step(p, o, k)
    return loss


ms_full = timeit(run_full, params, opt_state, key, n=10)

# ---- per-component fwd+bwd --------------------------------------------------
meas = {}

g_pyr = jax.jit(jax.grad(lambda p: jnp.sum(las_encoder_forward(
    p, cfg, feats, acous_lens=lens, rng=key, is_training=True
)[0].astype(jnp.float32))))
meas["pyramid"] = timeit(g_pyr, params["las"]["encoder"])

acous_out, lens8 = jax.jit(lambda p, f, l: las_encoder_forward(
    p, cfg, f, acous_lens=l, rng=key, is_training=True))(
        params["las"]["encoder"], feats, lens)

g_dec = jax.jit(jax.grad(lambda p: jnp.sum(las_decoder_forward(
    p, cfg, acous_out, acous_lens=lens, tgt=src, use_teacher_forcing=True,
    rng=key, is_training=True)[1].astype(jnp.float32))))
meas["las_decoder"] = timeit(g_dec, params["las"]["decoder"])

dec_out = jax.jit(lambda p: las_decoder_forward(
    p, cfg, acous_out, acous_lens=lens, tgt=src, use_teacher_forcing=True,
    rng=key, is_training=True))(params["las"]["decoder"])
embs = dec_out[0]
src_trim = _pre_proc_src(src)
_, emb_src, src_mask = _get_src_emb(params, cfg, src_trim, embs)
tgt_mask, emb_tgt = _get_tgt_emb(params, cfg, tgt)

g_tfe = jax.jit(jax.grad(lambda p: jnp.sum(tf_encoder_forward(
    p, cfg, emb_src, src_mask=src_mask, rng=key, is_training=True
)[0].astype(jnp.float32))))
meas["tf_encoder"] = timeit(g_tfe, params["enc_src"])

enc_out = jax.jit(lambda p: tf_encoder_forward(
    p, cfg, emb_src, src_mask=src_mask, rng=key, is_training=True)[0])(
        params["enc_src"])

g_tfd = jax.jit(jax.grad(lambda p: jnp.sum(tf_decoder_forward(
    p, cfg, emb_tgt, enc_out, tgt_mask=tgt_mask, src_mask=src_mask, rng=key,
    is_training=True)[0].astype(jnp.float32))))
meas["tf_decoder"] = timeit(g_tfd, params["dec_tgt"])

dec_tgt_out = jax.jit(lambda p: tf_decoder_forward(
    p, cfg, emb_tgt, enc_out, tgt_mask=tgt_mask, src_mask=src_mask, rng=key,
    is_training=True)[0])(params["dec_tgt"])


def st_head_loss(p_out):
    # out_tgt is bias-free (ref: Seq2seq.py:180)
    lp = jax.nn.log_softmax(
        (dec_tgt_out @ p_out["w"]).astype(jnp.float32), axis=-1)
    l, n = nll_loss_with_mask(lp[:, :-1, :], tgt[:, 1:])
    return l / jnp.maximum(n, 1.0)


g_head = jax.jit(jax.grad(st_head_loss))
meas["st_head"] = timeit(g_head, params["out_tgt"])

grads_like = jax.tree_util.tree_map(jnp.ones_like, params)


@jax.jit
def opt_apply(g, o, p):
    import optax

    updates, o2 = tx.update(g, o, p)
    return optax.apply_updates(p, updates)


meas["optimizer"] = timeit(opt_apply, grads_like, opt_state, params)

# ---- analytic floors --------------------------------------------------------
flops = analytic_train_flop_parts(cfg, B, T, b["max_src"], b["decode_len"])
flops["st_head"] = flops.pop("st_head")  # keep key order stable


def param_bytes(tree):
    return sum(np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(tree))


weight_bytes = {
    "pyramid": 3 * param_bytes(params["las"]["encoder"]),
    "las_decoder": 3 * param_bytes(params["las"]["decoder"]),
    "tf_encoder": 3 * param_bytes(params["enc_src"]),
    "tf_decoder": 3 * param_bytes(params["dec_tgt"]),
    "st_head": 3 * param_bytes(params["out_tgt"]),
    # adam: read p/m/v + grads, write p/m/v -> ~7x param bytes
    "optimizer": 7 * param_bytes(params),
}
flops["optimizer"] = 0.0

# serial dependent-chain lengths (sequential cell steps, fwd + bwd)
chain = {
    "pyramid": 2 * sum(T // (2 ** i) for i in range(cfg.num_pyramid_layers)),
    "las_decoder": 2 * (b["max_src"] - 1),
}

rows = {}
total_floor = 0.0
for name, ms in meas.items():
    fl = flops.get(name, 0.0)
    floor_flops_ms = fl / PEAK * 1000.0
    floor_bw_ms = weight_bytes.get(name, 0) / HBM_BW * 1000.0
    floor = max(floor_flops_ms, floor_bw_ms)
    total_floor += floor
    row = {
        "measured_ms": round(ms, 2),
        "floor_ms": round(floor, 3),
        "floor_flops_ms": round(floor_flops_ms, 3),
        "floor_weight_traffic_ms": round(floor_bw_ms, 3),
        "slack_ms": round(ms - floor, 2),
        "slack_x": round(ms / floor, 1) if floor > 0 else None,
    }
    if name in chain:
        row["serial_chain_steps_fwd_bwd"] = chain[name]
        row["implied_us_per_chain_step"] = round(
            (ms - floor) / chain[name] * 1000.0, 2)
    rows[name] = row

sum_components = sum(m for m in meas.values())
result = {
    "platform": str(jax.devices()[0]),
    "backend": jax.default_backend(),
    "batch": B,
    "dtype": DTYPE_NAME,
    "shapes": {"frames": T, "max_src": b["max_src"],
               "decode_len": b["decode_len"]},
    "peak_flops": PEAK,
    "hbm_bw_bytes_s": HBM_BW,
    "full_step_ms": round(ms_full, 2),
    "full_step_per_s": round(1000.0 / ms_full, 2),
    "sum_components_ms": round(sum_components, 2),
    "residual_glue_ms": round(ms_full - sum_components, 2),
    "residual_note": "embeddings/masks/loss glue + per-call dispatch not in "
                     "any component probe; each component probe itself pays "
                     "a ~2 ms pipelined-dispatch floor (ROADMAP #14), so "
                     "sum_components can exceed full_step",
    "total_floor_ms": round(total_floor, 2),
    "mfu_equivalent": round(
        (sum(flops.values()) / PEAK * 1000.0) / ms_full, 3),
    "components": rows,
}
print(json.dumps(result, indent=2))
path = os.path.join(ROOT, "benchmarks", "sol_decomposition.json")
with open(path, "w") as f:
    json.dump(result, f, indent=2)
print("wrote", path)
