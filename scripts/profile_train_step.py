"""Per-op device profile of the B=32 bf16 ASR_ST train step (VERDICT r4 #1).

jax.profiler works on the axon TPU platform; the xplane.pb it writes
carries the full HLO instruction text per op — including the flattened
parameter names (`params__las____decoder____dec_l1____w_ih__`, ...) — so
every fusion can be ATTRIBUTED to a model component by the parameters and
named buffers it touches. This replaces the r4 SOL decomposition's
outside-in component probes (each inflated by a ~2 ms dispatch floor) with
the compiler's own schedule.

Output: benchmarks/train_profile_b32.json
  - top_ops: every op >= 50 us/step with component attribution + op kind
  - components: per-component device-time totals (3-step means)
  - occupancy: program wall vs op time (gaps = serial launch bubbles)

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_train_step.py
"""

import json
import os
import re
import shutil
import sys
from collections import defaultdict
from functools import partial

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import optax

from bench import BENCH
from stjep_tpu.config import BOS, ModelConfig
from stjep_tpu.models.seq2seq import forward_train, init_seq2seq
from stjep_tpu.train.optim import make_optimizer, set_lr
from stjep_tpu.utils.misc import root_key

B = 32
LOGDIR = "/tmp/train_trace"

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

params = init_seq2seq(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
T = b["frames"]
feats = jnp.asarray(rng.randn(B, T, b["acous_dim"]).astype(np.float32)
                    ).astype(jnp.bfloat16)
lens = jnp.asarray(
    np.linspace(T // 2, T - 8, B).astype(np.int32))
src = jnp.asarray(
    rng.randint(5, b["enc_vocab"], size=(B, b["max_src"])).astype(np.int32)
).at[:, 0].set(BOS)
tgt = jnp.asarray(
    rng.randint(5, b["dec_vocab"], size=(B, b["decode_len"])).astype(np.int32)
).at[:, 0].set(BOS)

tx = make_optimizer(1.0)
opt_state = set_lr(tx.init(params), 1e-4)


def train_step(params, opt_state, feats, lens, src, tgt, rng):
    def loss_fn(p):
        o = forward_train(p, cfg, "ASR_ST", src, tgt=tgt, acous_feats=feats,
                          acous_lens=lens, rng=rng, is_training=True,
                          ref_pick=True)
        la = -jnp.mean(o["picked_asr"])  # == NLL at the ref tokens
        ld = -jnp.mean(o["picked_st"])
        return la + ld

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


step = jax.jit(train_step, donate_argnums=(0, 1))
for w in (1, 2):
    params, opt_state, loss = step(params, opt_state, feats, lens, src, tgt,
                                   root_key(w))
    _ = float(loss)

N_STEPS = 3
shutil.rmtree(LOGDIR, ignore_errors=True)
with jax.profiler.trace(LOGDIR):
    for i in range(N_STEPS):
        params, opt_state, loss = step(params, opt_state, feats, lens, src,
                                       tgt, root_key(10 + i))
    _ = float(loss)
print("traced", flush=True)


# ---------------------------------------------------------------- xplane
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402
import glob  # noqa: E402

xp = sorted(glob.glob(os.path.join(
    LOGDIR, "plugins", "profile", "*", "*.xplane.pb")))[-1]
xs = xplane_pb2.XSpace()
with open(xp, "rb") as f:
    xs.ParseFromString(f.read())
plane = [pl for pl in xs.planes if pl.name == "/device:TPU:0"][0]
em = plane.event_metadata
ops_line = [l for l in plane.lines if l.name == "XLA Ops"][0]
mods_line = [l for l in plane.lines if l.name == "XLA Modules"][0]

sm = plane.stat_metadata
PEAK_TFLOPS = 197.0  # v5e bf16 (f32-accumulate) MXU
PEAK_BW = 819e9


def stat_val(st):
    for f in ("double_value", "uint64_value", "int64_value", "str_value"):
        v = getattr(st, f)
        if v:
            return v
    if st.ref_value:
        return sm[st.ref_value].name
    return 0


def ev_stats(ev):
    out = {}
    for st in list(ev.stats) + list(em[ev.metadata_id].stats):
        out.setdefault(sm[st.metadata_id].name, stat_val(st))
    return out


SOURCE_COMPONENT = [
    ("las_encoder", "pyramid"), ("lstm", "pyramid"),
    ("las_decoder", "las_decoder"), ("las_tf_flash", "las_decoder"),
    ("las_flash", "las_decoder"),
    ("tf_encoder", "tf_encoder"), ("tf_decoder", "tf_decoder"),
    ("losses", "loss"), ("optim", "optimizer"), ("masks", "masks"),
    ("seq2seq", "seq2seq_glue"),
]


def attribute(source: str, hlo: str, shape: str) -> str:
    base = os.path.basename(source.split(":")[0]) if source else ""
    for key, comp in SOURCE_COMPONENT:
        if key in base:
            return comp
    if "transformer.py" in base or "attention.py" in base:
        # shared module code: split encoder vs decoder stacks (and the LAS
        # output head, which runs ops/attention.py:linear over the source
        # length) by the sequence length in the op's result shape
        if re.search(r"\b30000\b", shape):
            return "asr_head"
        if re.search(r"\b89\b|\b90\b", shape):
            return "tf_encoder"
        if re.search(r"\b149\b|\b150\b", shape):
            return "tf_decoder"
        return "tf_shared"
    if re.search(r"opt_state|adam|clip", source + hlo, re.I):
        return "optimizer"
    if not source:
        # no jax source: Adam/optax update fusions and raw copies
        if re.search(r"copy|bitcast|tuple", hlo.split(" = ")[0]):
            return "copies"
        return "no_source"
    return "other:" + base


def op_kind(name: str) -> str:
    short = name.split(" = ")[0].lstrip("%") if " = " in name else name
    return re.sub(r"[.\d]+$", "", short)


per_md = defaultdict(lambda: [0.0, 0, None])
for ev in ops_line.events:
    rec = per_md[ev.metadata_id]
    rec[0] += ev.duration_ps / 1e6  # -> us
    rec[1] += 1
    if rec[2] is None:
        rec[2] = ev_stats(ev)

rows = []
comp_tot = defaultdict(float)
total_us = 0.0
for mid, (us, cnt, stats) in per_md.items():
    hlo = em[mid].name
    stats = stats or {}
    source = str(stats.get("source", ""))
    shape = str(stats.get("shape_with_layout", ""))
    comp = attribute(source, hlo, shape)
    us_step = us / N_STEPS
    comp_tot[comp] += us_step
    total_us += us_step
    dur_s = us / max(cnt, 1) / 1e6
    flops = float(stats.get("flops", 0) or 0)
    bts = float(stats.get("bytes_accessed", 0) or 0)
    mxu = flops / dur_s / 1e12 / PEAK_TFLOPS if dur_s else 0.0
    bw = bts / dur_s / PEAK_BW if dur_s else 0.0
    bound = ("mxu" if mxu > 0.5 else "hbm" if bw > 0.5 else
             "latency/vpu")
    rows.append({
        "op": op_kind(hlo),
        "us_per_step": round(us_step, 1),
        "count_per_step": cnt // N_STEPS,
        "component": comp,
        "source": source.replace("/root/repo/", ""),
        "tf_op": str(stats.get("tf_op", ""))[:80],
        "category": str(stats.get("hlo_category", "")),
        "gflops": round(flops / 1e9, 2),
        "mbytes": round(bts / 1e6, 1),
        "mxu_util": round(mxu, 3),
        "hbm_util": round(bw, 3),
        "bound": bound,
        "shape": shape[:160],
    })
rows.sort(key=lambda r: -r["us_per_step"])

prog_ms = sum(e.duration_ps / 1e9 for e in mods_line.events) / N_STEPS

out = {
    "platform": str(jax.devices()[0]),
    "config": {"batch": B, "dtype": "bfloat16",
               **{k: b[k] for k in ("frames", "max_src", "decode_len")}},
    "steps_traced": N_STEPS,
    "program_ms_per_step": round(prog_ms, 2),
    "sum_ops_ms_per_step": round(total_us / 1000.0, 2),
    "launch_gap_ms_per_step": round(prog_ms - total_us / 1000.0, 2),
    "components_ms": {k: round(v / 1000.0, 2)
                      for k, v in sorted(comp_tot.items(),
                                         key=lambda kv: -kv[1])},
    "top_ops": [r for r in rows if r["us_per_step"] >= 50.0],
    "note": "XLA Ops line of the device xplane; attribution by the jax "
            "`source` stat (file:line) with shape-based encoder/decoder "
            "split for shared module code. mxu_util/hbm_util are "
            "achieved/peak per op; bound > 0.5 of either peak names the "
            "roofline wall, else latency/VPU. 'launch_gap' is device idle "
            "inside the program.",
}
path = os.path.join(ROOT, "benchmarks", "train_profile_b32.json")
with open(path, "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps({k: out[k] for k in
                  ("program_ms_per_step", "sum_ops_ms_per_step",
                   "launch_gap_ms_per_step", "components_ms")}, indent=2))
for r in out["top_ops"][:45]:
    print(f"{r['us_per_step']:8.1f} us x{r['count_per_step']:<3d} "
          f"{r['component']:14s} {r['bound']:11s} "
          f"mxu={r['mxu_util']:5.2f} hbm={r['hbm_util']:5.2f} "
          f"{r['source'][-36:]:36s} {r['op'][:28]}")
print("wrote", path)
