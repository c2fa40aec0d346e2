"""Per-component fwd/bwd timing of the flagship ASR_ST step at bench shapes:
pyramid encoder, LAS decoder (teacher-forced), transformer encoder/decoder,
losses+optimizer. Identifies where the train-step milliseconds go."""

import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from stjep_tpu.config import BOS, ModelConfig
from stjep_tpu.models.seq2seq import init_seq2seq, _get_src_emb, _pre_proc_src
from stjep_tpu.models.las_encoder import las_encoder_forward
from stjep_tpu.models.las_decoder import las_decoder_forward
from stjep_tpu.models.tf_encoder import tf_encoder_forward
from stjep_tpu.models.tf_decoder import tf_decoder_forward

DTYPE = jnp.bfloat16 if os.environ.get("PROF_DTYPE") == "bf16" else jnp.float32

cfg = ModelConfig(
    enc_vocab_size=30000, dec_vocab_size=200,
    enc_embedding_size=200, dec_embedding_size=512,
    acous_dim=40, acous_hidden_size=256,
    dim_model=512, dim_feedforward=1024,
    num_heads=8, enc_layers=6, dec_layers=6,
    num_unilstm_dec=3, spec_aug=True, dropout=0.2,
    max_seq_len_src=90, max_seq_len_tgt=150, mode="ASR_ST",
)
params = init_seq2seq(jax.random.PRNGKey(0), cfg, dtype=DTYPE)

B, frames = int(os.environ.get("PROF_BATCH", "16")), 1504
rng = np.random.RandomState(0)
feats = jnp.asarray(rng.randn(B, frames, 40).astype(np.float32)).astype(DTYPE)
lens_np = rng.randint(frames // 2, frames - 8, size=(B,)).astype(np.int32)
lens_np[0] = frames - 8
lens = jnp.asarray(lens_np)
src = jnp.asarray(rng.randint(5, 30000, size=(B, 90)).astype(np.int32)
                  ).at[:, 0].set(BOS)
tgt = jnp.asarray(rng.randint(5, 200, size=(B, 150)).astype(np.int32)
                  ).at[:, 0].set(BOS)
from stjep_tpu.utils.misc import root_key

# hardware rbg keys, like the real train step: threefry mask generation
# inflates every dropout-bearing component by milliseconds (CLAUDE.md)
key = root_key(1)


def timeit(fn, *args, n=20, warm=2):
    """Pipelined timing: async-dispatch n calls, ONE readback at the end
    (a per-iteration readback costs the ~28 ms axon tunnel RTT and would
    swamp 5-15 ms kernels). Median of 3 windows."""
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


# --- forward components -----------------------------------------------------
enc_f = jax.jit(lambda p, f, l: las_encoder_forward(
    p, cfg, f, acous_lens=l, rng=key, is_training=True))
acous_out, lens8 = enc_f(params["las"]["encoder"], feats, lens)
print(f"pyramid fwd      : {timeit(enc_f, params['las']['encoder'], feats, lens):7.1f} ms", flush=True)

dec_f = jax.jit(lambda p, a, l, s: las_decoder_forward(
    p, cfg, a, acous_lens=l, tgt=s, use_teacher_forcing=True, rng=key,
    is_training=True))
print(f"las dec fwd (TF) : {timeit(dec_f, params['las']['decoder'], acous_out, lens, src):7.1f} ms", flush=True)

embs, _, _, lengths = dec_f(params["las"]["decoder"], acous_out, lens, src)
src_trim = _pre_proc_src(src)
_, emb_src, src_mask = _get_src_emb(params, cfg, src_trim, embs)

tfenc_f = jax.jit(lambda p, e, m: tf_encoder_forward(
    p, cfg, e, src_mask=m, rng=key, is_training=True)[0])
enc_out = tfenc_f(params["enc_src"], emb_src, src_mask)
print(f"tf enc fwd       : {timeit(tfenc_f, params['enc_src'], emb_src, src_mask):7.1f} ms", flush=True)

from stjep_tpu.models.seq2seq import _get_tgt_emb
tgt_mask, emb_tgt = _get_tgt_emb(params, cfg, tgt)
tfdec_f = jax.jit(lambda p, et, eo, tm, sm: tf_decoder_forward(
    p, cfg, et, eo, tgt_mask=tm, src_mask=sm, rng=key, is_training=True)[0])
print(f"tf dec fwd       : {timeit(tfdec_f, params['dec_tgt'], emb_tgt, enc_out, tgt_mask, src_mask):7.1f} ms", flush=True)

# --- gradients per component -------------------------------------------------
def g_of(fn):
    return jax.jit(jax.grad(fn))

g_enc = g_of(lambda p: jnp.sum(las_encoder_forward(
    p, cfg, feats, acous_lens=lens, rng=key, is_training=True)[0].astype(jnp.float32)))
print(f"pyramid fwd+bwd  : {timeit(g_enc, params['las']['encoder']):7.1f} ms", flush=True)

g_dec = g_of(lambda p: jnp.sum(las_decoder_forward(
    p, cfg, acous_out, acous_lens=lens, tgt=src, use_teacher_forcing=True,
    rng=key, is_training=True)[1].astype(jnp.float32)))
print(f"las dec fwd+bwd  : {timeit(g_dec, params['las']['decoder']):7.1f} ms", flush=True)

g_tfe = g_of(lambda p: jnp.sum(tf_encoder_forward(
    p, cfg, emb_src, src_mask=src_mask, rng=key, is_training=True)[0].astype(jnp.float32)))
print(f"tf enc fwd+bwd   : {timeit(g_tfe, params['enc_src']):7.1f} ms", flush=True)

g_tfd = g_of(lambda p: jnp.sum(tf_decoder_forward(
    p, cfg, emb_tgt, enc_out, tgt_mask=tgt_mask, src_mask=src_mask, rng=key,
    is_training=True)[0].astype(jnp.float32)))
print(f"tf dec fwd+bwd   : {timeit(g_tfd, params['dec_tgt']):7.1f} ms", flush=True)
