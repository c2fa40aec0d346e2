"""Ablate the TF decoder *training* path (fwd+bwd) at bench shapes to find
where its milliseconds go before (or instead of) building a kernel.

The B=32 component profile puts the 6-layer decoder fwd+bwd at ~15.6 ms —
the largest single component of the train step, at ~17% MFU vs ~36% for the
pyramid kernels. Variants measured (each jit(grad) over a 6-layer stack with
the real mha/ffn params, L=150, mem=89):

  base      : exact product code path (transpose head-split, where-mask,
              dropout 0.2 + attn 0.1)
  nodrop    : deterministic (no dropout / no RNG) — dropout + mask-gen cost
  nomask    : no attention masking — the where + broadcast cost
  addmask   : additive precomputed [B,1,L,L] bias instead of where
  blnd      : layout-preserving attention — q/k/v stay [B,L,n,d], einsums
              carry the head axis, no transposes (reshape-only merge)
  fuseqkv   : one [D,3D] self-QKV matmul + one [D,2D] cross-KV matmul
  blnd+fuse : both

Run one-at-a-time on the TPU:
  PROF_BATCH=32 PYTHONPATH=/root/repo:/root/.axon_site \
    nohup python scripts/probe_tfdec_ablation.py > /tmp/abl.log 2>&1 &
"""

import os
import time

import numpy as np
import jax

from stjep_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from stjep_tpu.config import ModelConfig
from stjep_tpu.models.tf_decoder import tf_decoder_init, tf_decoder_forward
from stjep_tpu.ops.masks import pad_mask, subsequent_mask
from stjep_tpu.ops.transformer import (ATTN_DROPOUT, ATTN_MASK_FILL, dropout,
                                       layer_norm)
from stjep_tpu.utils.misc import root_key

DTYPE = jnp.bfloat16 if os.environ.get("PROF_DTYPE") == "bf16" else jnp.float32
B = int(os.environ.get("PROF_BATCH", "32"))
L, LK, D, NH, FF, NL = 150, 89, 512, 8, 1024, 6

cfg = ModelConfig(
    enc_vocab_size=30000, dec_vocab_size=200,
    enc_embedding_size=200, dec_embedding_size=D,
    acous_dim=40, acous_hidden_size=256,
    dim_model=D, dim_feedforward=FF, num_heads=NH,
    enc_layers=NL, dec_layers=NL, dropout=0.2,
    max_seq_len_src=90, max_seq_len_tgt=L, mode="ASR_ST",
)
params = tf_decoder_init(jax.random.PRNGKey(0), cfg, dtype=DTYPE)
rng = np.random.RandomState(0)
tgt = jnp.asarray(rng.randn(B, L, D).astype(np.float32)).astype(DTYPE)
mem = jnp.asarray(rng.randn(B, LK, D).astype(np.float32)).astype(DTYPE)
tgt_ids = jnp.asarray(rng.randint(5, 200, size=(B, L)).astype(np.int32))
tgt_mask = (pad_mask(tgt_ids)[:, None, :] * subsequent_mask(L)).astype(jnp.int32)
src_mask = jnp.ones((B, 1, LK), jnp.int32)
key = root_key(1)


def timeit(fn, *args, n=20):
    def drain(out):
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    for _ in range(2):
        drain(fn(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        drain(out)
        times.append((time.perf_counter() - t0) / n * 1000)
    return sorted(times)[1]


# --- speed-of-light decomposition ------------------------------------------
# strip the stack down to its matmuls, then add back one op class at a time:
# locates the non-matmul milliseconds without a profiler (each variant keeps
# identical FLOPs in the matmuls).


def _mha_sol(p, q, k, v, *, mask, rngk, det, ln, sm):
    residual = q
    qn = layer_norm(p["layer_norm"], q, eps=1e-6) if ln else q
    d_k = p["w_qs"]["w"].shape[1] // NH
    qh, kh, vh = qn @ p["w_qs"]["w"], k @ p["w_ks"]["w"], v @ p["w_vs"]["w"]
    b, lq, _ = qh.shape
    lk = kh.shape[1]
    qh = qh.reshape(b, lq, NH, d_k)
    kh = kh.reshape(b, lk, NH, d_k)
    vh = vh.reshape(b, lk, NH, d_k)
    attn = jnp.einsum("bqnd,bknd->bnqk", qh / (d_k**0.5), kh)
    if mask is not None:
        attn = jnp.where(mask == 0, ATTN_MASK_FILL, attn)
    if sm:
        attn = jax.nn.softmax(attn, axis=-1)
    if not det:
        r1, r2 = jax.random.split(rngk)
        attn = dropout(r1, attn, ATTN_DROPOUT, det)
    out = jnp.einsum("bnqk,bknd->bqnd", attn, vh).reshape(b, lq, NH * d_k)
    out = out @ p["fc"]["w"]
    if not det:
        out = dropout(r2, out, cfg.dropout, det)
    return out + residual


def sol_fwd(params, tgt, mem, *, k, ln=False, sm=False, det=True, masked=False):
    smask = tgt_mask if masked else None
    cmask = src_mask[:, None, :, :] if masked else None
    x = tgt
    for i in range(NL):
        lp = params["layers"][i]
        k, k1, k2, k3 = jax.random.split(k, 4)
        x = _mha_sol(lp["decslf_attn"], x, x, x, mask=smask, rngk=k1, det=det,
                     ln=ln, sm=sm)
        x = _mha_sol(lp["encdec_attn"], x, mem, mem, mask=cmask, rngk=k2,
                     det=det, ln=ln, sm=sm)
        fp = lp["pos_ffn"]
        y = layer_norm(fp["layer_norm"], x, eps=1e-6) if ln else x
        y = jax.nn.relu(y @ fp["w_1"]["w"] + fp["w_1"]["b"]) @ fp["w_2"]["w"]
        if not det:
            y = dropout(k3, y, cfg.dropout, det)
        x = y + fp["w_2"]["b"] + x
    return layer_norm(params["norm"], x, eps=1e-5)


def make_sol_grad(**kw):
    def loss(p):
        return jnp.sum(sol_fwd(p, tgt, mem, k=key, **kw).astype(jnp.float32))
    return jax.jit(jax.grad(loss))


SOL_VARIANTS = [
    ("matmuls-only", dict()),
    ("+softmax    ", dict(sm=True)),
    ("+mask+sm    ", dict(sm=True, masked=True)),
    ("+ln         ", dict(sm=True, masked=True, ln=True)),
    ("+dropout=all", dict(sm=True, masked=True, ln=True, det=False)),
]


# --- parameterized reimplementation ----------------------------------------

def _mha_v(p, q, k, v, *, mask, layout, fuse, kind, rngk, det):
    residual = q
    qn = layer_norm(p["layer_norm"], q, eps=1e-6)
    wq, wk, wv = p["w_qs"]["w"], p["w_ks"]["w"], p["w_vs"]["w"]
    d_k = wq.shape[1] // NH
    if fuse and kind == "self":
        qkv = qn @ jnp.concatenate([wq, wk, wv], axis=1)
        qh, kh, vh = jnp.split(qkv, 3, axis=-1)
    elif fuse and kind == "cross":
        qh = qn @ wq
        kv = k @ jnp.concatenate([wk, wv], axis=1)
        kh, vh = jnp.split(kv, 2, axis=-1)
    else:
        qh, kh, vh = qn @ wq, k @ wk, v @ wv
    b, lq, _ = qh.shape
    lk = kh.shape[1]
    if layout == "transpose":
        qh = qh.reshape(b, lq, NH, d_k).transpose(0, 2, 1, 3)
        kh = kh.reshape(b, lk, NH, d_k).transpose(0, 2, 1, 3)
        vh = vh.reshape(b, lk, NH, d_k).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bnqd,bnkd->bnqk", qh / (d_k**0.5), kh)
    else:  # blnd: head axis stays minor-adjacent, no transposes
        qh = qh.reshape(b, lq, NH, d_k)
        kh = kh.reshape(b, lk, NH, d_k)
        vh = vh.reshape(b, lk, NH, d_k)
        attn = jnp.einsum("bqnd,bknd->bnqk", qh / (d_k**0.5), kh)
    if mask is not None:
        if mask.ndim == 3:
            mask = mask[:, None, :, :]
        if mask.dtype == DTYPE:  # additive
            attn = attn + mask
        else:
            attn = jnp.where(mask == 0, ATTN_MASK_FILL, attn)
    attn = jax.nn.softmax(attn, axis=-1)
    r1, r2 = jax.random.split(rngk)
    attn = dropout(r1, attn, ATTN_DROPOUT, det)
    if layout == "transpose":
        out = jnp.einsum("bnqk,bnkd->bnqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, NH * d_k)
    else:
        out = jnp.einsum("bnqk,bknd->bqnd", attn, vh)
        out = out.reshape(b, lq, NH * d_k)
    out = out @ p["fc"]["w"]
    out = dropout(r2, out, cfg.dropout, det)
    return out + residual


def _ffn_v(p, x, rngk, det):
    residual = x
    y = layer_norm(p["layer_norm"], x, eps=1e-6)
    y = jax.nn.relu(y @ p["w_1"]["w"] + p["w_1"]["b"]) @ p["w_2"]["w"] + p["w_2"]["b"]
    y = dropout(rngk, y, cfg.dropout, det)
    return y + residual


def stack_fwd(params, tgt, mem, *, layout, fuse, maskmode, det, k):
    if maskmode == "none":
        smask = cmask = None
    elif maskmode == "add":
        smask = (ATTN_MASK_FILL * (1 - tgt_mask)).astype(DTYPE)
        cmask = jnp.zeros((B, 1, 1, LK), DTYPE)
    else:
        smask, cmask = tgt_mask, src_mask
    x = tgt
    for i in range(NL):
        lp = params["layers"][i]
        k, k1, k2, k3 = jax.random.split(k, 4)
        x = _mha_v(lp["decslf_attn"], x, x, x, mask=smask, layout=layout,
                   fuse=fuse, kind="self", rngk=k1, det=det)
        x = _mha_v(lp["encdec_attn"], x, mem, mem, mask=cmask, layout=layout,
                   fuse=fuse, kind="cross", rngk=k2, det=det)
        x = _ffn_v(lp["pos_ffn"], x, k3, det)
    return layer_norm(params["norm"], x, eps=1e-5)


def make_grad(**kw):
    def loss(p):
        return jnp.sum(stack_fwd(p, tgt, mem, k=key, **kw).astype(jnp.float32))
    return jax.jit(jax.grad(loss))


def product_grad():
    def loss(p):
        out, _, _ = tf_decoder_forward(
            p, cfg, tgt, mem, tgt_mask=tgt_mask, src_mask=src_mask,
            rng=key, is_training=True)
        return jnp.sum(out.astype(jnp.float32))
    return jax.jit(jax.grad(loss))


VARIANTS = [
    ("product ", None),
    ("base    ", dict(layout="transpose", fuse=False, maskmode="where", det=False)),
    ("nodrop  ", dict(layout="transpose", fuse=False, maskmode="where", det=True)),
    ("nomask  ", dict(layout="transpose", fuse=False, maskmode="none", det=False)),
    ("addmask ", dict(layout="transpose", fuse=False, maskmode="add", det=False)),
    ("blnd    ", dict(layout="blnd", fuse=False, maskmode="where", det=False)),
    ("fuseqkv ", dict(layout="transpose", fuse=True, maskmode="where", det=False)),
    ("blnd+fus", dict(layout="blnd", fuse=True, maskmode="where", det=False)),
]

if __name__ == "__main__":
    import sys

    print(f"B={B} dtype={DTYPE.__name__} L={L} mem={LK} layers={NL}", flush=True)
    if "--sol" in sys.argv:
        for name, kw in SOL_VARIANTS:
            g = make_sol_grad(**kw)
            print(f"{name}: {timeit(g, params):7.2f} ms", flush=True)
    else:
        for name, kw in VARIANTS:
            g = product_grad() if kw is None else make_grad(**kw)
            print(f"{name}: {timeit(g, params):7.2f} ms", flush=True)
