"""Fused Pallas kernel: free-running LAS greedy decode, whole loop on-chip.

The free-running attention decoder (ref: models/Dec.py:205-224 with
teacher_forcing off) is the hot loop of ASR decode/eval and of the ST
decode's embedding pass (SURVEY §3.2/§3.3). Under XLA it is a lax.scan
whose every step launches ~20 fusions: 3 LSTM cells, bilinear attention,
the FFN, the [Hs, V] output head, log_softmax, argmax, and the embedding
lookup of the emitted symbol — all serial, all launch-bound, plus an
[B, L-1, V] logp buffer written to HBM that eval rarely reads in full.

This kernel runs the ENTIRE decode as one pallas_call with a grid over the
L-1 steps. Everything lives in VMEM: the LSTM/FFN weights, the bilinear
key projections and attention values, the embedder table and output head
(callers pass them bf16 on real TPUs — ~45 MB resident), and the h/c/
cell_value/symbol carries in scratch. Per step:

  one-hot(sym) @ embedder   (MXU — the feedback embedding lookup; exact,
                             since one-hot rows select table rows and the
                             PAD row is zero by construction)
  3-layer residual LSTM     (split input projections, f32 carries)
  bilinear attention        (VPU broadcast-mul + lane reduction, -1e12
                             mask fill, f32 softmax — ops/attention.py
                             semantics)
  FFN -> dynamic embedding  (row-split matmul, no bias — ref: Dec.py:96-97)
  output head + log-softmax stats + greedy argmax (lowest-index ties,
                             matching jnp.argmax)
  picked logp               (log-softmax value at a caller-given reference
                             token — what dev NLL reads; the full [B, V]
                             row never leaves the kernel)

Outputs: dynamic embeddings [L-1, B, Hs], greedy symbols and picked logps
(as [L-1, B, 128] lane-broadcast blocks — full-tile writes; callers take
lane 0). Length tracking (first EOS-or-PAD) is vectorised outside, as in
the teacher-forced path.

Gradients: none — this is an inference/eval kernel; training paths keep
the XLA scan (las_decoder.py routes accordingly).

Precision: on real TPUs the weights/att-values are held in bf16 regardless
of param dtype — f32 copies of the flagship embedder + output head alone
(~85 MB) cannot be VMEM-resident. This matches the operand rounding XLA's
DEFAULT TPU matmul precision applies on the dense path (bf16 MXU inputs,
f32 accumulation); carries, biases, softmax stats and picked logps stay
f32. Callers needing strict f32 arithmetic (e.g. bit-parity probes with
jax_default_matmul_precision=highest) must disable fused kernels via
STJEP_NO_FLASH=1, which falls back to the XLA scan. CPU interpret mode
keeps f32, so the oracle parity suites check exact semantics.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from stjep_tpu.config import ModelConfig

VMEM_LIMIT = 100 * 1024 * 1024
MASK_FILL = -1e12  # ops/attention.py MASK_FILL (ref: modules/attention.py:252)


def las_flash_supported(cfg: ModelConfig) -> bool:
    """The kernel assumes bilinear attention (the recipe's mode,
    ref: Seq2seq.py:151) and tile-friendly widths."""
    return (
        cfg.acous_att_mode == "bilinear"
        and cfg.enc_embedding_size % 8 == 0
        and cfg.dim_model % 128 == 0
        and (2 * cfg.acous_hidden_size) % 128 == 0
    )


def _kernel(lens_ref, sym0_ref, refs_ref, wk_ref, val_ref, emb_ref,
            wffn_ref, wout_ref, bout_ref, *rest,
            n_layers: int, E: int, Ha2: int):
    from jax.experimental import pallas as pl

    n_w = 2 * n_layers + 1
    lstm_refs = rest[:n_w]
    embs_ref, pred_ref, picked_ref = rest[n_w:n_w + 3]
    scratch = rest[n_w + 3:]
    h_scr = scratch[:n_layers]
    c_scr = scratch[n_layers:2 * n_layers]
    cell_scr, sym_scr = scratch[2 * n_layers], scratch[2 * n_layers + 1]

    t = pl.program_id(0)
    f32 = jnp.float32
    B, V = sym_scr.shape[0], emb_ref.shape[0]
    Hd = h_scr[0].shape[-1]

    @pl.when(t == 0)
    def _init():
        for r in h_scr + c_scr:
            r[:] = jnp.zeros_like(r)
        cell_scr[:] = jnp.zeros_like(cell_scr)
        sym_scr[:] = sym0_ref[:]

    def mdot(a, w):
        # matmuls run in the weight's dtype (bf16 on TPU, f32 in interpret
        # mode) with f32 accumulation — the same contraction precision as
        # XLA's default elsewhere in the model
        return jnp.dot(a.astype(w.dtype), w, preferred_element_type=f32)

    # feedback embedding: one-hot @ table (table's PAD row is zero, so
    # torch's padding_idx semantics hold exactly — las_decoder.embed)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
    onehot = (iota_v == sym_scr[:]).astype(emb_ref.dtype)
    emb = mdot(onehot, emb_ref[:])  # [B, E]

    # 3-layer residual LSTM stack (ref: Dec.py:384-424); input =
    # [emb ; cell_value] via row-split matmuls
    def gates(pre, c):
        from stjep_tpu.ops.lstm import lstm_gates

        return lstm_gates(pre, c, Hd)

    # recurrent inputs lane-concatenated: one chained dot per layer
    # (the emb side stays separate — E is not a lane-tile multiple)
    w_ih0E, w0_ref, b0 = lstm_refs[0], lstm_refs[1], lstm_refs[2]
    pre = (mdot(emb, w_ih0E[:])
           + mdot(jnp.concatenate([cell_scr[:], h_scr[0][:]], axis=-1),
                  w0_ref[:]) + b0[:])
    h_new, c_new = gates(pre, c_scr[0][:])
    h_scr[0][:] = h_new
    c_scr[0][:] = c_new
    out = h_new
    for i in range(1, n_layers):
        w_i, b = lstm_refs[i * 2 + 1], lstm_refs[i * 2 + 2]
        pre = mdot(jnp.concatenate([out, h_scr[i][:]], axis=-1), w_i[:]) + b[:]
        h_new, c_new = gates(pre, c_scr[i][:])
        h_scr[i][:] = h_new
        c_scr[i][:] = c_new
        out = h_new + out if i < n_layers - 1 else h_new  # middle residuals

    # bilinear attention over the (precomputed) key projections
    q = out  # [B, Hd]
    Tk = wk_ref.shape[1]
    scores = jnp.sum(q[:, None, :] * wk_ref[:].astype(f32), axis=-1)  # [B,Tk]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (B, Tk), 1)
    scores = jnp.where(iota_k >= lens_ref[:], MASK_FILL, scores)
    mx = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - mx)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    ctx = jnp.sum(attn[:, :, None] * val_ref[:].astype(f32), axis=1)  # [B,Ha2]

    # FFN [att ; dec] -> dynamic embedding (no bias, ref: Dec.py:96-97)
    cell_new = mdot(jnp.concatenate([ctx, q], axis=-1), wffn_ref[:])

    # output head + log-softmax stats + greedy pick (ref: Dec.py:320-341)
    logits = mdot(cell_new, wout_ref[:]) + bout_ref[:]  # [B, V]
    lmx = jnp.max(logits, axis=-1)
    lse = lmx + jnp.log(jnp.sum(jnp.exp(logits - lmx[:, None]), axis=-1))
    pred = jnp.min(jnp.where(logits == lmx[:, None], iota_v, V), axis=-1)
    gid = refs_ref[0]  # [B, 128] broadcast rows; lane 0 is the token id
    glp = jnp.sum(jnp.where(iota_v == gid[:, :1], logits, 0.0), axis=-1) - lse

    embs_ref[0] = cell_new.astype(embs_ref.dtype)
    pred_ref[0] = jnp.broadcast_to(pred[:, None], pred_ref.shape[1:]).astype(
        jnp.int32)
    picked_ref[0] = jnp.broadcast_to(glp[:, None], picked_ref.shape[1:])

    cell_scr[:] = cell_new
    sym_scr[:] = pred[:, None].astype(jnp.int32)


def las_greedy_flash(
    params: Dict,  # LAS decoder param tree (las_decoder_init layout)
    cfg: ModelConfig,
    wk: jnp.ndarray,  # [B, Tk, Hd] precomputed bilinear key projections
    att_values: jnp.ndarray,  # [B, Tk, 2Ha]
    lens_k: jnp.ndarray,  # [B] valid key positions (Tk when unmasked)
    sym0: jnp.ndarray,  # [B] first input symbol (BOS)
    n_steps: int,
    ref_tokens: jnp.ndarray = None,  # [B, n_steps] tokens to pick logps at
    weight_dtype=None,  # bf16 on real TPUs; None keeps param dtype
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the fused free-running decode. Returns
    (embs [B, n_steps, Hs], preds [B, n_steps], picked [B, n_steps])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Tk, Hd = wk.shape
    Ha2 = att_values.shape[-1]
    E = cfg.enc_embedding_size
    n = cfg.num_unilstm_dec
    V = params["embedder"].shape[0]
    f32 = jnp.float32
    interpret = jax.default_backend() == "cpu"
    wdt = weight_dtype
    if wdt is None:
        wdt = jnp.float32 if interpret else jnp.bfloat16

    cast = lambda a: a.astype(wdt)
    p0 = params["dec_l0"]
    lstm_args = [
        cast(p0["w_ih"][:E]),
        cast(jnp.concatenate([p0["w_ih"][E:], p0["w_hh"]], axis=0)),
        (p0["b_ih"] + p0["b_hh"]).astype(f32)[None, :],
    ]
    for i in range(1, n):
        p = params[f"dec_l{i}"]
        lstm_args += [
            cast(jnp.concatenate([p["w_ih"], p["w_hh"]], axis=0)),
            (p["b_ih"] + p["b_hh"]).astype(f32)[None, :],
        ]
    if ref_tokens is None:
        ref_tokens = jnp.zeros((B, n_steps), jnp.int32)
    # refs enter as [n_steps, B, 128] lane-broadcast blocks (full-tile IO)
    refs = jnp.broadcast_to(
        ref_tokens.astype(jnp.int32).T[:, :, None], (n_steps, B, 128))

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    stepb = lambda w, dt: (pl.BlockSpec((1, B, w), lambda t: (t, 0, 0),
                                        memory_space=pltpu.VMEM),
                           jax.ShapeDtypeStruct((n_steps, B, w), dt))
    embs_spec, embs_shape = stepb(Hd, att_values.dtype)
    pred_spec, pred_shape = stepb(128, jnp.int32)
    picked_spec, picked_shape = stepb(128, f32)
    refs_spec = pl.BlockSpec((1, B, 128), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM)

    embs, preds, picked = pl.pallas_call(
        functools.partial(_kernel, n_layers=n, E=E, Ha2=Ha2),
        grid=(n_steps,),
        in_specs=[vmem(), vmem(), refs_spec] + [vmem()] * (7 + 2 * n),
        out_specs=(embs_spec, pred_spec, picked_spec),
        out_shape=(embs_shape, pred_shape, picked_shape),
        scratch_shapes=(
            [pltpu.VMEM((B, Hd), f32)] * (2 * n)
            + [pltpu.VMEM((B, Hd), f32),
               pltpu.VMEM((B, 1), jnp.int32)]
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(
        lens_k.astype(jnp.int32)[:, None],
        sym0.astype(jnp.int32)[:, None],
        refs,
        cast(wk), cast(att_values),
        cast(params["embedder"]),
        cast(params["acous_ffn"]["w"]),
        cast(params["acous_out"]["w"]),
        params["acous_out"]["b"].astype(f32)[None, :],
        *lstm_args,
    )
    return (jnp.swapaxes(embs, 0, 1), jnp.swapaxes(preds[:, :, 0], 0, 1),
            jnp.swapaxes(picked[:, :, 0], 0, 1))
