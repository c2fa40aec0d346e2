"""Fused Pallas kernels: teacher-forced LAS decoder scan, forward + backward.

The teacher-forced attention-decoder scan is the train step's largest
single component after the pyramid (SURVEY §3.1 HOTTEST; ~7.7 ms fwd+bwd
at flagship shapes under XLA): L-1 serial steps of 3 LSTM cells, bilinear
attention and the dynamic-embedding FFN, each step ~15 launch-bound
fusions forward and the same again in XLA's scan-transposed backward.

Design (mirrors ops/lstm_pallas_bwd.py, extended with attention + FFN):

- `_fwd_kernel` runs the whole scan in one pallas_call (grid = L-1 steps):
  weights, bilinear key projections `wk` and attention values VMEM-resident,
  h/c/cell carries in scratch. It SAVES per-step residuals (gate
  activations, pre-step carries, layer inputs, attention probs, masked
  context, query) so the backward never recomputes the recurrence.
- `_bwd_kernel` runs the reverse-time pass in one pallas_call with the
  dh/dc/dcell carries resident. It emits per-step gradient STREAMS
  (dpre per LSTM layer, d_scores, total dcell) instead of accumulating
  weight gradients in VMEM: every weight gradient then finishes OUTSIDE
  as one large MXU matmul over the saved streams
  (dW = inputs^T @ dpre etc.), which is both faster and VMEM-cheaper.
- `las_tf_scan` wraps the pair in jax.custom_vjp. Inputs are the hoisted
  per-step quantities las_decoder_forward already computes (layer-0
  embedding-side pre-activations, inverted-dropout masks), so cotangents
  flow back into the embedder/embedding-dropout through XLA autodiff.

Semantics pinned against the XLA scan path (same masks, same math):
ref: models/Dec.py:344-434 per-step structure — input [emb ; cell_value],
residual on middle LSTM layers only, bilinear scores with -1e12 mask fill,
dynamic embedding = FFN([dropout(ctx) ; dec_out]) with no bias.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

MASK_FILL = -1e12
VMEM_LIMIT = 100 * 1024 * 1024


def _interpret():
    return jax.default_backend() == "cpu"


def las_tf_flash_supported(cfg) -> bool:
    return (cfg.acous_att_mode == "bilinear"
            and cfg.dim_model % 128 == 0
            and (2 * cfg.acous_hidden_size) % 128 == 0)


def _gates_fwd(pre, c, H):
    from stjep_tpu.ops.lstm import lstm_gates

    return lstm_gates(pre, c, H, with_gates=True)


def _mdot(a, w):
    return jnp.dot(a.astype(w.dtype), w, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(lens_ref, pre0_ref, m0_ref, m1_ref, m2_ref, mctx_ref,
                wk_ref, val_ref,
                w0_ref, w1_ref, b1_ref, w2_ref, b2_ref, wffn_ref,
                cell_ref, g0_ref, g1_ref, g2_ref,
                hp0_ref, hp1_ref, hp2_ref, cp0_ref, cp1_ref, cp2_ref,
                in1_ref, in2_ref, q_ref, attn_ref, ctxm_ref,
                h0, c0, h1, c1, h2, c2, cell,
                *, use_masks: bool):
    from jax.experimental import pallas as pl

    t = pl.program_id(0)
    f32 = jnp.float32
    B, Hd = h0.shape
    Ha2 = val_ref.shape[-1]
    Tk = wk_ref.shape[1]

    @pl.when(t == 0)
    def _init():
        for r in (h0, c0, h1, c1, h2, c2, cell):
            r[:] = jnp.zeros_like(r)

    # residual streams may be stored bf16 (see _run_fwd): halves the HBM
    # save/replay traffic; carries stay f32 in scratch
    rdt = g0_ref.dtype

    # ---- layer 0: input = [emb (hoisted into pre0) ; cell_value]
    # recurrent inputs are lane-concatenated so each layer is ONE chained
    # MXU dot ([x ; h] @ [Wi ; Wh]) instead of two — halves the serial
    # matmul chain per step
    hp0_ref[0] = h0[:].astype(rdt)
    cp0_ref[0] = c0[:].astype(rdt)
    pre = pre0_ref[0] + _mdot(
        jnp.concatenate([cell[:], h0[:]], axis=-1), w0_ref[:])
    h_new, c_new, gsave = _gates_fwd(pre, c0[:], Hd)
    g0_ref[0] = gsave.astype(rdt)
    h0[:] = h_new
    c0[:] = c_new
    x1 = h_new * m0_ref[0] if use_masks else h_new
    in1_ref[0] = x1.astype(rdt)

    # ---- layer 1 (residual)
    hp1_ref[0] = h1[:].astype(rdt)
    cp1_ref[0] = c1[:].astype(rdt)
    pre = _mdot(jnp.concatenate([x1, h1[:]], axis=-1), w1_ref[:]) + b1_ref[:]
    h_new, c_new, gsave = _gates_fwd(pre, c1[:], Hd)
    g1_ref[0] = gsave.astype(rdt)
    h1[:] = h_new
    c1[:] = c_new
    y1 = h_new + x1
    x2 = y1 * m1_ref[0] if use_masks else y1
    in2_ref[0] = x2.astype(rdt)

    # ---- layer 2 (no residual; output is the query)
    hp2_ref[0] = h2[:].astype(rdt)
    cp2_ref[0] = c2[:].astype(rdt)
    pre = _mdot(jnp.concatenate([x2, h2[:]], axis=-1), w2_ref[:]) + b2_ref[:]
    h_new, c_new, gsave = _gates_fwd(pre, c2[:], Hd)
    g2_ref[0] = gsave.astype(rdt)
    h2[:] = h_new
    c2[:] = c_new
    q = h_new * m2_ref[0] if use_masks else h_new
    q_ref[0] = q.astype(rdt)

    # ---- bilinear attention (-1e12 fill, f32 softmax)
    scores = jnp.sum(q[:, None, :] * wk_ref[:].astype(f32), axis=-1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (B, Tk), 1)
    scores = jnp.where(iota_k >= lens_ref[:], MASK_FILL, scores)
    mx = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - mx)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    attn_ref[0] = attn.astype(rdt)
    ctx = jnp.sum(attn[:, :, None] * val_ref[:].astype(f32), axis=1)
    ctx_m = ctx * mctx_ref[0] if use_masks else ctx
    ctxm_ref[0] = ctx_m.astype(rdt)

    # ---- FFN -> dynamic embedding (no bias; one [ctx ; q] dot)
    cell_new = _mdot(jnp.concatenate([ctx_m, q], axis=-1), wffn_ref[:])
    cell_ref[0] = cell_new
    cell[:] = cell_new


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(lens_ref, gcell_ref, m0_ref, m1_ref, m2_ref, mctx_ref,
                wk_ref, val_ref,
                w0t_ref, w1t_ref, w2t_ref, wffnt_ref,
                g0_ref, g1_ref, g2_ref,
                cp0_ref, cp1_ref, cp2_ref, attn_ref,
                dpre0_ref, dpre1_ref, dpre2_ref, dsc_ref, dcell_ref,
                dh0, dc0, dh1, dc1, dh2, dc2, dcell,
                *, use_masks: bool):
    """Reverse-time pass; grid step t processes decode step (L-1)-1-t.

    Transposed weights (w^T) are passed resident so the in-kernel chain
    matmuls are plain [B, 4H] x [4H, H] dots."""
    from jax.experimental import pallas as pl

    t = pl.program_id(0)
    f32 = jnp.float32
    B, Hd = dh0.shape
    Tk = wk_ref.shape[1]

    @pl.when(t == 0)
    def _init():
        for r in (dh0, dc0, dh1, dc1, dh2, dc2, dcell):
            r[:] = jnp.zeros_like(r)

    def lstm_bwd(go, g_ref, cp_ref, dh, dc):
        """One LSTM cell backward. go = dL/dh_t (external); dh/dc carries
        hold the recurrent parts. Returns dpre [B, 4Hd]; updates dh?no —
        caller updates carries from dpre @ w^T."""
        gates = g_ref[0].astype(f32)
        i = gates[:, 0 * Hd:1 * Hd]
        f = gates[:, 1 * Hd:2 * Hd]
        g = gates[:, 2 * Hd:3 * Hd]
        o = gates[:, 3 * Hd:4 * Hd]
        c_prev = cp_ref[0].astype(f32)
        c_t = f * c_prev + i * g
        tanh_c = jnp.tanh(c_t)
        dh_t = go + dh[:]
        do = dh_t * tanh_c
        dc_t = dc[:] + dh_t * o * (1.0 - tanh_c * tanh_c)
        di = dc_t * g
        df = dc_t * c_prev
        dg = dc_t * i
        dpre = jnp.concatenate([
            di * i * (1.0 - i),
            df * f * (1.0 - f),
            dg * (1.0 - g * g),
            do * o * (1.0 - o),
        ], axis=-1)
        dc[:] = dc_t * f
        return dpre

    # ---- head/loss + next-step-input gradient into cell_value
    dcell_t = gcell_ref[0] + dcell[:]
    dcell_ref[0] = dcell_t

    # ---- FFN bwd: one dot through wffn^T [Hs, Ha2+Hd], lane-sliced
    Ha2 = val_ref.shape[-1]
    dff = _mdot(dcell_t, wffnt_ref[:])
    dctx_m = dff[:, :Ha2]
    dq = dff[:, Ha2:]

    # ---- attention bwd
    dctx = dctx_m * mctx_ref[0] if use_masks else dctx_m
    attn = attn_ref[0].astype(f32)
    datt = jnp.sum(dctx[:, None, :] * val_ref[:].astype(f32), axis=-1)
    dsc = attn * (datt - jnp.sum(attn * datt, axis=-1, keepdims=True))
    dsc_ref[0] = dsc
    dq = dq + jnp.sum(dsc[:, :, None] * wk_ref[:].astype(f32), axis=1)

    # ---- layer 2 bwd (merged dx/dh dot through [Wi ; Wh]^T)
    go2 = dq * m2_ref[0] if use_masks else dq
    dpre2 = lstm_bwd(go2, g2_ref, cp2_ref, dh2, dc2)
    dpre2_ref[0] = dpre2
    dxh2 = _mdot(dpre2, w2t_ref[:])  # [B, 2Hd]
    dh2[:] = dxh2[:, Hd:]
    dx2 = dxh2[:, :Hd]

    # ---- layer 1 bwd (residual: y1 = h1 + x1)
    dy1 = dx2 * m1_ref[0] if use_masks else dx2
    dpre1 = lstm_bwd(dy1, g1_ref, cp1_ref, dh1, dc1)
    dpre1_ref[0] = dpre1
    dxh1 = _mdot(dpre1, w1t_ref[:])
    dh1[:] = dxh1[:, Hd:]
    dx1 = dy1 + dxh1[:, :Hd]  # residual + through-cell paths

    # ---- layer 0 bwd
    go0 = dx1 * m0_ref[0] if use_masks else dx1
    dpre0 = lstm_bwd(go0, g0_ref, cp0_ref, dh0, dc0)
    dpre0_ref[0] = dpre0
    dxh0 = _mdot(dpre0, w0t_ref[:])  # [B, 2Hd]: [cell ; h0] cotangents
    dcell[:] = dxh0[:, :Hd]
    dh0[:] = dxh0[:, Hd:]


# ---------------------------------------------------------------------------
# host-side wrapper with custom VJP
# ---------------------------------------------------------------------------


def _step_spec(pl, pltpu, B, w, n_steps, reverse=False):
    if reverse:
        return pl.BlockSpec((1, B, w), lambda t: (n_steps - 1 - t, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, B, w), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)


def _run_fwd(stack, att_w, ffn_w, pre0_steps, wk, values, lens_k, masks):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, B, _ = pre0_steps.shape  # n_steps
    Hd = stack["dec_l0"]["w_hh"].shape[0]
    Ha2 = values.shape[-1]
    Tk = values.shape[1]
    E = stack["dec_l0"]["w_ih"].shape[0] - Hd  # input = E + Hs(=Hd)
    f32 = jnp.float32
    use_masks = masks is not None
    interpret = _interpret()
    wdt = f32 if interpret else jnp.bfloat16
    cast = lambda a: a.astype(wdt)

    if use_masks:
        lstm_m, ctx_m = masks  # [S, n, B, Hd], [S, B, 1, Ha2]
        m0 = lstm_m[:, 0]
        m1 = lstm_m[:, 1]
        m2 = lstm_m[:, 2]
        mctx = ctx_m[:, :, 0, :]
    else:
        z = jnp.zeros((S, B, 1), f32)  # placeholders (never read)
        m0 = m1 = m2 = z
        mctx = z

    sp = functools.partial(_step_spec, pl, pltpu, B)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    mw = 1 if not use_masks else Hd
    mcw = 1 if not use_masks else Ha2
    in_specs = [vmem(), sp(4 * Hd, S), sp(mw, S), sp(mw, S), sp(mw, S),
                sp(mcw, S)] + [vmem()] * 8
    rdt = f32 if interpret else jnp.bfloat16  # residual-stream dtype
    outs = [
        (sp(Hd, S), jax.ShapeDtypeStruct((S, B, Hd), f32)),     # cell
        (sp(4 * Hd, S), jax.ShapeDtypeStruct((S, B, 4 * Hd), rdt)),  # g0
        (sp(4 * Hd, S), jax.ShapeDtypeStruct((S, B, 4 * Hd), rdt)),  # g1
        (sp(4 * Hd, S), jax.ShapeDtypeStruct((S, B, 4 * Hd), rdt)),  # g2
    ] + [(sp(Hd, S), jax.ShapeDtypeStruct((S, B, Hd), rdt))] * 6  # hp/cp
    outs += [(sp(Hd, S), jax.ShapeDtypeStruct((S, B, Hd), rdt))] * 3  # in1/in2/q
    outs += [(sp(Tk, S), jax.ShapeDtypeStruct((S, B, Tk), rdt))]  # attn
    outs += [(sp(Ha2, S), jax.ShapeDtypeStruct((S, B, Ha2), rdt))]  # ctxm

    p0 = stack["dec_l0"]
    p1 = stack["dec_l1"]
    p2 = stack["dec_l2"]
    res = pl.pallas_call(
        functools.partial(_fwd_kernel, use_masks=use_masks),
        grid=(S,),
        in_specs=in_specs,
        out_specs=tuple(o[0] for o in outs),
        out_shape=tuple(o[1] for o in outs),
        scratch_shapes=[pltpu.VMEM((B, Hd), f32)] * 7,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(
        lens_k.astype(jnp.int32)[:, None],
        pre0_steps, m0, m1, m2, mctx,
        cast(wk), cast(values),
        cast(jnp.concatenate([p0["w_ih"][E:], p0["w_hh"]], axis=0)),
        cast(jnp.concatenate([p1["w_ih"], p1["w_hh"]], axis=0)),
        (p1["b_ih"] + p1["b_hh"]).astype(f32)[None, :],
        cast(jnp.concatenate([p2["w_ih"], p2["w_hh"]], axis=0)),
        (p2["b_ih"] + p2["b_hh"]).astype(f32)[None, :],
        cast(ffn_w),
    )
    return res


def las_tf_scan(stack: Dict, att_w: jnp.ndarray, ffn_w: jnp.ndarray,
                pre0_steps: jnp.ndarray, acous_outputs: jnp.ndarray,
                lens_k: jnp.ndarray, masks) -> jnp.ndarray:
    """Teacher-forced decoder scan over the fused kernels.

    stack: {dec_l0, dec_l1, dec_l2} LSTM params; att_w: bilinear weight
    [2Ha, Hd] (pre_keys = acous @ att_w); ffn_w: [Ha2+Hd, Hs];
    pre0_steps: [S, B, 4Hd] hoisted emb-side layer-0 pre-activation
    (incl. biases); masks: hoisted dropout masks or None.
    Returns cell_values [S, B, Hs] (time-major, like the XLA scan's ys)."""
    return _las_tf_scan(stack, att_w, ffn_w, pre0_steps, acous_outputs,
                        lens_k, masks)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _las_tf_scan(stack, att_w, ffn_w, pre0_steps, acous_outputs, lens_k,
                 masks):
    wk = acous_outputs @ att_w
    res = _run_fwd(stack, att_w, ffn_w, pre0_steps, wk, acous_outputs,
                   lens_k, masks)
    return res[0]


def _vjp_fwd(stack, att_w, ffn_w, pre0_steps, acous_outputs, lens_k, masks):
    wk = acous_outputs @ att_w
    res = _run_fwd(stack, att_w, ffn_w, pre0_steps, wk, acous_outputs,
                   lens_k, masks)
    saved = (stack, att_w, ffn_w, pre0_steps, acous_outputs, lens_k, masks,
             wk, res)
    return res[0], saved


def _vjp_bwd(saved, g_cell):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (stack, att_w, ffn_w, pre0_steps, acous_outputs, lens_k, masks,
     wk, res) = saved
    (cell_vals, g0, g1, g2, hp0, hp1, hp2, cp0, cp1, cp2,
     in1, in2, q, attn, ctxm) = res
    S, B, Hd = cell_vals.shape
    Ha2 = acous_outputs.shape[-1]
    Tk = acous_outputs.shape[1]
    E = stack["dec_l0"]["w_ih"].shape[0] - Hd
    f32 = jnp.float32
    use_masks = masks is not None
    interpret = _interpret()
    wdt = f32 if interpret else jnp.bfloat16
    cast = lambda a: a.astype(wdt)

    if use_masks:
        lstm_m, ctx_mm = masks
        m0 = lstm_m[:, 0]
        m1 = lstm_m[:, 1]
        m2 = lstm_m[:, 2]
        mctx = ctx_mm[:, :, 0, :]
    else:
        z = jnp.zeros((S, B, 1), f32)
        m0 = m1 = m2 = z
        mctx = z

    rsp = functools.partial(_step_spec, pl, pltpu, B, n_steps=S, reverse=True)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    mw = 1 if not use_masks else Hd
    mcw = 1 if not use_masks else Ha2
    p0 = stack["dec_l0"]
    p1 = stack["dec_l1"]
    p2 = stack["dec_l2"]

    in_specs = ([vmem(), rsp(Hd), rsp(mw), rsp(mw), rsp(mw), rsp(mcw)]
                + [vmem()] * 6
                + [rsp(4 * Hd)] * 3 + [rsp(Hd)] * 3 + [rsp(Tk)])
    out_specs = (rsp(4 * Hd), rsp(4 * Hd), rsp(4 * Hd), rsp(Tk), rsp(Hd))
    out_shape = (
        jax.ShapeDtypeStruct((S, B, 4 * Hd), f32),
        jax.ShapeDtypeStruct((S, B, 4 * Hd), f32),
        jax.ShapeDtypeStruct((S, B, 4 * Hd), f32),
        jax.ShapeDtypeStruct((S, B, Tk), f32),
        jax.ShapeDtypeStruct((S, B, Hd), f32),
    )
    dpre0, dpre1, dpre2, dsc, dcell = pl.pallas_call(
        functools.partial(_bwd_kernel, use_masks=use_masks),
        grid=(S,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((B, Hd), f32)] * 7,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(
        lens_k.astype(jnp.int32)[:, None],
        g_cell, m0, m1, m2, mctx,
        cast(wk), cast(acous_outputs),
        cast(jnp.concatenate([p0["w_ih"][E:], p0["w_hh"]], axis=0).T),
        cast(jnp.concatenate([p1["w_ih"], p1["w_hh"]], axis=0).T),
        cast(jnp.concatenate([p2["w_ih"], p2["w_hh"]], axis=0).T),
        cast(ffn_w.T),
        g0, g1, g2, cp0, cp1, cp2, attn,
    )

    # ---- finish every weight/input gradient as big MXU matmuls ----------
    flat = lambda a: a.reshape(S * B, a.shape[-1])
    # cell_value input at step t is cell_vals[t-1] (zeros at t=0)
    cell_prev = jnp.concatenate(
        [jnp.zeros((1, B, Hd), f32), cell_vals[:-1]], axis=0)

    d_l0 = {
        "w_ih": jnp.concatenate([
            jnp.zeros((E, 4 * Hd), f32),  # emb-side rows flow via pre0 grads
            flat(cell_prev).T @ flat(dpre0),
        ], axis=0),
        "w_hh": flat(hp0).T @ flat(dpre0),
        # biases + emb-side rows flow through the pre0_steps cotangent
        "b_ih": jnp.zeros((4 * Hd,), f32),
        "b_hh": jnp.zeros((4 * Hd,), f32),
    }
    d_l1 = {
        "w_ih": flat(in1).T @ flat(dpre1),
        "w_hh": flat(hp1).T @ flat(dpre1),
        "b_ih": jnp.sum(flat(dpre1), axis=0),
        "b_hh": jnp.sum(flat(dpre1), axis=0),
    }
    d_l2 = {
        "w_ih": flat(in2).T @ flat(dpre2),
        "w_hh": flat(hp2).T @ flat(dpre2),
        "b_ih": jnp.sum(flat(dpre2), axis=0),
        "b_hh": jnp.sum(flat(dpre2), axis=0),
    }
    d_stack = {"dec_l0": d_l0, "dec_l1": d_l1, "dec_l2": d_l2}

    # FFN: ff_in = [ctx_m ; q]
    d_ffn = jnp.concatenate([
        flat(ctxm).T @ flat(dcell),
        flat(q).T @ flat(dcell),
    ], axis=0)

    # attention: wk = acous @ att_w; scores = q . wk; ctx = attn . values
    # d_wk[b,t,:] = sum_s dsc[s,b,t] q[s,b,:]
    d_wk = jnp.einsum("sbt,sbh->bth", dsc, q)
    d_att_w = acous_outputs.reshape(-1, Ha2).T @ d_wk.reshape(-1, Hd)
    dctx = dcell @ ffn_w[:Ha2].T  # [S, B, Ha2]
    if use_masks:
        dctx = dctx * mctx
    d_values = jnp.einsum("sbt,sbd->btd", attn, dctx)
    d_acous = d_values + d_wk @ att_w.T

    # layer-0 emb-side pre-activation stream (cotangent for pre0_steps)
    d_pre0_steps = dpre0

    # cotangent dtypes must match the primals (bf16 training passes bf16
    # params/activations)
    d_stack = jax.tree_util.tree_map(
        lambda g, p: g.astype(p.dtype), d_stack, stack)
    return (d_stack, d_att_w.astype(att_w.dtype), d_ffn.astype(ffn_w.dtype),
            d_pre0_steps.astype(pre0_steps.dtype),
            d_acous.astype(acous_outputs.dtype), None, None)


_las_tf_scan.defvjp(_vjp_fwd, _vjp_bwd)
