"""Fused Pallas backward for the bidirectional LSTM scan.

Completes the kernel pair: lstm_pallas.py's forward now saves the per-step
carries (h, c) and gate activations; this module's kernel runs the reverse
time scan for BOTH directions in one grid pass with dh/dc and the dW_hh
accumulators resident in VMEM. The heavy input-side gradients stay outside
as single MXU matmuls:

    dX     = dPre @ W_ih^T         dW_ih = X^T dPre        db = sum_t dPre

Packed-sequence masking mirrors the forward: at invalid steps the carries
pass through untouched and no dPre/dW_hh contribution is made.

Backward recurrences (per direction, processing t = T-1 .. 0):
    dh_t   = g_out_t + dPre_{t+1} W_hh^T          (carry)
    do     = dh_t * tanh(c_t)
    dc_t  += dh_t * o * (1 - tanh(c_t)^2)         (carry)
    di, df, dg = dc*g, dc*c_{t-1}, dc*i
    dPre_t = [di i(1-i), df f(1-f), dg (1-g^2), do o(1-o)]
    dc_{t-1} = dc_t * f
    dW_hh += h_{t-1}^T dPre_t                     (VMEM accumulator)
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from stjep_tpu.ops.lstm import lstm_gates


def _fwd_save_kernel(len_ref, xf_ref, xb_ref, wif_ref, wib_ref, bf_ref,
                     bb_ref, whf_ref, whb_ref,
                     outf_ref, outb_ref, hsf_ref, csf_ref, gf_ref,
                     hsb_ref, csb_ref, gb_ref, hf, cf, hb, cb,
                     *, unroll, fast):
    """Forward pass that additionally saves carries and gate activations.

    hs*_ref[t] = h carry BEFORE step t (i.e. h_{t-1}); cs*_ref[t] = c_{t-1};
    g*_ref[t] = (i,f,g,o) gate values at step t (zero at invalid steps).
    Each grid iteration runs `unroll` consecutive time-steps (serial
    recurrence; the unroll amortises per-grid-step fixed costs). Grid is
    (batch blocks, time blocks) with time innermost: the h/c scratch spans
    one batch block's full time sweep, re-initialised at t == 0."""
    from jax.experimental import pallas as pl

    t = pl.program_id(1)
    Tb = pl.num_programs(1)
    H = hf.shape[-1]

    @pl.when(t == 0)
    def _init():
        hf[:] = jnp.zeros_like(hf)
        cf[:] = jnp.zeros_like(cf)
        hb[:] = jnp.zeros_like(hb)
        cb[:] = jnp.zeros_like(cb)

    lens = len_ref[:]
    from stjep_tpu.ops.lstm_pallas import bf16_dot, f32_dot

    mm = bf16_dot if fast else f32_dot

    # input projections computed on-chip for the whole block (see
    # lstm_pallas._bilstm_kernel): raw [U, B, Din] inputs stream instead of
    # [U, B, 4H] precomputed projections
    U_, B_, Din = xf_ref.shape
    H_ = hf.shape[-1]
    xp_f = (mm(xf_ref[:].reshape(U_ * B_, Din), wif_ref[:])
            + bf_ref[:]).reshape(U_, B_, 4 * H_)
    xp_b = (mm(xb_ref[:].reshape(U_ * B_, Din), wib_ref[:])
            + bb_ref[:]).reshape(U_, B_, 4 * H_)

    def one(xp, wh_ref, out_ref, hs_ref, cs_ref, g_ref, h, c, row, pos):
        # residual streams may be stored bf16 (see _run_fwd_save): halves
        # the dominant HBM save/replay traffic; carries stay f32 in scratch
        rdt = hs_ref.dtype
        hs_ref[row] = h[:].astype(rdt)
        cs_ref[row] = c[:].astype(rdt)
        pre = xp[row] + mm(h[:], wh_ref[:])
        h_new, c_new, gcat = lstm_gates(pre, c[:], H, with_gates=True)
        valid = lens > pos
        g_ref[row] = jnp.where(
            valid, gcat, jnp.zeros_like(pre)).astype(rdt)
        h[:] = jnp.where(valid, h_new, h[:])
        c[:] = jnp.where(valid, c_new, c[:])
        out_ref[row] = jnp.where(
            valid, h_new, jnp.zeros_like(h_new)).astype(out_ref.dtype)

    for u in range(unroll):
        one(xp_f, whf_ref, outf_ref, hsf_ref, csf_ref, gf_ref, hf, cf,
            u, t * unroll + u)
        ub = unroll - 1 - u
        one(xp_b, whb_ref, outb_ref, hsb_ref, csb_ref, gb_ref, hb, cb,
            ub, (Tb - 1 - t) * unroll + ub)


def _bwd_kernel(len_ref, gof_ref, gob_ref, hsf_ref, csf_ref, gf_ref,
                hsb_ref, csb_ref, gb_ref, whf_ref, whb_ref,
                dxpf_ref, dxpb_ref,
                dhf, dcf, dhb, dcb, *, unroll, fast):
    """Reverse-time pass; grid step t processes position block Tb-1-t
    (descending within the block) for the forward direction and block t
    (ascending) for the backward direction. Batch blocks iterate on the
    outer grid dimension (see _fwd_save_kernel)."""
    from jax.experimental import pallas as pl

    t = pl.program_id(1)
    Tb = pl.num_programs(1)
    H = dhf.shape[-1]

    @pl.when(t == 0)
    def _init():
        dhf[:] = jnp.zeros_like(dhf)
        dcf[:] = jnp.zeros_like(dcf)
        dhb[:] = jnp.zeros_like(dhb)
        dcb[:] = jnp.zeros_like(dcb)

    lens = len_ref[:]

    def one(go_ref, hs_ref, cs_ref, g_ref, wh_ref, dxp_ref, dh, dc,
            row, pos):
        gates = g_ref[row].astype(jnp.float32)
        i = gates[:, 0 * H:1 * H]
        f = gates[:, 1 * H:2 * H]
        g = gates[:, 2 * H:3 * H]
        o = gates[:, 3 * H:4 * H]
        c_prev = cs_ref[row].astype(jnp.float32)
        c_t = f * c_prev + i * g
        tanh_c = jnp.tanh(c_t)
        valid = lens > pos

        dh_t = go_ref[row] + dh[:]
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
        dpre = jnp.where(valid, dpre, jnp.zeros_like(dpre))
        dxp_ref[row] = dpre.astype(dxp_ref.dtype)
        # dW_hh accumulation moved OUT of the kernel (one big MXU matmul
        # over the dxp stream and the saved h carries) — it was a second
        # chained matmul on every step of the serial critical path
        if fast:  # bf16 operands, f32 accumulation (see lstm_pallas.bf16_dot)
            dpre_mm = dpre.astype(jnp.bfloat16)
            wh = wh_ref[:].astype(jnp.bfloat16)
        else:
            dpre_mm, wh = dpre, wh_ref[:]
        dh_back = jax.lax.dot_general(
            dpre_mm, wh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh[:] = jnp.where(valid, dh_back, dh[:])
        dc[:] = jnp.where(valid, dc_t * f, dc[:])

    for u in range(unroll):
        ub = unroll - 1 - u
        one(gof_ref, hsf_ref, csf_ref, gf_ref, whf_ref, dxpf_ref,
            dhf, dcf, ub, (Tb - 1 - t) * unroll + ub)
        one(gob_ref, hsb_ref, csb_ref, gb_ref, whb_ref, dxpb_ref,
            dhb, dcb, u, t * unroll + u)


def _interpret():
    return jax.default_backend() == "cpu"


def _run_fwd_save(params_fwd, params_bwd, x, lengths):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, Din = x.shape
    H = params_fwd["w_hh"].shape[0]
    xT = jnp.swapaxes(x, 0, 1)  # [T, B, Din]; projections computed in-kernel
    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    len2d = lengths.astype(jnp.int32).reshape(B, 1)

    f32 = jnp.float32
    from stjep_tpu.ops.lstm_pallas import _batch_block, _unroll_of

    U = _unroll_of(T)
    Tb = T // U
    # the training pair streams residuals on top of the inputs, so its
    # VMEM working set per batch row is larger than the inference forward's
    # — 32-row blocks leave headroom at the pyramid's Din=1024 layers
    # (B=64 single-block overflowed the 16 MB scoped limit by 256 KB)
    Bb = _batch_block(B, limit=32)
    step_spec = lambda w: pl.BlockSpec((U, Bb, w), lambda b, t: (t, b, 0),
                                       memory_space=pltpu.VMEM)
    rstep_spec = lambda w: pl.BlockSpec(
        (U, Bb, w), lambda b, t: (Tb - 1 - t, b, 0), memory_space=pltpu.VMEM)
    rdt = jnp.float32 if _interpret() else jnp.bfloat16
    outs = pl.pallas_call(
        functools.partial(_fwd_save_kernel, unroll=U,
                          fast=not _interpret()),
        grid=(B // Bb, Tb),
        in_specs=[
            pl.BlockSpec((Bb, 1), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            step_spec(Din), rstep_spec(Din),
            pl.BlockSpec((Din, 4 * H), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Din, 4 * H), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            step_spec(H), rstep_spec(H),          # out_f, out_b
            step_spec(H), step_spec(H), step_spec(4 * H),    # hs/cs/gates fwd
            rstep_spec(H), rstep_spec(H), rstep_spec(4 * H),  # hs/cs/gates bwd
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), x.dtype),
            jax.ShapeDtypeStruct((T, B, H), x.dtype),
            jax.ShapeDtypeStruct((T, B, H), rdt),
            jax.ShapeDtypeStruct((T, B, H), rdt),
            jax.ShapeDtypeStruct((T, B, 4 * H), rdt),
            jax.ShapeDtypeStruct((T, B, H), rdt),
            jax.ShapeDtypeStruct((T, B, H), rdt),
            jax.ShapeDtypeStruct((T, B, 4 * H), rdt),
        ),
        scratch_shapes=[pltpu.VMEM((Bb, H), f32)] * 4,
        interpret=_interpret(),
    )(len2d, xT, xT,
      params_fwd["w_ih"], params_bwd["w_ih"],
      (params_fwd["b_ih"] + params_fwd["b_hh"])[None, :],
      (params_bwd["b_ih"] + params_bwd["b_hh"])[None, :],
      params_fwd["w_hh"], params_bwd["w_hh"])
    (out_f, out_b, hs_f, cs_f, g_f, hs_b, cs_b, g_b) = outs
    out = jnp.concatenate(
        [jnp.swapaxes(out_f, 0, 1), jnp.swapaxes(out_b, 0, 1)], axis=-1)
    residuals = (hs_f, cs_f, g_f, hs_b, cs_b, g_b, len2d)
    return out, residuals


@functools.partial(jax.custom_vjp)
def bilstm_pallas_trainable(params_fwd, params_bwd, x, lengths):
    """Fused BiLSTM with a fused Pallas backward — safe for training."""
    out, _ = _run_fwd_save(params_fwd, params_bwd, x, lengths)
    return out


def _tr_fwd(params_fwd, params_bwd, x, lengths):
    out, residuals = _run_fwd_save(params_fwd, params_bwd, x, lengths)
    return out, (params_fwd, params_bwd, x, lengths, residuals)


def _tr_bwd(res, g_out):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    params_fwd, params_bwd, x, lengths, residuals = res
    hs_f, cs_f, g_f, hs_b, cs_b, g_b, len2d = residuals
    B, T, _ = x.shape
    H = params_fwd["w_hh"].shape[0]
    f32 = jnp.float32

    go_f = jnp.swapaxes(g_out[..., :H], 0, 1)   # [T, B, H]
    go_b = jnp.swapaxes(g_out[..., H:], 0, 1)

    # the bwd grid step t handles fwd position block Tb-1-t and bwd block t
    from stjep_tpu.ops.lstm_pallas import _batch_block, _unroll_of

    U = _unroll_of(T)
    Tb = T // U
    Bb = _batch_block(B, limit=32)  # match _run_fwd_save's block size
    fpos = lambda w: pl.BlockSpec(
        (U, Bb, w), lambda b, t: (Tb - 1 - t, b, 0), memory_space=pltpu.VMEM)
    bpos = lambda w: pl.BlockSpec((U, Bb, w), lambda b, t: (t, b, 0),
                                  memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((H, 4 * H), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM)
    rdt = f32 if _interpret() else jnp.bfloat16
    (dxp_f, dxp_b) = pl.pallas_call(
        functools.partial(_bwd_kernel, unroll=U, fast=not _interpret()),
        grid=(B // Bb, Tb),
        in_specs=[
            pl.BlockSpec((Bb, 1), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            fpos(H), bpos(H),
            fpos(H), fpos(H), fpos(4 * H),
            bpos(H), bpos(H), bpos(4 * H),
            wspec, wspec,
        ],
        out_specs=(fpos(4 * H), bpos(4 * H)),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, 4 * H), rdt),
            jax.ShapeDtypeStruct((T, B, 4 * H), rdt),
        ),
        scratch_shapes=[pltpu.VMEM((Bb, H), f32)] * 4,
        interpret=_interpret(),
    )(len2d, go_f, go_b, hs_f, cs_f, g_f, hs_b, cs_b, g_b,
      params_fwd["w_hh"], params_bwd["w_hh"])

    # dW_hh = h_prev^T dpre, one MXU matmul over the whole stream per dir
    # (streams may be bf16; accumulate f32 explicitly)
    dwh_f = jnp.einsum("th,tf->hf", hs_f.reshape(-1, H),
                       dxp_f.reshape(-1, 4 * H),
                       preferred_element_type=f32)
    dwh_b = jnp.einsum("th,tf->hf", hs_b.reshape(-1, H),
                       dxp_b.reshape(-1, 4 * H),
                       preferred_element_type=f32)

    dxp_f = jnp.swapaxes(dxp_f, 0, 1)  # [B, T, 4H]
    dxp_b = jnp.swapaxes(dxp_b, 0, 1)

    def input_grads(p, dxp):
        flat_x = x.reshape(-1, x.shape[-1])
        flat_d = dxp.reshape(-1, 4 * H)
        db = jnp.sum(flat_d.astype(f32), axis=0)
        return {
            "w_ih": jnp.einsum("td,tf->df", flat_x, flat_d,
                               preferred_element_type=f32),
            "w_hh": None,  # filled below
            "b_ih": db,
            "b_hh": db,
        }

    d_pf = input_grads(params_fwd, dxp_f)
    d_pf["w_hh"] = dwh_f
    d_pb = input_grads(params_bwd, dxp_b)
    d_pb["w_hh"] = dwh_b
    # cotangent dtypes must match the primal params: the grad-accum scan
    # carries zeros_like(params), so f32 grads on bf16 params would change
    # the carry dtype mid-scan (las_tf_flash's bwd does the same cast)
    d_pf = jax.tree_util.tree_map(lambda g, p: g.astype(p.dtype),
                                  d_pf, params_fwd)
    d_pb = jax.tree_util.tree_map(lambda g, p: g.astype(p.dtype),
                                  d_pb, params_bwd)
    d_x = (jnp.einsum("btf,df->btd", dxp_f, params_fwd["w_ih"],
                      preferred_element_type=f32)
           + jnp.einsum("btf,df->btd", dxp_b, params_bwd["w_ih"],
                        preferred_element_type=f32)).astype(x.dtype)
    return d_pf, d_pb, d_x, None


bilstm_pallas_trainable.defvjp(_tr_fwd, _tr_bwd)
