"""Pallas TPU kernel: fused bidirectional LSTM scan with VMEM-resident state.

Why a kernel (SURVEY §7 hard part #1): the pyramid encoder's recurrence is
inherently sequential; under plain lax.scan every step round-trips h/c
through HBM and launches separate gate ops. This kernel:

- keeps h/c for BOTH directions in VMEM scratch across all T grid steps
  (TPU grid iterations run sequentially, scratch persists),
- consumes the time-major input projections (the big [B*T, D]x[D, 4H]
  matmuls stay outside, on the MXU, computed once per layer),
- fuses the per-step [B, H]x[H, 4H] recurrent matmul + all gate math +
  packed-sequence masking for forward and reverse in one pass over t
  (reverse reads/writes position T-1-t via BlockSpec index maps).

Gradients: jax.custom_vjp with a rematerialising backward that calls the
XLA lax.scan implementation's VJP — forward stays fused, training remains
exactly differentiable.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from stjep_tpu.ops import lstm as lstm_ref


def _batch_block(B: int, limit: int = 64) -> int:
    """Batch rows per grid block. The kernel streams [U, B, Din] input
    blocks whose VMEM footprint scales with B; past ~64 rows (at the
    pyramid's Din=1024 layers) the scoped-VMEM limit (18 MB) is exceeded.
    Chunking the batch over a leading grid dimension caps the working set
    at the proven 64-row tile while keeping a single pallas launch."""
    if B <= limit:
        return B
    for bb in range(limit, 0, -1):
        if B % bb == 0:
            return bb
    return B


def _unroll_of(T: int) -> int:
    """Time-steps per grid iteration. The recurrence is serial, so each
    sub-step's work is a tiny [B, H]x[H, 4H] matmul — per-grid-step fixed
    costs (DMA turnaround, pipeline flushes) dominate at one step per
    iteration. Unrolling amortises them; U must divide T (padded inputs
    keep correctness via the length masks but would cost a full-array
    copy, so pick the largest divisor instead)."""
    for u in (8, 4, 2):
        if T % u == 0:
            return u
    return 1


def f32_dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def bf16_dot(a, b):
    """One-pass MXU matmul: bf16 operands, f32 accumulation."""
    return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _bilstm_kernel(len_ref, xf_ref, xb_ref, wif_ref, wib_ref, bf_ref,
                   bb_ref, whf_ref, whb_ref,
                   outf_ref, outb_ref, hf, cf, hb, cb, *, unroll, fast):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    # grid = (batch blocks, time blocks); time iterates innermost, so the
    # h/c scratch persists across one batch block's full time sweep and is
    # re-initialised at t == 0 of the next block.
    t = pl.program_id(1)
    Tb = pl.num_programs(1)
    H = hf.shape[-1]

    @pl.when(t == 0)
    def _init():
        hf[:] = jnp.zeros_like(hf)
        cf[:] = jnp.zeros_like(cf)
        hb[:] = jnp.zeros_like(hb)
        cb[:] = jnp.zeros_like(cb)

    def step(pre, c):
        return lstm_ref.lstm_gates(pre, c, H)

    lens = len_ref[:]  # [B, 1] int32

    # recurrent matmuls run with bf16 operands + f32 accumulation on real
    # TPUs — one MXU pass instead of the multi-pass f32 emulation, and the
    # same contraction precision XLA's default gives every other matmul in
    # the model. Interpret mode (CPU tests) keeps full f32 for exact parity.
    mm = bf16_dot if fast else f32_dot
    whf = whf_ref[:].astype(jnp.bfloat16) if fast else whf_ref[:]
    whb = whb_ref[:].astype(jnp.bfloat16) if fast else whb_ref[:]

    # input projections computed ON-CHIP for the whole block (one batched
    # MXU matmul per direction, off the recurrent critical path): streaming
    # the raw [U, B, Din] inputs instead of precomputed [U, B, 4H]
    # projections cuts the kernel's HBM read traffic up to ~4x and removes
    # the projections' HBM round-trip entirely
    U_, B_, Din = xf_ref.shape
    xp_f = (mm(xf_ref[:].reshape(U_ * B_, Din), wif_ref[:])
            + bf_ref[:]).reshape(U_, B_, 4 * H)
    xp_b = (mm(xb_ref[:].reshape(U_ * B_, Din), wib_ref[:])
            + bb_ref[:]).reshape(U_, B_, 4 * H)

    for u in range(unroll):
        # forward direction: position t*U + u
        pre_f = xp_f[u] + mm(hf[:], whf)
        h_new, c_new = step(pre_f, cf[:])
        valid = lens > t * unroll + u  # [B, 1]
        hf[:] = jnp.where(valid, h_new, hf[:])
        cf[:] = jnp.where(valid, c_new, cf[:])
        outf_ref[u] = jnp.where(
            valid, h_new, jnp.zeros_like(h_new)).astype(outf_ref.dtype)

        # reverse direction: highest position of block Tb-1-t first
        ub = unroll - 1 - u
        pre_b = xp_b[ub] + mm(hb[:], whb)
        h_new, c_new = step(pre_b, cb[:])
        valid_b = lens > (Tb - 1 - t) * unroll + ub
        hb[:] = jnp.where(valid_b, h_new, hb[:])
        cb[:] = jnp.where(valid_b, c_new, cb[:])
        outb_ref[ub] = jnp.where(
            valid_b, h_new, jnp.zeros_like(h_new)).astype(outb_ref.dtype)


def _bilstm_pallas_fwd_impl(params_fwd, params_bwd, x, lengths):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, Din = x.shape
    H = params_fwd["w_hh"].shape[0]

    xT = jnp.swapaxes(x, 0, 1)  # [T, B, Din] (projections computed in-kernel)

    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    len2d = lengths.astype(jnp.int32).reshape(B, 1)

    out_shape = (
        jax.ShapeDtypeStruct((T, B, H), x.dtype),
        jax.ShapeDtypeStruct((T, B, H), x.dtype),
    )
    U = _unroll_of(T)
    Tb = T // U
    Bb = _batch_block(B)
    grid = (B // Bb, Tb)
    # interpreter mode lets the kernel run (slowly) on CPU for tests
    interpret = jax.default_backend() == "cpu"
    out_f, out_b = pl.pallas_call(
        functools.partial(_bilstm_kernel, unroll=U, fast=not interpret),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bb, 1), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, Bb, Din), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, Bb, Din), lambda b, t: (Tb - 1 - t, b, 0),
                         memory_space=pltpu.VMEM),
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
            pl.BlockSpec((U, Bb, H), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, Bb, H), lambda b, t: (Tb - 1 - t, b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((Bb, H), jnp.float32),
            pltpu.VMEM((Bb, H), jnp.float32),
            pltpu.VMEM((Bb, H), jnp.float32),
            pltpu.VMEM((Bb, H), jnp.float32),
        ],
        interpret=interpret,
    )(len2d, xT, xT,
      params_fwd["w_ih"], params_bwd["w_ih"],
      (params_fwd["b_ih"] + params_fwd["b_hh"])[None, :],
      (params_bwd["b_ih"] + params_bwd["b_hh"])[None, :],
      params_fwd["w_hh"], params_bwd["w_hh"])

    out = jnp.concatenate(
        [jnp.swapaxes(out_f, 0, 1), jnp.swapaxes(out_b, 0, 1)], axis=-1
    )
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def bilstm_pallas(params_fwd, params_bwd, x, lengths):
    """Fused bidirectional LSTM: [B, T, D] -> [B, T, 2H] with packed
    semantics. Drop-in for ops.lstm.bilstm."""
    return _bilstm_pallas_fwd_impl(params_fwd, params_bwd, x, lengths)


def _fwd(params_fwd, params_bwd, x, lengths):
    out = _bilstm_pallas_fwd_impl(params_fwd, params_bwd, x, lengths)
    return out, (params_fwd, params_bwd, x, lengths)


def _bwd(res, g):
    params_fwd, params_bwd, x, lengths = res
    # rematerialise through the XLA scan implementation for gradients
    _, vjp = jax.vjp(
        lambda pf, pb, xx: lstm_ref.bilstm(pf, pb, xx, lengths=lengths),
        params_fwd, params_bwd, x,
    )
    d_pf, d_pb, d_x = vjp(g)
    return d_pf, d_pb, d_x, None


bilstm_pallas.defvjp(_fwd, _bwd)
