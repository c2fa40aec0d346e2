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


def _bilstm_kernel(len_ref, xpf_ref, xpb_ref, whf_ref, whb_ref,
                   outf_ref, outb_ref, hf, cf, hb, cb):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    t = pl.program_id(0)
    T = pl.num_programs(0)
    H = hf.shape[-1]

    @pl.when(t == 0)
    def _init():
        hf[:] = jnp.zeros_like(hf)
        cf[:] = jnp.zeros_like(cf)
        hb[:] = jnp.zeros_like(hb)
        cb[:] = jnp.zeros_like(cb)

    def step(pre, c):
        i = jax.nn.sigmoid(pre[:, 0 * H:1 * H])
        f = jax.nn.sigmoid(pre[:, 1 * H:2 * H])
        g = jnp.tanh(pre[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(pre[:, 3 * H:4 * H])
        c_new = f * c + i * g
        return o * jnp.tanh(c_new), c_new

    lens = len_ref[:]  # [B, 1] int32

    # forward direction: position t
    pre_f = xpf_ref[0] + jnp.dot(hf[:], whf_ref[:],
                                 preferred_element_type=jnp.float32)
    h_new, c_new = step(pre_f, cf[:])
    valid = lens > t  # [B, 1]
    hf[:] = jnp.where(valid, h_new, hf[:])
    cf[:] = jnp.where(valid, c_new, cf[:])
    outf_ref[0] = jnp.where(valid, h_new, jnp.zeros_like(h_new))

    # reverse direction: position T-1-t (index maps mirror the IO)
    pre_b = xpb_ref[0] + jnp.dot(hb[:], whb_ref[:],
                                 preferred_element_type=jnp.float32)
    h_new, c_new = step(pre_b, cb[:])
    valid_b = lens > (T - 1 - t)
    hb[:] = jnp.where(valid_b, h_new, hb[:])
    cb[:] = jnp.where(valid_b, c_new, cb[:])
    outb_ref[0] = jnp.where(valid_b, h_new, jnp.zeros_like(h_new))


def _bilstm_pallas_fwd_impl(params_fwd, params_bwd, x, lengths):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, _ = x.shape
    H = params_fwd["w_hh"].shape[0]

    # hoisted input projections (MXU), time-major
    xp_f = (x @ params_fwd["w_ih"] + params_fwd["b_ih"] + params_fwd["b_hh"])
    xp_b = (x @ params_bwd["w_ih"] + params_bwd["b_ih"] + params_bwd["b_hh"])
    xp_f = jnp.swapaxes(xp_f, 0, 1)  # [T, B, 4H]
    xp_b = jnp.swapaxes(xp_b, 0, 1)

    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    len2d = lengths.astype(jnp.int32).reshape(B, 1)

    out_shape = (
        jax.ShapeDtypeStruct((T, B, H), x.dtype),
        jax.ShapeDtypeStruct((T, B, H), x.dtype),
    )
    grid = (T,)
    # interpreter mode lets the kernel run (slowly) on CPU for tests
    interpret = jax.default_backend() == "cpu"
    out_f, out_b = pl.pallas_call(
        _bilstm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 4 * H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 4 * H), lambda t: (T - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), lambda t: (T - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(len2d, xp_f, xp_b, params_fwd["w_hh"], params_bwd["w_hh"])

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
