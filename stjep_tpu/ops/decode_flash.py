"""Fused Pallas decode-step kernels (ROADMAP #1: the decode megakernel).

A KV-cached decode step through one decoder layer costs ~15 XLA fusions; at
decode batch sizes (B*K ~ 80 rows) the per-launch overhead and the full-length
cache reads dominate the ~0.1 ms of useful work. These kernels collapse each
decoder layer step into THREE pallas_calls:

  1. `self_attn_step`  — pre-LN -> QKV projections -> in-place HBM cache row
     write -> ancestry-resolved online-softmax attention streamed over ONLY
     the live cache prefix (blocks <= pos) -> output projection -> residual.
  2. `cross_attn_step` — pre-LN -> Q projection -> online-softmax attention
     over the precomputed (UNexpanded) memory K/V streamed in blocks ->
     output projection -> residual.
  3. `ffn_step`        — pre-LN -> w1 -> relu -> w2 -> residual.

Key design points (see /opt/skills/guides/pallas_guide.md):

- Caches live in HBM (`pltpu.MemorySpace.HBM`) in HEAD-MERGED, GROUP-MAJOR
  layout [group, B, Lpad, D] (lane dim = D = n*d so DMA runs are contiguous
  and VMEM tiles fully packed; group-major so each beam row is a static
  index — Mosaic rejects the reshapes a b-major layout would need). `Lpad`
  is `max_seq_len` rounded up to the block size. Per-head math uses a
  static [D, n] head-selector matmul instead of lane-splitting reshapes.
- The new position's K/V row is injected in-register into the attention
  values (a 1-row DMA on the tiled L dim is not legal), and the whole
  BLOCK-aligned pos-block is flushed back to the aliased cache output after
  the loop; the caller gets the updated cache back with zero copies.
- Attention streams K/V blocks HBM->VMEM with double buffering and a
  DYNAMIC trip count `pos // BLOCK + 1` — a decode step only reads the
  prefix it can attend to, halving average cache traffic vs dense XLA ops.
- Beam search never reorders the cache: `anc[s, l]` gives the in-group row
  that wrote hypothesis-s's position-l K/V (gather-at-read, see
  infer/beam.py); the select folds into the streamed attention as a
  one-hot over the (<= beam_width) group rows.
- Online softmax (flash-attention style m/l/acc carry) keeps only
  [rows, heads]-sized state; when every position in range is masked the
  result degenerates to uniform attention over the (masked) range, matching
  the XLA path's softmax of an all(-1e9) row (ref: modules/layers.py:222-229
  semantics).

Numerics: computation is f32 (caches may be stored bf16); the online softmax
re-associates the sum over positions, so outputs can differ from the XLA
path by ~1 ulp. Greedy decode therefore keeps the XLA path in the default
token-identical parity mode, and tests/test_decode_flash.py pins this kernel
against the XLA ancestry path to fp tolerance (plus beam line-parity is
re-checked end-to-end in tests/test_beam_parity.py with the kernel forced on
in interpret mode).

Reference semantics mirrored here: LayerNorm on the query input only
(ref: modules/layers.py:153-160), -1e9 mask fill (ref: layers.py:222-224),
q pre-scaled by 1/sqrt(d_k) (ref: layers.py:210), FFN LN->w1->relu->w2->
residual (ref: layers.py:243-251).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from stjep_tpu.config import EOS as EOS_ID
from stjep_tpu.config import PAD as PAD_ID

BLOCK = 16  # max self-cache positions streamed per DMA; Lpad is a multiple
CROSS_BLOCK = 32  # max memory positions streamed per DMA in cross-attention


def stream_blocks(n_rows: int, d_model: int = 512, itemsize: int = 4,
                  max_len: int = 0):
    """Per-call stream block sizes (self, cross), chosen against a VMEM
    byte budget: ~10 [n_rows, blk, D]-sized temporaries (K/V selects,
    products, probs) live at once in the attention kernels, so big batches
    halve the block — but bf16 caches keep full-size blocks at serving
    batch sizes where f32 must shrink.

    max_len > 0 enables LATENCY mode: when the whole streamed length fits
    the budget (small serving batches), both blocks grow to max_len so the
    K/V stream is ONE DMA — at B=1 the per-step cost is dominated by the
    ~10 dependent block-wait latencies per layer, not bandwidth. Callers
    pass the length the returned block must divide (it returns max_len
    itself, and L % L == 0)."""
    blk, bs = BLOCK, CROSS_BLOCK
    budget = 56 * 1024 * 1024
    # BLOCK alignment required: _self_core's flush window is BLOCK-row
    # aligned inside the (whole-length) read block, so a max_len that is
    # 8- but not 16-aligned would compute an out-of-bounds flush slice
    if (max_len and max_len % BLOCK == 0
            and 10 * n_rows * max_len * d_model * itemsize <= budget):
        return max_len, max_len
    while blk > 4 and 10 * n_rows * blk * d_model * itemsize > budget:
        blk //= 2
        bs //= 2
    return blk, bs
# The self kernel's working set (2x double-buffered K/V blocks + 4 [D,D]
# weights + selection temporaries) exceeds the compiler's default 16 MB
# scoped-vmem cap at flagship decode shapes, so the attention kernels raise
# vmem_limit_bytes (v5e VMEM is 128 MB; only one kernel occupies it at a
# time during serial decode). 98 MB lets bf16 serving batches keep
# full-size stream blocks (measured scoped usage ~74 MB at B=64).
VMEM_LIMIT = 98 * 1024 * 1024

NEG = -1e9  # ops.transformer.ATTN_MASK_FILL


def pad_len(n: int, block: int = BLOCK) -> int:
    return ((n + block - 1) // block) * block


def flash_supported(dim_model: int) -> bool:
    """Whether the fused decode kernels can compile for this model width.

    The HBM cache layout is [group, B, L, D] with D minor; the kernels DMA
    L-dim slices, which Mosaic requires to be lane-tile aligned — so D must
    be a multiple of 128 (flagship widths are; tiny test configs fall back
    to the dense XLA path). Interpret mode (CPU) has no such constraint."""
    return dim_model % 128 == 0


def _ln(x, scale, bias, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


# ---------------------------------------------------------------------------
# 1. fused self-attention step (ancestry + in-place HBM cache)
# ---------------------------------------------------------------------------


def _head_sel(D: int, n_head: int):
    """Static [D, n] 0/1 matrix: column h selects head-h's lane chunk.

    Multiplying a merged-head [rows, D] tensor by this on the MXU performs
    the per-head segmented reduction without any lane-dim reshape (Mosaic
    rejects vector shape casts that split the lane dimension)."""
    d = D // n_head
    return (jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 0) // d
            == jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 1)
            ).astype(jnp.float32)


def _self_core(pos, x, anc_ref, maskk_ref,
               lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref, wo_ref,
               ck_out, cv_out,
               kbuf, vbuf, sem_rd, sem_wr,
               n_head: int, group: int, blk: int = BLOCK,
               residual: bool = True):
    """Fused self-attention step body; returns y [BK, D] and persists the
    new K/V row into the (aliased) HBM caches as a side effect.

    Rectangular projections are supported for tensor parallelism: wq/wk/wv
    may be [D, Dq] with Dq = D/n_model (a head shard — n_head is then the
    LOCAL head count) and wo [Dq, D]; residual=False returns the partial
    output-projection contribution only, for a psum across the model axis
    before the residual add (ops/decode_flash_tp.py)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    BK, D = x.shape
    Dq = wq_ref.shape[1]  # attention width (== D unless head-sharded)
    d = Dq // n_head
    B = BK // group
    hsel = _head_sel(Dq, n_head)  # [Dq, n]
    xn = _ln(x, lns_ref[:], lnb_ref[:])
    q = jnp.dot(xn, wq_ref[:], preferred_element_type=f32) / (d**0.5)
    k_new = jnp.dot(x, wk_ref[:], preferred_element_type=f32)
    v_new = jnp.dot(x, wv_ref[:], preferred_element_type=f32)

    # The new position's K/V row is NOT written to HBM up front: a 1-row DMA
    # slice on the tiled L dim is rejected by Mosaic (8-row alignment). It is
    # instead injected into the VMEM block buffer when the block containing
    # `pos` arrives (one [group, B, blk, D] select, last block only — cheaper
    # than an every-block [BK, blk, D] in-register where), and that buffer is
    # flushed back to the cache verbatim after the loop.
    nb = pos // blk + 1  # dynamic trip count: only the live prefix
    last = nb - 1

    # regroup the new row b-major -> group-major with 0/1 row-select matmuls
    # (Mosaic-safe; used by the last-block injection below)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, BK), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, BK), 0) * group
    knew_gm = []
    vnew_gm = []
    # HIGHEST: these 0/1 matmuls SHUFFLE the freshly-projected K/V rows
    # into group-major order — default MXU precision would round the
    # values to bf16 before the cache's own storage dtype gets a say
    hp = jax.lax.Precision.HIGHEST
    for j in range(group):
        pj = (rows == cols + j).astype(f32)  # [B, BK] selects rows b*g+j
        knew_gm.append(jnp.dot(pj, k_new, preferred_element_type=f32,
                               precision=hp)[None])
        vnew_gm.append(jnp.dot(pj, v_new, preferred_element_type=f32,
                               precision=hp)[None])
    knew_gm = jnp.concatenate(knew_gm, axis=0)  # [group, B, D]
    vnew_gm = jnp.concatenate(vnew_gm, axis=0)
    inblk = jax.lax.broadcasted_iota(
        jnp.int32, (group, B, blk, 1), 2) == (pos - last * blk)

    def rd(i, slot):
        k_dma = pltpu.make_async_copy(
            ck_out.at[:, :, pl.ds(i * blk, blk), :], kbuf.at[slot],
            sem_rd.at[slot, 0])
        v_dma = pltpu.make_async_copy(
            cv_out.at[:, :, pl.ds(i * blk, blk), :], vbuf.at[slot],
            sem_rd.at[slot, 1])
        return k_dma, v_dma

    k0, v0 = rd(0, 0)
    k0.start()
    v0.start()

    m0 = jnp.full((BK, n_head), -1e30, f32)
    l0 = jnp.zeros((BK, n_head), f32)
    a0 = jnp.zeros((BK, Dq), f32)

    def body(i, carry):
        m, lsum, acc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nb)
        def _():
            kn, vn = rd(i + 1, jax.lax.rem(i + 1, 2))
            kn.start()
            vn.start()

        kw, vw = rd(i, slot)
        kw.wait()
        vw.wait()

        # inject the current position's freshly-projected K/V into the VMEM
        # buffer of the block that contains `pos` (row `pos` is not in HBM
        # yet; anc[pos] is each row's own index, so the group-major regrouped
        # rows are the right values). The modified buffer doubles as the
        # flush source after the loop.
        sdt = kbuf.dtype

        @pl.when(i == last)
        def _inject():
            kbuf[slot] = jnp.where(
                inblk, knew_gm[:, :, None, :], kbuf[slot].astype(f32)
            ).astype(sdt)
            vbuf[slot] = jnp.where(
                inblk, vnew_gm[:, :, None, :], vbuf[slot].astype(f32)
            ).astype(sdt)

        l_start = i * blk
        # anc/mask arrive TRANSPOSED [L, BK]: the block slice is then a
        # sublane slice (dynamic lane offsets must be 128-multiples)
        anc_blk = jnp.swapaxes(
            anc_ref[pl.ds(l_start, blk), :], 0, 1)  # [BK, blk]
        msk_blk = jnp.swapaxes(maskk_ref[pl.ds(l_start, blk), :], 0, 1)
        lidx = l_start + jax.lax.broadcasted_iota(
            jnp.int32, (BK, blk), 1)
        valid = (lidx <= pos) & (msk_blk > 0)  # [BK, BLOCK]

        # ancestry-select K/V rows for each hypothesis: a static loop of
        # selects over the (<= beam width) group rows, no gathers.
        # NB: bool masks are expanded through f32 (Mosaic can't insert a
        # minor dim on 1-bit vectors) and re-compared after expansion.
        # The selects run in the CACHE dtype: for bf16 caches this halves
        # the dominant VPU select traffic (ROADMAP #2 "bf16 select
        # arithmetic"); the f32-parity mode is unchanged. Scores still
        # accumulate f32 on the MXU via preferred_element_type.
        ksel = jnp.zeros((BK, blk, Dq), sdt)
        vsel = jnp.zeros((BK, blk, Dq), sdt)
        for j in range(group):
            kj = jnp.broadcast_to(
                kbuf[slot, j][:, None], (B, group, blk, Dq)
            ).reshape(BK, blk, Dq)
            vj = jnp.broadcast_to(
                vbuf[slot, j][:, None], (B, group, blk, Dq)
            ).reshape(BK, blk, Dq)
            take = (anc_blk == j).astype(f32)[:, :, None] > 0.5
            ksel = jnp.where(take, kj, ksel)
            vsel = jnp.where(take, vj, vsel)

        # per-head scores via the head-selector matmul (no lane reshape);
        # hsel matches the select dtype so nothing silently promotes back
        # to f32 (accumulation stays f32 via preferred_element_type)
        prod = q[:, None, :].astype(sdt) * ksel  # [BK, BLOCK, Dq]
        s = jnp.dot(prod.reshape(BK * blk, Dq), hsel.astype(sdt),
                    preferred_element_type=f32).reshape(BK, blk, n_head)
        s = jnp.where(valid.astype(f32)[:, :, None] > 0.5, s, NEG)

        m_blk = jnp.max(s, axis=1)  # [BK, n]
        m_new = jnp.maximum(m, m_blk)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[:, None, :])  # [BK, BLOCK, n]
        lsum = lsum * alpha + jnp.sum(p, axis=1)

        # expand per-head weights across their lane chunk and contract the
        # block on the VPU: ctx[s, h*d+dd] = sum_l p[s,l,h] * vsel[s,l,h*d+dd]
        p_exp = jnp.dot(p.reshape(BK * blk, n_head), hsel.T,
                        preferred_element_type=f32).reshape(BK, blk, Dq)
        ctx = jnp.sum(p_exp * vsel, axis=1)  # [BK, Dq]
        alpha_exp = jnp.dot(alpha, hsel.T, preferred_element_type=f32)
        acc = acc * alpha_exp + ctx
        return m_new, lsum, acc

    m, lsum, acc = jax.lax.fori_loop(0, nb, body, (m0, l0, a0))
    lsum = jnp.where(lsum == 0.0, 1.0, lsum)
    lsum_exp = jnp.dot(lsum, hsel.T, preferred_element_type=f32)
    out = acc / lsum_exp
    y = jnp.dot(out, wo_ref[:], preferred_element_type=f32)
    if residual:
        y = y + x

    # ---- persist the new K/V row: the last block's VMEM buffer already
    # holds the loaded contents with the new row injected at `pos`, so the
    # flush is a verbatim DMA of that buffer back to the cache — restricted
    # to the BLOCK-row window containing `pos` so latency-mode whole-length
    # read blocks (stream_blocks max_len) don't multiply write traffic.
    slot_last = jax.lax.rem(last, 2)
    wblk = min(blk, BLOCK)
    sub = (pos - last * blk) // wblk * wblk  # wblk-aligned, inside the block
    fk = pltpu.make_async_copy(
        kbuf.at[slot_last, :, :, pl.ds(sub, wblk), :],
        ck_out.at[:, :, pl.ds(last * blk + sub, wblk), :],
        sem_wr.at[0])
    fv = pltpu.make_async_copy(
        vbuf.at[slot_last, :, :, pl.ds(sub, wblk), :],
        cv_out.at[:, :, pl.ds(last * blk + sub, wblk), :],
        sem_wr.at[1])
    fk.start()
    fv.start()
    fk.wait()
    fv.wait()
    return y


def _self_kernel(pos_ref, x_ref, anc_ref, maskk_ref,
                 lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                 ck_in, cv_in,
                 y_ref, ck_out, cv_out,
                 kbuf, vbuf, sem_rd, sem_wr,
                 *, n_head: int, group: int, blk: int,
                 residual: bool = True):
    y_ref[:] = _self_core(
        pos_ref[0], x_ref[:], anc_ref, maskk_ref,
        lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref, wo_ref,
        ck_out, cv_out, kbuf, vbuf, sem_rd, sem_wr,
        n_head, group, blk, residual=residual)


def self_attn_step(
    params: Dict,  # mha params: w_qs/w_ks/w_vs/fc/layer_norm
    x_new: jnp.ndarray,  # [B*K, 1, D]
    cache_k: jnp.ndarray,  # [K, B, Lpad, D] GROUP-MAJOR head-merged (HBM)
    cache_v: jnp.ndarray,
    pos: jnp.ndarray,
    n_head: int,
    anc: jnp.ndarray,  # [Lpad, B*K] int32 TRANSPOSED (all-zeros for greedy)
    group: int,
    mask_k: jnp.ndarray,  # [Lpad, B*K] bool TRANSPOSED, True=attendable
    residual: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (y [B*K,1,D], cache_k, cache_v) — caches updated in place.

    Row s = b*group + k of the logical [B*K] batch lives at cache[k, b]
    (group-major storage lets the kernel address beam rows with static
    indices instead of Mosaic-unsupported reshapes). anc/mask_k arrive
    position-major so block slicing is a sublane slice.

    Under tensor parallelism the params hold a head shard ([D, Dq] with
    Dq = D/n_model), caches are [group, B, Lpad, Dq], n_head is the local
    head count, and residual=False returns the pre-residual partial."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BK, _, D = x_new.shape
    Dq = params["w_qs"]["w"].shape[1]
    L = cache_k.shape[2]
    assert cache_k.shape[:2] == (group, BK // group)
    assert cache_k.shape[3] == Dq
    blk, _ = stream_blocks(BK, D, jnp.dtype(cache_k.dtype).itemsize,
                           max_len=L)
    assert anc.shape == (L, BK) and mask_k.shape == (L, BK)
    assert L % blk == 0, f"cache length {L} not a multiple of {blk}"
    f32 = jnp.float32
    cdt = cache_k.dtype
    B = BK // group

    args = (
        jnp.asarray(pos, jnp.int32).reshape(1),
        x_new[:, 0, :].astype(f32),
        anc.astype(jnp.int32),
        mask_k.astype(jnp.int32),
        params["layer_norm"]["scale"], params["layer_norm"]["bias"],
        params["w_qs"]["w"], params["w_ks"]["w"], params["w_vs"]["w"],
        params["fc"]["w"],
        cache_k, cache_v,
    )
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = (pl.ANY if jax.default_backend() == "cpu"
           else pltpu.MemorySpace.HBM)  # interpret mode needs ANY
    anyspace = lambda: pl.BlockSpec(memory_space=hbm)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + \
        [vmem() for _ in range(9)] + [anyspace(), anyspace()]
    out_shape = (
        jax.ShapeDtypeStruct((BK, D), f32),
        jax.ShapeDtypeStruct((group, B, L, Dq), cdt),
        jax.ShapeDtypeStruct((group, B, L, Dq), cdt),
    )
    y, ck, cv = pl.pallas_call(
        functools.partial(_self_kernel, n_head=n_head, group=group,
                          blk=blk, residual=residual),
        in_specs=in_specs,
        out_specs=(vmem(), anyspace(), anyspace()),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, group, B, blk, Dq), cdt),  # kbuf
            pltpu.VMEM((2, group, B, blk, Dq), cdt),  # vbuf
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={10: 1, 11: 2},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )(*args)
    return y[:, None, :], ck, cv


# ---------------------------------------------------------------------------
# 2. fused cross-attention step (unexpanded memory, static block count)
# ---------------------------------------------------------------------------


def _cross_core(x, memmask_ref,
                lns_ref, lnb_ref, wq_ref, wo_ref,
                mk_hbm, mv_hbm,
                kbuf, vbuf, sem_rd,
                n_head: int, group: int, bs: int,
                residual: bool = True):
    """Fused cross-attention step body; returns y [BK, D].

    Rectangular wq [D, Dq] / wo [Dq, D] (head shards, n_head local) and
    residual=False support the tensor-parallel trio (decode_flash_tp)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    BK, D = x.shape
    B, Lk, Dq = mk_hbm.shape
    d = Dq // n_head
    nb = Lk // bs
    hsel = _head_sel(Dq, n_head)
    # [BK, B] 0/1: row s=(b,k) <- batch entry b
    expand = (jax.lax.broadcasted_iota(jnp.int32, (BK, B), 0) // group
              == jax.lax.broadcasted_iota(jnp.int32, (BK, B), 1)
              ).astype(f32)
    xn = _ln(x, lns_ref[:], lnb_ref[:])
    q = jnp.dot(xn, wq_ref[:], preferred_element_type=f32) / (d**0.5)

    def rd(i, slot):
        k_dma = pltpu.make_async_copy(
            mk_hbm.at[:, pl.ds(i * bs, bs), :], kbuf.at[slot],
            sem_rd.at[slot, 0])
        v_dma = pltpu.make_async_copy(
            mv_hbm.at[:, pl.ds(i * bs, bs), :], vbuf.at[slot],
            sem_rd.at[slot, 1])
        return k_dma, v_dma

    k0, v0 = rd(0, 0)
    k0.start()
    v0.start()

    m0 = jnp.full((BK, n_head), -1e30, f32)
    l0 = jnp.zeros((BK, n_head), f32)
    a0 = jnp.zeros((BK, Dq), f32)

    def body(i, carry):
        m, lsum, acc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nb)
        def _():
            kn, vn = rd(i + 1, jax.lax.rem(i + 1, 2))
            kn.start()
            vn.start()

        kw, vw = rd(i, slot)
        kw.wait()
        vw.wait()

        # memory rows are shared by all `group` beam rows of a batch entry;
        # broadcasts stay in the memory dtype (halves traffic for bf16)
        mdt_k = kbuf.dtype
        kblk = jnp.broadcast_to(
            kbuf[slot][:, None], (B, group, bs, Dq)
        ).reshape(BK, bs, Dq)
        vblk = jnp.broadcast_to(
            vbuf[slot][:, None], (B, group, bs, Dq)
        ).reshape(BK, bs, Dq)
        # mask arrives TRANSPOSED [Lk, B]; beam-expand rows via the 0/1
        # expansion matmul (no sublane-merging reshapes)
        mm = jnp.swapaxes(
            memmask_ref[pl.ds(i * bs, bs), :], 0, 1).astype(f32)  # [B, bs]
        msk = jnp.dot(expand, mm, preferred_element_type=f32)  # [BK, bs] f32

        prod = q[:, None, :].astype(mdt_k) * kblk  # [BK, bs, Dq]
        s = jnp.dot(prod.reshape(BK * bs, Dq), hsel.astype(mdt_k),
                    preferred_element_type=f32).reshape(BK, bs, n_head)
        s = jnp.where(msk[:, :, None] > 0.5, s, NEG)

        m_blk = jnp.max(s, axis=1)
        m_new = jnp.maximum(m, m_blk)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[:, None, :])
        lsum = lsum * alpha + jnp.sum(p, axis=1)
        p_exp = jnp.dot(p.reshape(BK * bs, n_head), hsel.T,
                        preferred_element_type=f32).reshape(BK, bs, Dq)
        ctx = jnp.sum(p_exp * vblk, axis=1)
        alpha_exp = jnp.dot(alpha, hsel.T, preferred_element_type=f32)
        acc = acc * alpha_exp + ctx
        return m_new, lsum, acc

    m, lsum, acc = jax.lax.fori_loop(0, nb, body, (m0, l0, a0))
    lsum = jnp.where(lsum == 0.0, 1.0, lsum)
    lsum_exp = jnp.dot(lsum, hsel.T, preferred_element_type=f32)
    out = acc / lsum_exp
    y = jnp.dot(out, wo_ref[:], preferred_element_type=f32)
    if residual:
        y = y + x
    return y


def _cross_kernel(x_ref, memmask_ref,
                  lns_ref, lnb_ref, wq_ref, wo_ref,
                  mk_hbm, mv_hbm,
                  y_ref,
                  kbuf, vbuf, sem_rd,
                  *, n_head: int, group: int, bs: int,
                  residual: bool = True):
    y_ref[:] = _cross_core(
        x_ref[:], memmask_ref, lns_ref, lnb_ref, wq_ref, wo_ref,
        mk_hbm, mv_hbm, kbuf, vbuf, sem_rd, n_head, group, bs,
        residual=residual)


def cross_attn_step(
    params: Dict,  # mha params: w_qs/fc/layer_norm (K/V precomputed)
    x_new: jnp.ndarray,  # [B*K, 1, D]
    mem_k: jnp.ndarray,  # [B, Lk_pad, D] head-merged projections
    mem_v: jnp.ndarray,
    n_head: int,
    group: int,
    mem_mask: jnp.ndarray,  # [Lk_pad, B] bool TRANSPOSED (False on padding)
    bs: int = 0,  # 0 = auto via stream_blocks
    residual: bool = True,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BK, _, D = x_new.shape
    B, Lk, Dq = mem_k.shape
    if not bs:
        _, bs = stream_blocks(BK, D, jnp.dtype(mem_k.dtype).itemsize,
                              max_len=Lk)
    assert Lk % bs == 0, f"memory length {Lk} not a multiple of {bs}"
    f32 = jnp.float32
    mdt = mem_k.dtype

    args = (
        x_new[:, 0, :].astype(f32),
        mem_mask.astype(jnp.int32),
        params["layer_norm"]["scale"], params["layer_norm"]["bias"],
        params["w_qs"]["w"], params["fc"]["w"],
        mem_k, mem_v,
    )
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = (pl.ANY if jax.default_backend() == "cpu"
           else pltpu.MemorySpace.HBM)  # interpret mode needs ANY
    anyspace = lambda: pl.BlockSpec(memory_space=hbm)
    y = pl.pallas_call(
        functools.partial(_cross_kernel, n_head=n_head, group=group, bs=bs,
                          residual=residual),
        in_specs=[vmem() for _ in range(6)] + [anyspace(), anyspace()],
        out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((BK, D), f32),
        scratch_shapes=[
            pltpu.VMEM((2, B, bs, Dq), mdt),
            pltpu.VMEM((2, B, bs, Dq), mdt),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )(*args)
    return y[:, None, :]


# ---------------------------------------------------------------------------
# 3. fused FFN step
# ---------------------------------------------------------------------------


def _ffn_core(x, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
              partial_tp: bool = False):
    """Fused FFN step body; returns y [BK, D].

    partial_tp=True returns only `relu(LN(x) @ w1 + b1) @ w2` — the hidden
    dim is a model-axis shard (w1 column- / w2 row-parallel, b1 sharded),
    so the caller psums the partials and adds x + b2 once afterwards."""
    f32 = jnp.float32
    xn = _ln(x, lns_ref[:], lnb_ref[:])
    h = jnp.maximum(
        jnp.dot(xn, w1_ref[:], preferred_element_type=f32) + b1_ref[:], 0.0)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=f32)
    if partial_tp:
        return y
    return x + y + b2_ref[:]


def _ffn_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                y_ref, *, partial_tp: bool = False):
    y_ref[:] = _ffn_core(x_ref[:], lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                         b2_ref, partial_tp=partial_tp)


def ffn_step(params: Dict, x_new: jnp.ndarray,
             partial_tp: bool = False) -> jnp.ndarray:
    """x_new: [B*K, 1, D]. LN -> w1 -> relu -> w2 -> residual, one launch."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BK, _, D = x_new.shape
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        functools.partial(_ffn_kernel, partial_tp=partial_tp),
        in_specs=[vmem() for _ in range(7)],
        out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((BK, D), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(
        x_new[:, 0, :].astype(jnp.float32),
        params["layer_norm"]["scale"], params["layer_norm"]["bias"],
        params["w_1"]["w"], params["w_1"]["b"],
        params["w_2"]["w"], params["w_2"]["b"],
    )
    return y[:, None, :]


# ---------------------------------------------------------------------------
# int8 weight streaming (serving-latency mode)
# ---------------------------------------------------------------------------
#
# At small serving batches the fused layer-step launches are HBM-bound on
# the WEIGHTS they re-read every decode step (benchmarks/
# serving_latency_b1.json: 69% of B=1 beam latency, ~92.8 us/step at the
# streamed dtype). Quantizing the eight streamed matrices per layer
# (self q/k/v/o, cross q/o, FFN w1/w2) to per-output-channel symmetric int8
# quarters those bytes vs f32; the kernel dequantizes after the VMEM copy
# (one [in, out] VPU multiply per matrix — negligible next to the DMA) and
# all matmuls still accumulate f32. LayerNorms, biases, the cross K/V
# projections (amortized once per utterance batch in
# tf_decoder_init_cache_flash), and the decode head (V is char-sized)
# stay full precision. Opt-in via --weight_dtype int8 (translate.py);
# the default f32 path is untouched for oracle parity.


def _q8_leaf(leaf: Dict) -> Dict:
    """{"w": [in, out]} -> {"w": int8, "w_s": f32 [1, out]} (sym. per-col)."""
    w = leaf["w"].astype(jnp.float32)
    s = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    s = jnp.where(s == 0.0, 1.0, s)
    q = jnp.clip(jnp.round(w / s), -127.0, 127.0).astype(jnp.int8)
    out = dict(leaf)
    out["w"] = q
    out["w_s"] = s
    return out


QUANT_SELF = ("w_qs", "w_ks", "w_vs", "fc")
QUANT_CROSS = ("w_qs", "fc")
QUANT_FFN = ("w_1", "w_2")


def quantize_decoder_weights(dec_params: Dict) -> Dict:
    """Quantize every per-step-streamed decoder weight to int8 + scales.

    Returns a structurally-compatible copy of the `dec_tgt` subtree; leaves
    not streamed by the layer-step kernel (LNs, biases, encdec K/V
    projections, the final norm) are shared, not copied. The layer-step
    wrapper detects the "w_s" key and dispatches the dequantizing kernel."""
    out = dict(dec_params)
    layers = []
    for lp in dec_params["layers"]:
        sa = dict(lp["decslf_attn"])
        ca = dict(lp["encdec_attn"])
        ff = dict(lp["pos_ffn"])
        for k in QUANT_SELF:
            sa[k] = _q8_leaf(sa[k])
        for k in QUANT_CROSS:
            ca[k] = _q8_leaf(ca[k])
        for k in QUANT_FFN:
            ff[k] = _q8_leaf(ff[k])
        nl = dict(lp)
        nl["decslf_attn"] = sa
        nl["encdec_attn"] = ca
        nl["pos_ffn"] = ff
        layers.append(nl)
    out["layers"] = layers
    return out


def _layer_kernel_q8(pos_ref, x_ref, anc_ref, maskk_ref, memmask_ref,
                     slns_ref, slnb_ref, wq_ref, wqs_ref, wk_ref, wks_ref,
                     wv_ref, wvs_ref, wo_ref, wos_ref,
                     clns_ref, clnb_ref, cwq_ref, cwqs_ref, cwo_ref, cwos_ref,
                     flns_ref, flnb_ref, w1_ref, w1s_ref, b1_ref,
                     w2_ref, w2s_ref, b2_ref,
                     ck_in, cv_in, mk_hbm, mv_hbm,
                     y_ref, ck_out, cv_out,
                     kbuf, vbuf, mkbuf, mvbuf,
                     sem_self, sem_wr, sem_cross,
                     *, n_head: int, group: int, bs: int, blk: int):
    """decoder_layer_step_flash body with int8 weights: dequantize each
    streamed matrix once after its VMEM copy, then run the shared cores
    (which accept plain arrays — `arr[:]` is the array) unchanged."""
    dq = lambda w, s: w[:].astype(jnp.float32) * s[:]
    y = _self_core(
        pos_ref[0], x_ref[:], anc_ref, maskk_ref,
        slns_ref, slnb_ref, dq(wq_ref, wqs_ref), dq(wk_ref, wks_ref),
        dq(wv_ref, wvs_ref), dq(wo_ref, wos_ref),
        ck_out, cv_out, kbuf, vbuf,
        sem_self, sem_wr, n_head, group, blk)
    y = _cross_core(
        y, memmask_ref, clns_ref, clnb_ref, dq(cwq_ref, cwqs_ref),
        dq(cwo_ref, cwos_ref),
        mk_hbm, mv_hbm, mkbuf, mvbuf, sem_cross, n_head, group, bs)
    y_ref[:] = _ffn_core(y, flns_ref, flnb_ref, dq(w1_ref, w1s_ref), b1_ref,
                         dq(w2_ref, w2s_ref), b2_ref)


def _layer_kernel(pos_ref, x_ref, anc_ref, maskk_ref, memmask_ref,
                  slns_ref, slnb_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                  clns_ref, clnb_ref, cwq_ref, cwo_ref,
                  flns_ref, flnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  ck_in, cv_in, mk_hbm, mv_hbm,
                  y_ref, ck_out, cv_out,
                  kbuf, vbuf, mkbuf, mvbuf,
                  sem_self, sem_wr, sem_cross,
                  *, n_head: int, group: int, bs: int, blk: int):
    """One decoder layer's whole decode step in a single launch."""
    y = _self_core(
        pos_ref[0], x_ref[:], anc_ref, maskk_ref,
        slns_ref, slnb_ref, wq_ref, wk_ref, wv_ref, wo_ref,
        ck_out, cv_out, kbuf, vbuf,
        sem_self, sem_wr, n_head, group, blk)
    y = _cross_core(
        y, memmask_ref, clns_ref, clnb_ref, cwq_ref, cwo_ref,
        mk_hbm, mv_hbm, mkbuf, mvbuf, sem_cross, n_head, group, bs)
    y_ref[:] = _ffn_core(y, flns_ref, flnb_ref, w1_ref, b1_ref, w2_ref,
                         b2_ref)


def decoder_layer_step_flash(
    params: Dict,  # decoder layer: decslf_attn / encdec_attn / pos_ffn
    x_new: jnp.ndarray,  # [B*K, 1, D]
    cache_k: jnp.ndarray,  # [group, B, Lpad, D]
    cache_v: jnp.ndarray,
    mem_k: jnp.ndarray,  # [B, Lk_pad, D]
    mem_v: jnp.ndarray,
    pos: jnp.ndarray,
    n_head: int,
    anc: jnp.ndarray,  # [Lpad, B*K] transposed
    group: int,
    mem_mask: jnp.ndarray,  # [Lk_pad, B] transposed
    self_mask_k: jnp.ndarray,  # [Lpad, B*K] transposed
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full decoder-layer decode step in ONE fused launch.

    The per-phase wrappers (self_attn_step / cross_attn_step / ffn_step)
    share the same cores and remain available for debugging."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BK, _, D = x_new.shape
    L = cache_k.shape[2]
    B, Lk, _ = mem_k.shape
    # block sizes follow each stream's own dtype (like the standalone
    # self_attn_step/cross_attn_step wrappers) so an f32 memory alongside
    # bf16 self caches keeps the memory scratch inside the VMEM budget
    blk, _ = stream_blocks(BK, D, jnp.dtype(cache_k.dtype).itemsize,
                           max_len=L)
    _, bs = stream_blocks(BK, D, jnp.dtype(mem_k.dtype).itemsize,
                          max_len=Lk)
    assert cache_k.shape[:2] == (group, B) and BK == B * group
    assert anc.shape == (L, BK) and self_mask_k.shape == (L, BK)
    assert mem_mask.shape == (Lk, B)
    assert L % blk == 0 and Lk % bs == 0
    f32 = jnp.float32
    cdt = cache_k.dtype
    mdt = mem_k.dtype

    sa = params["decslf_attn"]
    ca = params["encdec_attn"]
    ff = params["pos_ffn"]
    quant = "w_s" in sa["w_qs"]  # from quantize_decoder_weights
    if quant:
        wargs = (
            sa["layer_norm"]["scale"], sa["layer_norm"]["bias"],
            sa["w_qs"]["w"], sa["w_qs"]["w_s"], sa["w_ks"]["w"],
            sa["w_ks"]["w_s"], sa["w_vs"]["w"], sa["w_vs"]["w_s"],
            sa["fc"]["w"], sa["fc"]["w_s"],
            ca["layer_norm"]["scale"], ca["layer_norm"]["bias"],
            ca["w_qs"]["w"], ca["w_qs"]["w_s"], ca["fc"]["w"],
            ca["fc"]["w_s"],
            ff["layer_norm"]["scale"], ff["layer_norm"]["bias"],
            ff["w_1"]["w"], ff["w_1"]["w_s"], ff["w_1"]["b"],
            ff["w_2"]["w"], ff["w_2"]["w_s"], ff["w_2"]["b"],
        )
        kern = _layer_kernel_q8
    else:
        wargs = (
            sa["layer_norm"]["scale"], sa["layer_norm"]["bias"],
            sa["w_qs"]["w"], sa["w_ks"]["w"], sa["w_vs"]["w"], sa["fc"]["w"],
            ca["layer_norm"]["scale"], ca["layer_norm"]["bias"],
            ca["w_qs"]["w"], ca["fc"]["w"],
            ff["layer_norm"]["scale"], ff["layer_norm"]["bias"],
            ff["w_1"]["w"], ff["w_1"]["b"], ff["w_2"]["w"], ff["w_2"]["b"],
        )
        kern = _layer_kernel
    args = (
        jnp.asarray(pos, jnp.int32).reshape(1),
        x_new[:, 0, :].astype(f32),
        anc.astype(jnp.int32),
        self_mask_k.astype(jnp.int32),
        mem_mask.astype(jnp.int32),
    ) + wargs + (cache_k, cache_v, mem_k, mem_v)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = (pl.ANY if jax.default_backend() == "cpu"
           else pltpu.MemorySpace.HBM)
    anyspace = lambda: pl.BlockSpec(memory_space=hbm)
    n_w = len(wargs)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [vmem() for _ in range(4 + n_w)]
                + [anyspace() for _ in range(4)])
    out_shape = (
        jax.ShapeDtypeStruct((BK, D), f32),
        jax.ShapeDtypeStruct((group, B, L, D), cdt),
        jax.ShapeDtypeStruct((group, B, L, D), cdt),
    )
    ck_arg = 5 + n_w  # index of cache_k in args (aliased to output 1)
    y, ck, cv = pl.pallas_call(
        functools.partial(kern, n_head=n_head, group=group, bs=bs,
                          blk=blk),
        in_specs=in_specs,
        out_specs=(vmem(), anyspace(), anyspace()),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, group, B, blk, D), cdt),  # kbuf
            pltpu.VMEM((2, group, B, blk, D), cdt),  # vbuf
            pltpu.VMEM((2, B, bs, D), mdt),  # mem kbuf
            pltpu.VMEM((2, B, bs, D), mdt),  # mem vbuf
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        input_output_aliases={ck_arg: 1, ck_arg + 1: 2},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )(*args)
    return y[:, None, :], ck, cv


def decoder_layer_step_flash_trio(
    params: Dict,
    x_new: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    mem_k: jnp.ndarray,
    mem_v: jnp.ndarray,
    pos: jnp.ndarray,
    n_head: int,
    anc: jnp.ndarray,
    group: int,
    mem_mask: jnp.ndarray,
    self_mask_k: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Same step as decoder_layer_step_flash but as three launches (kept
    for A/B debugging of the fused layer kernel)."""
    y, ck, cv = self_attn_step(
        params["decslf_attn"], x_new, cache_k, cache_v, pos, n_head, anc,
        group, self_mask_k)
    y = cross_attn_step(
        params["encdec_attn"], y, mem_k, mem_v, n_head, group, mem_mask)
    y = ffn_step(params["pos_ffn"], y)
    return y, ck, cv


# ---------------------------------------------------------------------------
# 3b. chained whole-step kernel: ALL layers + decode head in ONE launch
# ---------------------------------------------------------------------------
#
# serving_latency_b1.json (r4): at B=1 the beam stage ran 59.5 us/step int8
# against a 35.2 us weight-stream floor — the gap is per-launch overhead of
# the 6 layer launches + 1 head launch per decode step, plus the XLA glue
# between them. This kernel runs the WHOLE decode position in one
# pallas_call with `grid=(n_layers,)`: per-layer weights arrive as stacked
# [nl, ...] tensors whose blocks Pallas auto-pipelines (layer l+1's weight
# DMA overlaps layer l's compute — the double-buffered weight streaming the
# r4 design doc called for, for free), the hidden state x rides a VMEM
# scratch across grid steps, and the final grid step also runs the decode
# head (final LN -> out proj -> log_softmax -> top-k [+ gathered ref logp]).
# Launches per decode position: 7 -> 1.


def _stack_leaf(lps, *path):
    vals = []
    for lp in lps:
        v = lp
        for p in path:
            v = v[p]
        vals.append(v)
    out = jnp.stack(vals, axis=0)
    if out.ndim == 2:
        # 1-D leaves (LN scales/biases, FFN biases) stack to [nl, D], whose
        # per-layer block (1, D) Mosaic rejects (the sublane block dim must
        # divide 8 or equal the array dim). [nl, 1, D] blocks as (1, 1, D)
        # — trailing dims equal the array — and [1, D] broadcasts in the
        # cores exactly like [D].
        out = out[:, None, :]
    return out


CHAIN_KEYS_F32 = (
    ("decslf_attn", "layer_norm", "scale"), ("decslf_attn", "layer_norm", "bias"),
    ("decslf_attn", "w_qs", "w"), ("decslf_attn", "w_ks", "w"),
    ("decslf_attn", "w_vs", "w"), ("decslf_attn", "fc", "w"),
    ("encdec_attn", "layer_norm", "scale"), ("encdec_attn", "layer_norm", "bias"),
    ("encdec_attn", "w_qs", "w"), ("encdec_attn", "fc", "w"),
    ("pos_ffn", "layer_norm", "scale"), ("pos_ffn", "layer_norm", "bias"),
    ("pos_ffn", "w_1", "w"), ("pos_ffn", "w_1", "b"),
    ("pos_ffn", "w_2", "w"), ("pos_ffn", "w_2", "b"),
)
CHAIN_KEYS_Q8 = (
    ("decslf_attn", "layer_norm", "scale"), ("decslf_attn", "layer_norm", "bias"),
    ("decslf_attn", "w_qs", "w"), ("decslf_attn", "w_qs", "w_s"),
    ("decslf_attn", "w_ks", "w"), ("decslf_attn", "w_ks", "w_s"),
    ("decslf_attn", "w_vs", "w"), ("decslf_attn", "w_vs", "w_s"),
    ("decslf_attn", "fc", "w"), ("decslf_attn", "fc", "w_s"),
    ("encdec_attn", "layer_norm", "scale"), ("encdec_attn", "layer_norm", "bias"),
    ("encdec_attn", "w_qs", "w"), ("encdec_attn", "w_qs", "w_s"),
    ("encdec_attn", "fc", "w"), ("encdec_attn", "fc", "w_s"),
    ("pos_ffn", "layer_norm", "scale"), ("pos_ffn", "layer_norm", "bias"),
    ("pos_ffn", "w_1", "w"), ("pos_ffn", "w_1", "w_s"), ("pos_ffn", "w_1", "b"),
    ("pos_ffn", "w_2", "w"), ("pos_ffn", "w_2", "w_s"), ("pos_ffn", "w_2", "b"),
)


def stack_decoder_layers(dec_params: Dict) -> Tuple[Tuple[jnp.ndarray, ...], bool]:
    """Stack each per-layer streamed weight into one [n_layers, ...] tensor
    (loop-invariant, so jit hoists the stacking out of the decode loop).
    Accepts plain or quantize_decoder_weights'd layer trees; returns
    (stacked tensors in CHAIN_KEYS order, quantized?)."""
    lps = list(dec_params["layers"])
    quant = "w_s" in lps[0]["decslf_attn"]["w_qs"]
    keys = CHAIN_KEYS_Q8 if quant else CHAIN_KEYS_F32
    return tuple(_stack_leaf(lps, *k) for k in keys), quant


def chain_supported(cfg) -> bool:
    """The chained kernel covers the standard (non-universal, non-ACT)
    decoder; universal's per-layer signal add keeps the per-layer path.
    Interpret mode (CPU) has no tiling constraint, so every suite that
    forces the kernels on CPU (tests/test_decode_flash.py chain/megastep
    parity + flash-vs-XLA e2e, test_spmd_kernels, test_tp_decode,
    test_eval_fast, and test_beam_parity's forced-kernel oracle arm vs the
    live torch reference) pins the chain path — the default on TPU — end
    to end; on-chip it is pinned by benchmarks/strict_f32_tpu.json,
    flash_tpu.json and int8_decode_tpu.json. STJEP_NO_CHAIN=1 restores
    the per-layer launches for A/B."""
    import os

    if os.environ.get("STJEP_NO_CHAIN"):
        return False
    if getattr(cfg, "transformer_type", "standard") != "standard":
        return False
    if jax.default_backend() == "cpu":
        return True
    return flash_supported(cfg.dim_model)


def _chain_unpack(wrefs, quant: bool):
    """Blocked stacked weights arrive as [1, ...] VMEM tiles; [0] drops the
    layer dim (the cores accept plain arrays — `arr[:]` is the array)."""
    w = [r[0] for r in wrefs]
    f32 = jnp.float32
    if quant:
        dq = lambda i: w[i].astype(f32) * w[i + 1]
        return (w[0], w[1], dq(2), dq(4), dq(6), dq(8),
                w[10], w[11], dq(12), dq(14),
                w[16], w[17], dq(18), w[20], dq(21), w[23])
    return tuple(w)


def _head_topk(x, lns_ref, lnb_ref, hw_ref, topk: int):
    """Final LN (eps 1e-5) -> out proj -> log_softmax -> iterative top-k
    (identical ordering to jax.lax.top_k). Returns (sc [BK, topk] f32,
    ids [BK, topk] i32) as VALUES (shared by the chain and beam kernels)."""
    f32 = jnp.float32
    xn = _ln(x, lns_ref[:], lnb_ref[:], eps=1e-5)  # torch default eps
    logits = jnp.dot(xn, hw_ref[:], preferred_element_type=f32)
    BK, V = logits.shape
    mx = jnp.max(logits, axis=-1)
    se = jnp.sum(jnp.exp(logits - mx[:, None]), axis=-1)
    lse = mx + jnp.log(se)
    iota = jax.lax.broadcasted_iota(jnp.int32, (BK, V), 1)
    cur = logits
    scs, ids = [], []
    for _k in range(topk):
        mk = jnp.max(cur, axis=-1)
        amk = jnp.min(jnp.where(cur == mk[:, None], iota, V), axis=-1)
        scs.append((mk - lse)[:, None])
        ids.append(amk[:, None].astype(jnp.int32))
        cur = jnp.where(iota == amk[:, None], -1e30, cur)
    return (jnp.concatenate(scs, axis=1), jnp.concatenate(ids, axis=1),
            logits, lse)


def _chain_kernel(pos_ref, x_ref, anc_ref, maskk_ref, memmask_ref, gid_ref,
                  *rest,
                  n_head: int, group: int, bs: int, blk: int,
                  n_layers: int, topk: int, gather: bool, quant: bool):
    from jax.experimental import pallas as pl

    n_w = len(CHAIN_KEYS_Q8 if quant else CHAIN_KEYS_F32)
    wrefs = rest[:n_w]
    (hlns_ref, hlnb_ref, hw_ref, ck_in, cv_in, mk_hbm, mv_hbm,
     sc_ref, id_ref) = rest[n_w:n_w + 9]
    k = n_w + 9
    if gather:
        glp_ref = rest[k]
        k += 1
    ck_out, cv_out = rest[k], rest[k + 1]
    (xs, kbuf, vbuf, mkbuf, mvbuf,
     sem_self, sem_wr, sem_cross) = rest[k + 2:k + 10]

    lyr = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(lyr == 0)
    def _():
        xs[:] = x_ref[:]

    (slns, slnb, swq, swk, swv, swo,
     clns, clnb, cwq, cwo,
     flns, flnb, w1, b1, w2, b2) = _chain_unpack(wrefs, quant)

    y = _self_core(
        pos_ref[0], xs[:], anc_ref, maskk_ref,
        slns, slnb, swq, swk, swv, swo,
        ck_out.at[lyr], cv_out.at[lyr], kbuf, vbuf,
        sem_self, sem_wr, n_head, group, blk)
    y = _cross_core(
        y, memmask_ref, clns, clnb, cwq, cwo,
        mk_hbm.at[lyr], mv_hbm.at[lyr], mkbuf, mvbuf, sem_cross,
        n_head, group, bs)
    y = _ffn_core(y, flns, flnb, w1, b1, w2, b2)
    xs[:] = y

    @pl.when(lyr == n_layers - 1)
    def _head():
        sc, ids, logits, lse = _head_topk(y, hlns_ref, hlnb_ref, hw_ref, topk)
        sc_ref[:] = sc
        id_ref[:] = ids
        if gather:
            BK, V = logits.shape
            iota = jax.lax.broadcasted_iota(jnp.int32, (BK, V), 1)
            gid = gid_ref[:, 0][:, None]
            glog = jnp.sum(jnp.where(iota == gid, logits, 0.0), axis=-1)
            glp_ref[:] = (glog - lse)[:, None]


def decode_chain_step_flash(
    stacked: Tuple[jnp.ndarray, ...],  # from stack_decoder_layers
    quant: bool,
    norm_params: Dict,  # final decoder LayerNorm
    out_params: Dict,  # out_tgt linear
    x_new: jnp.ndarray,  # [B*K, 1, D] embedded token (+ time signal)
    cache_k: jnp.ndarray,  # [nl, group, B, Lpad, D] stacked HBM caches
    cache_v: jnp.ndarray,
    mem_k: jnp.ndarray,  # [nl, B, Lk_pad, D] stacked cross K/V projections
    mem_v: jnp.ndarray,
    pos: jnp.ndarray,
    n_head: int,
    anc: jnp.ndarray,  # [Lpad, B*K] transposed
    group: int,
    mem_mask: jnp.ndarray,  # [Lk_pad, B] transposed
    self_mask_k: jnp.ndarray,  # [Lpad, B*K] transposed
    topk: int,
    gather_ids: Optional[jnp.ndarray] = None,  # [B*K] -> also return ref logp
):
    """One launch per decode position: all layers + the decode head.

    Returns (score_k [BK, topk], pred_k [BK, topk], [glp [BK],]
    cache_k, cache_v). Math is identical (same cores, same order) to the
    per-layer decoder_layer_step_flash sequence + decode_head[_gather]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BK, _, D = x_new.shape
    nl, _, B, L, _ = cache_k.shape
    Lk = mem_k.shape[2]
    blk, _ = stream_blocks(BK, D, jnp.dtype(cache_k.dtype).itemsize,
                           max_len=L)
    _, bs = stream_blocks(BK, D, jnp.dtype(mem_k.dtype).itemsize,
                          max_len=Lk)
    assert cache_k.shape[1] == group and BK == B * group
    assert anc.shape == (L, BK) and self_mask_k.shape == (L, BK)
    assert mem_mask.shape == (Lk, B)
    assert L % blk == 0 and Lk % bs == 0
    f32 = jnp.float32
    cdt = cache_k.dtype
    mdt = mem_k.dtype
    gather = gather_ids is not None

    gid = (gather_ids.astype(jnp.int32)[:, None] if gather
           else jnp.zeros((BK, 1), jnp.int32))
    args = (
        jnp.asarray(pos, jnp.int32).reshape(1),
        x_new[:, 0, :].astype(f32),
        anc.astype(jnp.int32),
        self_mask_k.astype(jnp.int32),
        mem_mask.astype(jnp.int32),
        gid,
    ) + tuple(stacked) + (
        norm_params["scale"], norm_params["bias"], out_params["w"],
        cache_k, cache_v, mem_k, mem_v,
    )

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = (pl.ANY if jax.default_backend() == "cpu"
           else pltpu.MemorySpace.HBM)
    anyspace = lambda: pl.BlockSpec(memory_space=hbm)

    def wspec(a):
        # per-layer block of a stacked [nl, ...] weight: Pallas prefetches
        # layer l+1's block during layer l (the overlap win of the grid)
        shape = (1,) + a.shape[1:]
        nd = len(a.shape) - 1
        return pl.BlockSpec(shape, lambda l, _n=nd: (l,) + (0,) * _n)

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [vmem() for _ in range(5)]
        + [wspec(a) for a in stacked]
        + [vmem(), vmem(), vmem()]
        + [anyspace() for _ in range(4)]
    )
    out_shape = [
        jax.ShapeDtypeStruct((BK, topk), f32),
        jax.ShapeDtypeStruct((BK, topk), jnp.int32),
    ]
    out_specs = [vmem(), vmem()]
    if gather:
        out_shape.append(jax.ShapeDtypeStruct((BK, 1), f32))
        out_specs.append(vmem())
    out_shape += [
        jax.ShapeDtypeStruct((nl, group, B, L, D), cdt),
        jax.ShapeDtypeStruct((nl, group, B, L, D), cdt),
    ]
    out_specs += [anyspace(), anyspace()]
    n_in = len(args)
    outs = pl.pallas_call(
        functools.partial(
            _chain_kernel, n_head=n_head, group=group, bs=bs, blk=blk,
            n_layers=nl, topk=topk, gather=gather, quant=quant),
        grid=(nl,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((BK, D), f32),  # xs: hidden state across grid steps
            pltpu.VMEM((2, group, B, blk, D), cdt),  # kbuf
            pltpu.VMEM((2, group, B, blk, D), cdt),  # vbuf
            pltpu.VMEM((2, B, bs, D), mdt),  # mem kbuf
            pltpu.VMEM((2, B, bs, D), mdt),  # mem vbuf
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        input_output_aliases={n_in - 4: 3 if gather else 2,
                              n_in - 3: 4 if gather else 3},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )(*args)
    if gather:
        sc, ids, glp, ck, cv = outs
        return sc, ids, glp[:, 0], ck, cv
    sc, ids, ck, cv = outs
    return sc, ids, ck, cv


# ---------------------------------------------------------------------------
# 3c. beam megastep: the ENTIRE while-loop body in one launch
# ---------------------------------------------------------------------------
#
# After the chained layer+head kernel, the remaining per-step cost at B=1 is
# the XLA glue between launches: token embed, the k^2->k top-k select, EOS
# freezing, the prefix/ancestry back-copies — ~8 small fusions, each paying
# launch overhead that dwarfs its work at beam-decode sizes. This kernel
# absorbs all of it: one launch per decode position runs embed -> all
# layers -> head -> beam bookkeeping, and the XLA while_loop only threads
# the carry and reads a one-element all-EOS flag.
#
# Beam semantics are the literal transcription of infer/beam.py's body()
# (itself pinned line-identical to ref models/Seq2seq.py:337-393):
# reshape-free — Mosaic rejects the [BK,K]->[B,K*K] lane reshape — so the
# K^2 candidates live as K row-extracted [B, K] tiles (0/1 row-select
# matmuls, exact), top-k is the same iterative first-max extraction as the
# head (lowest-flat-index ties, identical to jax.lax.top_k over the
# flattened [B, K*K]), and the gathers are one-hot matmuls (sums with one
# nonzero term — bit-exact). Column->row vector moves use a [1,1] ones
# matmul (the Mosaic-safe transpose).


def _row_of(v):
    """[N, 1] f32 -> [1, N] via a ones-matmul (Mosaic-safe transpose).

    HIGHEST precision: this and every other bookkeeping matmul SHUFFLES
    values (scores, token ids) rather than computing — the default TPU
    matmul precision rounds f32 operands to bf16 on the MXU, which
    corrupts what should be exact copies (token ids > 256 stop being
    representable; near-tie scores flip). Caught by the on-chip margin
    check (scripts/check_flash_tpu.py) — CPU interpret mode computes
    exactly and cannot see it."""
    ones = jnp.ones((1, 1), jnp.float32)
    return jax.lax.dot_general(
        ones, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _beam_step_kernel(i_ref, tok_ref, preds_in, anc_in, maskk_in,
                      memmask_ref, scores_in, eos_in, lenm_in,
                      emb_ref, tsig_ref,
                      *rest,
                      n_head: int, group: int, bs: int, blk: int,
                      n_layers: int, quant: bool, pf: float,
                      eos_id: int, pad_id: int):
    from jax.experimental import pallas as pl

    n_w = len(CHAIN_KEYS_Q8 if quant else CHAIN_KEYS_F32)
    wrefs = rest[:n_w]
    (hlns_ref, hlnb_ref, hw_ref, ck_in, cv_in, mk_hbm, mv_hbm,
     preds_out, anc_out, maskk_out, tok_out, scores_out, eos_out,
     lenm_out, flag_out, ck_out, cv_out,
     xs, anc_s,
     kbuf, vbuf, mkbuf, mvbuf, sem_self, sem_wr, sem_cross) = rest[n_w:]

    lyr = pl.program_id(0)
    f32 = jnp.float32
    i32 = jnp.int32
    K = group
    BK = preds_in.shape[0]
    B = BK // K
    L = anc_in.shape[0]
    i_cur = i_ref[0]
    pos = i_cur - 1

    @pl.when(lyr == 0)
    def _embed():
        # ancestry row `pos`: each row's own group index (the K/V written
        # this step lives in the row itself — beam.py body() dus)
        rowi = jax.lax.broadcasted_iota(i32, (L, BK), 0)
        own = jax.lax.broadcasted_iota(i32, (L, BK), 1) % K
        anc_s[:] = jnp.where(rowi == pos, own, anc_in[:])
        # token embed: one-hot MXU lookup (exact), PAD row zeroed
        tok = tok_ref[:]  # [BK, 1]
        V = emb_ref.shape[0]
        vio = jax.lax.broadcasted_iota(i32, (BK, V), 1)
        oh = (vio == tok).astype(f32)
        # HIGHEST: a one-hot lookup must return the table row EXACTLY
        # (default MXU precision would round table values to bf16,
        # diverging from the XLA arm's jnp.take)
        emb = jnp.dot(oh, emb_ref[:], preferred_element_type=f32,
                      precision=jax.lax.Precision.HIGHEST)
        emb = emb * (tok != pad_id).astype(f32)
        sig = tsig_ref[pl.ds(pos, 1), :]  # [1, D] dynamic sublane slice
        xs[:] = emb + sig

    (slns, slnb, swq, swk, swv, swo,
     clns, clnb, cwq, cwo,
     flns, flnb, w1, b1, w2, b2) = _chain_unpack(wrefs, quant)

    y = _self_core(
        pos, xs[:], anc_s, maskk_in,
        slns, slnb, swq, swk, swv, swo,
        ck_out.at[lyr], cv_out.at[lyr], kbuf, vbuf,
        sem_self, sem_wr, n_head, group, blk)
    y = _cross_core(
        y, memmask_ref, clns, clnb, cwq, cwo,
        mk_hbm.at[lyr], mv_hbm.at[lyr], mkbuf, mvbuf, sem_cross,
        n_head, group, bs)
    y = _ffn_core(y, flns, flnb, w1, b1, w2, b2)
    xs[:] = y

    @pl.when(lyr == n_layers - 1)
    def _bookkeep():
        score_k, pred_k, _, _ = _head_topk(y, hlns_ref, hlnb_ref, hw_ref, K)
        eosb = eos_in[:] > 0  # [BK, 1]
        scores = scores_in[:]
        lenm = lenm_in[:]
        lp = lenm if pf == 1.0 else lenm ** pf

        col = jax.lax.broadcasted_iota(i32, (BK, K), 1)
        sm = jnp.where(eosb, 0.0, score_k)
        sm = jnp.where((col >= 1) & eosb, -1e9, sm)
        st = (scores + sm) / lp  # [BK, K]

        # group-row extraction: cand[j][b, c] = st[b*K+j, c]
        rows_b = jax.lax.broadcasted_iota(i32, (B, BK), 1)
        bidx = jax.lax.broadcasted_iota(i32, (B, BK), 0)
        hp = jax.lax.Precision.HIGHEST  # exact value shuffling (see _row_of)
        pjs = [(rows_b == bidx * K + j).astype(f32) for j in range(K)]
        cand = [jnp.dot(pj, st, preferred_element_type=f32, precision=hp)
                for pj in pjs]
        predf = [jnp.dot(pj, pred_k.astype(f32),
                         preferred_element_type=f32, precision=hp)
                 for pj in pjs]

        # iterative top-K over the K^2 candidates, flat index j*K + c
        # (identical ordering/ties to lax.top_k over reshape(B, K*K))
        cio = jax.lax.broadcasted_iota(i32, (B, K), 1)
        KK = jnp.int32(K * K)
        work = list(cand)
        sel_sc, sel_flat = [], []
        for _slot in range(K):
            m = work[0]
            for j in range(1, K):
                m = jnp.maximum(m, work[j])
            gmax = jnp.max(m, axis=1, keepdims=True)  # [B, 1]
            flat = jnp.full((B, 1), KK, i32)
            for j in range(K):
                fj = jnp.min(
                    jnp.where(work[j] == gmax, j * K + cio, KK),
                    axis=1, keepdims=True)
                flat = jnp.minimum(flat, fj)
            sel_sc.append(gmax)
            sel_flat.append(flat)
            for j in range(K):
                work[j] = jnp.where(j * K + cio == flat, -1e30, work[j])

        # per-slot source row j and picked token
        psel, jsel = [], []
        for slot in range(K):
            j_s = sel_flat[slot] // K
            c_s = sel_flat[slot] % K
            pv = jnp.zeros((B, 1), f32)
            for j in range(K):
                lane = jnp.sum(jnp.where(cio == c_s, predf[j], 0.0),
                               axis=1, keepdims=True)
                pv = jnp.where(j_s == j, lane, pv)
            psel.append(pv)
            jsel.append(j_s.astype(f32))

        # regroup slot-major [B, 1] lists back to row-major [BK, 1]
        srow = jax.lax.broadcasted_iota(i32, (BK, B), 0)
        scol = jax.lax.broadcasted_iota(i32, (BK, B), 1)
        expand = (srow // K == scol).astype(f32)  # [BK, B]
        smod = jax.lax.broadcasted_iota(i32, (BK, 1), 0) % K

        def regroup(slot_vals):
            out = jnp.zeros((BK, 1), f32)
            for k in range(K):
                v = jnp.dot(expand, slot_vals[k],
                            preferred_element_type=f32, precision=hp)
                out = jnp.where(smod == k, v, out)
            return out

        score_sel = regroup(sel_sc)
        pred_sel = regroup(psel)  # f32 token ids (exact)
        j_sel = regroup(jsel)
        iota_s = jax.lax.broadcasted_iota(i32, (BK, 1), 0)
        src_row = (iota_s // K) * K + j_sel.astype(i32)  # [BK, 1]

        # one-hot back-copy: R[s, q] = (q == src_row[s])
        colq = jax.lax.broadcasted_iota(i32, (BK, BK), 1)
        R = (colq == src_row).astype(f32)
        ct = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=f32,
            precision=hp)

        preds_f = jnp.dot(R, preds_in[:].astype(f32),
                          preferred_element_type=f32,
                          precision=hp)  # [BK, Lbuf]
        li = jax.lax.broadcasted_iota(i32, (BK, L), 1)
        preds_f = jnp.where(li == i_cur, pred_sel, preds_f)
        preds_out[:] = preds_f.astype(i32)

        anc_g = ct(anc_s[:].astype(f32), R)  # [L, BK]: anc_s[:, src_row[s]]
        anc_out[:] = anc_g.astype(i32)

        notpad_row = _row_of((pred_sel != pad_id).astype(f32))  # [1, BK]
        rowi = jax.lax.broadcasted_iota(i32, (L, BK), 0)
        maskk_g = ct(maskk_in[:].astype(f32), R)
        maskk_g = jnp.where(rowi == i_cur, notpad_row, maskk_g)
        maskk_out[:] = maskk_g.astype(i32)

        eos_new = eosb | (pred_sel == eos_id)
        scores_out[:] = score_sel * lp
        tok_out[:] = pred_sel.astype(i32)
        eos_out[:] = eos_new.astype(i32)
        lenm_out[:] = lenm + jnp.where(eos_new, 0.0, 1.0)
        flag_out[:] = jnp.min(eos_new.astype(i32), axis=0, keepdims=True)


def decode_beam_step_flash(
    stacked: Tuple[jnp.ndarray, ...],
    quant: bool,
    norm_params: Dict,
    out_params: Dict,
    emb_table: jnp.ndarray,  # [V_dec, D] target embedding table
    time_sig: jnp.ndarray,  # [max_time, D] positional table
    i: jnp.ndarray,  # current write position (>= 2 in the loop)
    last_tok: jnp.ndarray,  # [BK, 1] i32 token emitted at i-1
    preds: jnp.ndarray,  # [BK, Lbuf] i32
    anc: jnp.ndarray,  # [Lbuf, BK] i32
    maskk: jnp.ndarray,  # [Lbuf, BK] i32 (== (preds != PAD).T)
    mem_mask: jnp.ndarray,  # [Lk_pad, B] i32
    scores: jnp.ndarray,  # [BK, 1] f32
    eos: jnp.ndarray,  # [BK, 1] i32
    lenm: jnp.ndarray,  # [BK, 1] f32
    cache_k: jnp.ndarray,  # [nl, group, B, Lpad, D]
    cache_v: jnp.ndarray,
    mem_k: jnp.ndarray,  # [nl, B, Lk_pad, D]
    mem_v: jnp.ndarray,
    n_head: int,
    group: int,
    penalty_factor: float,
):
    """One launch per beam position: embed -> layers -> head -> k^2->k
    bookkeeping. Returns (preds, anc, maskk, last_tok, scores, eos, lenm,
    all_eos_flag [1,1], cache_k, cache_v)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BK, L = preds.shape
    nl, _, B, Lc, D = cache_k.shape
    Lk = mem_k.shape[2]
    blk, _ = stream_blocks(BK, D, jnp.dtype(cache_k.dtype).itemsize,
                           max_len=Lc)
    _, bs = stream_blocks(BK, D, jnp.dtype(mem_k.dtype).itemsize,
                          max_len=Lk)
    assert L == Lc and BK == B * group
    assert anc.shape == (L, BK) and maskk.shape == (L, BK)
    f32 = jnp.float32
    i32 = jnp.int32
    cdt = cache_k.dtype
    mdt = mem_k.dtype

    args = (
        jnp.asarray(i, i32).reshape(1),
        last_tok.astype(i32),
        preds.astype(i32),
        anc.astype(i32),
        maskk.astype(i32),
        mem_mask.astype(i32),
        scores.astype(f32),
        eos.astype(i32),
        lenm.astype(f32),
        emb_table.astype(f32),
        time_sig.astype(f32),
    ) + tuple(stacked) + (
        norm_params["scale"], norm_params["bias"], out_params["w"],
        cache_k, cache_v, mem_k, mem_v,
    )

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = (pl.ANY if jax.default_backend() == "cpu"
           else pltpu.MemorySpace.HBM)
    anyspace = lambda: pl.BlockSpec(memory_space=hbm)

    def wspec(a):
        shape = (1,) + a.shape[1:]
        nd = len(a.shape) - 1
        return pl.BlockSpec(shape, lambda l, _n=nd: (l,) + (0,) * _n)

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [vmem() for _ in range(10)]
        + [wspec(a) for a in stacked]
        + [vmem(), vmem(), vmem()]
        + [anyspace() for _ in range(4)]
    )
    out_shape = (
        jax.ShapeDtypeStruct((BK, L), i32),  # preds
        jax.ShapeDtypeStruct((L, BK), i32),  # anc
        jax.ShapeDtypeStruct((L, BK), i32),  # maskk
        jax.ShapeDtypeStruct((BK, 1), i32),  # last_tok
        jax.ShapeDtypeStruct((BK, 1), f32),  # scores
        jax.ShapeDtypeStruct((BK, 1), i32),  # eos
        jax.ShapeDtypeStruct((BK, 1), f32),  # lenm
        jax.ShapeDtypeStruct((1, 1), i32),  # all-EOS flag
        jax.ShapeDtypeStruct((nl, group, B, L, D), cdt),
        jax.ShapeDtypeStruct((nl, group, B, L, D), cdt),
    )
    out_specs = tuple([vmem()] * 8 + [anyspace(), anyspace()])
    n_in = len(args)
    outs = pl.pallas_call(
        functools.partial(
            _beam_step_kernel, n_head=n_head, group=group, bs=bs, blk=blk,
            n_layers=nl, quant=quant, pf=float(penalty_factor),
            eos_id=EOS_ID, pad_id=PAD_ID),
        grid=(nl,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((BK, D), f32),  # xs
            pltpu.VMEM((L, BK), i32),  # anc_s (row `pos` updated)
            pltpu.VMEM((2, group, B, blk, D), cdt),
            pltpu.VMEM((2, group, B, blk, D), cdt),
            pltpu.VMEM((2, B, bs, D), mdt),
            pltpu.VMEM((2, B, bs, D), mdt),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        input_output_aliases={n_in - 4: 8, n_in - 3: 9},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )(*args)
    return outs


# ---------------------------------------------------------------------------
# 4. fused decode head: final LN -> output projection -> log_softmax -> top-k
# ---------------------------------------------------------------------------


def _head_kernel(x_ref, lns_ref, lnb_ref, w_ref, *rest,
                 topk: int, gather: bool, partial: bool = False):
    f32 = jnp.float32
    if not partial:
        # non-partial path: the exact _head_topk core the chain/megastep
        # kernels run — ONE definition, so the chain-vs-per-layer equality
        # (test_chain_step_matches_per_layer) cannot drift
        if gather:
            gid_ref, sc_ref, id_ref, glp_ref = rest
        else:
            sc_ref, id_ref = rest
        sc, ids, logits, lse = _head_topk(
            x_ref[:], lns_ref, lnb_ref, w_ref, topk)
        sc_ref[:] = sc
        id_ref[:] = ids
        if gather:
            BK, V = logits.shape
            iota = jax.lax.broadcasted_iota(jnp.int32, (BK, V), 1)
            gid = gid_ref[:, 0][:, None]  # [BK, 1]
            glog = jnp.sum(jnp.where(iota == gid, logits, 0.0), axis=-1)
            glp_ref[:] = (glog - lse)[:, None]
        return

    # partial (tensor-parallel) mode: emits RAW top logits plus (mx, se)
    # so the caller can form the GLOBAL logsumexp across vocab shards
    if gather:
        gid_ref, sc_ref, id_ref, glp_ref, mx_ref, se_ref = rest
    else:
        sc_ref, id_ref, mx_ref, se_ref = rest
    x = _ln(x_ref[:], lns_ref[:], lnb_ref[:], eps=1e-5)  # torch default eps
    logits = jnp.dot(x, w_ref[:], preferred_element_type=f32)
    BK, V = logits.shape
    mx = jnp.max(logits, axis=-1)
    se = jnp.sum(jnp.exp(logits - mx[:, None]), axis=-1)

    # top-k by iterative first-max extraction — identical ordering to
    # jax.lax.top_k (ties resolve to the lowest index)
    iota = jax.lax.broadcasted_iota(jnp.int32, (BK, V), 1)
    cur = logits
    scs, ids = [], []
    for _k in range(topk):
        mk = jnp.max(cur, axis=-1)  # [BK]
        amk = jnp.min(jnp.where(cur == mk[:, None], iota, V), axis=-1)
        scs.append(mk[:, None])
        ids.append(amk[:, None].astype(jnp.int32))
        cur = jnp.where(iota == amk[:, None], -1e30, cur)
    sc_ref[:] = jnp.concatenate(scs, axis=1)
    id_ref[:] = jnp.concatenate(ids, axis=1)
    mx_ref[:] = mx[:, None]
    se_ref[:] = se[:, None]
    if gather:
        # in partial mode the id arrives pre-offset into the local vocab
        # shard (out-of-shard ids match nothing and contribute 0 to the
        # psum)
        gid = gid_ref[:, 0][:, None]  # [BK, 1]
        glog = jnp.sum(jnp.where(iota == gid, logits, 0.0), axis=-1)
        glp_ref[:] = glog[:, None]


def decode_head(
    norm_params: Dict,  # final decoder LayerNorm (eps 1e-5, ref TFDec.py:58)
    out_params: Dict,  # out_tgt linear (no bias, ref Seq2seq.py init)
    x: jnp.ndarray,  # [B*K, D] decoder output BEFORE the final LayerNorm
    topk: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (score_k [B*K, topk] log-softmax scores, pred_k int32).

    One launch replacing final-LN + output matmul + log_softmax + top_k
    (4+ XLA fusions per decode step)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BK, D = x.shape
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    sc, ids = pl.pallas_call(
        functools.partial(_head_kernel, topk=topk, gather=False),
        in_specs=[vmem() for _ in range(4)],
        out_specs=(vmem(), vmem()),
        out_shape=(
            jax.ShapeDtypeStruct((BK, topk), jnp.float32),
            jax.ShapeDtypeStruct((BK, topk), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )(
        x.astype(jnp.float32),
        norm_params["scale"], norm_params["bias"],
        out_params["w"],
    )
    return sc, ids


def decode_head_gather(
    norm_params: Dict,
    out_params: Dict,
    x: jnp.ndarray,  # [B*K, D]
    topk: int,
    gather_ids: jnp.ndarray,  # [B*K] int32 token ids to read logp at
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """decode_head + the log-softmax value at `gather_ids` per row.

    Serves free-running dev evaluation: the trainer scores the reference
    token under the model's free-running distribution each step
    (ref: trainer_asr.py:_evaluate_batches NLL), so the full [BK, V] logp
    row never has to leave the kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BK, D = x.shape
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    sc, ids, glp = pl.pallas_call(
        functools.partial(_head_kernel, topk=topk, gather=True),
        in_specs=[vmem() for _ in range(5)],
        out_specs=(vmem(), vmem(), vmem()),
        out_shape=(
            jax.ShapeDtypeStruct((BK, topk), jnp.float32),
            jax.ShapeDtypeStruct((BK, topk), jnp.int32),
            jax.ShapeDtypeStruct((BK, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )(
        x.astype(jnp.float32),
        norm_params["scale"], norm_params["bias"],
        out_params["w"],
        gather_ids.astype(jnp.int32)[:, None],
    )
    return sc, ids, glp[:, 0]


def decode_head_partial(
    norm_params: Dict,
    out_params: Dict,  # vocab SHARD of out_tgt: w [D, V/n_model]
    x: jnp.ndarray,  # [B*K, D]
    topk: int,
    gather_ids: Optional[jnp.ndarray] = None,  # [B*K] ids ALREADY offset
    # into the local shard (out-of-shard rows may be any out-of-range value)
):
    """Per-vocab-shard decode head for tensor parallelism.

    Returns (sc_raw [BK, topk] RAW top logits, ids [BK, topk] LOCAL ids,
    mx [BK], se [BK], [glog_raw [BK]]): the caller (decode_flash_tp.
    decode_head_tp) merges shards into the global log-softmax top-k via
    lse = pmax/psum over the model axis and an all_gather of candidates."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BK, D = x.shape
    gather = gather_ids is not None
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    n_out = 5 if gather else 4
    out_shape = [
        jax.ShapeDtypeStruct((BK, topk), jnp.float32),
        jax.ShapeDtypeStruct((BK, topk), jnp.int32),
    ]
    if gather:
        out_shape.append(jax.ShapeDtypeStruct((BK, 1), jnp.float32))  # glog
    out_shape += [
        jax.ShapeDtypeStruct((BK, 1), jnp.float32),  # mx
        jax.ShapeDtypeStruct((BK, 1), jnp.float32),  # se
    ]
    args = [
        x.astype(jnp.float32),
        norm_params["scale"], norm_params["bias"],
        out_params["w"],
    ]
    if gather:
        args.append(gather_ids.astype(jnp.int32)[:, None])
    outs = pl.pallas_call(
        functools.partial(_head_kernel, topk=topk, gather=gather,
                          partial=True),
        in_specs=[vmem() for _ in range(len(args))],
        out_specs=tuple(vmem() for _ in range(n_out)),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )(*args)
    if gather:
        sc, ids, glog, mx, se = outs
        return sc, ids, mx[:, 0], se[:, 0], glog[:, 0]
    sc, ids, mx, se = outs
    return sc, ids, mx[:, 0], se[:, 0]
