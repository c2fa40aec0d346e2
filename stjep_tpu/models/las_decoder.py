"""LAS attention decoder (the 'attend-and-spell') as a single lax.scan.

TPU-native rebuild of the reference Dec (ref: models/Dec.py:24-438). The
reference's per-token Python loop (ref: Dec.py:205-224) becomes one scan whose
carry holds the 3-layer residual uni-LSTM state, the previous FFN cell value
(the *dynamic embedding*), the hybrid-attention cumulative mean, and the
greedy-decode bookkeeping (previous symbol, per-sequence lengths).

Key fidelity points:
- input at each step = [token embedding ; previous cell_value]
  (ref: Dec.py:377-379)
- residual connections on middle LSTM layers only (ref: Dec.py:417-418)
- dynamic embedding = FFN([attention context ; LSTM out]) (ref: Dec.py:432-434)
- length tracking: first emission of EOS-or-PAD at step idx sets
  length = idx + 1 (ref: Dec.py:334-341)
- teacher-forced inputs use embedding_dropout; free-running inputs use the
  raw embedder (ref: Dec.py:166 vs Dec.py:223)
- attention key projections are hoisted out of the scan (bilinear becomes one
  [B,1,H]x[B,H,T'] matmul per step).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from stjep_tpu.config import BOS, EOS, PAD, ModelConfig
from stjep_tpu.ops.attention import attend, attention_init, linear, linear_init, precompute_keys
from stjep_tpu.ops.lstm import lstm_cell_step, lstm_init
from stjep_tpu.ops.masks import round_up8
from stjep_tpu.ops.transformer import dropout


def embed(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Embedding lookup with padding_idx=PAD semantics: the PAD row reads as
    zero and receives no gradient (torch nn.Embedding(padding_idx=PAD))."""
    e = jnp.take(table, ids, axis=0)
    return e * (ids != PAD)[..., None].astype(e.dtype)


def embedding_init(key, vocab_size: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """torch nn.Embedding default init: N(0,1), PAD row zeroed."""
    t = jax.random.normal(key, (vocab_size, dim), dtype)
    return t.at[PAD].set(0.0)


def las_decoder_init(key, cfg: ModelConfig, dtype=jnp.float32) -> Dict:
    """Parameter tree mirroring the reference module names
    (ref: models/Dec.py:70-118) for the checkpoint converter."""
    E = cfg.enc_embedding_size
    Ha = cfg.acous_hidden_size
    Hd = cfg.dim_model  # hidden_size_dec (Seq2seq passes dim_model, ref:152)
    Hs = cfg.dim_model  # hidden_size_shared (ref: Seq2seq.py:153)
    V = cfg.enc_vocab_size
    keys = jax.random.split(key, 5 + cfg.num_unilstm_dec)
    params: Dict = {
        "embedder": embedding_init(keys[0], V, E, dtype),
        "acous_att": attention_init(
            keys[1], query_size=Hd, key_size=2 * Ha, mode=cfg.acous_att_mode,
            hidden_size=max(1, 0) or 1, dtype=dtype,
        ),
        # FFN [att ; dec] -> shared (no bias, ref: Dec.py:96-97)
        "acous_ffn": linear_init(keys[2], 2 * Ha + Hd, Hs, bias=False, dtype=dtype),
        # output projection (bias, ref: Dec.py:98)
        "acous_out": linear_init(keys[3], Hs, V, bias=True, dtype=dtype),
    }
    # residual uni-LSTM stack (ref: Dec.py:109-118)
    params["dec_l0"] = lstm_init(keys[4], E + Hs, Hd, dtype)
    for i in range(1, cfg.num_unilstm_dec):
        params[f"dec_l{i}"] = lstm_init(keys[4 + i], Hd, Hd, dtype)
    return params


class DecodeState(NamedTuple):
    h: jnp.ndarray  # [n_layers, B, Hd]
    c: jnp.ndarray  # [n_layers, B, Hd]
    cell_value: jnp.ndarray  # [B, Hs]
    prev_c: jnp.ndarray  # [B, 1, Tk] hybrid-attention cumulative mean
    symbol: jnp.ndarray  # [B] last emitted symbol (greedy)
    lengths: jnp.ndarray  # [B] int32
    ctx: jnp.ndarray  # [B, 3] last-3 emitted symbols (n-gram LM context)


def _make_drop_masks(rng, cfg: ModelConfig, n_steps: int, B: int, Ha2: int):
    """Hoisted inverted-dropout masks for every step of the decode scan.

    The masks never depend on the scan carry (dropout positions are data-
    independent), so generating them as two big vectorised draws outside
    the scan removes 4 serial rng-splits + tiny bernoulli kernels from
    every step of the recurrence's critical path. Returns
    (lstm_masks [L-1, n, B, Hd], ctx_masks [L-1, B, 1, Ha2])."""
    n = cfg.num_unilstm_dec
    keep = 1.0 - cfg.dropout
    k1, k2 = jax.random.split(rng)
    lstm_m = jax.random.bernoulli(
        k1, keep, (n_steps, n, B, cfg.dim_model)).astype(jnp.float32) / keep
    ctx_m = jax.random.bernoulli(
        k2, keep, (n_steps, B, 1, Ha2)).astype(jnp.float32) / keep
    return lstm_m, ctx_m


def _dec_lstm_stack(params, cfg, x, h, c, masks, pre0=None):
    """3-layer residual LSTM stack, one step (ref: Dec.py:384-424).

    x: [B, E+Hs] (or just the cell_value half when pre0 — the hoisted
    embedding-side layer-0 pre-activation — is given). masks: [n, B, Hd]
    inverted-dropout masks or None. Returns (out [B, Hd], h', c')."""
    n = cfg.num_unilstm_dec
    hs, cs = [], []
    if pre0 is not None:
        E = params["embedder"].shape[1]
        p0 = params["dec_l0"]
        pre = pre0 + x @ p0["w_ih"][E:] + h[0] @ p0["w_hh"]
        from stjep_tpu.ops.lstm import _gates

        h0, c0 = _gates(pre, c[0], h.shape[-1])
    else:
        h0, c0 = lstm_cell_step(params["dec_l0"], x, h[0], c[0])
    hs.append(h0)
    cs.append(c0)
    out = h0 if masks is None else h0 * masks[0].astype(h0.dtype)
    for i in range(1, n):
        inp = out
        hi, ci = lstm_cell_step(params[f"dec_l{i}"], inp, h[i], c[i])
        hs.append(hi)
        cs.append(ci)
        y = hi
        if i < n - 1:  # residual on middle layers only (ref: Dec.py:417-418)
            y = y + inp
        out = y if masks is None else y * masks[i].astype(y.dtype)
    return out, jnp.stack(hs), jnp.stack(cs)


def las_decoder_step_core(
    params: Dict,
    cfg: ModelConfig,
    pre_keys: Dict,
    att_values: jnp.ndarray,  # [B, Tk, 2Ha]
    att_mask: Optional[jnp.ndarray],  # [B, Tk] True = masked (trailing pad)
    emb_token: jnp.ndarray,  # [B, E] (or [B, 4Hd] pre-activation, see below)
    state: DecodeState,
    masks=None,  # (lstm [n,B,Hd], ctx [B,1,2Ha]) inverted-dropout or None
    emb_is_pre0: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, DecodeState]:
    """Recurrent part of one decode step (ref: Dec.py:344-434 forward_step,
    up to the dynamic embedding). Returns (cell_value [B,Hs], attn [B,Tk],
    new_state). The output head (acous_out + log_softmax) is applied by the
    caller: per step when the symbol feeds back (free running / LM fusion),
    batched over all steps after the scan when teacher-forced — the
    [B,Hs]x[Hs,V] projection is the FLOPs bulk of the step and batching it
    turns L-1 launch-bound matmuls into one MXU call.

    emb_is_pre0: emb_token is the hoisted layer-0 pre-activation
    emb @ w_ih[:E] + biases (teacher-forced path: the embedding side never
    depends on the carry, so its matmul batches over all steps outside)."""
    lstm_masks, ctx_mask = masks if masks is not None else (None, None)
    if emb_is_pre0:
        dec_out, h, c = _dec_lstm_stack(
            params, cfg, state.cell_value, state.h, state.c, lstm_masks,
            pre0=emb_token)
    else:
        x = jnp.concatenate([emb_token, state.cell_value], axis=-1)
        dec_out, h, c = _dec_lstm_stack(
            params, cfg, x, state.h, state.c, lstm_masks)

    query = dec_out[:, None, :]  # [B, 1, Hd]
    ctx, attn, c_out = attend(
        params["acous_att"], pre_keys, query, att_values, cfg.acous_att_mode,
        mask=att_mask, prev_c=state.prev_c,
    )
    att_out = (ctx if ctx_mask is None
               else ctx * ctx_mask.astype(ctx.dtype))

    ff_in = jnp.concatenate([att_out, query], axis=-1)  # [B, 1, 2Ha+Hd]
    cell_value = linear(params["acous_ffn"], ff_in)  # [B, 1, Hs]

    new_prev_c = c_out if c_out is not None else state.prev_c
    new_state = state._replace(
        h=h, c=c, cell_value=cell_value[:, 0], prev_c=new_prev_c
    )
    return cell_value[:, 0], attn[:, 0], new_state


def las_decoder_step(
    params: Dict,
    cfg: ModelConfig,
    pre_keys: Dict,
    att_values: jnp.ndarray,
    att_mask: Optional[jnp.ndarray],
    emb_token: jnp.ndarray,
    state: DecodeState,
    masks=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, DecodeState]:
    """One full decode step (ref: Dec.py:344-438 forward_step).

    Returns (cell_value [B,Hs], logp [B,V], attn [B,Tk], new_state)."""
    cell_value, attn, new_state = las_decoder_step_core(
        params, cfg, pre_keys, att_values, att_mask, emb_token, state,
        masks=masks
    )
    logits = linear(params["acous_out"], cell_value)  # [B, V]
    logp = jax.nn.log_softmax(logits, axis=-1)
    return cell_value, logp, attn, new_state


def _greedy_update(step, logp, lengths):
    """Greedy symbol + length tracking (ref: Dec.py:320-341)."""
    symbols = jnp.argmax(logp, axis=-1)
    eos_b = (symbols == EOS) | (symbols == PAD)
    update = (lengths > step) & eos_b
    lengths = jnp.where(update, step + 1, lengths)
    return symbols, lengths


def las_decoder_forward(
    params: Dict,
    cfg: ModelConfig,
    acous_outputs: jnp.ndarray,  # [B, Tk, 2Ha] pyramid output
    acous_lens: Optional[jnp.ndarray] = None,  # [B] raw frame lengths
    tgt: Optional[jnp.ndarray] = None,  # [B, L] token ids (teacher forcing)
    use_teacher_forcing: bool = False,
    teacher_forcing_ratio: Optional[float] = None,
    max_seq_len: Optional[int] = None,
    rng: Optional[jax.Array] = None,
    is_training: bool = False,
    lm_fuse=None,
    ref_tokens: Optional[jnp.ndarray] = None,
    want_logps: bool = True,
    flash_ok: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full decode over max_seq_len - 1 steps (ref: Dec.py:130-233).

    Returns (sequence_embs [B, L-1, Hs], logps [B, L-1, V],
             symbols [B, L-1], lengths [B]).

    ref_tokens [B, >=L-1]: when given, the logps slot of the return holds
    the PICKED logps [B, L-1] instead — the log-softmax value at
    ref_tokens[:, step] per step (token slot conventions match
    take_along_axis over the full buffer; dev NLL reads exactly this).
    want_logps=False drops the [B, L-1, V] buffer from the scan outputs
    entirely (eval paths that only need embs/preds/lengths), and — for
    free-running eval with bilinear attention on TPU — routes the whole
    loop through the fused Pallas decode kernel (ops/las_flash.py).

    teacher_forcing_ratio, when given, reproduces the reference's per-batch
    coin flip `random.random() < ratio` (ref: Dec.py:196): ratio >= 1.0 is
    statically teacher-forced, ratio <= 0.0 statically free-running
    (random.random() lies in [0, 1)), and anything in between draws one
    bernoulli(ratio) from `rng` and selects the step input accordingly —
    traced, so one compilation covers both outcomes.
    """
    B, Tk, _ = acous_outputs.shape
    tf_coin = None  # traced per-batch teacher-forcing decision
    if teacher_forcing_ratio is not None:
        if teacher_forcing_ratio >= 1.0:
            use_teacher_forcing = True
        elif teacher_forcing_ratio <= 0.0:
            use_teacher_forcing = False
        else:
            assert tgt is not None  # ref: Las.py:107
            assert rng is not None, "stochastic teacher forcing needs rng"
            rng, k = jax.random.split(rng)
            tf_coin = jax.random.bernoulli(k, teacher_forcing_ratio)
            use_teacher_forcing = True  # embeds tgt; body selects per coin
    if tgt is None:
        assert not use_teacher_forcing
        L = max_seq_len if max_seq_len is not None else cfg.max_seq_len_src
        tgt = jnp.full((B, L), BOS, dtype=jnp.int32)
    L = tgt.shape[1]
    if rng is None:
        rng = jax.random.PRNGKey(0)

    # attention mask over trailing pad of the reduced sequence
    # (ref: Dec.py:173-179): True = masked out
    if acous_lens is not None:
        lens8 = round_up8(acous_lens.astype(jnp.int32)) // 8
        att_mask = jnp.arange(Tk)[None, :] >= lens8[:, None]
    else:
        att_mask = None

    pre_keys = precompute_keys(params["acous_att"], acous_outputs, cfg.acous_att_mode)

    # fused free-running decode kernel (ops/las_flash.py): eval-only (no
    # gradients), bilinear attention, no LM fusion, and the caller must not
    # need the full [B, L-1, V] logp buffer (picked logps are fine)
    free_running = tf_coin is None and not use_teacher_forcing
    # flash_ok is an explicit caller opt-in: the kernel has no VJP, so only
    # pure-eval paths (no gradient through the outputs) may enable it
    if (flash_ok and free_running and not is_training and lm_fuse is None
            and not want_logps):
        import os

        from stjep_tpu.ops.las_flash import las_flash_supported

        from stjep_tpu.utils.misc import flash_kernels_disabled

        if las_flash_supported(cfg) and not flash_kernels_disabled() and (
            jax.default_backend() != "cpu"
            or os.environ.get("STJEP_FORCE_FLASH") == "1"
        ):
            from stjep_tpu.parallel.spmd import las_greedy_flash_dp

            lens_k = (lens8 if acous_lens is not None
                      else jnp.full((B,), Tk, jnp.int32))
            refs = None
            if ref_tokens is not None:
                # picked[:, j] = logps[:, j, ref_tokens[:, j]] — ref_tokens
                # shares the output-slot alignment of the logps buffer
                r = ref_tokens[:, : L - 1]
                refs = jnp.pad(r, ((0, 0), (0, L - 1 - r.shape[1])))
            embs, preds, picked = las_greedy_flash_dp(
                params, cfg, pre_keys["wk"], acous_outputs, lens_k,
                tgt[:, 0], L - 1, ref_tokens=refs,
            )
            eos_bt = (preds == EOS) | (preds == PAD)
            any_eos = jnp.any(eos_bt, axis=1)
            first = jnp.argmax(eos_bt, axis=1).astype(jnp.int32)
            lengths = jnp.where(any_eos, first + 1, jnp.int32(L))
            return embs, (picked if ref_tokens is not None else None), \
                preds, lengths

    # teacher-forced inputs get embedding_dropout (ref: Dec.py:166)
    emb_tgt = embed(params["embedder"], tgt)
    if is_training and cfg.embedding_dropout > 0.0:
        rng, k = jax.random.split(rng)
        emb_tgt = dropout(k, emb_tgt, cfg.embedding_dropout, deterministic=False)

    Hd = cfg.dim_model
    Hs = cfg.dim_model
    init = DecodeState(
        h=jnp.zeros((cfg.num_unilstm_dec, B, Hd), acous_outputs.dtype),
        c=jnp.zeros((cfg.num_unilstm_dec, B, Hd), acous_outputs.dtype),
        cell_value=jnp.zeros((B, Hs), acous_outputs.dtype),
        prev_c=jnp.zeros((B, 1, Tk), acous_outputs.dtype),
        symbol=tgt[:, 0],  # BOS
        lengths=jnp.full((B,), L, dtype=jnp.int32),
        ctx=jnp.zeros((B, 3), dtype=jnp.int32),
    )

    emb_steps = jnp.swapaxes(emb_tgt[:, : L - 1], 0, 1)  # [L-1, B, E]
    steps = jnp.arange(L - 1)

    # dropout masks for every step, hoisted (see _make_drop_masks)
    use_drop = is_training and cfg.dropout > 0.0
    if use_drop:
        rng, k = jax.random.split(rng)
        step_masks = _make_drop_masks(k, cfg, L - 1, B,
                                      acous_outputs.shape[-1])
    else:
        step_masks = None

    def masks_at(xs_masks):
        return xs_masks if use_drop else None

    if tf_coin is None and use_teacher_forcing and lm_fuse is None:
        # Static teacher forcing: no symbol feedback, so the output head
        # (acous_out [Hs, V] + log_softmax) moves OUT of the scan — one
        # [B*(L-1), Hs] x [Hs, V] MXU matmul instead of L-1 launch-bound
        # per-step projections. This is the training hot path
        # (SURVEY §3.1 HOTTEST); per-row math is unchanged, so outputs match
        # the stepped head. The embedding-side layer-0 pre-activation is
        # hoisted too: one [B*(L-1), E] x [E, 4Hd] matmul.
        p0 = params["dec_l0"]
        E = params["embedder"].shape[1]
        pre0_steps = (emb_steps @ p0["w_ih"][:E]
                      + p0["b_ih"] + p0["b_hh"])  # [L-1, B, 4Hd]

        import os

        from stjep_tpu.ops.las_tf_flash import las_tf_flash_supported

        from stjep_tpu.utils.misc import flash_kernels_disabled

        use_tf_kernel = (
            cfg.num_unilstm_dec == 3
            and cfg.acous_att_mode == "bilinear"
            and las_tf_flash_supported(cfg)
            and not flash_kernels_disabled()
            and (jax.default_backend() != "cpu"
                 or os.environ.get("STJEP_FORCE_FLASH") == "1")
        )
        if use_tf_kernel:
            # fused Pallas scan with a fused reverse-time backward
            # (ops/las_tf_flash.py) — differentiable via custom_vjp, so the
            # training path uses it too
            from stjep_tpu.parallel.spmd import las_tf_scan_dp

            stack = {k: params[k] for k in ("dec_l0", "dec_l1", "dec_l2")}
            lens_k = (lens8 if acous_lens is not None
                      else jnp.full((B,), Tk, jnp.int32))
            embs = las_tf_scan_dp(
                stack, params["acous_att"]["linear_att_w"]["w"],
                params["acous_ffn"]["w"], pre0_steps, acous_outputs,
                lens_k, step_masks)
        else:
            def body_tf(state, xs):
                pre0_t, m = ((xs[0], masks_at(xs[1:])) if use_drop
                             else (xs[0], None))
                cell_value, _attn, state = las_decoder_step_core(
                    params, cfg, pre_keys, acous_outputs, att_mask, pre0_t,
                    state, masks=m, emb_is_pre0=True,
                )
                return state, cell_value

            xs = (pre0_steps,) + (step_masks if use_drop else ())
            _final, embs = jax.lax.scan(body_tf, init, xs)
        embs_bt = jnp.swapaxes(embs, 0, 1)  # [B, L-1, Hs]
        head_in = embs_bt
        if ref_tokens is not None:
            # training NLL path: the fused LAS kernel emits f32 embedding
            # streams, and an f32 head input makes the [B, L-1, 30k] logits
            # materialise f32 (510 MB) with every reduce re-reading it —
            # measured 3x ~490 us/step. Matching the weight dtype (bf16
            # under --dtype bfloat16; a no-op at f32) keeps the logits at
            # one bf16 materialisation. Only the HEAD input is cast — the
            # returned dynamic embeddings (the ST bridge) stay f32 — and
            # parity/eval paths are untouched.
            head_in = embs_bt.astype(params["acous_out"]["w"].dtype)
        logits = linear(params["acous_out"], head_in)
        # argmax of the raw logits == argmax of log_softmax (a per-row
        # monotone shift); reading the [B, L-1, V] logits once instead of a
        # materialised log-softmax saves a full f32 [.., 30k] HBM pass
        symbols_bt = jnp.argmax(logits, axis=-1)
        # vectorised _greedy_update (ref: Dec.py:320-341): length = first
        # emission of EOS-or-PAD + 1, else the full L
        eos_bt = (symbols_bt == EOS) | (symbols_bt == PAD)
        any_eos = jnp.any(eos_bt, axis=1)
        first = jnp.argmax(eos_bt, axis=1).astype(jnp.int32)
        lengths = jnp.where(any_eos, first + 1, jnp.int32(L))
        if ref_tokens is not None:
            # picked log-softmax via gather - logsumexp, never materialising
            # the [B, L-1, V] log-probability tensor (the f32 write+reads
            # were ~2.4 ms/step of the B=32 flagship train step,
            # benchmarks/train_profile_b32.json). The f32 casts live INSIDE
            # single-consumer reduce/gather chains so they fuse — a whole-
            # tensor `.astype(f32)` here makes XLA materialise a second
            # [.., V] f32 copy of the logits (measured +1.4 ms)
            m32 = jnp.max(logits, axis=-1).astype(jnp.float32)
            se = jnp.sum(
                jnp.exp(logits.astype(jnp.float32) - m32[..., None]),
                axis=-1)
            lse = m32 + jnp.log(se)
            pickedl = jnp.take_along_axis(
                logits, ref_tokens[:, : L - 1].astype(jnp.int32)[:, :, None],
                axis=2)[:, :, 0].astype(jnp.float32)
            return embs_bt, pickedl - lse, symbols_bt, lengths
        if not want_logps:
            return embs_bt, None, symbols_bt, lengths
        logps_bt = jax.nn.log_softmax(logits, axis=-1)
        return embs_bt, logps_bt, symbols_bt, lengths

    def body(state, xs):
        step, emb_tf = xs[0], xs[1]
        m = masks_at(xs[2:])
        if tf_coin is not None:
            # per-batch coin (ref: Dec.py:196): teacher-forced input (with
            # embedding_dropout already applied) vs raw embed of the previous
            # greedy symbol, selected by one traced bernoulli draw.
            emb_fr = embed(params["embedder"], state.symbol)
            emb_in = jnp.where(tf_coin, emb_tf, emb_fr)
        elif use_teacher_forcing:
            emb_in = emb_tf
        else:
            # free-running: raw embedder on previous greedy symbol
            emb_in = embed(params["embedder"], state.symbol)
        cell_value, logp, attn, state = las_decoder_step(
            params, cfg, pre_keys, acous_outputs, att_mask, emb_in, state,
            masks=m,
        )
        if lm_fuse is not None and getattr(lm_fuse, "on_device", False):
            # hashed n-gram probe table in HBM (infer/lm_table.py): pure
            # gathers, no host sync
            logp = lm_fuse(logp, state.ctx, step)
        elif lm_fuse is not None:
            # n-gram LM shallow fusion over top candidates: the reference's
            # per-candidate host loop (ref: Dec.py:236-317) becomes a
            # pure_callback per step.
            logp = jax.pure_callback(
                lm_fuse,
                jax.ShapeDtypeStruct(logp.shape, logp.dtype),
                logp, state.ctx, step,
                vmap_method="sequential",
            )
        symbols, lengths = _greedy_update(step, logp, state.lengths)
        ctx = jnp.concatenate(
            [state.ctx[:, 1:], symbols[:, None].astype(jnp.int32)], axis=1)
        state = state._replace(symbol=symbols, lengths=lengths, ctx=ctx)
        ys = {"embs": cell_value, "symbols": symbols}
        if ref_tokens is not None:
            gid = jax.lax.dynamic_index_in_dim(refs_steps, step, keepdims=False)
            ys["picked"] = jnp.take_along_axis(
                logp, gid[:, None], axis=1)[:, 0]
        elif want_logps:
            ys["logps"] = logp
        return state, ys

    refs_steps = None
    if ref_tokens is not None:
        r = ref_tokens[:, : L - 1].astype(jnp.int32)
        refs_steps = jnp.pad(r, ((0, 0), (0, L - 1 - r.shape[1]))).T  # [L-1,B]
    xs = (steps, emb_steps) + (step_masks if use_drop else ())
    final, ys = jax.lax.scan(body, init, xs)
    if ref_tokens is not None:
        logps_out = jnp.swapaxes(ys["picked"], 0, 1)  # [B, L-1] picked
    elif want_logps:
        logps_out = jnp.swapaxes(ys["logps"], 0, 1)  # [B, L-1, V]
    else:
        logps_out = None
    return (
        jnp.swapaxes(ys["embs"], 0, 1),  # [B, L-1, Hs]
        logps_out,
        jnp.swapaxes(ys["symbols"], 0, 1),  # [B, L-1]
        final.lengths,
    )
