"""Benchmark: flagship ST beam decode + train step on the local accelerator.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The baseline denominator is the reference PyTorch CPU implementation measured
by scripts/measure_reference_baseline.py on the SAME workload shapes and
recorded in benchmarks/reference_baseline.json (the reference publishes no
numbers of its own — BASELINE.md).

Axon-platform note: block_until_ready is not reliable through the remote
tunnel, so every timed iteration forces completion with a scalar readback;
the ~28 ms round-trip is amortised by batching (and is part of real serving
latency anyway).
"""

import json
import os
import time

ROOT = os.path.dirname(os.path.abspath(__file__))

# Flagship workload (matches scripts/measure_reference_baseline.py)
BENCH = dict(
    enc_vocab=30000,
    dec_vocab=200,  # char-level De targets
    batch=16,
    frames=1504,  # ~15s utterances, acous_max_len train regime, mult of 8
    acous_dim=40,
    acous_hidden=256,
    dim_model=512,
    dim_ff=1024,
    heads=8,
    layers=6,
    max_src=90,
    decode_len=150,
    beam=5,
)


def analytic_train_flop_parts(cfg, B, T, Ls, Lt):
    """Per-component analytic matmul FLOPs of one ASR_ST train step
    (fwd+bwd+apply), as a dict. Counts the MXU work only (matmul MACs x 2;
    elementwise/softmax ignored), backward ~= 2x forward, so train = 3x
    forward. Summed by analytic_train_flops for the MFU field; consumed
    per-component by scripts/measure_sol_decomposition.py."""
    H = cfg.acous_hidden_size
    D = cfg.dim_model
    F = cfg.dim_feedforward
    E = cfg.enc_embedding_size
    Ve = cfg.enc_vocab_size
    Vd = cfg.dec_vocab_size
    parts = {}
    # pyramidal BiLSTM: per step/direction (in*4H + H*4H) MACs; input doubles
    # (concat adjacent pairs of the 2H output) while T halves each layer
    t, d = T, cfg.acous_dim
    macs = 0.0
    for _ in range(cfg.num_pyramid_layers):
        macs += 2 * t * B * (d * 4 * H + H * 4 * H)  # x2 directions
        t //= 2
        d = 4 * H
    parts["pyramid"] = macs
    Tk = T // 8
    # LAS decoder: Ls-1 steps of 3-layer LSTM + bilinear att + FFN + out proj
    steps = Ls - 1
    lstm = (E + D) * 4 * D + D * 4 * D + 2 * (2 * D * 4 * D)
    att = Tk * 2 * H * D / max(steps, 1) + Tk * D  # keys hoisted + per-step dot
    ffn = (2 * H + D) * D
    outp = D * Ve
    parts["las_decoder"] = steps * B * (lstm + att + ffn + outp)
    # static+dynamic projection
    parts["src_emb_proj"] = B * (Ls - 1) * (E + D) * D
    # transformer encoder over Ls-1
    Lse = Ls - 1
    parts["tf_encoder"] = cfg.enc_layers * B * (
        Lse * (4 * D * D + 2 * D * F) + 2 * Lse * Lse * D)
    # transformer decoder over Lt (self + cross + FFN) + vocab projection
    parts["tf_decoder"] = cfg.dec_layers * B * (
        Lt * (4 * D * D + 2 * D * F) + 2 * Lt * Lt * D
        + Lt * 2 * D * D + Lse * 2 * D * D + 2 * Lt * Lse * D
    )
    parts["st_head"] = B * Lt * D * Vd
    # MACs -> FLOPs (x2), fwd+bwd+apply ~= 3x fwd
    return {k: 3.0 * 2.0 * v for k, v in parts.items()}


def analytic_train_flops(cfg, B, T, Ls, Lt):
    """Total analytic train-step FLOPs (see analytic_train_flop_parts)."""
    return sum(analytic_train_flop_parts(cfg, B, T, Ls, Lt).values())


# TPU v5e peak: 197 TFLOP/s bf16 (f32 runs through the same MXU via passes;
# we report MFU against the bf16 peak for both, i.e. a conservative number)
V5E_PEAK_FLOPS = 197e12


def bench_tpu(train_iters: int = 10, train_repeats: int = 3):
    """Returns a dict of measured throughputs. All rows are medians over
    repeated pipelined windows (30 decode batches, 3x10 train steps) —
    VERDICT r1 asked for >=20 decode iterations and median reporting; the
    windowing additionally keeps the ~28 ms axon-tunnel round-trip out of
    the per-batch cost, matching how a real serving/training loop runs."""
    import numpy as np

    import jax

    # persistent compilation cache: first bench run pays the remote compiles,
    # later runs (and rounds) reuse them
    from stjep_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    from functools import partial

    from stjep_tpu.config import BOS, ModelConfig
    from stjep_tpu.infer.forward import forward_translate
    from stjep_tpu.models.seq2seq import forward_train, init_seq2seq

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
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    B = b["batch"]
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, b["frames"], b["acous_dim"]).astype(np.float32))
    lens_np = rng.randint(b["frames"] // 2, b["frames"] - 8, size=(B,)).astype(np.int32)
    lens_np[0] = b["frames"] - 8  # round_up8(max) == frames, as the ref data
    lens = jnp.asarray(lens_np)   # pipeline guarantees (ref: dataset.py:179)
    src = jnp.asarray(
        rng.randint(5, b["enc_vocab"], size=(B, b["max_src"])).astype(np.int32)
    ).at[:, 0].set(BOS)
    tgt = jnp.asarray(
        rng.randint(5, b["dec_vocab"], size=(B, b["decode_len"])).astype(np.int32)
    ).at[:, 0].set(BOS)

    # ---- beam decode (ST: LAS greedy + transformer beam) ----
    # Timed like the train step: dispatch a WINDOW of async calls and drain
    # once at the end. A serving loop pipelines requests the same way; the
    # earlier per-iteration readback charged one full ~28 ms tunnel
    # round-trip to every batch (25% of the f32 number) and its jitter
    # dominated round-to-round comparisons (VERDICT r1 #4).
    def _measure_decode(cache_dtype, d_feats, d_lens, nb,
                        win: int = 5, repeats: int = 6):
        dec = jax.jit(partial(
            forward_translate, cfg=cfg, mode="ST", beam_width=b["beam"],
            penalty_factor=1.0, max_seq_len=b["decode_len"],
            cache_dtype=cache_dtype,
        ))
        for _w in range(2):  # compile, then absorb layout recompiles
            out = dec(params, acous_feats=d_feats, acous_lens=d_lens)
            _ = int(np.asarray(out[0, 0]))
        rates = []
        for _r in range(repeats):
            t0 = time.perf_counter()
            for _i in range(win):
                out = dec(params, acous_feats=d_feats, acous_lens=d_lens)
            _ = int(np.asarray(out[0, 1]))
            rates.append(win * nb / (time.perf_counter() - t0))
        return float(np.median(rates))

    utt_per_s = _measure_decode(None, feats, lens, B)  # f32 parity mode
    utt_per_s_bf16 = _measure_decode(jnp.bfloat16, feats, lens, B)

    # single-request serving latency: BLOCKING call at B=1 (median over 20;
    # includes the tunnel round-trip on axon — probe_serving_latency.py
    # reports the rtt-subtracted device-side number)
    dec1 = jax.jit(partial(
        forward_translate, cfg=cfg, mode="ST", beam_width=b["beam"],
        penalty_factor=1.0, max_seq_len=b["decode_len"],
        cache_dtype=jnp.bfloat16,
    ))
    f1, l1 = feats[:1], lens[:1]  # lens[0] == frames - 8 (set above)
    for _ in range(2):
        out = dec1(params, acous_feats=f1, acous_lens=l1)
        _ = int(np.asarray(out[0, 0]))
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        out = dec1(params, acous_feats=f1, acous_lens=l1)
        _ = int(np.asarray(out[0, 1]))
        lat.append((time.perf_counter() - t0) * 1000)
    latency_b1_ms = float(np.median(lat))

    # serving-throughput mode: larger batch amortises per-step weight
    # streaming (the reference baseline is matched-workload B=16 above)
    B4 = 4 * B
    feats4 = jnp.tile(feats, (4, 1, 1))
    lens4 = jnp.tile(lens, (4,))
    utt_per_s_serving = _measure_decode(jnp.bfloat16, feats4, lens4, B4)

    # ---- train step (ASR_ST fwd+bwd+adam) ----
    from stjep_tpu.train.optim import make_optimizer, set_lr
    import optax

    from stjep_tpu.utils.misc import root_key

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

    def _timed_train(step, params, opt_state, args):
        """One timing protocol for every train row. Warm TWO steps: the
        first compiles, the second absorbs the one-time recompile when the
        step's outputs come back with compiler-chosen layouts that differ
        from the freshly-initialised arrays. Then time the async-dispatched
        pipeline and drain once per window: a real training loop does not
        read the loss back every step, and on axon a per-step readback adds
        a ~28 ms tunnel round-trip to every iteration. Median rate across
        repeated windows (tunnel speed varies)."""
        for w in (1, 2):
            params, opt_state, loss = step(params, opt_state, *args,
                                           root_key(w))
            _ = float(loss)
        rates = []
        for _r in range(train_repeats):
            t0 = time.perf_counter()
            for i in range(train_iters):
                params, opt_state, loss = step(params, opt_state, *args,
                                               root_key(i))
            _ = float(loss)
            rates.append(train_iters / (time.perf_counter() - t0))
        return float(np.median(rates))

    step = jax.jit(train_step, donate_argnums=(0, 1))
    step_per_s = _timed_train(step, params, opt_state,
                              (feats, lens, src, tgt))
    params = opt_state = None  # donated

    # ---- bf16 train step (the --dtype bfloat16 CLI path: bf16 params +
    # activations, f32 Adam moments via optax's dtype-preserving update) ----
    params16 = init_seq2seq(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    opt_state16 = set_lr(tx.init(params16), 1e-4)
    step16 = jax.jit(train_step, donate_argnums=(0, 1))
    feats16 = feats.astype(jnp.bfloat16)  # the bf16 CLI stages bf16 features
    step_bf16_per_s = _timed_train(step16, params16, opt_state16,
                                   (feats16, lens, src, tgt))
    params16 = opt_state16 = None  # donated

    # ---- batch-32 train step: the LSTM recurrences are latency-bound on
    # their dependent chains (README analysis), so doubling rows costs far
    # less than 2x wall time — samples/s demonstrates the headroom recipes
    # get from a larger per-device minibatch
    feats32 = jnp.tile(feats, (2, 1, 1))
    lens32 = jnp.tile(lens, (2,))
    src32 = jnp.tile(src, (2, 1))
    tgt32 = jnp.tile(tgt, (2, 1))
    params32 = init_seq2seq(jax.random.PRNGKey(0), cfg)
    opt_state32 = set_lr(tx.init(params32), 1e-4)
    step32 = jax.jit(train_step, donate_argnums=(0, 1))
    step_b32_per_s = _timed_train(step32, params32, opt_state32,
                                  (feats32, lens32, src32, tgt32))
    params32 = opt_state32 = None  # donated

    # ---- bf16 batch-32 (the recipe throughput point: ROADMAP Next #1/#2)
    feats32h = feats32.astype(jnp.bfloat16)
    params32h = init_seq2seq(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    opt_state32h = set_lr(tx.init(params32h), 1e-4)
    step32h = jax.jit(train_step, donate_argnums=(0, 1))
    step_b32h_per_s = _timed_train(step32h, params32h, opt_state32h,
                                   (feats32h, lens32, src32, tgt32))
    params32h = opt_state32h = None  # donated

    # ---- bf16 batch-32 through the 8-step window executor (the trainer's
    # --train_window surface): ONE dispatch per 8 steps. The device-side
    # step is ~27 ms (benchmarks/train_profile_b32.json) while a single
    # dispatched call adds 3-8 ms of host/tunnel dispatch on this 1-CPU
    # host — the window amortises it to <1 ms/step.
    WIN = 8

    def win_step(params, opt_state, feats, lens, src, tgt, rngs):
        def body(c, k):
            p, o = c
            p, o, l = train_step(p, o, feats, lens, src, tgt, k)
            return (p, o), l

        (params, opt_state), ls = jax.lax.scan(
            body, (params, opt_state), rngs)
        return params, opt_state, ls[-1]

    params32w = init_seq2seq(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    opt_state32w = set_lr(tx.init(params32w), 1e-4)
    steww = jax.jit(win_step, donate_argnums=(0, 1))
    args_w = (feats32h, lens32, src32, tgt32)
    for w in (1, 2):
        params32w, opt_state32w, loss = steww(
            params32w, opt_state32w, *args_w, jax.random.split(root_key(w), WIN))
        _ = float(loss)
    rates = []
    for _r in range(train_repeats):
        t0 = time.perf_counter()
        for i in range(max(2, train_iters // WIN)):
            params32w, opt_state32w, loss = steww(
                params32w, opt_state32w, *args_w,
                jax.random.split(root_key(i), WIN))
        _ = float(loss)
        rates.append(max(2, train_iters // WIN) * WIN
                     / (time.perf_counter() - t0))
    step_b32w_per_s = float(np.median(rates))
    params32w = opt_state32w = None  # donated

    flops = analytic_train_flops(cfg, B, b["frames"], b["max_src"],
                                 b["decode_len"])
    mfu = flops * step_per_s / V5E_PEAK_FLOPS
    mfu_bf16 = flops * step_bf16_per_s / V5E_PEAK_FLOPS
    mfu_b32 = 2 * flops * step_b32_per_s / V5E_PEAK_FLOPS
    mfu_b32_bf16 = 2 * flops * step_b32h_per_s / V5E_PEAK_FLOPS
    mfu_b32_win8 = 2 * flops * step_b32w_per_s / V5E_PEAK_FLOPS

    return (utt_per_s, utt_per_s_bf16, utt_per_s_serving, step_per_s,
            step_bf16_per_s, mfu, mfu_bf16, step_b32_per_s, mfu_b32,
            step_b32h_per_s, mfu_b32_bf16, step_b32w_per_s, mfu_b32_win8,
            latency_b1_ms)


def main():
    (utt_per_s, utt_per_s_bf16, utt_per_s_serving, step_per_s,
     step_bf16_per_s, mfu, mfu_bf16, step_b32_per_s, mfu_b32,
     step_b32h_per_s, mfu_b32_bf16, step_b32w_per_s, mfu_b32_win8,
     latency_b1_ms) = bench_tpu()

    baseline_path = os.path.join(ROOT, "benchmarks", "reference_baseline.json")
    vs_baseline = None
    extra = {}
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("beam_decode_utt_per_s"):
            vs_baseline = utt_per_s / base["beam_decode_utt_per_s"]
        if base.get("train_step_per_s"):
            extra["train_step_vs_baseline"] = step_per_s / base["train_step_per_s"]

    result = {
        "metric": "beam_decode_utterances_per_sec",
        "value": round(utt_per_s, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "train_step_per_s": round(step_per_s, 4),
        "train_step_bf16_per_s": round(step_bf16_per_s, 4),
        "beam_decode_bf16_cache_utt_per_s": round(utt_per_s_bf16, 3),
        "beam_decode_serving_b64_utt_per_s": round(utt_per_s_serving, 3),
        "train_step_b32_per_s": round(step_b32_per_s, 4),
        "train_b32_samples_per_s": round(32 * step_b32_per_s, 2),
        "train_b32_bf16_samples_per_s": round(32 * step_b32h_per_s, 2),
        "train_b32_bf16_win8_samples_per_s": round(32 * step_b32w_per_s, 2),
        "mfu": round(mfu, 4),
        "mfu_bf16": round(mfu_bf16, 4),
        "mfu_b32": round(mfu_b32, 4),
        "mfu_b32_bf16": round(mfu_b32_bf16, 4),
        "mfu_b32_win8": round(mfu_b32_win8, 4),
        "serving_latency_b1_ms": round(latency_b1_ms, 1),
        **extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
