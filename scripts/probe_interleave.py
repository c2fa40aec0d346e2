"""Probe: interleaved minibatch pairs inside the grad-accum scan.

ROADMAP #8 established the flagship train step is latency-bound on the
LSTM recurrences' dependent chains (pyramid + LAS decoder ~55% of the
step), and probe_train_batch.py showed widening the batch past 32 buys
nothing — one wider matmul does not shorten the chain. The untested lever
(VERDICT r2, next #4): put TWO independent minibatches in one grad-accum
scan iteration as SEPARATE subgraphs (not concatenated), so XLA may
overlap one batch's MXU work with the other's recurrence-issue latency.

Arms at flagship ASR_ST dims, total macro batch 32:
  wide32   - 1 scan iteration,  minibatch 32            (today's default)
  scan2x16 - 2 scan iterations, minibatch 16            (today's partition=2)
  inter2x16- 1 scan iteration, two independent 16-row fwd+bwd per body,
             grads summed (identical gradient math to scan2x16)

Accept if inter2x16 beats wide32 by >10%; otherwise record the negative.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_interleave.py
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

WARMUP = 3
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import bench as bb
    from stjep_tpu.config import BOS, ModelConfig
    from stjep_tpu.models.seq2seq import forward_train, init_seq2seq
    from stjep_tpu.ops.losses import nll_loss_masked, normalise
    from stjep_tpu.config import PAD
    from stjep_tpu.train.optim import make_optimizer
    from stjep_tpu.train.policies import trainable_mask
    from stjep_tpu.utils import misc as _misc

    b = bb.BENCH
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
    tx = make_optimizer(1.0, trainable_mask(params, lambda n: False))
    opt_state = tx.init(params)

    B, T = 32, b["frames"]
    rng = np.random.RandomState(0)
    feats = rng.randn(B, T, cfg.acous_dim).astype(np.float32)
    lens = np.full((B,), T - 8, np.int32)
    src = rng.randint(5, cfg.enc_vocab_size, (B, cfg.max_seq_len_src))
    tgt = rng.randint(5, cfg.dec_vocab_size, (B, cfg.max_seq_len_tgt))
    src[:, 0] = tgt[:, 0] = BOS
    src = src.astype(np.int32)
    tgt = tgt.astype(np.int32)

    def loss_fn(p, mb, rng):
        out = forward_train(p, cfg, "ASR_ST", src=mb["src"], tgt=mb["tgt"],
                            acous_feats=mb["feats"], acous_lens=mb["lens"],
                            rng=rng, is_training=True)
        total = 0.0
        for logps, targets in ((out["logps_asr"], mb["src"][:, 1:]),
                               (out["logps_st"][:, :-1, :], mb["tgt"][:, 1:])):
            V = logps.shape[-1]
            mask = targets != PAD
            s, norm = nll_loss_masked(logps.reshape(-1, V),
                                      targets.reshape(-1), mask.reshape(-1))
            total = total + normalise(s, norm)
        return total

    def update(p, o, grads):
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o

    def make_wide(n_mini):
        """Standard grad-accum scan over n_mini minibatches of B/n_mini."""
        mini = B // n_mini

        def step(p, o, macro, rng):
            rngs = jax.random.split(rng, n_mini)

            def body(g, xs):
                mb, k = xs
                return jax.tree_util.tree_map(
                    jnp.add, g, jax.grad(loss_fn)(p, mb, k)), None

            zero = jax.tree_util.tree_map(jnp.zeros_like, p)
            grads, _ = jax.lax.scan(body, zero, (macro, rngs))
            return update(p, o, grads)

        macro = {
            "src": src.reshape(n_mini, mini, -1),
            "tgt": tgt.reshape(n_mini, mini, -1),
            "feats": feats.reshape(n_mini, mini, T, -1),
            "lens": lens.reshape(n_mini, mini),
        }
        return jax.jit(step, donate_argnums=(0, 1)), macro

    def make_interleaved(pair_mini):
        """One scan iteration, TWO independent fwd+bwd subgraphs per body."""
        n_pairs = B // (2 * pair_mini)

        def step(p, o, macro, rng):
            rngs = jax.random.split(rng, 2 * n_pairs).reshape(n_pairs, 2)

            def body(g, xs):
                mb2, k2 = xs
                for i in range(2):  # two INDEPENDENT subgraphs, XLA may overlap
                    mb = {k: v[i] for k, v in mb2.items()}
                    g = jax.tree_util.tree_map(
                        jnp.add, g, jax.grad(loss_fn)(p, mb, k2[i]))
                return g, None

            zero = jax.tree_util.tree_map(jnp.zeros_like, p)
            grads, _ = jax.lax.scan(body, zero, (macro, rngs))
            return update(p, o, grads)

        macro = {
            "src": src.reshape(n_pairs, 2, pair_mini, -1),
            "tgt": tgt.reshape(n_pairs, 2, pair_mini, -1),
            "feats": feats.reshape(n_pairs, 2, pair_mini, T, -1),
            "lens": lens.reshape(n_pairs, 2, pair_mini),
        }
        return jax.jit(step, donate_argnums=(0, 1)), macro

    key = _misc.root_key(0)
    results = {}
    arms = {
        "wide32": lambda: make_wide(1),
        "scan2x16": lambda: make_wide(2),
        "inter2x16": lambda: make_interleaved(16),
    }
    for name, mk in arms.items():
        step, macro = mk()
        p = jax.tree_util.tree_map(jnp.copy, params)
        o = tx.init(p)
        macro_d = jax.device_put(macro)
        k = key

        def force(p):
            leaf = jax.tree_util.tree_leaves(p)[0]
            return float(np.asarray(leaf).ravel()[0])

        for _ in range(WARMUP):
            k, kk = jax.random.split(k)
            p, o = step(p, o, macro_d, kk)
        force(p)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            k, kk = jax.random.split(k)
            p, o = step(p, o, macro_d, kk)
        force(p)
        dt = (time.perf_counter() - t0) / ITERS
        results[name] = {"step_ms": round(dt * 1e3, 2),
                         "steps_per_s": round(1.0 / dt, 2),
                         "samples_per_s": round(B / dt, 1)}
        print(name, results[name], flush=True)

    out = {"batch_total": B, "arms": results,
           "verdict": ("ACCEPT" if results["inter2x16"]["steps_per_s"]
                       > 1.10 * results["wide32"]["steps_per_s"]
                       else "REJECT (<10% over wide32)")}
    print(json.dumps(out))
    with open(os.path.join(ROOT, "benchmarks", "probe_interleave.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
