"""Capture a jax.profiler trace of the flagship beam decode (TensorBoard).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_decode.py \
      [--logdir /tmp/stjep_trace] [--beam 5] [--iters 2]
Then: tensorboard --logdir <logdir>
"""

import argparse
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/stjep_trace")
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from bench import BENCH
    from stjep_tpu.config import BOS, ModelConfig
    from stjep_tpu.infer.forward import forward_translate
    from stjep_tpu.models.seq2seq import init_seq2seq
    from stjep_tpu.utils.profiling import trace

    b = BENCH
    cfg = ModelConfig(
        enc_vocab_size=b["enc_vocab"], dec_vocab_size=b["dec_vocab"],
        enc_embedding_size=200, dec_embedding_size=b["dim_model"],
        acous_dim=b["acous_dim"], acous_hidden_size=b["acous_hidden"],
        dim_model=b["dim_model"], dim_feedforward=b["dim_ff"],
        num_heads=b["heads"], enc_layers=b["layers"], dec_layers=b["layers"],
        num_unilstm_dec=3, max_seq_len_src=b["max_src"],
        max_seq_len_tgt=b["decode_len"], mode="ASR_ST",
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B = b["batch"]
    feats = jnp.asarray(rng.randn(B, b["frames"], b["acous_dim"]).astype(np.float32))
    lens = np.full((B,), b["frames"] - 8, np.int32)
    lens[1:] = rng.randint(b["frames"] // 2, b["frames"] - 8, size=(B - 1,))
    lens = jnp.asarray(lens)

    dec = jax.jit(partial(
        forward_translate, cfg=cfg, mode="ST", beam_width=args.beam,
        penalty_factor=1.0, max_seq_len=b["decode_len"],
    ))
    out = dec(params, acous_feats=feats, acous_lens=lens)
    _ = int(np.asarray(out[0, 0]))  # compile + settle

    with trace(args.logdir):
        for _i in range(args.iters):
            out = dec(params, acous_feats=feats, acous_lens=lens)
            _ = int(np.asarray(out[0, 1]))
    print("trace written to", args.logdir)


if __name__ == "__main__":
    main()
