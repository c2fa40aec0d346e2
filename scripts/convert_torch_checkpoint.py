"""Convert a reference PyTorch checkpoint directory to this framework's
format.

The reference pickles whole nn.Module objects (ref: modules/checkpoint.py:76),
so unpickling needs the reference package importable; point --reference at it
(read-only). The output is a standard stjep_tpu checkpoint dir loadable by
translate.py / train.py --load.

Usage:
  python scripts/convert_torch_checkpoint.py \
      --torch_ckpt /path/to/checkpoints/<timestamp> \
      --out /path/to/out_ckpt \
      [--reference /root/reference] [--emb_dyn_ave dyn_emb_ave.npy]
"""

import argparse
import dataclasses
import os
import sys
import types

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--emb_dyn_ave", default=None)
    args = ap.parse_args()

    sys.modules.setdefault("bpemb", types.ModuleType("bpemb"))
    sys.modules["bpemb"].BPEmb = object
    sys.path.insert(0, args.reference)

    import dill
    import torch

    model = torch.load(
        os.path.join(args.torch_ckpt, "model.pt"),
        map_location=lambda storage, loc: storage,
        weights_only=False,
    )
    with open(os.path.join(args.torch_ckpt, "input_vocab.pt"), "rb") as f:
        input_vocab = dill.load(f)
    with open(os.path.join(args.torch_ckpt, "output_vocab.pt"), "rb") as f:
        output_vocab = dill.load(f)

    from stjep_tpu.config import ModelConfig
    from stjep_tpu.train.checkpoint import Checkpoint
    from stjep_tpu.train.convert import convert_torch_model

    # reconstruct the ModelConfig from the pickled module's attributes
    # (the reference's check_var shim would default anything missing,
    # ref: models/Seq2seq.py:906-914)
    def attr(name, default):
        return getattr(model, name, default)

    las = getattr(model, "las", None)
    cfg = ModelConfig(
        enc_vocab_size=attr("enc_vocab_size", 32),
        dec_vocab_size=attr("dec_vocab_size", 32),
        share_embedder=model.enc_embedder is model.dec_embedder,
        enc_embedding_size=attr("enc_embedding_size", 200),
        dec_embedding_size=attr("dec_embedding_size", 200),
        max_seq_len_src=attr("max_seq_len_src", 32),
        max_seq_len_tgt=attr("max_seq_len_tgt", 300),
        num_heads=attr("num_heads", 8),
        dim_model=attr("dim_model", 512),
        dim_feedforward=attr("dim_feedforward", 1024),
        enc_layers=attr("enc_layers", 6),
        dec_layers=attr("dec_layers", 6),
        act=bool(attr("act", False)),
        transformer_type=attr("transformer_type", "standard"),
        acous_dim=attr("acous_dim", 40),
        acous_hidden_size=attr("acous_hidden_size", 256),
        num_unilstm_dec=(
            las.decoder.num_unilstm_dec if las is not None else 3
        ),
        mode=attr("mode", "ASR"),
        load_mode=attr("load_mode", None),
    )
    params = convert_torch_model(model, cfg)
    if args.emb_dyn_ave:
        import jax.numpy as jnp

        params["emb_dyn_ave"] = jnp.asarray(
            np.load(args.emb_dyn_ave).reshape(-1), jnp.float32)

    ck = Checkpoint(
        params=params, epoch=0, step=0,
        input_vocab=list(input_vocab), output_vocab=list(output_vocab),
        model_config=dataclasses.asdict(cfg),
    )
    path = ck.save_customise(args.out)
    print("converted ->", path)


if __name__ == "__main__":
    main()
