"""Measure the reference PyTorch implementation's CPU throughput on the
bench.py workload shapes and record benchmarks/reference_baseline.json.

The reference repo publishes no numbers (BASELINE.md), so this script
produces the denominator for bench.py's vs_baseline. It imports the
read-only reference at /root/reference as an executable oracle (no code is
vendored).

Run: python scripts/measure_reference_baseline.py [--iters 1]
"""

import argparse
import json
import os
import sys
import time
import types
from unittest import mock

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import BENCH  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=1)
    parser.add_argument("--reference", type=str, default="/root/reference")
    args = parser.parse_args()

    sys.modules.setdefault("bpemb", types.ModuleType("bpemb"))
    sys.modules["bpemb"].BPEmb = object
    sys.path.insert(0, args.reference)

    import torch

    torch.set_num_threads(os.cpu_count() or 8)

    # torch>=2 compat shims for the 1.1-era reference
    _mf, _mf_ = torch.Tensor.masked_fill, torch.Tensor.masked_fill_
    torch.Tensor.masked_fill = lambda self, m, v: _mf(self, m.bool(), v)
    torch.Tensor.masked_fill_ = lambda self, m, v: _mf_(self, m.bool(), v)

    b = BENCH
    emb_dyn = np.zeros(b["dim_model"], dtype=np.float32)
    with mock.patch("numpy.load", return_value=emb_dyn):
        from models.Seq2seq import Seq2seq

        model = Seq2seq(
            b["enc_vocab"], b["dec_vocab"], share_embedder=False,
            enc_embedding_size=200, dec_embedding_size=b["dim_model"],
            max_seq_len_src=b["max_src"], max_seq_len_tgt=b["decode_len"],
            num_heads=b["heads"], dim_model=b["dim_model"],
            dim_feedforward=b["dim_ff"], enc_layers=b["layers"],
            dec_layers=b["layers"], embedding_dropout=0.0, dropout=0.2,
            act=False, transformer_type="standard", acous_dim=b["acous_dim"],
            acous_hidden_size=b["acous_hidden"], mode="ASR_ST",
            load_mode="null",
        )
    model.eval()
    model.las.decoder.max_seq_len = b["max_src"]

    rng = np.random.RandomState(0)
    B = b["batch"]
    feats = torch.tensor(rng.randn(B, b["frames"], b["acous_dim"]).astype(np.float32))
    lens = rng.randint(b["frames"] // 2, b["frames"] - 8, size=(B,))
    lens[0] = b["frames"] - 8  # round_up8(max) == frames (ref: dataset.py:179)
    tlens = [torch.tensor([int(x)]) for x in lens]
    src = torch.tensor(
        rng.randint(5, b["enc_vocab"], size=(B, b["max_src"])).astype(np.int64))
    src[:, 0] = 2
    tgt = torch.tensor(
        rng.randint(5, b["dec_vocab"], size=(B, b["decode_len"])).astype(np.int64))
    tgt[:, 0] = 2

    # ---- beam decode ----
    with torch.no_grad():
        t0 = time.perf_counter()
        for _ in range(args.iters):
            model.forward_translate(
                acous_feats=feats, acous_lens=tlens, beam_width=b["beam"],
                penalty_factor=1.0, use_gpu=False, max_seq_len=b["decode_len"],
                mode="ST",
            )
        dt_dec = (time.perf_counter() - t0) / args.iters
    utt_per_s = B / dt_dec

    # ---- train step (fwd + bwd + adam) ----
    model.train(True)
    model.las.encoder.spec_aug = True
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    crit = torch.nn.NLLLoss(reduction="none")

    def one_step():
        out = model.forward_train(src, tgt=tgt, acous_feats=feats,
                                  acous_lens=tlens, mode="ASR_ST", use_gpu=False)
        la = crit(out["logps_asr"].reshape(-1, b["enc_vocab"]),
                  src[:, 1:].reshape(-1)).mean()
        ld = crit(out["logps_st"][:, :-1].reshape(-1, b["dec_vocab"]),
                  tgt[:, 1:].reshape(-1)).mean()
        loss = la + ld
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        model.zero_grad()

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.iters):
        one_step()
    dt_train = (time.perf_counter() - t0) / args.iters
    step_per_s = 1.0 / dt_train

    out = {
        "beam_decode_utt_per_s": utt_per_s,
        "train_step_per_s": step_per_s,
        "beam_decode_sec_per_batch": dt_dec,
        "train_sec_per_step": dt_train,
        "hardware": "cpu ({} threads)".format(torch.get_num_threads()),
        "workload": b,
        "torch": torch.__version__,
    }
    os.makedirs(os.path.join(ROOT, "benchmarks"), exist_ok=True)
    path = os.path.join(ROOT, "benchmarks", "reference_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print("saved to", path)


if __name__ == "__main__":
    main()
