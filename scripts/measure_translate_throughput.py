"""End-to-end translate-CLI throughput at flagship dims.

bench.py measures the bare jitted beam-decode call; this harness measures
the PRODUCT inference path — translate.translate() over the real Dataset
stack (per-utterance fbank np.load, CMVN, batch staging, beam decode,
detokenisation, output-file writing) — so the gap between the two numbers
is the host-pipeline overhead a user actually experiences. The software
pipeline depth is swept (STJEP_DECODE_PIPELINE: 1 = the blocking
per-minibatch readback loop, 4 = default overlap) to record what the
overlap buys. Results land in benchmarks/translate_e2e.json.

Usage: python scripts/measure_translate_throughput.py [workdir] [batch_size]
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import numpy as np


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stjep_translate_e2e"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import bench as bb
    from measure_trainer_throughput import make_flagship_corpus
    from stjep_tpu.config import ModelConfig
    from stjep_tpu.data.dataset import Dataset
    from stjep_tpu.models.seq2seq import init_seq2seq
    import translate as tr

    b = bb.BENCH
    corpus = make_flagship_corpus(os.path.join(work, "corpus"), b)

    ds = Dataset(
        path_src=os.path.join(corpus, "train.src"),
        path_tgt=os.path.join(corpus, "train.tgt"),
        path_vocab_src=os.path.join(corpus, "vocab.src"),
        path_vocab_tgt=os.path.join(corpus, "vocab.tgt"),
        acous_path=os.path.join(corpus, "train.flis"),
        acous_norm_path=os.path.join(corpus, "norm"),
        acous_norm=True, acous_max_len=6000, use_type="char",
        max_seq_len_src=900, max_seq_len_tgt=900,
        batch_size=batch_size, mode="ST", seed=0,
    )
    n_utt = len(ds.src_sentences)

    cfg = ModelConfig(
        enc_vocab_size=len(ds.vocab_src), dec_vocab_size=len(ds.vocab_tgt),
        enc_embedding_size=200, dec_embedding_size=b["dim_model"],
        acous_dim=b["acous_dim"], acous_hidden_size=b["acous_hidden"],
        dim_model=b["dim_model"], dim_feedforward=b["dim_ff"],
        num_heads=b["heads"], enc_layers=b["layers"], dec_layers=b["layers"],
        num_unilstm_dec=3, spec_aug=True, dropout=0.2,
        max_seq_len_src=b["max_src"], max_seq_len_tgt=b["decode_len"],
        mode="ASR_ST",
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)

    def one_pass(depth: int, tag: str, feat_dtype: str = "auto"):
        os.environ["STJEP_DECODE_PIPELINE"] = str(depth)
        outdir = os.path.join(work, "out_%s" % tag)
        t0 = time.perf_counter()
        tr.translate(ds, cfg, params, outdir, max_seq_len=b["decode_len"],
                     beam_width=b["beam"], gen_mode="ST",
                     beam_cache_dtype="bfloat16", feat_dtype=feat_dtype,
                     logger_print=lambda *a: None)
        return time.perf_counter() - t0

    # warmup passes compile (persistent cache makes repeats cheap)
    one_pass(4, "piped")
    one_pass(4, "piped_q", "int8")
    # the remote service's speed drifts over minutes; ALTERNATE the arms
    # so a slow window penalises all equally, and report medians
    t1, t4, t8 = [], [], []
    for _ in range(3):
        t1.append(one_pass(1, "blocking"))
        t4.append(one_pass(4, "piped"))
        t8.append(one_pass(4, "piped_q", "int8"))

    def row(depth, times, **extra):
        sec = float(np.median(times))
        return {"pipeline_depth": depth, "wall_s": round(sec, 2),
                "per_pass_s": [round(x, 2) for x in times],
                "utt_per_s": round(n_utt / sec, 2), **extra}

    blocking = row(1, t1)
    piped = row(4, t4)
    piped_q = row(4, t8, feat_dtype="int8")
    out = {
        "batch_size": batch_size,
        "n_utterances": n_utt,
        "beam_width": b["beam"],
        "cache_dtype": "bfloat16",
        "blocking": blocking,
        "pipelined": piped,
        "pipelined_int8": piped_q,
        "note": ("end-to-end translate() incl. Dataset np.load+CMVN, "
                 "staging, beam decode, detok, file write; arms "
                 "alternated per pass (remote-service speed drifts), "
                 "median of 3 after a compile warmup; pipelined_int8 "
                 "stages int8-quantized features (--feat_dtype int8)"),
    }
    print(json.dumps(out), flush=True)
    path = os.path.join(ROOT, "benchmarks", "translate_e2e.json")
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    existing["b%d" % batch_size] = out
    with open(path, "w") as f:
        json.dump(existing, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
