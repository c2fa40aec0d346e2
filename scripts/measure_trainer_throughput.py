"""End-to-end Trainer throughput at flagship dims on a synthetic corpus.

bench.py measures the bare jitted ASR_ST train step; this harness measures
the PRODUCT training path — Trainer_ASR_ST._train_epoches over the real
Dataset/loader stack (vocab load, tokenisation, per-utterance fbank np.load,
CMVN, pad-to-8, host prefetch, per-step LR + loss plumbing) — so the gap
between the two numbers is the host-pipeline + dispatch overhead a user
actually experiences. Results land in benchmarks/trainer_e2e.json.

The corpus is random (throughput only, nothing to learn) but shaped like
the flagship bench workload (bench.BENCH): 30k-word src vocab, 200-char
tgt vocab, <=1500-frame utterances, src<=90 tokens, tgt<=150 tokens.

Usage: python scripts/measure_trainer_throughput.py [workdir] [batch_size] [dtype] [staging] [window]

staging (default none): int8 | cache | cache_int8 — the H2D-compression
levers of stjep_tpu/data/device_cache.py (--feat_dtype int8 /
--device_cache True in the CLI). Results land under keys like
"b32_bfloat16_cache_int8".

window (default 1 = the single-step path, matching the Trainer/CLI
default): the multi-step executor's K — with the device cache, K
consecutive steps run as ONE jitted lax.scan (--train_window in the CLI).
Any window != 1 suffixes the result key with "_winK" so a windowed run can
never overwrite a single-step baseline; the window used is always recorded
in the result body.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

N_UTT = 256
N_SPEAKERS = 4
MEASURE_EPOCHS = 6  # timed epochs (after a warmup epoch that compiles)


def make_flagship_corpus(root: str, bench: dict, seed: int = 0):
    """Synthetic corpus in the reference on-disk layout (tests/data_factory
    docstring; ref utils/dataset.py) at flagship shapes."""
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    feadir = os.path.join(root, "fbk")
    normdir = os.path.join(root, "norm")
    os.makedirs(feadir, exist_ok=True)
    os.makedirs(normdir, exist_ok=True)

    specials = ["<pad>", "<unk>", "<s>", "</s>", "<spc>"]
    src_words = ["w%05d" % i for i in range(bench["enc_vocab"] - len(specials))]
    # char-level tgt: one unicode letter per vocab entry (Cyrillic block)
    tgt_chars = [chr(0x430 + i) for i in range(bench["dec_vocab"] - len(specials))]
    with open(os.path.join(root, "vocab.src"), "w") as f:
        f.write("\n".join(specials + src_words) + "\n")
    with open(os.path.join(root, "vocab.tgt"), "w") as f:
        f.write("\n".join(specials + tgt_chars) + "\n")

    acous_dim = bench["acous_dim"]
    for s in range(N_SPEAKERS):
        np.save(os.path.join(normdir, "spk%d.mu.npy" % s),
                rng.randn(acous_dim).astype(np.float32) * 0.1)
        np.save(os.path.join(normdir, "spk%d.std.npy" % s),
                (1.0 + 0.1 * rng.rand(acous_dim)).astype(np.float32))

    src_lines, tgt_lines, flis_lines = [], [], []
    for i in range(N_UTT):
        # src<=90 incl BOS/EOS; tgt chars + <spc> joins <=150 incl BOS/EOS
        nw = rng.randint(60, bench["max_src"] - 2)
        words = [src_words[j] for j in rng.randint(0, len(src_words), size=nw)]
        src_lines.append(" ".join(words))
        n_tok = rng.randint(100, bench["decode_len"] - 2)
        n_words = max(1, n_tok // 8)  # ~7 chars + <spc> per word
        toks = []
        for w in range(n_words):
            toks.append("".join(
                tgt_chars[j] for j in rng.randint(0, len(tgt_chars), size=7)))
        tgt_lines.append(" ".join(toks))
        # frame range chosen so every batch's padded length lands in the
        # SAME acous bucket (1281..1536 -> 1536 at acous_bucket=256): one
        # train-step compile total, none inside the timed epochs
        T = int(rng.randint(1290, bench["frames"] - 8))
        feat = rng.randn(T, acous_dim).astype(np.float32)
        fpath = os.path.join(feadir, "utt%04d.npy" % i)
        np.save(fpath, feat)
        flis_lines.append("%s %d spk%d.extra" % (fpath, T, i % N_SPEAKERS))

    for name, lines in (("train.src", src_lines), ("train.tgt", tgt_lines),
                        ("train.flis", flis_lines)):
        with open(os.path.join(root, name), "w") as f:
            f.write("\n".join(lines) + "\n")

    # dev set with ZERO surviving batches (the single utterance exceeds
    # acous_max_len, so preprocess filters it): keeps the trainer on its
    # dev-set code path — no 240 MB per-epoch checkpoint saves inside the
    # timed window — while the epoch-end evaluation costs nothing
    with open(os.path.join(root, "dev.src"), "w") as f:
        f.write(src_lines[0] + "\n")
    with open(os.path.join(root, "dev.tgt"), "w") as f:
        f.write(tgt_lines[0] + "\n")
    feat = rng.randn(1600, acous_dim).astype(np.float32)
    fpath = os.path.join(feadir, "dev0000.npy")
    np.save(fpath, feat)
    with open(os.path.join(root, "dev.flis"), "w") as f:
        f.write("%s 1600 spk0.extra\n" % fpath)
    return root


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stjep_trainer_e2e"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    dtype_name = sys.argv[3] if len(sys.argv) > 3 else "float32"
    staging = sys.argv[4] if len(sys.argv) > 4 else "none"
    assert staging in ("none", "int8", "cache", "cache_int8"), staging
    window = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import bench as bb
    from stjep_tpu.config import ModelConfig
    from stjep_tpu.data.dataset import Dataset
    from stjep_tpu.models.seq2seq import init_seq2seq
    from stjep_tpu.train.trainer import Trainer_ASR_ST

    b = bb.BENCH
    corpus = make_flagship_corpus(os.path.join(work, "corpus"), b)

    ds = Dataset(
        path_src=os.path.join(corpus, "train.src"),
        path_tgt=os.path.join(corpus, "train.tgt"),
        path_vocab_src=os.path.join(corpus, "vocab.src"),
        path_vocab_tgt=os.path.join(corpus, "vocab.tgt"),
        acous_path=os.path.join(corpus, "train.flis"),
        acous_norm_path=os.path.join(corpus, "norm"),
        acous_norm=True, acous_max_len=1500, use_type="char",
        max_seq_len_src=b["max_src"], max_seq_len_tgt=b["decode_len"],
        batch_size=batch_size, mode="ST", seed=0,
    )

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
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    params = init_seq2seq(jax.random.PRNGKey(0), cfg, dtype=dtype)

    dev = Dataset(
        path_src=os.path.join(corpus, "dev.src"),
        path_tgt=os.path.join(corpus, "dev.tgt"),
        path_vocab_src=os.path.join(corpus, "vocab.src"),
        path_vocab_tgt=os.path.join(corpus, "vocab.tgt"),
        acous_path=os.path.join(corpus, "dev.flis"),
        acous_norm_path=os.path.join(corpus, "norm"),
        acous_norm=True, acous_max_len=1500, use_type="char",
        max_seq_len_src=b["max_src"], max_seq_len_tgt=b["decode_len"],
        batch_size=batch_size, mode="ST", seed=0,
    )

    t = Trainer_ASR_ST(
        expt_dir=os.path.join(work, "expt"), batch_size=batch_size,
        minibatch_partition=1, checkpoint_every=10 ** 9, print_every=10 ** 9,
        learning_rate=1e-5, learning_rate_init=5e-4, lr_warmup_steps=12000,
        max_count_no_improve=100, seed=0,
        loss_coeff={"nll_asr": 1.0, "nll_st": 1.0},
        feat_dtype=("int8" if "int8" in staging
                    else "bfloat16" if dtype_name == "bfloat16" else None),
        device_cache=staging.startswith("cache"),
        train_window=window,
    )

    def force(params):
        """Drain the dispatch pipeline: read one param scalar back (the
        last step's update must have completed to produce it)."""
        import jax

        leaf = jax.tree_util.tree_leaves(params)[0]
        _ = float(np.asarray(leaf).ravel()[0])

    # epoch 1 compiles (and absorbs the output-layout recompile); the SAME
    # trainer then re-runs with its cached jitted step — zero retrace in
    # the timed epochs
    t0 = time.perf_counter()
    cfg, params = t.train({"st": ds}, (cfg, params), num_epochs=1,
                          dev_sets={"st": dev})
    force(params)
    warm_s = time.perf_counter() - t0

    # steady state: ONE multi-epoch train() call, the way real training
    # runs — epoch boundaries (construct_batches, prefetch spin-up) stay in
    # the timed window, but the per-call entry overhead (optimizer re-init,
    # load-mode dispatch, param placement) is paid once, not per epoch
    steps_per_epoch = len(ds)
    t0 = time.perf_counter()
    cfg, params = t.train({"st": ds}, (cfg, params),
                          num_epochs=MEASURE_EPOCHS, dev_sets={"st": dev})
    force(params)
    wall = time.perf_counter() - t0
    per_epoch = [wall / MEASURE_EPOCHS]

    step_per_s = steps_per_epoch * MEASURE_EPOCHS / wall
    samples_per_s = step_per_s * batch_size
    out = {
        "batch_size": batch_size,
        "dtype": dtype_name,
        "staging": staging,
        "train_window": window,
        "n_utterances": N_UTT,
        "steps_per_epoch": steps_per_epoch,
        "warmup_epoch_s": round(warm_s, 1),
        "per_epoch_s": [round(x, 2) for x in per_epoch],
        "e2e_step_per_s": round(step_per_s, 3),
        "e2e_samples_per_s": round(samples_per_s, 1),
        "note": ("end-to-end Trainer_ASR_ST loop incl. Dataset np.load+CMVN, "
                 "host prefetch, construct_batches, LR/loss plumbing; "
                 "one %d-epoch train() call (steady state); eval/ckpt "
                 "outside the loop (empty dev set)" % MEASURE_EPOCHS),
    }
    print(json.dumps(out), flush=True)
    path = os.path.join(ROOT, "benchmarks", "trainer_e2e.json")
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    key = "b%d" % batch_size
    if dtype_name != "float32":
        key += "_" + dtype_name
    if staging != "none":
        key += "_" + staging
    if window != 1:
        key += "_win%d" % window
    existing[key] = out
    with open(path, "w") as f:
        json.dump(existing, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
