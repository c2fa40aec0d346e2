"""Exhaustive eval-path flag audit: every translate surface on one device.

VERDICT r2 asked for one scripted pass driving every inference-CLI
combination on the TPU chip (most were CPU-tested piecemeal). Matrix:

  eval_mode 1 x gen_mode {ASR, ASR-REF, MT, ST, ST-REF, ST_BASE}
              x LM fusion {off, s-4g_0.5}        (12 decode runs)
  eval_mode 2 (checkpoint combine/average)
  eval_mode 3 (gather mean dynamic embedding -> dyn_emb_ave.npy)
  eval_mode 4 (tensorboard embedding projector dump)

The checkpoint comes from a short ASR_ST train run inside the audit (tiny
dims, same corpus), so the pass is self-contained. The LM is the dict
n-gram export (on-device table path); the host-callback .logscore path is
covered by tests/test_lm_fusion.py. Each run is a translate.py subprocess;
pass = rc 0 + the mode's artifact exists (mode 1: non-empty translate.txt
with one line per test sentence).

Results land in benchmarks/eval_audit.json with the platform recorded.

Usage: [PYTHONPATH=/root/repo:/root/.axon_site] python scripts/run_eval_audit.py [workdir]
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_SENT = 16
DIMS = [
    "--las_acous_dim", "8", "--las_acous_hidden_size", "6",
    "--dim_model", "12", "--dim_feedforward", "24", "--num_heads", "2",
    "--enc_layers", "2", "--dec_layers", "2",
    "--embedding_size_enc", "8", "--embedding_size_dec", "12",
    "--max_seq_len_src", "16", "--max_seq_len_tgt", "32",
]


def sh(cmd, log):
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + ":" + env.get("PYTHONPATH", "")
    t0 = time.time()
    with open(log, "w") as f:
        r = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT, cwd=ROOT,
                           env=env)
    return r.returncode, round(time.time() - t0, 1)


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stjep_eval_audit"
    os.makedirs(work, exist_ok=True)
    data = os.path.join(work, "data")

    from tests.data_factory import make_corpus

    corpus = make_corpus(data, n_sent=N_SENT, learnable=True)

    py = sys.executable
    rc, t_train = sh([
        py, "train.py", "--mode", "ASR_ST", "--save", f"{work}/expt",
        "--st_train_path_src", corpus["path_src"],
        "--st_train_path_tgt", corpus["path_tgt"],
        "--st_train_acous_path", corpus["acous_path"],
        "--path_vocab_src", corpus["path_vocab_src"],
        "--path_vocab_tgt", corpus["path_vocab_tgt"],
        "--las_acous_norm", "False", "--use_type", "char",
        "--batch_size", "8", "--minibatch_partition", "1",
        "--num_epochs", "2", "--checkpoint_every", "1000000",
        "--print_every", "1000000", "--learning_rate", "0.003",
        "--learning_rate_init", "0.003", "--lr_warmup_steps", "0",
        "--loss_nll_asr_coeff", "1.0", "--loss_nll_st_coeff", "1.0",
        "--use_gpu", "False", "--grab_memory", "False", *DIMS,
    ], f"{work}/log.train")
    assert rc == 0, f"audit train stage failed, see {work}/log.train"
    # no dev set -> per-epoch dirs (ref: trainer_asr.py:497-505)
    ckpt = f"{work}/expt/checkpoints_epoch/2"
    assert os.path.isdir(ckpt), ckpt

    # dict n-gram export: unigram logps over the tgt vocab (+ light bigrams)
    import dill

    entries = {(i,): -1.0 for i in range(corpus["vocab_tgt_size"])}
    entries.update({(5, i): -0.5 for i in range(5, 10)})
    lm_path = os.path.join(work, "lm.dill")
    with open(lm_path, "wb") as f:
        dill.dump({"entries": entries, "backoffs": {(i,): -0.3 for i in
                                                    range(5, 10)}}, f)

    base = ["--load", ckpt,
            "--test_path_src", corpus["path_src"],
            "--test_path_tgt", corpus["path_tgt"],
            "--test_acous_path", corpus["acous_path"],
            "--batch_size", "8", "--use_type", "char"]

    results = {}
    ok = True

    def record(name, rc, dt, artifact_ok, log):
        nonlocal ok
        status = "PASS" if (rc == 0 and artifact_ok) else "FAIL"
        results[name] = {"status": status, "rc": rc, "wall_s": dt}
        if status == "FAIL":
            ok = False
            print(f"[FAIL] {name} (rc={rc}) — see {log}", flush=True)
            print(open(log, errors="replace").read()[-1500:], flush=True)
        else:
            print(f"[PASS] {name} ({dt}s)", flush=True)

    # --- eval_mode 1: gen modes x LM ---
    for gm in ("ASR", "ASR-REF", "MT", "ST", "ST-REF", "ST_BASE"):
        for lm in (None, "s-4g_0.5"):
            name = f"mode1_{gm}" + ("_lm" if lm else "")
            out = os.path.join(work, "dec_" + name)
            cmd = [py, "translate.py", "--eval_mode", "1",
                   "--gen_mode", gm, "--test_path_out", out,
                   "--beam_width", "2", "--max_seq_len", "32", *base]
            if lm:
                cmd += ["--lm_mode", lm, "--lm_path", lm_path]
            log = f"{work}/log.{name}"
            rc, dt = sh(cmd, log)
            txt = os.path.join(out, "translate.txt")
            good = (os.path.exists(txt)
                    and len(open(txt).readlines()) == N_SENT)
            record(name, rc, dt, good, log)

    # --- eval_mode 2: checkpoint combine/average ---
    name = "mode2_combine"
    log = f"{work}/log.{name}"
    rc, dt = sh([py, "translate.py", "--eval_mode", "2",
                 "--combine_path", f"{work}/expt/checkpoints_epoch",
                 "--test_path_out", f"{work}/combine_out", *base], log)
    comb = f"{work}/expt/checkpoints_epoch-combine"
    record(name, rc, dt, os.path.isdir(comb), log)

    # --- eval_mode 3: mean dynamic embedding artifact ---
    name = "mode3_gather_emb"
    log = f"{work}/log.{name}"
    out3 = f"{work}/emb"
    rc, dt = sh([py, "translate.py", "--eval_mode", "3",
                 "--test_path_out", out3, *base], log)
    record(name, rc, dt,
           os.path.exists(os.path.join(out3, "dyn_emb_ave.npy")), log)

    # --- eval_mode 4: embedding projector dump ---
    name = "mode4_plot_emb"
    log = f"{work}/log.{name}"
    out4 = f"{work}/proj"
    rc, dt = sh([py, "translate.py", "--eval_mode", "4",
                 "--test_path_out", out4, *base], log)
    made = os.path.isdir(out4) and any(
        os.scandir(out4)) if os.path.isdir(out4) else False
    record(name, rc, dt, made, log)

    import jax

    summary = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "n_pass": sum(1 for r in results.values() if r["status"] == "PASS"),
        "n_fail": sum(1 for r in results.values() if r["status"] == "FAIL"),
        "runs": results,
    }
    with open(os.path.join(ROOT, "benchmarks", "eval_audit.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("platform", "n_pass", "n_fail")}))
    print("wrote benchmarks/eval_audit.json")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
