"""CLI smoke tests: train.py / translate.py subprocess runs on a tiny
synthetic corpus (forced CPU) + config round-trip."""

import json
import os
import subprocess
import sys

import pytest

from stjep_tpu.config import read_config, save_config, validate_config

from tests.data_factory import make_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd=REPO, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env, timeout=timeout,
        capture_output=True, text=True,
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_corpus(str(tmp_path_factory.mktemp("cli")), n_sent=12)


@pytest.fixture(scope="module")
def trained(corpus, tmp_path_factory):
    expt = str(tmp_path_factory.mktemp("expt"))
    r = _run([
        "train.py", "--mode", "ASR", "--save", expt,
        "--asr_train_path_src", corpus["path_src"],
        "--asr_train_acous_path", corpus["acous_path"],
        "--asr_dev_path_src", corpus["path_src"],
        "--asr_dev_acous_path", corpus["acous_path"],
        "--path_vocab_src", corpus["path_vocab_src"],
        "--path_vocab_tgt", corpus["path_vocab_tgt"],
        "--las_acous_dim", "8", "--las_acous_hidden_size", "4",
        "--las_acous_norm", "False",
        "--dim_model", "8", "--dim_feedforward", "16", "--num_heads", "2",
        "--enc_layers", "1", "--dec_layers", "1",
        "--embedding_size_enc", "8", "--embedding_size_dec", "8",
        "--max_seq_len_src", "16", "--max_seq_len_tgt", "24",
        "--batch_size", "6", "--minibatch_partition", "1",
        "--num_epochs", "1", "--checkpoint_every", "2", "--print_every", "2",
        "--learning_rate", "0.005", "--learning_rate_init", "0.005",
        "--lr_warmup_steps", "0",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    from stjep_tpu.train.checkpoint import Checkpoint

    latest = Checkpoint.get_latest_checkpoint(expt)
    assert latest is not None, r.stderr[-2000:]
    return corpus, latest


@pytest.mark.slow  # heavy integration: slow lane (r5 re-budget)
def test_train_cli_writes_config_and_ckpt(trained):
    corpus, latest = trained
    expt = os.path.dirname(os.path.dirname(latest))
    assert os.path.exists(os.path.join(expt, "model.cfg"))
    assert os.path.exists(os.path.join(latest, "params.msgpack"))
    with open(os.path.join(latest, "meta.json")) as f:
        meta = json.load(f)
    assert meta["model_config"]["mode"] == "ASR"


@pytest.mark.slow  # heavy integration: slow lane (r5 re-budget)
def test_translate_cli_mode1_asr(trained, tmp_path):
    corpus, latest = trained
    out = str(tmp_path / "eval")
    r = _run([
        "translate.py", "--test_path_src", corpus["path_src"],
        "--test_path_tgt", corpus["path_tgt"],
        "--test_acous_path", corpus["acous_path"],
        "--load", latest, "--test_path_out", out,
        "--eval_mode", "1", "--gen_mode", "ASR", "--batch_size", "6",
        "--beam_width", "1", "--max_seq_len", "16", "--use_type", "word",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    lines = open(os.path.join(out, "translate.txt")).read().splitlines()
    assert len(lines) == 12  # one output line per utterance


@pytest.mark.slow  # heavy integration: slow lane
def test_translate_cli_mode2_combine(trained, tmp_path):
    corpus, latest = trained
    pool = os.path.dirname(latest)
    r = _run([
        "translate.py", "--test_path_src", corpus["path_src"],
        "--test_path_tgt", corpus["path_tgt"],
        "--test_acous_path", corpus["acous_path"],
        "--load", latest, "--combine_path", pool,
        "--test_path_out", str(tmp_path / "x"), "--eval_mode", "2",
        "--batch_size", "6",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    combined = pool.rstrip("/") + "-combine/combine"
    assert os.path.exists(os.path.join(combined, "params.msgpack"))


def test_config_roundtrip(tmp_path):
    cfg = {"a": 1, "b": True, "c": "hello", "d": 0.5}
    p = str(tmp_path / "c.cfg")
    save_config(cfg, p)
    text = open(p).read()
    assert "a:1" in text and "b:True" in text

    p2 = str(tmp_path / "c2.cfg")
    with open(p2, "w") as f:
        f.write("x=3\ny=0.25\nz=true\nw=hello\n")
    back = read_config(p2)
    assert back == {"x": 3, "y": 0.25, "z": True, "w": "hello"}


def test_validate_config_string_booleans():
    cfg = validate_config({"a": "True", "b": "false", "c": "None", "d": "keep"})
    assert cfg == {"a": True, "b": False, "c": None, "d": "keep"}


@pytest.mark.slow  # heavy integration: slow lane
def test_translate_pipeline_depths_and_fwd_cache(corpus, tmp_path):
    """The pipelined FIFO loop must write rows in the same order as the
    blocking loop, and repeated translate() calls must reuse one jitted
    decode program (re-wrapping in jax.jit re-traces seconds of beam
    program per call in a serving loop)."""
    import jax

    import translate as tr
    from stjep_tpu.config import ModelConfig
    from stjep_tpu.data.dataset import Dataset
    from stjep_tpu.models.seq2seq import init_seq2seq

    ds = Dataset(
        path_src=corpus["path_src"], path_tgt=corpus["path_tgt"],
        path_vocab_src=corpus["path_vocab_src"],
        path_vocab_tgt=corpus["path_vocab_tgt"],
        acous_path=corpus["acous_path"], acous_norm=False,
        acous_max_len=400, use_type="char",
        max_seq_len_src=16, max_seq_len_tgt=24,
        batch_size=5, mode="ST", seed=0,
    )
    cfg = ModelConfig(
        enc_vocab_size=len(ds.vocab_src), dec_vocab_size=len(ds.vocab_tgt),
        enc_embedding_size=8, dec_embedding_size=8, acous_dim=8,
        acous_hidden_size=4, dim_model=8, dim_feedforward=16, num_heads=2,
        enc_layers=1, dec_layers=1, num_unilstm_dec=1,
        max_seq_len_src=16, max_seq_len_tgt=24, mode="ASR_ST",
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)

    tr._FWD_CACHE.clear()
    outs = {}
    for depth in ("0", "1", "3"):
        os.environ["STJEP_DECODE_PIPELINE"] = depth
        try:
            path = tr.translate(
                ds, cfg, params, str(tmp_path / ("d" + depth)),
                max_seq_len=24, beam_width=2, gen_mode="ST",
                logger_print=lambda *a: None)
        finally:
            del os.environ["STJEP_DECODE_PIPELINE"]
        with open(path, encoding="utf8") as f:
            outs[depth] = f.read()
    assert outs["0"] == outs["1"] == outs["3"]
    assert len(tr._FWD_CACHE) == 1  # one program, reused across calls


@pytest.mark.slow  # heavy integration: slow lane (r5 re-budget)
def test_translate_feat_dtype_int8_plumbing(corpus, tmp_path):
    """--feat_dtype int8 (quantize on the prefetch thread, dequantize
    inside the jitted decode) must produce EXACTLY the hypotheses of
    decoding host-side quantize->dequantize features staged as f32: the
    quantization noise is identical in both arms, so any difference is a
    staging/jit plumbing bug, not a near-tie flip."""
    import jax
    import numpy as np

    import translate as tr
    from stjep_tpu.config import ModelConfig
    from stjep_tpu.data.dataset import Dataset
    from stjep_tpu.data.device_cache import quantize_batch
    from stjep_tpu.models.seq2seq import init_seq2seq

    def make_ds():
        return Dataset(
            path_src=corpus["path_src"], path_tgt=corpus["path_tgt"],
            path_vocab_src=corpus["path_vocab_src"],
            path_vocab_tgt=corpus["path_vocab_tgt"],
            acous_path=corpus["acous_path"], acous_norm=False,
            acous_max_len=400, use_type="char",
            max_seq_len_src=16, max_seq_len_tgt=24,
            batch_size=5, mode="ST", seed=0,
        )

    ds = make_ds()
    cfg = ModelConfig(
        enc_vocab_size=len(ds.vocab_src), dec_vocab_size=len(ds.vocab_tgt),
        enc_embedding_size=8, dec_embedding_size=8, acous_dim=8,
        acous_hidden_size=4, dim_model=8, dim_feedforward=16, num_heads=2,
        enc_layers=1, dec_layers=1, num_unilstm_dec=1,
        max_seq_len_src=16, max_seq_len_tgt=24, mode="ASR_ST",
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)

    tr._FWD_CACHE.clear()
    p_int8 = tr.translate(
        ds, cfg, params, str(tmp_path / "int8"), max_seq_len=24,
        beam_width=2, gen_mode="ST", feat_dtype="int8",
        logger_print=lambda *a: None)

    # reference arm: same quantization applied on the host, staged as f32
    ds2 = make_ds()
    orig = ds2.materialise_batch

    def roundtrip(idx):
        item = dict(orig(idx))
        if "acous_feat" in item:
            packed = quantize_batch(item["acous_feat"], np.float32)
            item["acous_feat"] = (
                packed["q"].astype(np.float32)
                * packed["scale"][..., None, None])
        return item

    ds2.materialise_batch = roundtrip
    p_f32 = tr.translate(
        ds2, cfg, params, str(tmp_path / "rt32"), max_seq_len=24,
        beam_width=2, gen_mode="ST", feat_dtype="float32",
        logger_print=lambda *a: None)

    with open(p_int8, encoding="utf8") as f:
        int8_lines = f.read()
    with open(p_f32, encoding="utf8") as f:
        rt_lines = f.read()
    assert int8_lines == rt_lines and int8_lines.strip()


@pytest.mark.slow  # heavy integration: slow lane
def test_translate_cli_feat_dtype_int8(trained, tmp_path):
    corpus, latest = trained
    out = str(tmp_path / "eval_q")
    r = _run([
        "translate.py", "--test_path_src", corpus["path_src"],
        "--test_path_tgt", corpus["path_tgt"],
        "--test_acous_path", corpus["acous_path"],
        "--load", latest, "--test_path_out", out,
        "--eval_mode", "1", "--gen_mode", "ASR", "--batch_size", "6",
        "--beam_width", "1", "--max_seq_len", "16", "--use_type", "word",
        "--feat_dtype", "int8",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    lines = open(os.path.join(out, "translate.txt")).read().splitlines()
    assert len(lines) == 12


@pytest.mark.slow  # heavy integration: slow lane
def test_translate_cli_unsupported_lm_mode_fails_loudly(trained, tmp_path):
    """lm_mode s-rnn/d must error (the reference asserts for s-rnn;
    silently decoding with NO fusion misattributes scores to the LM)."""
    corpus, latest = trained
    r = _run([
        "translate.py", "--test_path_src", corpus["path_src"],
        "--test_path_tgt", corpus["path_tgt"],
        "--test_acous_path", corpus["acous_path"],
        "--load", latest, "--test_path_out", str(tmp_path / "o"),
        "--eval_mode", "1", "--gen_mode", "ASR", "--lm_mode", "d",
        "--batch_size", "6", "--beam_width", "1", "--max_seq_len", "16",
    ])
    assert r.returncode != 0
    assert "lm_mode" in r.stderr


@pytest.mark.slow  # heavy integration: slow lane
def test_translate_cli_mode2_requires_combine_path(trained, tmp_path):
    corpus, latest = trained
    r = _run([
        "translate.py", "--test_path_src", corpus["path_src"],
        "--test_path_tgt", corpus["path_tgt"],
        "--test_acous_path", corpus["acous_path"],
        "--load", latest, "--test_path_out", str(tmp_path / "o"),
        "--eval_mode", "2", "--batch_size", "6",
    ])
    assert r.returncode != 0
    assert "combine_path" in r.stderr


@pytest.mark.slow  # heavy integration: slow lane
def test_translate_cli_mode3_gather_emb(trained, tmp_path):
    """MODE 3 writes the dyn_emb_ave.npy artifact the Seq2seq ctor consumes
    (ref: translate.py:286-357 -> models/Seq2seq.py:64-66)."""
    import numpy as np

    corpus, latest = trained
    out = str(tmp_path / "emb")
    r = _run([
        "translate.py", "--test_path_src", corpus["path_src"],
        "--test_path_tgt", corpus["path_tgt"],
        "--test_acous_path", corpus["acous_path"],
        "--load", latest, "--test_path_out", out,
        "--eval_mode", "3", "--batch_size", "6", "--use_type", "word",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    vec = np.load(os.path.join(out, "dyn_emb_ave.npy"))
    # mean dynamic embedding: [hidden_size_shared] = dim_model, finite
    assert vec.shape == (8,)
    assert np.isfinite(vec).all()


@pytest.mark.slow  # heavy integration: slow lane
def test_translate_cli_mode4_projector_dump(trained, tmp_path):
    """MODE 4 writes a TensorBoard embedding-projector dump
    (ref: translate.py:200-283)."""
    corpus, latest = trained
    out = str(tmp_path / "proj")
    r = _run([
        "translate.py", "--test_path_src", corpus["path_src"],
        "--test_path_tgt", corpus["path_tgt"],
        "--test_acous_path", corpus["acous_path"],
        "--load", latest, "--test_path_out", out,
        "--eval_mode", "4", "--batch_size", "6", "--use_type", "word",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    # SummaryWriter projector layout: an events file + projector_config
    names = []
    for root, _dirs, files in os.walk(out):
        names += files
    assert any(n.startswith("events.out.tfevents") for n in names), names
    assert "projector_config.pbtxt" in names, names


@pytest.mark.slow  # heavy integration: slow lane
def test_train_cli_embedding_overlay_shared(corpus, tmp_path):
    """Pretrained-embedding overlay wiring (train.py) with share_embedder:
    the reference rebinds enc_embedder = dec_embedder AFTER both overlays
    (ref: models/Seq2seq.py:99-121), so the tgt-side overlay must win and a
    src-only overlay must be discarded. Overlaid rows of words absent from
    the training text must survive one epoch untouched (zero-grad Adam)."""
    import numpy as np

    from stjep_tpu.data.dataset import load_vocab_file
    from stjep_tpu.train.checkpoint import Checkpoint

    corpus = make_corpus(str(tmp_path / "data"), n_sent=4)
    _, w2i, _ = load_vocab_file(corpus["path_vocab_src"])
    with open(corpus["path_src"]) as f:
        used = set(f.read().split())
    unused = sorted(w for w in w2i if w not in used and not w.startswith("<"))
    assert len(unused) >= 2, "corpus uses every vocab word; shrink n_sent"
    w_both, w_src_only = unused[0], unused[1]

    vec_a = " ".join(str(0.111 * (i + 1)) for i in range(8))
    vec_b = " ".join(str(-0.222 * (i + 1)) for i in range(8))
    src_emb = tmp_path / "src.vec"
    tgt_emb = tmp_path / "tgt.vec"
    src_emb.write_text(f"{w_both} {vec_a}\n{w_src_only} {vec_a}\n")
    tgt_emb.write_text(f"{w_both} {vec_b}\n")

    expt = str(tmp_path / "expt")
    r = _run([
        "train.py", "--mode", "MT", "--save", expt,
        # identity "translation": same text both sides, word-level tgt,
        # one shared vocab -> share_embedder is well-formed
        # no dev set -> the per-epoch save path fires unconditionally
        # (a first dev eval at accuracy 0.0 would save nothing, like the
        # reference's improvement-gated save)
        "--mt_train_path_src", corpus["path_src"],
        "--mt_train_path_tgt", corpus["path_src"],
        "--path_vocab_src", corpus["path_vocab_src"],
        "--path_vocab_tgt", corpus["path_vocab_src"],
        "--use_type", "word", "--share_embedder", "True",
        "--load_embedding_src", str(src_emb),
        "--load_embedding_tgt", str(tgt_emb),
        "--dim_model", "8", "--dim_feedforward", "16", "--num_heads", "2",
        "--enc_layers", "1", "--dec_layers", "1",
        "--embedding_size_enc", "8", "--embedding_size_dec", "8",
        "--max_seq_len_src", "16", "--max_seq_len_tgt", "16",
        "--batch_size", "6", "--minibatch_partition", "1",
        "--num_epochs", "1", "--checkpoint_every", "2", "--print_every", "2",
        "--learning_rate", "0.005", "--learning_rate_init", "0.005",
        "--lr_warmup_steps", "0",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    ck = Checkpoint.load(os.path.join(expt, "checkpoints_epoch", "1"))
    enc = np.asarray(ck.params["enc_embedder"], np.float32)

    want_b = np.asarray([float(x) for x in vec_b.split()], np.float32)
    want_a = np.asarray([float(x) for x in vec_a.split()], np.float32)
    # tgt overlay won on the shared (live) table
    np.testing.assert_allclose(enc[w2i[w_both]], want_b, rtol=1e-6)
    # src-only overlay was discarded by the rebind
    assert not np.allclose(enc[w2i[w_src_only]], want_a)
