"""LM shallow-fusion parity vs the reference add_lm (oracle), using a fake
n-gram LM with a deterministic logscore."""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stjep_tpu.config import BOS
from stjep_tpu.infer.lm_fusion import make_ngram_fuser

from tests.reference_oracle import load_reference, reference_available


class FakeLM:
    """Deterministic .logscore(word, context) like an NLTK n-gram model."""

    def logscore(self, word, context):
        w = int(word)
        c = sum(int(x) for x in context) % 7
        if (w + c) % 11 == 0:
            return float("-inf")  # exercise the -inf -> -1e10 path
        return -((w * 13 + c * 3) % 17) / 4.0


def test_fuser_matches_reference_add_lm():
    if not reference_available():
        pytest.skip("reference not mounted")
    load_reference()
    from models.Dec import Dec

    dec = Dec(vocab_size=20, embedding_size=4, acous_hidden_size=4,
              hidden_size_dec=4, hidden_size_shared=4, num_unilstm_dec=2)
    lm = FakeLM()
    rng = np.random.RandomState(0)
    logps = np.log(rng.dirichlet(np.ones(20), size=3)).astype(np.float32)

    # context: two steps decoded so far
    seq = [torch.tensor([[5], [6], [7]]), torch.tensor([[8], [9], [10]])]
    import models.Dec as dec_mod

    dec_mod.device = torch.device("cpu")  # the ref reads a global
    ref = dec.add_lm("s-4g_0.5", lm, torch.tensor(logps), seq)

    fuse = make_ngram_fuser(lm, "s-4g_0.5")
    ctx = np.array([[0, 5, 8], [0, 6, 9], [0, 7, 10]], dtype=np.int32)
    got = fuse(logps, ctx, 2)
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_fuser_step0_bos_context():
    if not reference_available():
        pytest.skip("reference not mounted")
    load_reference()
    from models.Dec import Dec
    import models.Dec as dec_mod

    dec_mod.device = torch.device("cpu")
    dec = Dec(vocab_size=16, embedding_size=4, acous_hidden_size=4,
              hidden_size_dec=4, hidden_size_shared=4, num_unilstm_dec=2)
    lm = FakeLM()
    rng = np.random.RandomState(1)
    logps = np.log(rng.dirichlet(np.ones(16), size=2)).astype(np.float32)
    ref = dec.add_lm("s-4g_0.3", lm, torch.tensor(logps), [])
    fuse = make_ngram_fuser(lm, "s-4g_0.3")
    got = fuse(logps, np.zeros((2, 3), np.int32), 0)
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_fuser_null_mode():
    assert make_ngram_fuser(None, "null") is None
    assert make_ngram_fuser(FakeLM(), "null") is None


def test_fuser_inside_jitted_decode():
    """pure_callback path works inside a scan under jit."""
    lm = FakeLM()
    fuse = make_ngram_fuser(lm, "s-4g_0.5")

    def step(carry, step_i):
        logp = jnp.log(jax.nn.softmax(jnp.arange(12.0)[None, :] * 0.1))
        out = jax.pure_callback(
            fuse, jax.ShapeDtypeStruct((1, 12), jnp.float32),
            logp, carry, step_i, vmap_method="sequential",
        )
        sym = jnp.argmax(out, axis=-1).astype(jnp.int32)
        carry = jnp.concatenate([carry[:, 1:], sym[:, None]], axis=1)
        return carry, sym

    ctx0 = jnp.zeros((1, 3), jnp.int32)
    _, syms = jax.lax.scan(step, ctx0, jnp.arange(4))
    assert syms.shape == (4, 1)


# --------------------------------------------------------------------------
# on-device hashed-table fusion (infer/lm_table.py) vs the callback path
# --------------------------------------------------------------------------


def _toy_entries(vocab=16, seed=0):
    """Explicit ngram logprobs over small contexts (orders 1..4)."""
    rng = np.random.RandomState(seed)
    entries = {}
    for w in range(vocab):  # full unigram coverage
        entries[(w,)] = float(-rng.uniform(0.5, 6.0))
    for _ in range(120):
        n = rng.randint(1, 4)  # context length 1..3
        key = tuple(int(x) for x in rng.randint(0, vocab, size=n + 1))
        entries[key] = float(-rng.uniform(0.5, 6.0))
    return entries


class DictLM:
    """Strict dict LM: logscore is the stored value or -inf (like an NLTK
    MLE model for unseen ngrams)."""

    def __init__(self, entries):
        self.entries = entries

    def logscore(self, word, context):
        key = tuple(int(x) for x in context) + (int(word),)
        return self.entries.get(key, float("-inf"))


class BackoffLM:
    """Host ARPA-style backoff LM matching NGramTable's backoff recursion."""

    def __init__(self, entries, backoffs):
        self.entries = entries
        self.backoffs = backoffs

    def logscore(self, word, context):
        ctx = tuple(int(x) for x in context)
        w = int(word)
        acc = 0.0
        while True:
            if ctx + (w,) in self.entries:
                return acc + self.entries[ctx + (w,)]
            if not ctx:
                return float("-inf")
            acc += self.backoffs.get(ctx, 0.0)
            ctx = ctx[1:]


def test_table_fuser_matches_callback_strict():
    from stjep_tpu.infer.lm_table import NGramTable, make_table_fuser

    entries = _toy_entries()
    lm = DictLM(entries)
    fuse_cb = make_ngram_fuser(lm, "s-4g_0.5")
    table = NGramTable.from_ngrams(entries)
    assert not table.backoff
    fuse_dev = jax.jit(make_table_fuser(table, "s-4g_0.5"))

    rng = np.random.RandomState(3)
    B, V = 4, 16
    for step in (0, 1, 2, 3, 7):
        logps = np.log(rng.dirichlet(np.ones(V), size=B)).astype(np.float32)
        ctx = rng.randint(0, V, size=(B, 3)).astype(np.int32)
        want = fuse_cb(logps, ctx, step)
        got = np.asarray(fuse_dev(jnp.asarray(logps), jnp.asarray(ctx),
                                  jnp.int32(step)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_table_fuser_matches_callback_backoff():
    from stjep_tpu.infer.lm_table import NGramTable, make_table_fuser

    rng = np.random.RandomState(5)
    entries = _toy_entries(seed=5)
    backoffs = {}
    for key in list(entries):
        if len(key) <= 3 and rng.rand() < 0.6:
            backoffs[key] = float(-rng.uniform(0.1, 1.5))
    lm = BackoffLM(entries, backoffs)
    fuse_cb = make_ngram_fuser(lm, "s-4g_0.3")
    table = NGramTable.from_ngrams(entries, backoffs)
    assert table.backoff
    fuse_dev = jax.jit(make_table_fuser(table, "s-4g_0.3"))

    B, V = 3, 16
    for step in (0, 1, 2, 5):
        logps = np.log(rng.dirichlet(np.ones(V), size=B)).astype(np.float32)
        ctx = rng.randint(0, V, size=(B, 3)).astype(np.int32)
        want = fuse_cb(logps, ctx, step)
        got = np.asarray(fuse_dev(jnp.asarray(logps), jnp.asarray(ctx),
                                  jnp.int32(step)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_table_fuser_in_las_decode_matches_callback():
    """End-to-end: free-running LAS greedy decode with the on-device table
    produces the same symbols and logps as the host-callback path."""
    from stjep_tpu.config import ModelConfig
    from stjep_tpu.infer.lm_table import NGramTable, make_table_fuser
    from stjep_tpu.models.las_decoder import las_decoder_forward, las_decoder_init

    V = 16
    cfg = ModelConfig(
        enc_vocab_size=V, dec_vocab_size=V, enc_embedding_size=4,
        acous_dim=4, acous_hidden_size=4, dim_model=8, num_unilstm_dec=2,
        max_seq_len_src=9, dropout=0.0, mode="ASR",
    )
    params = las_decoder_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    acous = jnp.asarray(rng.randn(2, 6, 2 * cfg.acous_hidden_size)
                        .astype(np.float32))

    entries = _toy_entries(vocab=V, seed=2)
    lm = DictLM(entries)
    table = NGramTable.from_ngrams(entries)
    out_cb = las_decoder_forward(
        params, cfg, acous, lm_fuse=make_ngram_fuser(lm, "s-4g_0.4"))
    out_dev = las_decoder_forward(
        params, cfg, acous, lm_fuse=make_table_fuser(table, "s-4g_0.4"))
    np.testing.assert_array_equal(np.asarray(out_cb[2]), np.asarray(out_dev[2]))
    np.testing.assert_allclose(np.asarray(out_cb[1]), np.asarray(out_dev[1]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_cb[3]), np.asarray(out_dev[3]))


@pytest.mark.slow  # heavy integration: slow lane
def test_lm_fuse_plumbed_into_st_translate():
    """The reference threads lm_mode/lm_model into the LAS pass of EVERY
    translate mode (ref: Seq2seq.py:702,752,816,863), not just ASR: the ASR
    hypotheses that provide ST's static embeddings must be LM-fused. Pin
    that a biasing LM changes the ST hypotheses (the fuser is applied, not
    dropped on the floor)."""
    from stjep_tpu.config import ModelConfig
    from stjep_tpu.infer.forward import forward_translate
    from stjep_tpu.models.seq2seq import init_seq2seq

    cfg = ModelConfig(
        enc_vocab_size=16, dec_vocab_size=12, enc_embedding_size=8,
        dec_embedding_size=16, acous_dim=8, acous_hidden_size=8,
        dim_model=16, dim_feedforward=32, num_heads=2, enc_layers=1,
        dec_layers=1, num_unilstm_dec=2, spec_aug=False, dropout=0.0,
        max_seq_len_src=10, max_seq_len_tgt=12, mode="ASR_ST",
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(2, 32, 8).astype(np.float32))
    lens = jnp.asarray(np.array([32, 24], np.int32))

    class BiasLM:
        def logscore(self, word, context):
            return 50.0 if int(word) == 9 else -50.0

    fuse = make_ngram_fuser(BiasLM(), "s-4g_0.9")
    kw = dict(acous_feats=feats, acous_lens=lens, beam_width=2,
              penalty_factor=1.0, max_seq_len=12)
    base = np.asarray(forward_translate(params, cfg, "ST", **kw))
    for mode in ("ST", "ST_BASE"):
        fused = np.asarray(
            forward_translate(params, cfg, mode, lm_fuse=fuse, **kw))
        assert fused.shape == base.shape
    # the heavily biased LM must steer the (untrained) ASR hypotheses,
    # changing the ST translation inputs -> outputs differ from unfused
    fused_st = np.asarray(
        forward_translate(params, cfg, "ST", lm_fuse=fuse, **kw))
    assert not np.array_equal(fused_st, base)


@pytest.mark.slow  # heavy integration: slow lane (r5 re-budget)
def test_lm_fuse_in_forward_eval_asr():
    """forward_eval accepts lm_fuse like the reference's lm_mode/lm_model
    (ref: Seq2seq.py:548): the fused greedy ASR hypotheses differ under a
    strongly biased LM."""
    from stjep_tpu.config import ModelConfig
    from stjep_tpu.models.seq2seq import forward_eval, init_seq2seq

    cfg = ModelConfig(
        enc_vocab_size=16, dec_vocab_size=12, enc_embedding_size=8,
        dec_embedding_size=16, acous_dim=8, acous_hidden_size=8,
        dim_model=16, dim_feedforward=32, num_heads=2, enc_layers=1,
        dec_layers=1, num_unilstm_dec=2, spec_aug=False, dropout=0.0,
        max_seq_len_src=10, max_seq_len_tgt=12, mode="ASR",
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(2, 32, 8).astype(np.float32))
    lens = jnp.asarray(np.array([32, 24], np.int32))

    class BiasLM:
        def logscore(self, word, context):
            return 50.0 if int(word) == 9 else -50.0

    fuse = make_ngram_fuser(BiasLM(), "s-4g_0.9")
    base = forward_eval(params, cfg, "ASR", acous_feats=feats,
                        acous_lens=lens)
    fused = forward_eval(params, cfg, "ASR", acous_feats=feats,
                         acous_lens=lens, lm_fuse=fuse)
    assert not np.array_equal(np.asarray(base["preds_asr"]),
                              np.asarray(fused["preds_asr"]))


@pytest.mark.slow  # heavy integration: slow lane (r5 re-budget)
def test_lm_fuse_in_refen_asr_translate():
    """refen ASR passes lm_fuse into the teacher-forced LAS like the
    reference (ref: Seq2seq.py:816): emitted symbols are fused though the
    inputs come from the reference history."""
    from stjep_tpu.config import BOS, ModelConfig
    from stjep_tpu.infer.forward import forward_translate_refen
    from stjep_tpu.models.seq2seq import init_seq2seq

    cfg = ModelConfig(
        enc_vocab_size=16, dec_vocab_size=12, enc_embedding_size=8,
        dec_embedding_size=16, acous_dim=8, acous_hidden_size=8,
        dim_model=16, dim_feedforward=32, num_heads=2, enc_layers=1,
        dec_layers=1, num_unilstm_dec=2, spec_aug=False, dropout=0.0,
        max_seq_len_src=10, max_seq_len_tgt=12, mode="ASR",
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(2, 32, 8).astype(np.float32))
    lens = jnp.asarray(np.array([32, 24], np.int32))
    src = jnp.asarray(rng.randint(5, 16, size=(2, 10)).astype(np.int32))
    src = src.at[:, 0].set(BOS)

    class BiasLM:
        def logscore(self, word, context):
            return 50.0 if int(word) == 9 else -50.0

    fuse = make_ngram_fuser(BiasLM(), "s-4g_0.9")
    kw = dict(src=src, acous_feats=feats, acous_lens=lens, beam_width=1,
              penalty_factor=1.0, max_seq_len=12)
    base = np.asarray(forward_translate_refen(params, cfg, "ASR", **kw))
    fused = np.asarray(
        forward_translate_refen(params, cfg, "ASR", lm_fuse=fuse, **kw))
    assert not np.array_equal(base, fused)
