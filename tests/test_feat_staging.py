"""Feature-staging compression: int8 quantization and the device-resident
feature cache (stjep_tpu/data/device_cache.py).

The reference has no staging compression (it re-stages float tensors to the
GPU every step, ref: trainer/trainer_asr.py:219-233); these are TPU-native
additions for tunnel/DCN-attached hosts. Invariants pinned here:

- int8 round-trip error is bounded by half a quantization step
- the int8-staged train step trains (finite losses, params move) and its
  first-step loss sits within quantization noise of the float32-staged one
- the device-cache path is numerically IDENTICAL to direct float staging
  (same loads, same CMVN, same padding, same RNG -> same trained params)
- both paths run under the virtual multi-device mesh (conftest forces 8
  CPU devices, so Trainer builds a (data, model) mesh automatically)
"""

import numpy as np
import pytest

import jax

from stjep_tpu.config import ModelConfig
from stjep_tpu.data.dataset import Dataset
from stjep_tpu.data.device_cache import (
    DeviceFeatureCache,
    dequantize,
    quantize_batch,
)
from stjep_tpu.models.seq2seq import init_seq2seq
from stjep_tpu.train.trainer import Trainer_ASR_ST

from tests.data_factory import make_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_corpus(str(tmp_path_factory.mktemp("corpus")), n_sent=16)


def _dataset(corpus, seed=5):
    return Dataset(
        path_src=corpus["path_src"], path_tgt=corpus["path_tgt"],
        path_vocab_src=corpus["path_vocab_src"],
        path_vocab_tgt=corpus["path_vocab_tgt"],
        acous_path=corpus["acous_path"],
        acous_norm_path=corpus["acous_norm_path"], acous_norm=True,
        max_seq_len_src=16, max_seq_len_tgt=32, batch_size=8,
        use_type="char", mode="ST", seed=seed,
    )


def _cfg(corpus):
    return ModelConfig(
        enc_vocab_size=corpus["vocab_src_size"],
        dec_vocab_size=corpus["vocab_tgt_size"],
        enc_embedding_size=8, dec_embedding_size=12,
        acous_dim=corpus["acous_dim"], acous_hidden_size=6,
        dim_model=12, dim_feedforward=24, num_heads=2, enc_layers=2,
        dec_layers=2, num_unilstm_dec=3, spec_aug=False, dropout=0.0,
        max_seq_len_src=16, max_seq_len_tgt=32, mode="ASR_ST",
    )


def _trainer(tmp_path, name, **kw):
    return Trainer_ASR_ST(
        expt_dir=str(tmp_path / name), batch_size=8, minibatch_partition=2,
        checkpoint_every=10 ** 9, print_every=10 ** 9, learning_rate=0.003,
        learning_rate_init=0.003, lr_warmup_steps=0, seed=0,
        loss_coeff={"nll_asr": 1.0, "nll_st": 1.0}, **kw,
    )


def test_quantize_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    feats = rng.randn(3, 4, 24, 8).astype(np.float32) * 3.0
    feats[1, 2] = 0.0  # all-zero utterance: scale 0, dequant must stay 0
    qd = quantize_batch(feats, np.float32)
    assert qd["q"].dtype == np.int8 and qd["scale"].shape == (3, 4)
    deq = np.asarray(dequantize(qd["q"], qd["scale"]))
    amax = np.abs(feats).max(axis=(-2, -1), keepdims=True)
    assert np.all(np.abs(deq - feats) <= amax / 127.0 * 0.5 + 1e-7)
    assert np.all(deq[1, 2] == 0.0)


def test_quantize_scale_dtype_is_dequant_dtype():
    feats = np.random.RandomState(1).randn(2, 8, 4).astype(np.float32)
    qd = quantize_batch(feats, "bfloat16")
    deq = dequantize(jax.numpy.asarray(qd["q"]),
                     jax.numpy.asarray(qd["scale"]))
    assert str(deq.dtype) == "bfloat16"


@pytest.mark.slow  # 17 s end-to-end numerical check; the int8 plumbing
# stays covered in-lane by quantize/dequantize unit tests + auto-cache
def test_int8_staged_loss_matches_f32(corpus, tmp_path):
    """One step from IDENTICAL params: the int8-staged loss sits within
    quantization noise of the float32-staged loss (updates are not applied
    before measuring, so no chaotic trajectory amplification)."""
    import jax.numpy as jnp

    from stjep_tpu.train.optim import make_optimizer
    from stjep_tpu.train.policies import trainable_mask

    ds = _dataset(corpus)
    cfg = _cfg(corpus)
    ds.construct_batches(is_train=False)
    item = ds.materialise_batch(0)
    losses = {}
    for name, feat_dtype in (("f32", None), ("int8", "int8")):
        # fresh params per arm: the step donates them
        params = init_seq2seq(jax.random.PRNGKey(0), cfg)
        t = _trainer(tmp_path, "probe_" + name, feat_dtype=feat_dtype)
        t._tx = make_optimizer(1.0, trainable_mask(params, lambda n: False))
        opt_state = t._tx.init(params)
        macro, n_real, _ = t._stage_batch(dict(item))
        if name == "int8":
            assert macro["acous_feat"].dtype == np.int8
            assert "acous_scale" in macro
        step = t._build_step(cfg, t._tx)
        _, _, out = step(params, opt_state, macro, {}, jax.random.PRNGKey(1),
                         jnp.float32(0.0), jnp.float32(1.0 / n_real))
        losses[name] = {k: float(v) for k, v in out.items()}
    for k, ref in losses["f32"].items():
        got = losses["int8"][k]
        assert np.isfinite(got)
        assert abs(got - ref) <= 0.02 * abs(ref) + 1e-3, (k, got, ref)


@pytest.mark.slow  # heavy integration: slow lane (r5 re-budget)
def test_int8_staged_training_runs(corpus, tmp_path):
    ds = _dataset(corpus)
    cfg = _cfg(corpus)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    t = _trainer(tmp_path, "int8_train", feat_dtype="int8")
    cfg, out = t.train({"st": ds}, (cfg, params), num_epochs=1)
    p0 = jax.tree_util.tree_leaves(init_seq2seq(jax.random.PRNGKey(0), cfg))
    p1 = jax.tree_util.tree_leaves(out)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(p0, p1)
    ), "int8-staged training did not update params"
    for v in t._last_losses().values():
        assert np.isfinite(float(v))


@pytest.mark.slow  # heavy integration: slow lane (r5 re-budget)
def test_device_cache_matches_direct_staging(corpus, tmp_path):
    cfg = _cfg(corpus)
    outs = {}
    for name, kw in (("direct", {"device_cache": False}),
                     ("cached", {"device_cache": True})):
        ds = _dataset(corpus)  # fresh dataset: identical shuffle stream
        params = init_seq2seq(jax.random.PRNGKey(0), cfg)
        t = _trainer(tmp_path, name, **kw)
        _, outs[name] = t.train({"st": ds}, (cfg, params), num_epochs=2)
        if name == "cached":
            assert t._feat_caches, "device cache was never built"
            cache = next(iter(t._feat_caches.values()))
            assert cache.feats.dtype == np.float32
            assert cache.scale is None
    a = jax.tree_util.tree_leaves(outs["direct"])
    b = jax.tree_util.tree_leaves(outs["cached"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32),
            rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # heavy integration: slow lane
def test_device_cache_int8(corpus, tmp_path):
    """Cache + int8 compose: rows stored int8 with per-utterance scales,
    training runs to finite losses under the (virtual) mesh."""
    ds = _dataset(corpus)
    cfg = _cfg(corpus)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    t = _trainer(tmp_path, "cache_i8", device_cache=True, feat_dtype="int8")
    cfg, params = t.train({"st": ds}, (cfg, params), num_epochs=2)
    cache = next(iter(t._feat_caches.values()))
    assert cache.feats.dtype == np.int8 and cache.scale is not None
    for v in t._last_losses().values():
        assert np.isfinite(float(v))


def test_cache_rows_roundtrip(corpus):
    ds = _dataset(corpus)
    cache = DeviceFeatureCache.build(ds, acous_bucket=256,
                                     feat_dtype=np.float32)
    ds.construct_batches(is_train=True)
    item = ds.materialise_batch(0, with_acous=False)
    assert "_flis" in item and "acous_feat" not in item
    rows = cache.rows(item["_flis"])
    # the gathered row equals what load_acous produces for that utterance
    direct = ds.load_acous(item["_flis"][:1],
                           norm_param=ds.load_mu_std(
                               [ds.train_acous_spkids[
                                   ds.train_acous_flis.index(
                                       item["_flis"][0])]]),
                           lengths=[int(item["acouslen"][0])])
    got = np.asarray(cache.feats)[rows[0], : direct.shape[1]]
    np.testing.assert_allclose(got, direct[0], rtol=1e-6, atol=1e-6)


def test_auto_cache_estimate_matches_build(corpus):
    """The auto heuristic's size estimate equals what build() actually
    allocates (f32 and int8), without loading any features."""
    from stjep_tpu.data.device_cache import estimate_corpus_bytes

    ds = _dataset(corpus)
    for dt in (np.float32, np.int8):
        need = estimate_corpus_bytes(ds, 256, dt)
        cache = DeviceFeatureCache.build(ds, acous_bucket=256, feat_dtype=dt)
        assert need == cache.nbytes, dt


def test_auto_cache_budget_env_override(monkeypatch):
    from stjep_tpu.data.device_cache import hbm_cache_budget

    monkeypatch.setenv("STJEP_CACHE_BUDGET_MB", "3")
    assert hbm_cache_budget() == 3 * 2 ** 20
    monkeypatch.delenv("STJEP_CACHE_BUDGET_MB")
    assert hbm_cache_budget() > 0


@pytest.mark.slow  # heavy integration: slow lane (r5 re-budget)
def test_auto_cache_enables_when_fits(corpus, tmp_path, monkeypatch):
    """device_cache='auto' (the default) + a corpus inside the budget ->
    the cache is built (replicated across the active 8-device virtual
    mesh) and training runs through the gather path."""
    monkeypatch.setenv("STJEP_CACHE_BUDGET_MB", "10000")
    ds = _dataset(corpus)
    cfg = _cfg(corpus)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    t = _trainer(tmp_path, "auto_fit")  # device_cache defaults to "auto"
    assert t.device_cache == "auto"
    t.train({"st": ds}, (cfg, params), num_epochs=1)
    built = [v for v in t._feat_caches.values()
             if isinstance(v, DeviceFeatureCache)]
    assert built and t._feat_cache is not None
    for v in t._last_losses().values():
        assert np.isfinite(float(v))


@pytest.mark.slow  # heavy integration: slow lane (r5 re-budget)
def test_auto_cache_disables_when_too_big(corpus, tmp_path, monkeypatch):
    """Zero budget -> auto decides per-step staging; training still runs."""
    monkeypatch.setenv("STJEP_CACHE_BUDGET_MB", "0")
    ds = _dataset(corpus)
    cfg = _cfg(corpus)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    t = _trainer(tmp_path, "auto_nofit", device_cache="auto")
    t.train({"st": ds}, (cfg, params), num_epochs=1)
    assert not any(isinstance(v, DeviceFeatureCache)
                   for v in t._feat_caches.values())
    assert t._feat_cache is None
    for v in t._last_losses().values():
        assert np.isfinite(float(v))
