"""Multi-step window executor (Trainer._build_window_step / _window_stream).

With the device cache active the trainer may run K consecutive steps as ONE
jitted program (outer lax.scan over steps). Invariants pinned here:

- trained params are IDENTICAL to the single-step path (same RNG sequence —
  K successive root splits — same per-step LR schedule, same batches), with
  dropout both off and ON (the RNG-stream equality is load-bearing)
- windows never straddle a print/checkpoint boundary and never mix acoustic
  time buckets; the stream's step accounting matches the epoch loop's
- reported window losses are the sum of the K per-step losses (the print
  path divides by print_every, as the reference does,
  ref: trainer/trainer_asr.py:367-373)
"""

import numpy as np
import pytest

import jax

from stjep_tpu.config import ModelConfig
from stjep_tpu.data.dataset import Dataset
from stjep_tpu.models.seq2seq import init_seq2seq
from stjep_tpu.train.trainer import Trainer_ASR_ST

from tests.data_factory import make_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_corpus(str(tmp_path_factory.mktemp("corpus")), n_sent=32)


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


def _cfg(corpus, dropout=0.0):
    return ModelConfig(
        enc_vocab_size=corpus["vocab_src_size"],
        dec_vocab_size=corpus["vocab_tgt_size"],
        enc_embedding_size=8, dec_embedding_size=12,
        acous_dim=corpus["acous_dim"], acous_hidden_size=6,
        dim_model=12, dim_feedforward=24, num_heads=2, enc_layers=2,
        dec_layers=2, num_unilstm_dec=3, spec_aug=False, dropout=dropout,
        max_seq_len_src=16, max_seq_len_tgt=32, mode="ASR_ST",
    )


def _trainer(tmp_path, name, **kw):
    return Trainer_ASR_ST(
        expt_dir=str(tmp_path / name), batch_size=8, minibatch_partition=2,
        checkpoint_every=10 ** 9, print_every=10 ** 9, learning_rate=0.003,
        learning_rate_init=0.003, lr_warmup_steps=0, seed=0,
        loss_coeff={"nll_asr": 1.0, "nll_st": 1.0}, device_cache=True, **kw,
    )


@pytest.mark.parametrize(
    "dropout",
    [
     # slow lane both arms: the window executor is default-off and its
     # core equality is re-checked by every slow-lane run (r5 re-budget)
     pytest.param(0.0, marks=pytest.mark.slow),
     pytest.param(0.2, marks=pytest.mark.slow)])
def test_window_matches_single_step(corpus, tmp_path, dropout):
    """2 epochs x 4 steps with train_window=4 == the single-step path,
    leaf-for-leaf. Covers the RNG sequence (dropout=0.2 arm), per-step LR,
    loss scaling, and the scan xs staging."""
    cfg = _cfg(corpus, dropout=dropout)
    outs = {}
    for name, win in (("single", 1), ("window", 4)):
        ds = _dataset(corpus)  # fresh dataset: identical shuffle stream
        params = init_seq2seq(jax.random.PRNGKey(0), cfg)
        t = _trainer(tmp_path, "%s_%s" % (name, dropout), train_window=win)
        _, outs[name] = t.train({"st": ds}, (cfg, params), num_epochs=2)
        if win > 1:
            assert any(isinstance(k, tuple) and k[0] == "window"
                       for k in t._step_fns), "no window program was built"
    a = jax.tree_util.tree_leaves(outs["single"])
    b = jax.tree_util.tree_leaves(outs["window"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32),
            rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # window executor is default-off; covered by the
# default-lane dropout=0.0 equality arm
def test_window_program_equals_four_single_steps(corpus, tmp_path):
    """Direct unit test of _build_window_step: the same 4 batches through
    4 single-step calls == one 4-window call (params, opt moments) and the
    window's reported losses equal the SUM of the per-step losses."""
    import jax.numpy as jnp

    from stjep_tpu.data.device_cache import DeviceFeatureCache
    from stjep_tpu.train.optim import make_optimizer
    from stjep_tpu.train.policies import trainable_mask

    cfg = _cfg(corpus)
    ds = _dataset(corpus)
    ds.construct_batches(is_train=False)
    t = _trainer(tmp_path, "unit", train_window=4)
    t._setup_mesh()
    t._feat_cache = DeviceFeatureCache.build(
        ds, t.acous_bucket, np.float32, mesh=t._mesh)
    cache = t._feat_cache.arrays
    items = [ds.materialise_batch(i, with_acous=False) for i in range(4)]
    hms = [t._host_macro(dict(it)) for it in items]
    assert len({hm[2] for hm in hms}) == 1, "test corpus buckets diverged"
    t_bucket = hms[0][2]

    params = t._place(init_seq2seq(jax.random.PRNGKey(0), cfg))
    t._tx = make_optimizer(1.0, trainable_mask(params, lambda n: False))
    ks, k0 = [], jax.random.PRNGKey(7)
    for _ in range(4):
        k0, k = jax.random.split(k0)
        ks.append(k)
    lrs = np.asarray([1e-3, 2e-3, 3e-3, 4e-3], np.float32)

    # 4 single steps (params copies: the step donates its inputs)
    p, o = params, t._init_opt(params)
    step = t._build_step(cfg, t._tx, t_bucket=t_bucket)
    loss_sum = {}
    for i in range(4):
        macro, n_real, _ = t._place_macro(hms[i])
        p, o, losses = step(p, o, macro, cache, ks[i],
                            jnp.float32(lrs[i]), jnp.float32(1.0 / n_real))
        for key, v in losses.items():
            loss_sum[key] = loss_sum.get(key, 0.0) + float(v)

    # one 4-step window
    params2 = t._place(init_seq2seq(jax.random.PRNGKey(0), cfg))
    macros, inv_ns, _, k_steps = t._stage_window(hms)
    win = t._build_window_step(cfg, t._tx, t_bucket, k_steps)
    p2, o2, wlosses = win(params2, t._init_opt(params2), macros, cache,
                          jnp.stack(ks), jnp.asarray(lrs),
                          jnp.asarray(inv_ns))

    for key, v in wlosses.items():
        np.testing.assert_allclose(float(v), loss_sum[key],
                                   rtol=1e-5, atol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves((p, o)),
                    jax.tree_util.tree_leaves((p2, o2))):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32),
            rtol=1e-5, atol=1e-6)


def test_window_stream_boundaries_and_buckets(tmp_path):
    """Unit-test the grouping generator: print boundaries force singles,
    bucket changes flush, step accounting covers every batch once."""
    t = Trainer_ASR_ST(expt_dir=str(tmp_path / "ws"), batch_size=8,
                       checkpoint_every=10 ** 9, print_every=5,
                       learning_rate=0.003, learning_rate_init=0.003,
                       lr_warmup_steps=0, device_cache=True)

    buckets = [64] * 10

    def fake_host_macro(item):
        return ({"x": np.zeros((1, 1), np.int32)}, 1.0, buckets[item])

    t._host_macro = fake_host_macro
    t._place_macro = lambda s, batch_axis=1: ("S", s[2])
    t._stage_window = lambda ss: ("W", ss[0][2], None, len(ss))

    out = list(t._window_stream(iter(range(10)), 0, 10, 2))
    kinds = [o[0] for o in out]
    # boundaries at 5 and 10: steps 1-2 W, 3-4 W, 5 S, 6-7 W, 8-9 W, 10 S
    assert kinds == ["W", "W", "S", "W", "W", "S"]
    assert sum(o[3] if o[0] == "W" else 1 for o in out) == 10

    # bucket change mid-pending flushes the pending item as a single;
    # a window may END on a boundary (steps 4-5 below), never straddle one
    buckets = [64, 64, 64, 128, 128, 128, 128, 128, 128, 128]
    out = list(t._window_stream(iter(range(10)), 0, 10, 2))
    kinds = [(o[0], o[1]) for o in out]
    assert kinds == [("W", 64), ("S", 64), ("W", 128), ("W", 128),
                     ("W", 128), ("S", 128)]
    assert sum(o[3] if o[0] == "W" else 1 for o in out) == 10
