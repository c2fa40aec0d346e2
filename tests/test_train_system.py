"""Training system tests: LR schedule math, checkpoints, load/freeze
policies, and a tiny end-to-end train run whose loss must drop."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from stjep_tpu.config import ModelConfig
from stjep_tpu.data.dataset import Dataset
from stjep_tpu.models.seq2seq import init_seq2seq
from stjep_tpu.train.checkpoint import Checkpoint, combine_weights
from stjep_tpu.train.optim import get_lr, make_optimizer, reference_lr, set_lr
from stjep_tpu.train.policies import (
    apply_load_mode,
    iter_paths,
    path_str,
    trainable_mask,
)
from stjep_tpu.train.trainer import Trainer_ASR

from tests.data_factory import make_corpus


def _tiny_cfg(mode="ASR"):
    return ModelConfig(
        enc_vocab_size=20, dec_vocab_size=15, enc_embedding_size=8,
        dec_embedding_size=12, acous_dim=8, acous_hidden_size=6,
        dim_model=12, dim_feedforward=24, num_heads=2, enc_layers=2,
        dec_layers=2, num_unilstm_dec=3, spec_aug=False, dropout=0.0,
        max_seq_len_src=16, max_seq_len_tgt=24, mode=mode,
    )


def test_reference_lr_formula():
    # warmup region: linear init->peak (ref: trainer_base.py:146)
    lr = float(reference_lr(8000, 0.0005, 0.00001, 16000))
    expect = 8000 * (0.00001 - 0.0005) / 16000 + 0.0005
    assert lr == pytest.approx(expect, rel=1e-6)
    # decay region (ref: trainer_base.py:149)
    lr = float(reference_lr(32000, 0.0005, 0.001, 16000))
    assert lr == pytest.approx(0.001 * 32000**-0.5 * 16000**0.5, rel=1e-6)
    # disabled
    assert float(reference_lr(5, 0.3, 0.9, 0)) == pytest.approx(0.3)


def test_optimizer_freeze_and_lr():
    params = {"a": jnp.ones(3), "b": jnp.ones(3)}
    mask = {"a": True, "b": False}
    tx = make_optimizer(1.0, mask)
    state = tx.init(params)
    state = set_lr(state, 0.5)
    assert get_lr(state) == pytest.approx(0.5)
    grads = {"a": jnp.ones(3), "b": jnp.ones(3)}
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert not np.allclose(np.asarray(new["a"]), 1.0)  # trained
    np.testing.assert_allclose(np.asarray(new["b"]), 1.0)  # frozen


def test_grad_clip_before_adam():
    params = {"a": jnp.zeros(4)}
    tx = make_optimizer(max_grad_norm=1.0)
    state = set_lr(tx.init(params), 1.0)
    big = {"a": jnp.full(4, 100.0)}
    updates, _ = tx.update(big, state, params)
    # adam normalises magnitude anyway; just confirm finite + right sign
    assert np.all(np.asarray(updates["a"]) < 0)


def test_checkpoint_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1.0)
    opt_state = tx.init(params)
    ck = Checkpoint(params, opt_state=opt_state, epoch=3, step=77,
                    input_vocab=["a"], output_vocab=["b"])
    path = ck.save(str(tmp_path))
    back = Checkpoint.load(path, params_template=params,
                           opt_state_template=opt_state)
    assert back.epoch == 3 and back.step == 77
    for (p1, l1), (p2, l2) in zip(iter_paths(params), iter_paths(back.params)):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert Checkpoint.get_latest_checkpoint(str(tmp_path)) == path


def test_checkpoint_rm_old(tmp_path):
    cfg = _tiny_cfg()
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    paths = []
    for i in range(4):
        ck = Checkpoint(params, epoch=i, step=i)
        paths.append(ck.save(str(tmp_path)))
    ck.rm_old(str(tmp_path), keep_num=2)
    left = sorted(os.listdir(os.path.join(str(tmp_path), "checkpoints")))
    assert len(left) == 2
    assert Checkpoint.get_latest_checkpoint(str(tmp_path)) == paths[-1]


def test_combine_weights(tmp_path):
    cfg = _tiny_cfg()
    base = str(tmp_path / "pool")
    trees = []
    for i in range(3):
        p = init_seq2seq(jax.random.PRNGKey(i), cfg)
        trees.append(p)
        Checkpoint(p, epoch=i, step=i).save_customise(os.path.join(base, f"c{i}"))
    avg = combine_weights(base, params_template=trees[0])
    leaf = lambda t: np.asarray(t["enc_embedder"])
    np.testing.assert_allclose(
        leaf(avg), (leaf(trees[0]) + leaf(trees[1]) + leaf(trees[2])) / 3.0,
        rtol=1e-6,
    )


def test_load_mode_las_policy():
    cfg = _tiny_cfg("ASR")
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    donor = init_seq2seq(jax.random.PRNGKey(1), cfg)
    new, mask = apply_load_mode(params, donor, "LAS", load_freeze=True)
    # encoder copied, decoder untouched
    np.testing.assert_array_equal(
        np.asarray(new["las"]["encoder"]["acous_enc_l1"]["fwd"]["w_ih"]),
        np.asarray(donor["las"]["encoder"]["acous_enc_l1"]["fwd"]["w_ih"]),
    )
    np.testing.assert_array_equal(
        np.asarray(new["las"]["decoder"]["acous_out"]["w"]),
        np.asarray(params["las"]["decoder"]["acous_out"]["w"]),
    )
    # frozen exactly las.encoder.*
    for path, trainable in iter_paths(mask):
        name = path_str(path)
        if name.startswith("las.encoder"):
            assert not trainable
        elif name == "emb_dyn_ave":
            assert not trainable
        else:
            assert trainable, name


def test_load_mode_asr_partial_policy():
    cfg = _tiny_cfg("ASR")
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    donor = init_seq2seq(jax.random.PRNGKey(1), cfg)
    _, mask = apply_load_mode(params, donor, "ASR-PARTIAL", load_freeze=True)
    for path, trainable in iter_paths(mask):
        name = path_str(path)
        if name.startswith("las.decoder.acous_out"):
            assert trainable
        elif name.startswith("las."):
            assert not trainable


@pytest.mark.slow  # heavy integration: slow lane (r5 re-budget)
def test_tiny_asr_training_loss_drops(tmp_path):
    corpus = make_corpus(str(tmp_path / "data"), n_sent=16)
    ds = Dataset(
        path_src=corpus["path_src"],
        path_vocab_src=corpus["path_vocab_src"],
        path_vocab_tgt=corpus["path_vocab_tgt"],
        acous_path=corpus["acous_path"], acous_norm=False,
        max_seq_len_src=16, max_seq_len_tgt=24, batch_size=8,
        mode="ASR", seed=3,
    )
    cfg = _tiny_cfg("ASR")
    cfg = type(cfg)(**{**cfg.__dict__, "enc_vocab_size": corpus["vocab_src_size"],
                       "dec_vocab_size": corpus["vocab_tgt_size"]})
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    t = Trainer_ASR(
        expt_dir=str(tmp_path / "expt"), batch_size=8, minibatch_partition=2,
        checkpoint_every=1000, print_every=1000,
        learning_rate=0.01, learning_rate_init=0.01, lr_warmup_steps=0,
        max_grad_norm=1.0, seed=0,
    )
    # run a few manual steps to watch loss
    from stjep_tpu.train.optim import make_optimizer

    t._tx = make_optimizer(1.0, trainable_mask(params, lambda n: False))
    opt_state = t._tx.init(params)
    ds.construct_batches(is_train=False)
    item = ds.materialise_batch(0)
    losses0 = None
    for step in range(1, 41):
        params, opt_state, losses = t._train_batch(cfg, params, opt_state, item, step)
        if losses0 is None:
            losses0 = losses["nll_loss_en"]
    assert losses["nll_loss_en"] < losses0 * 0.6, (losses0, losses)


def test_device_batch_ragged_minibatch_partition(tmp_path):
    """The CLI defaults (batch_size=64, minibatch_partition=20 -> mini=3)
    give a partition that does not divide the batch; the reference runs a
    ragged final minibatch (ref: trainer_asr.py:215-216), here the batch
    pads to a multiple of mini with all-PAD rows and the loss divisor stays
    ceil(B/mini)."""
    t = Trainer_ASR(
        expt_dir=str(tmp_path / "expt"), batch_size=64,
        minibatch_partition=20, learning_rate=0.01,
        learning_rate_init=0.01, lr_warmup_steps=0, seed=0,
    )
    assert t.minibatch_size == 3
    item = {"srcid": np.full((64, 5), 7, np.int32)}
    macro, n_real = t._device_batch(item, 64)
    assert macro["srcid"].shape == (22, 3, 5)  # 66 rows = 22 x 3
    assert n_real == 22.0  # ceil(64/3), the reference divisor
    assert np.all(macro["srcid"][-1, 1:] == 0)  # padded rows are all-PAD

    # ragged REAL batch (last macro batch of an epoch), mini divides pad_to
    item2 = {"srcid": np.full((5, 5), 7, np.int32)}
    macro2, n_real2 = t._device_batch(item2, 64)
    assert macro2["srcid"].shape == (22, 3, 5)
    assert n_real2 == 2.0  # ceil(5/3)


def test_negative_warmup_disables_scheduler(tmp_path):
    """warmup_steps <= 0 deactivates the scheduler entirely, so the
    rollback LR-halving persists (ref: trainer_base.py:141-143)."""
    for warm in (0, -1):
        t = Trainer_ASR(
            expt_dir=str(tmp_path / f"e{warm}"), batch_size=8,
            minibatch_partition=2, learning_rate=0.1,
            learning_rate_init=0.1, lr_warmup_steps=warm, seed=0,
        )
        t._lr_curr = 0.05  # simulate a rollback halving
        assert t._current_lr(100) == 0.05
