"""End-to-end trainer runs: full epoch loop with dev eval, checkpointing,
and the MT/ST/ASR_ST train paths."""

import os

import numpy as np
import pytest

import jax

from stjep_tpu.config import ModelConfig
from stjep_tpu.data.dataset import Dataset
from stjep_tpu.models.seq2seq import init_seq2seq
from stjep_tpu.train.checkpoint import Checkpoint
from stjep_tpu.train.trainer import (
    Trainer_ASR,
    Trainer_ASR_ST,
    Trainer_MT,
    Trainer_ST,
)

from tests.data_factory import make_corpus


def _cfg(corpus, mode):
    return ModelConfig(
        enc_vocab_size=corpus["vocab_src_size"],
        dec_vocab_size=corpus["vocab_tgt_size"],
        enc_embedding_size=8, dec_embedding_size=12,
        acous_dim=corpus["acous_dim"], acous_hidden_size=6,
        dim_model=12, dim_feedforward=24, num_heads=2, enc_layers=2,
        dec_layers=2, num_unilstm_dec=3, spec_aug=False, dropout=0.0,
        max_seq_len_src=16, max_seq_len_tgt=32, mode=mode,
    )


def _dataset(corpus, mode, with_tgt=True):
    return Dataset(
        path_src=corpus["path_src"],
        path_tgt=corpus["path_tgt"] if with_tgt else None,
        path_vocab_src=corpus["path_vocab_src"],
        path_vocab_tgt=corpus["path_vocab_tgt"],
        acous_path=corpus["acous_path"] if mode != "MT" else None,
        acous_norm_path=corpus["acous_norm_path"],
        acous_norm=(mode != "MT"),
        max_seq_len_src=16, max_seq_len_tgt=32, batch_size=8,
        use_type="char", mode=mode, seed=5,
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_corpus(str(tmp_path_factory.mktemp("corpus")), n_sent=16)


def test_trainer_asr_full_loop(corpus, tmp_path):
    ds = _dataset(corpus, "ASR", with_tgt=False)
    cfg = _cfg(corpus, "ASR")
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    t = Trainer_ASR(
        expt_dir=str(tmp_path / "expt"), batch_size=8, minibatch_partition=2,
        checkpoint_every=2, print_every=2, learning_rate=0.005,
        learning_rate_init=0.005, lr_warmup_steps=0, seed=0, keep_num=1,
    )
    cfg, params = t.train(
        {"asr": ds}, (cfg, params), num_epochs=2, dev_sets={"asr": ds}
    )
    latest = Checkpoint.get_latest_checkpoint(str(tmp_path / "expt"))
    assert latest is not None
    ck = Checkpoint.load(latest)
    assert ck.input_vocab == ds.vocab_src


@pytest.mark.parametrize("mode,cls,key", [
    # MT/ST arms: slow lane (r5 re-budget); the joint ASR_ST arm keeps the
    # flagship trainer smoke in the default lane
    pytest.param("MT", Trainer_MT, "mt", marks=pytest.mark.slow),
    pytest.param("ST", Trainer_ST, "st", marks=pytest.mark.slow),
    ("ASR_ST", Trainer_ASR_ST, "st"),
])
def test_trainer_modes_run(corpus, tmp_path, mode, cls, key):
    ds = _dataset(corpus, "MT" if mode == "MT" else "ST")
    cfg = _cfg(corpus, mode)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    t = cls(
        expt_dir=str(tmp_path / f"expt_{mode}"), batch_size=8,
        minibatch_partition=2, checkpoint_every=100, print_every=100,
        learning_rate=0.005, learning_rate_init=0.005, lr_warmup_steps=0,
        seed=0,
    )
    cfg, params = t.train({key: ds}, (cfg, params), num_epochs=1,
                          dev_sets={key: None})
    assert params is not None


@pytest.mark.slow  # heavy integration: slow lane (r5 re-budget)
def test_trainer_resume(corpus, tmp_path):
    ds = _dataset(corpus, "ASR", with_tgt=False)
    cfg = _cfg(corpus, "ASR")
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    expt = str(tmp_path / "expt")
    t = Trainer_ASR(
        expt_dir=expt, batch_size=8, minibatch_partition=2,
        checkpoint_every=2, print_every=100, learning_rate=0.005,
        learning_rate_init=0.005, lr_warmup_steps=0, seed=0,
    )
    t.train({"asr": ds}, (cfg, params), num_epochs=1, dev_sets={"asr": ds})
    latest = Checkpoint.get_latest_checkpoint(expt)
    assert latest is not None

    t2 = Trainer_ASR(
        expt_dir=expt, load_dir=latest, load_mode="resume",
        batch_size=8, minibatch_partition=2, checkpoint_every=100,
        print_every=100, learning_rate=0.005, learning_rate_init=0.005,
        lr_warmup_steps=0, seed=0,
    )
    params2 = init_seq2seq(jax.random.PRNGKey(7), cfg)
    cfg, out = t2.train({"asr": ds}, (cfg, params2), num_epochs=2,
                        dev_sets={"asr": None})
    assert out is not None
