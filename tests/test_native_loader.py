"""Native C++ batch loader parity vs the numpy path."""

import numpy as np
import pytest

from stjep_tpu.data.dataset import Dataset
from stjep_tpu.data.loader import get_native_loader
from stjep_tpu.ops.masks import round_up8

from tests.data_factory import make_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_corpus(str(tmp_path_factory.mktemp("nl")), n_sent=12)


def test_native_loader_builds():
    nl = get_native_loader()
    assert nl is not None, "native loader failed to build (g++ available?)"


def test_native_matches_numpy(corpus):
    ds = Dataset(
        path_src=corpus["path_src"], path_tgt=corpus["path_tgt"],
        path_vocab_src=corpus["path_vocab_src"],
        path_vocab_tgt=corpus["path_vocab_tgt"],
        acous_path=corpus["acous_path"],
        acous_norm_path=corpus["acous_norm_path"], acous_norm=True,
        max_seq_len_src=16, max_seq_len_tgt=64, batch_size=6,
        use_type="char", mode="ST", seed=2,
    )
    ds.construct_batches(is_train=False)
    b = ds.batches[0]
    norm = ds.load_mu_std(b["acous_spkids"])

    # numpy reference path
    ref = Dataset.load_acous(ds, b["acous_flis"], norm_param=norm)

    nl = get_native_loader()
    T = int(round_up8(max(b["acous_lengths"])))
    got = nl.load_batch(b["acous_flis"], T, corpus["acous_dim"], norm_param=norm)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_native_no_norm(corpus):
    ds = Dataset(
        path_src=corpus["path_src"], path_tgt=corpus["path_tgt"],
        path_vocab_src=corpus["path_vocab_src"],
        path_vocab_tgt=corpus["path_vocab_tgt"],
        acous_path=corpus["acous_path"], acous_norm=False,
        max_seq_len_src=16, max_seq_len_tgt=64, batch_size=6,
        use_type="char", mode="ST", seed=2,
    )
    ds.construct_batches(is_train=False)
    b = ds.batches[0]
    ref = Dataset.load_acous(ds, b["acous_flis"])
    nl = get_native_loader()
    T = int(round_up8(max(b["acous_lengths"])))
    got = nl.load_batch(b["acous_flis"], T, corpus["acous_dim"])
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_prefetch_to_device(corpus):
    from stjep_tpu.data.loader import prefetch_to_device

    ds = Dataset(
        path_src=corpus["path_src"], path_tgt=corpus["path_tgt"],
        path_vocab_src=corpus["path_vocab_src"],
        path_vocab_tgt=corpus["path_vocab_tgt"],
        acous_path=corpus["acous_path"], acous_norm=False,
        max_seq_len_src=16, max_seq_len_tgt=64, batch_size=6,
        use_type="char", mode="ST", seed=2,
    )
    ds.construct_batches(is_train=False)
    items = list(prefetch_to_device(ds.iter_batches()))
    assert len(items) == len(ds)
    import jax

    assert isinstance(items[0]["srcid"], jax.Array)
