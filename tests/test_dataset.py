"""Dataset pipeline tests incl. golden tokenisation vs the reference oracle."""

import numpy as np
import pytest

from stjep_tpu.config import BOS, EOS, PAD, SPC, UNK
from stjep_tpu.data.dataset import Dataset, load_vocab_file, tokenize_src, tokenize_tgt
from stjep_tpu.utils.metrics import corpus_bleu

from tests.data_factory import make_corpus
from tests.reference_oracle import load_reference, reference_available


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_corpus(str(tmp_path_factory.mktemp("corpus")))


def test_vocab_blank_line_consumes_id(tmp_path):
    p = tmp_path / "v.txt"
    p.write_text("<pad>\n<unk>\n\nword\n")
    vocab, w2i, i2w = load_vocab_file(str(p))
    # blank line consumed id 2; 'word' gets id 3 (ref: dataset.py:265-271)
    assert w2i["word"] == 3
    assert vocab == ["<pad>", "<unk>", "word"]


def test_tokenize_src_unk_bos_eos():
    w2i = {"hello": 7}
    assert tokenize_src(["hello", "zzz"], w2i) == [BOS, 7, UNK, EOS]


def test_tokenize_tgt_char_spc():
    w2i = {"a": 5, "b": 6}
    assert tokenize_tgt("a b", w2i, "char") == [BOS, 5, SPC, 6, EOS]


def test_dataset_st_end_to_end(corpus):
    ds = Dataset(
        path_src=corpus["path_src"], path_tgt=corpus["path_tgt"],
        path_vocab_src=corpus["path_vocab_src"],
        path_vocab_tgt=corpus["path_vocab_tgt"],
        acous_path=corpus["acous_path"],
        acous_norm_path=corpus["acous_norm_path"], acous_norm=True,
        max_seq_len_src=16, max_seq_len_tgt=64, batch_size=5,
        use_type="char", mode="ST", seed=1,
    )
    assert ds.num_training_sentences > 0
    ds.construct_batches(is_train=True)
    batch = ds.materialise_batch(0)
    B = batch["srcid"].shape[0]
    assert batch["srcid"].shape == (B, 16)
    assert batch["tgtid"].shape == (B, 64)
    # acoustics padded to multiple of 8 with the x+8-x%8 bump
    T = batch["acous_feat"].shape[1]
    assert T % 8 == 0
    assert T >= max(batch["acouslen"])
    # first token BOS, pad after EOS
    assert (batch["srcid"][:, 0] == BOS).all()
    for i in range(B):
        sl = batch["srclen"][i]
        assert batch["srcid"][i, sl - 1] == EOS
        assert (batch["srcid"][i, sl:] == PAD).all()


def test_dataset_asr_mode_has_dummy_tgt(corpus):
    ds = Dataset(
        path_src=corpus["path_src"],
        path_vocab_src=corpus["path_vocab_src"],
        path_vocab_tgt=corpus["path_vocab_tgt"],
        acous_path=corpus["acous_path"], acous_norm=False,
        max_seq_len_src=16, max_seq_len_tgt=64, batch_size=4,
        mode="ASR", seed=1,
    )
    assert ds.train_tgt_word_ids[0] == [BOS, EOS]
    ds.construct_batches(is_train=False)
    b = ds.materialise_batch(0)
    assert "acous_feat" in b and "tgtid" not in b


def test_dataset_length_filter(corpus):
    ds = Dataset(
        path_src=corpus["path_src"], path_tgt=corpus["path_tgt"],
        path_vocab_src=corpus["path_vocab_src"],
        path_vocab_tgt=corpus["path_vocab_tgt"],
        acous_path=corpus["acous_path"], acous_norm=False,
        max_seq_len_src=4, max_seq_len_tgt=64, batch_size=4,
        use_type="char", mode="ST", seed=1,
    )
    # only sentences with <= 2 words survive
    for ids in ds.train_src_word_ids:
        assert len(ids) <= 4


def test_length_bucketing_sorts_by_acous(corpus):
    ds = Dataset(
        path_src=corpus["path_src"], path_tgt=corpus["path_tgt"],
        path_vocab_src=corpus["path_vocab_src"],
        path_vocab_tgt=corpus["path_vocab_tgt"],
        acous_path=corpus["acous_path"], acous_norm=False,
        max_seq_len_src=16, max_seq_len_tgt=64, batch_size=5,
        use_type="char", mode="ST", seed=1, length_bucket=True,
    )
    ds.construct_batches(is_train=False)
    for b in ds.batches:
        lens = b["acous_lengths"]
        assert lens == sorted(lens)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_tokenisation_golden_vs_reference(corpus):
    load_reference()
    import utils.dataset as ref_ds

    ref = ref_ds.Dataset(
        path_src=corpus["path_src"], path_tgt=corpus["path_tgt"],
        path_vocab_src=corpus["path_vocab_src"],
        path_vocab_tgt=corpus["path_vocab_tgt"],
        acous_path=corpus["acous_path"],
        max_seq_len_src=16, max_seq_len_tgt=64, batch_size=5,
        use_type="char", mode="ST", use_gpu=False,
    )
    mine = Dataset(
        path_src=corpus["path_src"], path_tgt=corpus["path_tgt"],
        path_vocab_src=corpus["path_vocab_src"],
        path_vocab_tgt=corpus["path_vocab_tgt"],
        acous_path=corpus["acous_path"],
        max_seq_len_src=16, max_seq_len_tgt=64, batch_size=5,
        use_type="char", mode="ST",
    )
    assert ref.train_src_word_ids == mine.train_src_word_ids
    assert ref.train_tgt_word_ids == mine.train_tgt_word_ids
    assert list(ref.train_acous_lengths) == list(mine.train_acous_lengths)
    assert dict(ref.src_word2id) == dict(mine.src_word2id)


def test_corpus_bleu_sanity():
    hyp = [["the", "cat", "sat", "on", "mat"], ["a", "b", "c", "d"]]
    ref = [[["the", "cat", "sat", "on", "mat"]], [["a", "b", "c", "d"]]]
    assert corpus_bleu(hyp, ref) == pytest.approx(1.0)
    ref2 = [[["x", "y", "z", "w", "v"]], [["p", "q", "r", "s"]]]
    assert corpus_bleu(hyp, ref2) == 0.0


def test_corpus_bleu_partial():
    hyp = [["the", "cat", "sat", "on", "the", "mat"]]
    ref = [[["the", "cat", "sat", "on", "a", "mat"]]]
    score = corpus_bleu(hyp, ref)
    assert 0.0 < score < 1.0


@pytest.mark.skipif(not reference_available(), reason="reference missing")
def test_load_pretrained_embedding_matches_reference(tmp_path):
    """Oracle parity for the pretrained-embedding overlay
    (ref: utils/dataset.py:631-651): the `word.lower()` quirk, the
    `len(items) <= 2` header/short-line skip, OOV skip, and
    later-line-overwrites semantics must all match the reference."""
    load_reference()
    from utils.dataset import load_pretrained_embedding as ref_overlay

    from stjep_tpu.data.dataset import load_pretrained_embedding as my_overlay

    word2id = {"the": 5, "cat": 6, "mat": 7, "dog": 8}
    dim = 4
    lines = [
        "40000 4",                       # fastText-style header: skipped
        "The 1.0 2.0 3.0 4.0",           # uppercase -> lowercase match
        "cat 0.5 0.5 0.5 0.5",
        "zebra 9.0 9.0 9.0 9.0",         # OOV: skipped
        "mat -1",                        # len(items) <= 2: skipped
        "cat 7.0 7.0 7.0 7.0",           # later line overwrites
    ]
    p = tmp_path / "emb.vec"
    p.write_text("\n".join(lines) + "\n")

    rng = np.random.RandomState(0)
    init = rng.randn(10, dim)
    mine = my_overlay(word2id, init.copy(), str(p))
    theirs = ref_overlay(word2id, init.copy(), str(p))
    np.testing.assert_array_equal(mine, theirs)
    # the quirks, asserted directly
    np.testing.assert_array_equal(mine[5], [1.0, 2.0, 3.0, 4.0])
    np.testing.assert_array_equal(mine[6], [7.0, 7.0, 7.0, 7.0])
    np.testing.assert_array_equal(mine[7], init[7])
    np.testing.assert_array_equal(mine[8], init[8])


def test_acous_norm_without_path_fails_fast(corpus):
    """acous_norm=True + acoustics + no CMVN dir must fail at construction
    with a clear message, not as the reference's mid-training TypeError
    from join(None, spkid) (ref: dataset.py:139-146)."""
    with pytest.raises(ValueError, match="acous_norm"):
        Dataset(
            path_src=corpus["path_src"], path_tgt=corpus["path_tgt"],
            path_vocab_src=corpus["path_vocab_src"],
            path_vocab_tgt=corpus["path_vocab_tgt"],
            acous_path=corpus["acous_path"], acous_norm=True,
            max_seq_len_src=16, max_seq_len_tgt=64, batch_size=5,
            use_type="char", mode="ST", seed=1,
        )
