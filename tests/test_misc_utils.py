"""Detokenisation / corpus accumulation parity vs the reference oracle."""

import numpy as np
import pytest
import torch

from stjep_tpu.config import BOS, EOS, PAD, SPC
from stjep_tpu.utils.misc import add2corpus, detok_words

from tests.reference_oracle import load_reference, reference_available


def _vocab():
    id2word = {0: "<pad>", 1: "<unk>", 2: "<s>", 3: "</s>", 4: "<spc>"}
    for i in range(5, 15):
        id2word[i] = chr(ord("a") + i - 5)
    return id2word


def test_detok_word_level():
    words = ["hello", "world", "</s>", "junk", "<pad>"]
    assert detok_words(words, use_type="word") == "hello world"


def test_detok_char_level_spc():
    words = ["a", "b", "<spc>", "c", "</s>", "d"]
    assert detok_words(words, use_type="char") == "ab c"


def test_detok_seqrev():
    words = ["a", "b", "c", "</s>"]
    assert detok_words(words, use_type="word", seqrev=True) == "c b a"


def test_detok_empty():
    assert detok_words(["<pad>", "</s>"], use_type="word") == ""


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_add2corpus_matches_reference():
    load_reference()
    from utils.misc import add2corpus as ref_add2corpus

    id2word = _vocab()
    rng = np.random.RandomState(0)
    hyp = rng.randint(4, 15, size=(3, 8)).astype(np.int64)
    hyp[0, 5] = EOS
    hyp[1, 2] = PAD
    ref_ids = rng.randint(4, 15, size=(3, 9)).astype(np.int64)
    ref_ids[:, 0] = BOS
    ref_ids[2, 6] = EOS

    for use_type in ("word", "char"):
        h_ref, r_ref = ref_add2corpus(
            torch.tensor(hyp), torch.tensor(ref_ids), id2word, [], [],
            type=use_type,
        )
        h_got, r_got = add2corpus(hyp, ref_ids, id2word, [], [],
                                  use_type=use_type)
        assert h_got == h_ref, use_type
        assert r_got == r_ref, use_type
