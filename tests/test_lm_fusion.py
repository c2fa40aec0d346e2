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
