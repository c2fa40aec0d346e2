"""Loss parity vs torch masked-select semantics (ref: modules/loss.py)."""

import numpy as np
import torch
import torch.nn.functional as tF

import jax.numpy as jnp

from stjep_tpu.ops.losses import (
    bce_masked,
    cross_entropy_masked,
    kldiv_masked,
    mse_masked,
    nll_loss,
    nll_loss_masked,
    normalise,
    token_accuracy,
)


def test_nll_masked_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(10, 7).astype(np.float32)
    logps = tF.log_softmax(torch.tensor(logits), dim=-1)
    tgt = rng.randint(0, 7, size=(10,))
    mask = rng.rand(10) > 0.3

    # ref: criterion(outputs, target).masked_select(mask).sum()
    crit = torch.nn.NLLLoss(reduction="none")
    expect = crit(logps, torch.tensor(tgt)).masked_select(torch.tensor(mask)).sum()

    got, norm = nll_loss_masked(jnp.asarray(logps.numpy()), jnp.asarray(tgt),
                                jnp.asarray(mask))
    np.testing.assert_allclose(float(got), float(expect), rtol=1e-5)
    assert float(norm) == mask.sum()


def test_nll_unmasked_matches_torch():
    rng = np.random.RandomState(1)
    logps = tF.log_softmax(torch.tensor(rng.randn(6, 5).astype(np.float32)), dim=-1)
    tgt = rng.randint(0, 5, size=(6,))
    expect = torch.nn.NLLLoss(reduction="none")(logps, torch.tensor(tgt)).sum()
    got = nll_loss(jnp.asarray(logps.numpy()), jnp.asarray(tgt))
    np.testing.assert_allclose(float(got), float(expect), rtol=1e-5)


def test_cross_entropy_masked_matches_torch():
    rng = np.random.RandomState(2)
    logits = rng.randn(8, 4).astype(np.float32)
    tgt = rng.randint(0, 4, size=(8,))
    mask = rng.rand(8) > 0.5
    expect = (torch.nn.CrossEntropyLoss(reduction="none")(
        torch.tensor(logits), torch.tensor(tgt))
        .masked_select(torch.tensor(mask)).sum())
    got, _ = cross_entropy_masked(jnp.asarray(logits), jnp.asarray(tgt), jnp.asarray(mask))
    np.testing.assert_allclose(float(got), float(expect), rtol=1e-5)


def test_bce_masked_matches_torch():
    rng = np.random.RandomState(3)
    probs = rng.rand(9).astype(np.float32)
    tgt = (rng.rand(9) > 0.5).astype(np.float32)
    mask = rng.rand(9) > 0.4
    expect = (torch.nn.BCELoss(reduction="none")(
        torch.tensor(probs), torch.tensor(tgt))
        .masked_select(torch.tensor(mask)).sum())
    got, _ = bce_masked(jnp.asarray(probs), jnp.asarray(tgt), jnp.asarray(mask))
    np.testing.assert_allclose(float(got), float(expect), rtol=1e-4)


def test_kldiv_masked_matches_torch():
    rng = np.random.RandomState(4)
    logq = tF.log_softmax(torch.tensor(rng.randn(5, 6).astype(np.float32)), dim=-1)
    logp = tF.log_softmax(torch.tensor(rng.randn(5, 6).astype(np.float32)), dim=-1)
    mask = rng.rand(5) > 0.3
    p = torch.exp(logp)
    expect = (torch.nn.KLDivLoss(reduction="none")(logq, p)
              .sum(dim=1).masked_select(torch.tensor(mask)).sum())
    got, _ = kldiv_masked(jnp.asarray(logq.numpy()), jnp.asarray(logp.numpy()),
                          jnp.asarray(mask))
    np.testing.assert_allclose(float(got), float(expect), rtol=1e-4)


def test_mse_masked_matches_torch():
    rng = np.random.RandomState(5)
    a = rng.randn(4, 3).astype(np.float32)
    b = rng.randn(4, 3).astype(np.float32)
    mask = np.array([True, False, True, True])
    expect = (torch.nn.MSELoss(reduction="none")(torch.tensor(a), torch.tensor(b))
              .sum(dim=1).masked_select(torch.tensor(mask)).sum())
    got, _ = mse_masked(jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask))
    np.testing.assert_allclose(float(got), float(expect), rtol=1e-5)


def test_normalise_and_accuracy():
    assert float(normalise(jnp.asarray(10.0), jnp.asarray(4.0))) == 2.5
    preds = jnp.asarray([1, 2, 3, 4])
    tgts = jnp.asarray([1, 2, 0, 4])
    mask = jnp.asarray([True, True, True, False])
    match, total = token_accuracy(preds, tgts, mask)
    assert (int(match), int(total)) == (2, 3)
