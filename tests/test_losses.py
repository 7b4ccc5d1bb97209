"""Loss-value tests vs. hand-computed small cases and torch oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from vipformer_tpu.losses import (
    nt_xent_loss,
    partseg_smoothed_loss,
    smoothed_cross_entropy,
)


def np_nt_xent(z0, z1, t):
    """Oracle: SimCLR NT-Xent over the 2B concatenated batch (the semantics
    of lightly 1.1.x NTXentLoss used at reference pretrain.py:155)."""
    z = np.concatenate([z0, z1], 0)
    z = z / np.linalg.norm(z, axis=1, keepdims=True)
    n = z.shape[0]
    b = n // 2
    sim = z @ z.T / t
    np.fill_diagonal(sim, -1e30)
    labels = (np.arange(n) + b) % n
    logp = sim - np.log(np.sum(np.exp(sim - sim.max(1, keepdims=True)), 1, keepdims=True)) - sim.max(1, keepdims=True)
    return -np.mean(logp[np.arange(n), labels])


def test_nt_xent_matches_oracle(rng):
    z0 = rng.standard_normal((6, 8)).astype(np.float32)
    z1 = rng.standard_normal((6, 8)).astype(np.float32)
    got = float(nt_xent_loss(jnp.asarray(z0), jnp.asarray(z1), 0.1))
    want = np_nt_xent(z0, z1, 0.1)
    assert abs(got - want) < 1e-4


def test_nt_xent_matches_torch_reference():
    """Cross-check against torch with the exact formula lightly implements."""
    import torch
    import torch.nn.functional as F

    g = torch.Generator().manual_seed(0)
    a = torch.randn(5, 16, generator=g)
    b = torch.randn(5, 16, generator=g)
    out = torch.cat([F.normalize(a, dim=1), F.normalize(b, dim=1)], 0)
    logits = out @ out.t() / 0.1
    logits.fill_diagonal_(-9e15)
    labels = (torch.arange(10) + 5) % 10
    want = F.cross_entropy(logits, labels).item()
    got = float(nt_xent_loss(jnp.asarray(a.numpy()), jnp.asarray(b.numpy()), 0.1))
    assert abs(got - want) < 1e-4


def test_nt_xent_perfect_alignment_lower_loss(rng):
    z = rng.standard_normal((8, 16)).astype(np.float32)
    aligned = float(nt_xent_loss(jnp.asarray(z), jnp.asarray(z)))
    rand = float(
        nt_xent_loss(
            jnp.asarray(z),
            jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32)),
        )
    )
    assert aligned < rand


@pytest.mark.parametrize("smoothing", [0.0, 0.2])
def test_smoothed_ce_matches_torch(rng, smoothing):
    import torch
    import torch.nn.functional as F

    logits = rng.standard_normal((7, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(7,))
    want = F.cross_entropy(
        torch.tensor(logits), torch.tensor(labels), label_smoothing=smoothing
    ).item()
    got = float(
        smoothed_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), smoothing
        )
    )
    assert abs(got - want) < 1e-5


def test_partseg_smoothed_loss_oracle(rng):
    """Matches the reference's hand-rolled smoothing (utils.py:384-392)."""
    logits = rng.standard_normal((4, 6)).astype(np.float32)
    labels = rng.integers(0, 6, size=(4,))
    n = 6
    eps = 0.2
    x = logits - logits.max(1, keepdims=True)
    logp = x - np.log(np.exp(x).sum(1, keepdims=True))
    onehot = np.eye(n)[labels]
    target = onehot * (1 - eps) + (1 - onehot) * eps / (n - 1)
    want = -np.mean((target * logp).sum(1))
    got = float(partseg_smoothed_loss(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(got - want) < 1e-5
