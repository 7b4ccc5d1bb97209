"""Config CLI-overlay and attention-mask tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vipformer_tpu.config import Config, config_from_args, decode_arch_name


def test_arch_decode():
    d = decode_arch_name("E1CL8SL-H4D256-L128-MR2")
    assert d == dict(
        num_ca_layers=1, num_sa_layers=8, num_ca_heads=4, num_sa_heads=4,
        num_latent_channels=256, num_pc_latents=128, num_groups=128,
        mlp_widen_factor=2,
    )
    with pytest.raises(ValueError):
        decode_arch_name("nonsense")


def test_config_from_args_overrides():
    cfg = config_from_args(
        [
            "--arch", "E1CL6SL-H4D256-L96-MR4",
            "--batch_size", "64",
            "--layer_idx", "2", "6", "10",
            "--mp", "false",
            "--scheduler", "coswarm",
        ]
    )
    assert cfg.num_sa_layers == 6
    assert cfg.num_pc_latents == 96
    assert cfg.mlp_widen_factor == 4
    assert cfg.batch_size == 64
    assert cfg.layer_idx == (2, 6, 10)
    assert cfg.mp is False
    assert cfg.scheduler == "coswarm"


def test_config_validation():
    with pytest.raises(ValueError):
        Config(num_latent_channels=30, num_ca_heads=4)
    with pytest.raises(AssertionError):
        Config(modality="bogus")


def test_attention_pad_mask(rng):
    """Masked keys must not influence the output (reference pad_mask
    semantics, core/modules.py:86-89: True marks padding)."""
    from vipformer_tpu.nn.layers import MultiHeadAttention

    m = MultiHeadAttention(num_heads=2)
    xq = jnp.asarray(rng.standard_normal((1, 3, 16)).astype(np.float32))
    xkv = rng.standard_normal((1, 6, 16)).astype(np.float32)
    variables = m.init({"params": jax.random.key(0)}, xq, jnp.asarray(xkv))

    mask = jnp.asarray([[False, False, False, False, True, True]])
    out_masked = m.apply(variables, xq, jnp.asarray(xkv), mask)
    # perturbing the masked keys changes nothing
    xkv2 = xkv.copy()
    xkv2[:, 4:] += 100.0
    out_masked2 = m.apply(variables, xq, jnp.asarray(xkv2), mask)
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_masked2), atol=1e-5
    )
    # but they do change the unmasked output
    out_full = m.apply(variables, xq, jnp.asarray(xkv2))
    assert not np.allclose(np.asarray(out_masked), np.asarray(out_full))
