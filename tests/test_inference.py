"""Serving wrapper tests: bucket routing, padding-strip, consistency."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vipformer_tpu.config import Config
from vipformer_tpu.inference import classifier_predictor, partseg_predictor
from vipformer_tpu.models import build_ft_cls, build_ft_partseg


@pytest.fixture(scope="module")
def cls_setup():
    cfg = Config(
        compute_dtype="float32", num_pc_latents=8, num_groups=8,
        group_size=4, num_latent_channels=32, num_ca_heads=4,
        num_sa_heads=4, num_sa_layers=2, mlp_widen_factor=2,
        num_obj_classes=10,
    )
    model = build_ft_cls(cfg)
    pts = jnp.zeros((2, 64, 3))
    variables = model.init({"params": jax.random.key(0)}, pts)
    return model, variables


def test_classifier_predictor_buckets(cls_setup, rng):
    model, variables = cls_setup
    pred = classifier_predictor(model, variables, max_batch=16)
    assert pred.buckets == [1, 2, 4, 8, 16]
    x = rng.standard_normal((5, 64, 3)).astype(np.float32)
    out = pred(x)
    assert out["logits"].shape == (5, 10)
    assert out["backbone_feats"].shape == (5, 64)


def test_classifier_predictor_padding_consistency(cls_setup, rng):
    model, variables = cls_setup
    pred = classifier_predictor(model, variables, max_batch=16)
    x = rng.standard_normal((8, 64, 3)).astype(np.float32)
    full = pred(x)["logits"]
    part = pred(x[:3])["logits"]  # routed through bucket 4 with padding
    np.testing.assert_allclose(part, full[:3], atol=1e-5)


def test_classifier_predictor_rejects_oversize(cls_setup, rng):
    model, variables = cls_setup
    pred = classifier_predictor(model, variables, max_batch=4)
    with pytest.raises(ValueError):
        pred(rng.standard_normal((5, 64, 3)).astype(np.float32))


def test_partseg_predictor(rng):
    cfg = Config(
        compute_dtype="float32", num_pc_latents=8, num_groups=8,
        group_size=4, num_latent_channels=32, num_ca_heads=4,
        num_sa_heads=4, num_sa_layers=4, mlp_widen_factor=2,
        layer_idx=(1, 2, 4),
    )
    model = build_ft_partseg(cfg)
    pts0 = jnp.zeros((2, 64, 3))
    variables = model.init(
        {"params": jax.random.key(0)}, pts0, jnp.zeros((2, 16))
    )
    pred = partseg_predictor(model, variables, max_batch=8)
    pts = rng.standard_normal((3, 64, 3)).astype(np.float32)
    obj = np.array([0, 4, 15])
    out = pred(pts, obj)
    assert out["logits"].shape == (3, 64, 50)
    assert out["refined"].shape == (3, 64)
    from vipformer_tpu.train.trainer import INDEX_START, SEG_NUM

    for i, c in enumerate(obj):
        lo, hi = INDEX_START[c], INDEX_START[c] + SEG_NUM[c]
        assert out["refined"][i].min() >= lo
        assert out["refined"][i].max() < hi
