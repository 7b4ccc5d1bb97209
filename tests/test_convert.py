"""Checkpoint-converter tests: a reference torch model's state_dict must map
completely onto our flax tree (every leaf present and shape-matched), and
the converted model must run."""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture(scope="module")
def ref_model():
    torch = pytest.importorskip("torch")
    sys.modules.setdefault("imp", types.ModuleType("imp"))
    fairscale = types.ModuleType("fairscale")
    fnn = types.ModuleType("fairscale.nn")
    fnn.checkpoint_wrapper = lambda m: m
    fairscale.nn = fnn
    sys.modules.setdefault("fairscale", fairscale)
    sys.modules.setdefault("fairscale.nn", fnn)
    timm = types.ModuleType("timm")
    tm = types.ModuleType("timm.models")
    tl = types.ModuleType("timm.models.layers")
    import torch.nn as tnn

    class DropPath(tnn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    tl.DropPath = DropPath
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", tm)
    sys.modules.setdefault("timm.models.layers", tl)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from vipformer.model.pointcloud.partseg import CrossFormer_pc_mp
    from vipformer.model.pointcloud.classifier import PointCloudInputAdapter

    adapter = PointCloudInputAdapter((64, 3), 32)
    model = CrossFormer_pc_mp(
        input_adapter=adapter, num_latents=8, num_latent_channels=32,
        group_size=4, num_cross_attention_layers=1,
        num_cross_attention_heads=2, num_self_attention_layers=3,
        num_self_attention_heads=2, mlp_widen_factor=2, max_dpr=0.0,
        atten_drop=0.0, mlp_drop=0.0, modal_prior=True,
    ).eval()
    return model


def test_convert_consumes_all_keys_and_matches_shapes(ref_model):
    from convert_torch_ckpt import convert_pc_model

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params, stats = convert_pc_model(sd, num_sa_layers=3, kind="pretrain")

    # our freshly initialized tree for the same architecture
    from vipformer_tpu.config import Config
    from vipformer_tpu.models import build_pc_model

    cfg = Config(
        compute_dtype="float32", num_pc_latents=8, num_groups=8,
        group_size=4, num_latent_channels=32, num_ca_heads=2,
        num_sa_heads=2, num_sa_layers=3, mlp_widen_factor=2,
        max_dpr=0.0, atten_drop=0.0, mlp_drop=0.0,
    )
    model = build_pc_model(cfg)
    variables = model.init({"params": jax.random.key(0)},
                           jnp.zeros((1, 64, 3)))

    def flat(tree):
        return {
            "/".join(str(p.key) for p in path): np.asarray(leaf).shape
            for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
        }

    want_p = flat(variables["params"])
    got_p = flat(params)
    assert set(got_p) == set(want_p)
    for k in want_p:
        assert got_p[k] == want_p[k], k

    want_s = flat(variables["batch_stats"])
    got_s = flat(stats)
    assert set(got_s) == set(want_s)

    # converted model runs
    out = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 64, 3)).astype(np.float32)),
    )
    proj, feats = out
    assert np.isfinite(np.asarray(proj)).all()


def test_export_roundtrip_into_reference(ref_model, rng):
    """our params -> torch state_dict -> reference load_state_dict(strict)
    -> identical forward to weight-transplant expectations (round trip)."""
    import torch
    from convert_torch_ckpt import convert_pc_model
    from export_torch_ckpt import export_pc_model

    # start from the reference model's own weights, convert to ours,
    # export back, and load strictly into a FRESH reference instance
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params, stats = convert_pc_model(sd, num_sa_layers=3, kind="pretrain")
    back = export_pc_model(params, stats, kind="pretrain")
    missing = set(sd) - set(back)
    extra = set(back) - set(sd)
    assert not missing, missing
    assert not extra, extra
    for k in sd:
        np.testing.assert_array_equal(np.asarray(back[k]), sd[k]), k
    # strict load proves layout compatibility
    ref_model.load_state_dict(
        {k: torch.tensor(np.asarray(v)) for k, v in back.items()},
        strict=True,
    )
