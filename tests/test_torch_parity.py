"""Golden numerical parity vs. the reference's own torch modules.

These tests import the reference implementation (read-only, CPU torch),
copy its randomly-initialized weights into our flax modules, and compare
forward outputs on identical inputs in eval mode. This pins layer-for-layer
behavioral equivalence far more strongly than shape tests.

The full point-cloud model is *not* compared end-to-end: our
`divide_patches` deliberately implements the reference's documented intent
rather than its accidental group-axis slice (see ops/geometry.py), so the
stems differ by design. Everything downstream of the patch stem is covered.
"""

import os
import sys
import types

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref():
    """Import the reference model package with stubs for its absent deps."""
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
    import vipformer.model.pointcloud.partseg as ref_partseg
    import vipformer.model.pointcloud.utils as ref_utils
    import vipformer.model.pointcloud.classifier as ref_classifier

    return types.SimpleNamespace(
        partseg=ref_partseg, utils=ref_utils, classifier=ref_classifier,
        torch=torch,
    )


def t2n(t):
    return t.detach().numpy()


def lin(mod):  # torch Linear -> flax Dense dict
    out = {"kernel": t2n(mod.weight).T}
    if mod.bias is not None:
        out["bias"] = t2n(mod.bias)
    return out


def ln(mod):  # torch LayerNorm -> flax LayerNorm dict
    return {"scale": t2n(mod.weight), "bias": t2n(mod.bias)}


def bn(mod):  # torch BatchNorm1d -> flax BatchNorm params + stats
    params = {"scale": t2n(mod.weight), "bias": t2n(mod.bias)}
    stats = {"mean": t2n(mod.running_mean), "var": t2n(mod.running_var)}
    return params, stats


def conv1d(mod):  # torch Conv1d(k=1) -> flax Dense dict
    out = {"kernel": t2n(mod.weight)[:, :, 0].T}
    if mod.bias is not None:
        out["bias"] = t2n(mod.bias)
    return out


def mha_params(tm):
    return {
        "q_proj": lin(tm.q_proj),
        "k_proj": lin(tm.k_proj),
        "v_proj": lin(tm.v_proj),
        "o_proj": lin(tm.o_proj),
    }


def mlp_params(tm):  # reference MLP Sequential: [LN, Linear, GELU, Linear]
    return {
        "LayerNorm_0": ln(tm[0]),
        "Dense_0": lin(tm[1]),
        "Dense_1": lin(tm[3]),
    }


def ca_layer_params(tl_):  # reference CrossAttentionLayer Sequential
    cross = tl_[0].module  # Residual -> CrossAttention
    return {
        "CrossAttention_0": {
            "q_norm": ln(cross.q_norm),
            "kv_norm": ln(cross.kv_norm),
            "attention": mha_params(cross.attention),
        },
        "MLP_0": mlp_params(tl_[1].module),
    }


def sa_layer_params(tl_):  # reference SelfAttentionLayer Sequential
    sa = tl_[0].module
    return {
        "SelfAttention_0": {
            "norm": ln(sa.norm),
            "attention": mha_params(sa.attention),
        },
        "MLP_0": mlp_params(tl_[1].module),
    }


def test_mha_parity(ref, rng):
    torch = ref.torch
    tm = ref.partseg.MultiHeadAttention(
        num_heads=2, num_q_input_channels=32, num_kv_input_channels=32,
        num_latent_channels=32, dropout=0.0,
    ).eval()
    from vipformer_tpu.nn.layers import MultiHeadAttention

    fm = MultiHeadAttention(num_heads=2, num_qk_channels=32,
                            num_v_channels=32, num_output_channels=32)
    xq = rng.standard_normal((2, 5, 32)).astype(np.float32)
    xkv = rng.standard_normal((2, 9, 32)).astype(np.float32)
    want = t2n(tm(torch.tensor(xq), torch.tensor(xkv)))
    got = fm.apply(
        {"params": mha_params(tm)}, jnp.asarray(xq), jnp.asarray(xkv)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_sa_layer_parity(ref, rng):
    torch = ref.torch
    tl_ = ref.partseg.SelfAttentionLayer(
        num_heads=2, num_latent_channels=32, widening_factor=2,
        drop_path_rate=0.0, atten_drop=0.0, mlp_drop=0.0,
    ).eval()
    from vipformer_tpu.nn.layers import SelfAttentionLayer

    fm = SelfAttentionLayer(num_heads=2, widening_factor=2)
    x = rng.standard_normal((2, 7, 32)).astype(np.float32)
    want = t2n(tl_(torch.tensor(x)))
    got = fm.apply({"params": sa_layer_params(tl_)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_mp_encoder_parity(ref, rng):
    torch = ref.torch
    te = ref.partseg.Encoder(
        num_latent_channels=32, num_cross_attention_layers=1,
        num_cross_attention_heads=2, cross_attention_widening_factor=2,
        num_self_attention_layers=3, num_self_attention_heads=2,
        self_attention_widening_factor=2, dpr_list=[0.0, 0.0, 0.0],
        atten_drop=0.0, mlp_drop=0.0, modal_prior=True,
    ).eval()
    from vipformer_tpu.models.crossformer import MPEncoder

    fe = MPEncoder(
        num_latent_channels=32, num_cross_attention_layers=1,
        num_cross_attention_heads=2, cross_attention_widening_factor=2,
        num_self_attention_layers=3, num_self_attention_heads=2,
        self_attention_widening_factor=2, modal_prior=True,
    )
    params = {"cross_attn_n": ca_layer_params(te.cross_attn_1)}
    for i, sa in enumerate(te.sa_layers):
        params[f"sa_{i}"] = sa_layer_params(sa)

    g = rng.standard_normal((2, 6, 32)).astype(np.float32)
    p = rng.standard_normal((2, 6, 32)).astype(np.float32)
    pts = rng.standard_normal((2, 11, 32)).astype(np.float32)
    want = t2n(te(torch.tensor(g), torch.tensor(p), torch.tensor(pts)))
    got = fe.apply(
        {"params": params}, jnp.asarray(g), jnp.asarray(p), jnp.asarray(pts)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)


def test_mp_encoder_layer_taps_parity(ref, rng):
    torch = ref.torch
    te = ref.partseg.Encoder(
        num_latent_channels=32, num_cross_attention_layers=1,
        num_cross_attention_heads=2, cross_attention_widening_factor=2,
        num_self_attention_layers=4, num_self_attention_heads=2,
        self_attention_widening_factor=2, dpr_list=[0.0] * 4,
        atten_drop=0.0, mlp_drop=0.0, modal_prior=False,
    ).eval()
    from vipformer_tpu.models.crossformer import MPEncoder

    fe = MPEncoder(
        num_latent_channels=32, num_cross_attention_layers=1,
        num_cross_attention_heads=2, cross_attention_widening_factor=2,
        num_self_attention_layers=4, num_self_attention_heads=2,
        self_attention_widening_factor=2, modal_prior=False,
        layer_idx=(1, 2, 4),
    )
    params = {"cross_attn_n": ca_layer_params(te.cross_attn_1)}
    for i, sa in enumerate(te.sa_layers):
        params[f"sa_{i}"] = sa_layer_params(sa)

    g = rng.standard_normal((2, 6, 32)).astype(np.float32)
    p = rng.standard_normal((2, 6, 32)).astype(np.float32)
    pts = rng.standard_normal((2, 11, 32)).astype(np.float32)
    want = [
        t2n(x)
        for x in te(torch.tensor(g), torch.tensor(p), torch.tensor(pts),
                    layer_idx=[1, 2, 4])
    ]
    got = fe.apply(
        {"params": params}, jnp.asarray(g), jnp.asarray(p), jnp.asarray(pts)
    )
    assert len(got) == 3
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), b, atol=5e-5)


def test_group2emb_parity(ref, rng):
    torch = ref.torch
    tm = ref.utils.Group2Emb(dim_model=32).eval()
    from vipformer_tpu.nn.pointnet import Group2Emb

    fm = Group2Emb(32)
    p1, s1 = bn(tm.first_conv[1])
    p2, s2 = bn(tm.second_conv[1])
    params = {
        "Dense_0": conv1d(tm.first_conv[0]),
        "BatchNorm_0": p1,
        "Dense_1": conv1d(tm.first_conv[3]),
        "Dense_2": conv1d(tm.second_conv[0]),
        "BatchNorm_1": p2,
        "Dense_3": conv1d(tm.second_conv[3]),
    }
    stats = {"BatchNorm_0": s1, "BatchNorm_1": s2}
    x = rng.standard_normal((2, 4, 8, 3)).astype(np.float32)
    want = t2n(tm(torch.tensor(x)))
    got = fm.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), True,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_input_adapter_parity(ref, rng):
    torch = ref.torch
    tm = ref.classifier.PointCloudInputAdapter(
        pointcloud_shape=(64, 3), num_input_channels=32
    ).eval()
    from vipformer_tpu.nn.pointnet import PointCloudInputAdapter

    fm = PointCloudInputAdapter(32)
    params = {
        "Dense_0": lin(tm.point_mlp[0]),
        "LayerNorm_0": ln(tm.point_mlp[1]),
        "Dense_1": lin(tm.point_mlp[3]),
    }
    x = rng.standard_normal((2, 64, 3)).astype(np.float32)
    want = t2n(tm(torch.tensor(x)))
    got = fm.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_latent_head_parity(ref, rng):
    """Contrastive projection head: BN/ReLU/Linear x2 (partseg.py:519-525)."""
    torch = ref.torch
    tnn = torch.nn
    tm = tnn.Sequential(
        tnn.BatchNorm1d(64), tnn.ReLU(),
        tnn.Linear(64, 32, bias=False),
        tnn.BatchNorm1d(32), tnn.ReLU(),
        tnn.Linear(32, 32, bias=False),
    ).eval()
    from vipformer_tpu.nn.perceiver import LatentFeatsHead

    fm = LatentFeatsHead(32)
    p0, s0 = bn(tm[0])
    p1, s1 = bn(tm[3])
    params = {
        "BatchNorm_0": p0, "Dense_0": lin(tm[2]),
        "BatchNorm_1": p1, "Dense_1": lin(tm[5]),
    }
    stats = {"BatchNorm_0": s0, "BatchNorm_1": s1}
    x = rng.standard_normal((4, 64)).astype(np.float32)
    want = t2n(tm(torch.tensor(x)))
    got = fm.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), True
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_img_model_full_parity(ref, rng):
    """The image branch has no patch-stem deviation, so the FULL model
    (patchify + learned pos-emb + encoder + pooled latent head) must match
    the reference end-to-end under weight transplant."""
    torch = ref.torch
    tm = ref.partseg.CrossFormer_img_mp(
        img_height=24, img_width=24, patch_size=12, num_latent_channels=32,
        num_cross_attention_layers=1, num_cross_attention_heads=2,
        num_self_attention_layers=2, num_self_attention_heads=2,
        mlp_widen_factor=2, max_dpr=0.0, atten_drop=0.0, mlp_drop=0.0,
        modal_prior=True,
    ).eval()
    from vipformer_tpu.models.crossformer import CrossFormerImg

    fm = CrossFormerImg(
        img_height=24, img_width=24, patch_size=12, num_latent_channels=32,
        num_cross_attention_layers=1, num_cross_attention_heads=2,
        num_self_attention_layers=2, num_self_attention_heads=2,
        mlp_widen_factor=2, max_dpr=0.0, atten_drop=0.0, mlp_drop=0.0,
    )
    enc = {"cross_attn_n": ca_layer_params(tm.encoder.cross_attn_1)}
    for i, sa in enumerate(tm.encoder.sa_layers):
        enc[f"sa_{i}"] = sa_layer_params(sa)
    h0, s0 = bn(tm.latent_head[0])
    h1, s1 = bn(tm.latent_head[3])
    params = {
        "patch2emb": {
            "Dense_0": lin(tm.patch2emb[1]),
            "position_emb": t2n(tm.position_emb),
        },
        "encoder": enc,
        "latent_head": {
            "BatchNorm_0": h0,
            "Dense_0": lin(tm.latent_head[2]),
            "BatchNorm_1": h1,
            "Dense_1": lin(tm.latent_head[5]),
        },
    }
    stats = {"latent_head": {"BatchNorm_0": s0, "BatchNorm_1": s1}}
    imgs = rng.standard_normal((2, 24, 24, 3)).astype(np.float32)
    want_proj, want_feats = tm(torch.tensor(imgs))
    got_proj, got_feats = fm.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(imgs)
    )
    np.testing.assert_allclose(
        np.asarray(got_feats), t2n(want_feats), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_proj), t2n(want_proj), atol=1e-4
    )


def test_partseg_model_full_parity(ref, rng, monkeypatch):
    """Full part-segmentation model vs the reference with both sides fed the
    SAME patch decomposition (divide_patches monkeypatched on both, isolating
    the documented stem deviation): adapter, Group2Emb, position emb,
    tapped encoder, label conditioning, 3-NN propagation and the dense head
    must agree end-to-end."""
    torch = ref.torch
    import vipformer_tpu.models.crossformer as our_cf

    B, N, G, S, D = 2, 64, 8, 4, 32
    neighbors = rng.standard_normal((B, G, S, 3)).astype(np.float32)
    centers = rng.standard_normal((B, G, 3)).astype(np.float32)

    monkeypatch.setattr(
        ref.partseg, "divide_patches",
        lambda pts, g, s: (torch.tensor(neighbors), torch.tensor(centers)),
    )
    monkeypatch.setattr(
        our_cf, "divide_patches",
        lambda pts, g, s, key=None, neighbor_dtype=None, **kw: (
            jnp.asarray(neighbors).astype(neighbor_dtype or jnp.float32),
            jnp.asarray(centers),
        ),
    )

    adapter = ref.classifier.PointCloudInputAdapter((N, 3), D)
    tm = ref.partseg.CrossFormer_partseg(
        input_adapter=adapter, num_latents=G, num_latent_channels=D,
        group_size=S, num_cross_attention_layers=1,
        num_cross_attention_heads=2, num_self_attention_layers=4,
        num_self_attention_heads=2, mlp_widen_factor=2, max_dpr=0.0,
        atten_drop=0.0, mlp_drop=0.0, layer_idx=[1, 2, 4],
        num_part_classes=50,
    ).eval()

    fm = our_cf.CrossFormerPartSeg(
        num_latents=G, num_latent_channels=D, group_size=S,
        num_cross_attention_layers=1, num_cross_attention_heads=2,
        num_self_attention_layers=4, num_self_attention_heads=2,
        mlp_widen_factor=2, max_dpr=0.0, atten_drop=0.0, mlp_drop=0.0,
        layer_idx=(1, 2, 4), num_part_classes=50,
    )

    g2e_bn0_p, g2e_bn0_s = bn(tm.group2emb.first_conv[1])
    g2e_bn1_p, g2e_bn1_s = bn(tm.group2emb.second_conv[1])
    enc = {"cross_attn_n": ca_layer_params(tm.encoder.cross_attn_1)}
    for i, sa in enumerate(tm.encoder.sa_layers):
        enc[f"sa_{i}"] = sa_layer_params(sa)
    lbl_p, lbl_s = bn(tm.label_conv[1])
    prop_bn0_p, prop_bn0_s = bn(tm.propagation.mlp_bns[0])
    prop_bn1_p, prop_bn1_s = bn(tm.propagation.mlp_bns[1])
    seg_bn0_p, seg_bn0_s = bn(tm.bn1)
    seg_bn1_p, seg_bn1_s = bn(tm.bn2)

    params = {
        "stem": {
            "input_adapter": {
                "Dense_0": lin(tm.input_adapter.point_mlp[0]),
                "LayerNorm_0": ln(tm.input_adapter.point_mlp[1]),
                "Dense_1": lin(tm.input_adapter.point_mlp[3]),
            },
            "group2emb": {
                "Dense_0": conv1d(tm.group2emb.first_conv[0]),
                "BatchNorm_0": g2e_bn0_p,
                "Dense_1": conv1d(tm.group2emb.first_conv[3]),
                "Dense_2": conv1d(tm.group2emb.second_conv[0]),
                "BatchNorm_1": g2e_bn1_p,
                "Dense_3": conv1d(tm.group2emb.second_conv[3]),
            },
            "position_emb": {
                "Dense_0": lin(tm.position_emb[0]),
                "Dense_1": lin(tm.position_emb[2]),
            },
        },
        "encoder": enc,
        "norm": ln(tm.norm),
        "label_conv": {"Dense_0": conv1d(tm.label_conv[0]),
                       "BatchNorm_0": lbl_p},
        "propagation": {
            "Dense_0": conv1d(tm.propagation.mlp_convs[0]),
            "BatchNorm_0": prop_bn0_p,
            "Dense_1": conv1d(tm.propagation.mlp_convs[1]),
            "BatchNorm_1": prop_bn1_p,
        },
        "seg_head": {
            "Dense_0": conv1d(tm.conv1),
            "BatchNorm_0": seg_bn0_p,
            "Dense_1": conv1d(tm.conv2),
            "BatchNorm_1": seg_bn1_p,
            "Dense_2": conv1d(tm.conv3),
        },
    }
    stats = {
        "stem": {"group2emb": {"BatchNorm_0": g2e_bn0_s,
                               "BatchNorm_1": g2e_bn1_s}},
        "label_conv": {"BatchNorm_0": lbl_s},
        "propagation": {"BatchNorm_0": prop_bn0_s, "BatchNorm_1": prop_bn1_s},
        "seg_head": {"BatchNorm_0": seg_bn0_s, "BatchNorm_1": seg_bn1_s},
    }

    pts = rng.standard_normal((B, N, 3)).astype(np.float32)
    onehot = np.zeros((B, 16), dtype=np.float32)
    onehot[0, 4] = 1.0
    onehot[1, 0] = 1.0
    want = t2n(tm(torch.tensor(pts), torch.tensor(onehot)))
    got = fm.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(pts), jnp.asarray(onehot),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_semseg_model_full_parity(ref, rng, monkeypatch):
    """Full semantic-segmentation model vs the reference (xyz+rgb inputs,
    shared patch decomposition). Our model omits the reference's dead unused
    label_conv parameters (semseg.py:384-386) — everything that executes
    must agree end-to-end."""
    torch = ref.torch
    import vipformer.model.pointcloud.semseg as ref_semseg
    import vipformer_tpu.models.crossformer as our_cf

    B, N, G, S, D, C = 2, 64, 8, 4, 32, 6
    neighbors = rng.standard_normal((B, G, S, C)).astype(np.float32)
    centers = rng.standard_normal((B, G, C)).astype(np.float32)

    monkeypatch.setattr(
        ref_semseg, "divide_patches",
        lambda pts, g, s: (torch.tensor(neighbors), torch.tensor(centers)),
    )
    monkeypatch.setattr(
        our_cf, "divide_patches",
        lambda pts, g, s, key=None, neighbor_dtype=None, **kw: (
            jnp.asarray(neighbors).astype(neighbor_dtype or jnp.float32),
            jnp.asarray(centers),
        ),
    )

    adapter = ref.classifier.PointCloudInputAdapter((N, C), D)
    tm = ref_semseg.CrossFormer_semseg(
        input_adapter=adapter, point_channels=C, num_latents=G,
        num_latent_channels=D, group_size=S, num_cross_attention_layers=1,
        num_cross_attention_heads=2, num_self_attention_layers=4,
        num_self_attention_heads=2, mlp_widen_factor=2, max_dpr=0.0,
        atten_drop=0.0, mlp_drop=0.0, layer_idx=[1, 2, 4],
        num_obj_classes=13,
    ).eval()

    fm = our_cf.CrossFormerSemSeg(
        point_channels=C, num_latents=G, num_latent_channels=D,
        group_size=S, num_cross_attention_layers=1,
        num_cross_attention_heads=2, num_self_attention_layers=4,
        num_self_attention_heads=2, mlp_widen_factor=2, max_dpr=0.0,
        atten_drop=0.0, mlp_drop=0.0, layer_idx=(1, 2, 4),
        num_obj_classes=13,
    )

    g2e_bn0_p, g2e_bn0_s = bn(tm.group2emb.first_conv[1])
    g2e_bn1_p, g2e_bn1_s = bn(tm.group2emb.second_conv[1])
    enc = {"cross_attn_n": ca_layer_params(tm.encoder.cross_attn_1)}
    for i, sa in enumerate(tm.encoder.sa_layers):
        enc[f"sa_{i}"] = sa_layer_params(sa)
    prop_bn0_p, prop_bn0_s = bn(tm.propagation.mlp_bns[0])
    prop_bn1_p, prop_bn1_s = bn(tm.propagation.mlp_bns[1])
    seg_bn0_p, seg_bn0_s = bn(tm.bn1)
    seg_bn1_p, seg_bn1_s = bn(tm.bn2)

    params = {
        "stem": {
            "input_adapter": {
                "Dense_0": lin(tm.input_adapter.point_mlp[0]),
                "LayerNorm_0": ln(tm.input_adapter.point_mlp[1]),
                "Dense_1": lin(tm.input_adapter.point_mlp[3]),
            },
            "group2emb": {
                "Dense_0": conv1d(tm.group2emb.first_conv[0]),
                "BatchNorm_0": g2e_bn0_p,
                "Dense_1": conv1d(tm.group2emb.first_conv[3]),
                "Dense_2": conv1d(tm.group2emb.second_conv[0]),
                "BatchNorm_1": g2e_bn1_p,
                "Dense_3": conv1d(tm.group2emb.second_conv[3]),
            },
            "position_emb": {
                "Dense_0": lin(tm.position_emb[0]),
                "Dense_1": lin(tm.position_emb[2]),
            },
        },
        "encoder": enc,
        "norm": ln(tm.norm),
        "propagation": {
            "Dense_0": conv1d(tm.propagation.mlp_convs[0]),
            "BatchNorm_0": prop_bn0_p,
            "Dense_1": conv1d(tm.propagation.mlp_convs[1]),
            "BatchNorm_1": prop_bn1_p,
        },
        "seg_head": {
            "Dense_0": conv1d(tm.conv1),
            "BatchNorm_0": seg_bn0_p,
            "Dense_1": conv1d(tm.conv2),
            "BatchNorm_1": seg_bn1_p,
            "Dense_2": conv1d(tm.conv3),
        },
    }
    stats = {
        "stem": {"group2emb": {"BatchNorm_0": g2e_bn0_s,
                               "BatchNorm_1": g2e_bn1_s}},
        "propagation": {"BatchNorm_0": prop_bn0_s, "BatchNorm_1": prop_bn1_s},
        "seg_head": {"BatchNorm_0": seg_bn0_s, "BatchNorm_1": seg_bn1_s},
    }

    pts = rng.standard_normal((B, N, C)).astype(np.float32)
    want = t2n(tm(torch.tensor(pts)))
    got = fm.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(pts)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def _pc_mp_params(tm):
    """Transplant a reference CrossFormer_pc_mp's weights into our tree."""
    g2e_bn0_p, g2e_bn0_s = bn(tm.group2emb.first_conv[1])
    g2e_bn1_p, g2e_bn1_s = bn(tm.group2emb.second_conv[1])
    enc = {"cross_attn_n": ca_layer_params(tm.encoder.cross_attn_1)}
    for i, sa in enumerate(tm.encoder.sa_layers):
        enc[f"sa_{i}"] = sa_layer_params(sa)
    h0_p, h0_s = bn(tm.latent_head[0])
    h1_p, h1_s = bn(tm.latent_head[3])
    params = {
        "stem": {
            "input_adapter": {
                "Dense_0": lin(tm.input_adapter.point_mlp[0]),
                "LayerNorm_0": ln(tm.input_adapter.point_mlp[1]),
                "Dense_1": lin(tm.input_adapter.point_mlp[3]),
            },
            "group2emb": {
                "Dense_0": conv1d(tm.group2emb.first_conv[0]),
                "BatchNorm_0": g2e_bn0_p,
                "Dense_1": conv1d(tm.group2emb.first_conv[3]),
                "Dense_2": conv1d(tm.group2emb.second_conv[0]),
                "BatchNorm_1": g2e_bn1_p,
                "Dense_3": conv1d(tm.group2emb.second_conv[3]),
            },
            "position_emb": {
                "Dense_0": lin(tm.position_emb[0]),
                "Dense_1": lin(tm.position_emb[2]),
            },
        },
        "encoder": enc,
        "latent_head": {
            "BatchNorm_0": h0_p,
            "Dense_0": lin(tm.latent_head[2]),
            "BatchNorm_1": h1_p,
            "Dense_1": lin(tm.latent_head[5]),
        },
    }
    stats = {
        "stem": {"group2emb": {"BatchNorm_0": g2e_bn0_s,
                               "BatchNorm_1": g2e_bn1_s}},
        "latent_head": {"BatchNorm_0": h0_s, "BatchNorm_1": h1_s},
    }
    return params, stats


def test_pc_model_full_parity_compat(ref, rng, monkeypatch):
    """WHOLE point-cloud model vs the reference with NO shared-decomposition
    carve-out: both sides run their own FPS + kNN + patch normalization end to
    end. `patch_compat=True` reproduces the reference's accidental group-axis
    normalization slice (pointcloud/utils.py:36), which the released
    checkpoints were trained through. The only pins are determinism, not
    decomposition: the FPS start index is fixed to 0 on both sides (the
    reference draws it from torch.randint at utils.py:71; ours from an
    optional PRNG key), and the reference's topk is asked for sorted output
    (it passes sorted=False, i.e. "any order allowed" — utils.py:118 — so
    sorted order is within its contract)."""
    torch = ref.torch
    B, N, G, S, D = 2, 64, 8, 4, 32

    real_randint = torch.randint

    def fixed_randint(low, high, size, **kw):
        if size == (B,):
            return torch.zeros(B, dtype=kw.get("dtype", torch.long),
                               device=kw.get("device", "cpu"))
        return real_randint(low, high, size, **kw)

    monkeypatch.setattr(torch, "randint", fixed_randint)

    real_topk = torch.topk

    def sorted_topk(x, k, dim=-1, largest=True, sorted=False):
        return real_topk(x, k, dim=dim, largest=largest, sorted=True)

    monkeypatch.setattr(ref.utils.torch, "topk", sorted_topk)

    adapter = ref.classifier.PointCloudInputAdapter((N, 3), D)
    tm = ref.partseg.CrossFormer_pc_mp(
        input_adapter=adapter, num_latents=G, num_latent_channels=D,
        group_size=S, num_cross_attention_layers=1,
        num_cross_attention_heads=2, num_self_attention_layers=2,
        num_self_attention_heads=2, mlp_widen_factor=2, max_dpr=0.0,
        atten_drop=0.0, mlp_drop=0.0, modal_prior=True,
    ).eval()

    from vipformer_tpu.models.crossformer import CrossFormerPC
    import vipformer_tpu.ops.geometry as geometry

    monkeypatch.setattr(geometry, "KNN_METHOD", "exact")
    fm = CrossFormerPC(
        num_latents=G, num_latent_channels=D, group_size=S,
        patch_compat=True, num_cross_attention_layers=1,
        num_cross_attention_heads=2, num_self_attention_layers=2,
        num_self_attention_heads=2, mlp_widen_factor=2, max_dpr=0.0,
        atten_drop=0.0, mlp_drop=0.0,
    )
    params, stats = _pc_mp_params(tm)

    pts = rng.standard_normal((B, N, 3)).astype(np.float32)
    with ref.torch.no_grad():
        want_proj, want_feats = tm(torch.tensor(pts))
    got_proj, got_feats = fm.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(pts), True,
    )
    np.testing.assert_allclose(
        np.asarray(got_feats), t2n(want_feats), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_proj), t2n(want_proj), atol=1e-4
    )


def test_divide_patches_compat_oracle(ref, rng, monkeypatch):
    """divide_patches(compat=True) reproduces the reference's exact outputs
    (neighbors AND centers) on identical inputs. Determinism pins only:
    FPS start index fixed to 0 on both sides, and the reference's topk asked
    for sorted output (it passes sorted=False == "any order", utils.py:118;
    the compat slice normalizes the first three *slots*, so comparing a
    specific legal order is required)."""
    torch = ref.torch
    B, N, G, S = 3, 48, 6, 5
    pts = rng.standard_normal((B, N, 3)).astype(np.float32)

    monkeypatch.setattr(
        torch, "randint",
        lambda lo, hi, size, **kw: torch.zeros(size, dtype=torch.long),
    )
    real_topk = torch.topk
    monkeypatch.setattr(
        ref.utils.torch, "topk",
        lambda x, k, dim=-1, largest=True, sorted=False: real_topk(
            x, k, dim=dim, largest=largest, sorted=True
        ),
    )
    with torch.no_grad():
        want_nb, want_c = ref.utils.divide_patches(torch.tensor(pts), G, S)

    import vipformer_tpu.ops.geometry as geometry

    monkeypatch.setattr(geometry, "KNN_METHOD", "exact")
    neighbors, centers = geometry.divide_patches(
        jnp.asarray(pts), G, S, key=None, compat=True,
    )
    np.testing.assert_allclose(np.asarray(centers), t2n(want_c), atol=1e-6)
    np.testing.assert_allclose(np.asarray(neighbors), t2n(want_nb), atol=1e-6)
