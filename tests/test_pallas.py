"""Pallas kernel correctness in interpreter mode (CPU CI); the compiled
path is exercised on real TPU by bench/profile tooling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vipformer_tpu.ops.geometry import farthest_point_sample
from vipformer_tpu.ops.pallas.fps import fps_pallas


def test_fps_pallas_matches_lax_oracle(rng):
    xyz = jnp.asarray(rng.standard_normal((8, 128, 3)).astype(np.float32))
    want = np.asarray(farthest_point_sample(xyz, 16))
    got = np.asarray(fps_pallas(xyz, 16, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_random_start(rng):
    xyz = jnp.asarray(rng.standard_normal((4, 64, 3)).astype(np.float32))
    start = jnp.asarray([3, 7, 11, 0], dtype=jnp.int32)
    got = np.asarray(fps_pallas(xyz, 8, start, interpret=True))
    np.testing.assert_array_equal(got[:, 0], np.asarray(start))
    # all selected indices distinct per row
    for row in got:
        assert len(set(row.tolist())) == 8


def test_fps_pallas_ragged_batch_fallback(rng):
    # batch not divisible by the row tile -> row-by-row grid still correct
    xyz = jnp.asarray(rng.standard_normal((3, 64, 3)).astype(np.float32))
    want = np.asarray(farthest_point_sample(xyz, 8))
    got = np.asarray(fps_pallas(xyz, 8, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_extra_channels(rng):
    xyz = jnp.asarray(rng.standard_normal((2, 64, 6)).astype(np.float32))
    got = np.asarray(fps_pallas(xyz, 8, interpret=True))
    want = np.asarray(farthest_point_sample(xyz, 8))
    np.testing.assert_array_equal(got, want)


def test_fused_attention_matches_xla(rng):
    from vipformer_tpu.ops.attention import dot_product_attention
    from vipformer_tpu.ops.pallas.attention import fused_attention

    q = jnp.asarray(rng.standard_normal((2, 4, 16, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 4, 64, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 4, 64, 32)).astype(np.float32))
    want = np.asarray(
        dot_product_attention(q, k, v, scale=0.125, deterministic=True)
    )
    got = np.asarray(
        fused_attention(q, k, v, scale=0.125, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_attention_fits_budget():
    from vipformer_tpu.ops.pallas.attention import fused_attention_fits
    import jax.numpy as jnp

    assert fused_attention_fits(128, 2048, 64, 64, jnp.bfloat16)
    assert not fused_attention_fits(4096, 65536, 128, 128, jnp.float32)


def test_packed_attention_matches_xla(rng):
    """Packed-layout flash kernel == head-split XLA attention, for both the
    single-chunk (flagship CA, M fits one block) and multi-chunk (large-M
    Fourier image inputs) paths."""
    from vipformer_tpu.ops.attention import dot_product_attention
    from vipformer_tpu.ops.pallas.attention import fused_attention_packed

    b, h, g, m, dh = 2, 4, 8, 96, 8
    d = h * dh
    q = jnp.asarray(rng.standard_normal((b, g, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, m, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, m, d)).astype(np.float32))

    def split(x, n):
        return x.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

    o = dot_product_attention(
        split(q, g), split(k, m), split(v, m),
        scale=dh**-0.5, deterministic=True,
    )
    want = np.asarray(o.transpose(0, 2, 1, 3).reshape(b, g, d))
    for chunk in (96, 32):  # single chunk, and the flash recurrence
        got = np.asarray(
            fused_attention_packed(
                q, k, v, num_heads=h, scale=dh**-0.5,
                kv_chunk=chunk, interpret=True,
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_stem_matches_unfused(rng):
    """Fused gather+Group2Emb kernel == divide_patches + Group2Emb (eval),
    with nontrivial folded BatchNorm statistics."""
    from vipformer_tpu.nn.pointnet import Group2Emb
    from vipformer_tpu.ops.geometry import divide_patches
    from vipformer_tpu.ops.pallas.stem import (
        fused_stem_supported,
        group2emb_fused_apply,
    )
    from vipformer_tpu.ops import geometry
    from vipformer_tpu.ops.geometry import (
        farthest_point_sample, index_points, knn,
    )

    b, n, g, s, d = 2, 64, 8, 16, 32
    assert fused_stem_supported(g, s, n, True, False)
    pts = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    g2e = Group2Emb(d)
    variables = g2e.init({"params": jax.random.key(0)},
                         jnp.zeros((1, g, s, 3)))
    # nontrivial BN stats so the affine folding is actually exercised
    stats = jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            rng.uniform(0.5, 1.5, x.shape).astype(np.float32)
        ),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    neighbors, centers = divide_patches(pts, g, s)
    want = np.asarray(g2e.apply(variables, neighbors, True))

    center_idx = farthest_point_sample(pts, g)
    centers2 = index_points(pts, center_idx)
    idx = knn(s, pts, centers2)
    got = np.asarray(
        group2emb_fused_apply(
            variables["params"], variables["batch_stats"],
            pts, centers2, idx, jnp.float32, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_stem_extra_channels(rng):
    """Semseg-style xyz+rgb points: only xyz is centered (rgb rides along
    uncentered, like divide_patches)."""
    from vipformer_tpu.nn.pointnet import Group2Emb
    from vipformer_tpu.ops.geometry import (
        divide_patches, farthest_point_sample, index_points, knn,
    )
    from vipformer_tpu.ops.pallas.stem import group2emb_fused_apply

    b, n, g, s, d = 2, 64, 8, 16, 32
    pts = jnp.asarray(rng.standard_normal((b, n, 6)).astype(np.float32))
    g2e = Group2Emb(d)
    variables = g2e.init({"params": jax.random.key(0)},
                         jnp.zeros((1, g, s, 6)))
    neighbors, centers = divide_patches(pts, g, s)
    want = np.asarray(g2e.apply(variables, neighbors, True))
    center_idx = farthest_point_sample(pts, g)
    centers2 = index_points(pts, center_idx)
    idx = knn(s, pts[..., :3], centers2[..., :3])
    got = np.asarray(
        group2emb_fused_apply(
            variables["params"], variables["batch_stats"],
            pts, centers2, idx, jnp.float32, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_stem_gate():
    from vipformer_tpu.ops.pallas.stem import fused_stem_supported

    assert fused_stem_supported(128, 32, 1024, True, False)
    assert not fused_stem_supported(128, 32, 1024, False, False)  # train
    assert not fused_stem_supported(128, 32, 1024, True, True)  # compat
    assert not fused_stem_supported(8, 4, 256, True, False)  # 32 rows
    assert not fused_stem_supported(128, 32, 8192, True, False)  # big N


def test_packed_attention_gate():
    from vipformer_tpu.ops.pallas.attention import (
        _kv_chunk_for,
        packed_attention_enabled,
    )

    # never with masks/train-dropout, or mismatched qk/v widths
    assert not packed_attention_enabled(
        4, 256, 256, 1024, jnp.ones((2, 1024), bool), 0.0, True
    )
    assert not packed_attention_enabled(4, 256, 256, 1024, None, 0.1, False)
    assert not packed_attention_enabled(4, 256, 128, 1024, None, 0.0, True)
    # chunking picks divisors (50176 = 224*224 Fourier tokens)
    assert _kv_chunk_for(1024) == 1024
    assert _kv_chunk_for(50176) == 1792
    assert 50176 % _kv_chunk_for(50176) == 0


def test_mxu_gather_matches_take_along_axis(rng):
    from vipformer_tpu.ops.pallas.gather import gather_rows_pallas

    pts = jnp.asarray(rng.standard_normal((3, 64, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 64, size=(3, 32)).astype(np.int32))
    want = np.asarray(jnp.take_along_axis(pts, idx[:, :, None], axis=1))
    got = np.asarray(gather_rows_pallas(pts, idx, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_mxu_gather_grad_is_scatter_add(rng):
    from vipformer_tpu.ops.pallas.gather import gather_rows_pallas

    pts = jnp.asarray(rng.standard_normal((2, 16, 3)).astype(np.float32))
    idx = jnp.asarray(
        np.array([[0, 0, 5, 9], [3, 3, 3, 1]], dtype=np.int32)
    )

    def f(p):
        return jnp.sum(gather_rows_pallas(p, idx, interpret=True) ** 2)

    def f_ref(p):
        return jnp.sum(jnp.take_along_axis(p, idx[:, :, None], axis=1) ** 2)

    g = np.asarray(jax.grad(f)(pts))
    g_ref = np.asarray(jax.grad(f_ref)(pts))
    np.testing.assert_allclose(g, g_ref, atol=1e-5)


def test_packed_kv_attention_matches_separate_projections(rng):
    """fused_attention_packed_kv == Dense-projected k/v through
    fused_attention_packed, across chunked and single-chunk M."""
    from vipformer_tpu.ops.pallas.attention import (
        fused_attention_packed,
        fused_attention_packed_kv,
    )

    b, g, m, d, din, h = 2, 16, 512, 64, 128, 4
    q = jnp.asarray(rng.standard_normal((b, g, d)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((b, m, din)).astype(np.float32))
    wk = jnp.asarray(rng.standard_normal((din, d)).astype(np.float32))
    wv = jnp.asarray(rng.standard_normal((din, d)).astype(np.float32))
    scale = (d // h) ** -0.5
    want = np.asarray(
        fused_attention_packed(
            q, x @ wk, x @ wv, num_heads=h, scale=scale, interpret=True
        )
    )
    for chunk in (None, 128):
        got = np.asarray(
            fused_attention_packed_kv(
                q, x, wk, wv, num_heads=h, scale=scale, kv_chunk=chunk,
                interpret=True,
            )
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_mha_kv_fused_branch_matches_xla(rng):
    """MultiHeadAttention routed through the kv-fused kernel == the plain
    XLA attention path, same params, eval mode."""
    import vipformer_tpu.ops.pallas.attention as attn_mod
    from vipformer_tpu.nn.layers import MultiHeadAttention

    b, g, m, d, h = 2, 8, 512, 64, 4
    x_q = jnp.asarray(rng.standard_normal((b, g, d)).astype(np.float32))
    x_kv = jnp.asarray(rng.standard_normal((b, m, 128)).astype(np.float32))
    mha = MultiHeadAttention(num_heads=h, num_qk_channels=d)
    variables = mha.init(jax.random.key(0), x_q, x_kv)
    want = np.asarray(mha.apply(variables, x_q, x_kv, deterministic=True))
    old = attn_mod.USE_FUSED_ATTENTION
    attn_mod.USE_FUSED_ATTENTION = True
    try:
        assert attn_mod.packed_attention_kv_enabled(
            h, d, d, m, 128, None, 0.0, True
        )
        got = np.asarray(
            mha.apply(variables, x_q, x_kv, deterministic=True)
        )
    finally:
        attn_mod.USE_FUSED_ATTENTION = old
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_packed_kv_ln_attention_matches_module_chain(rng):
    """fused_attention_packed_kv_ln == LayerNorm -> Dense k/v ->
    fused_attention_packed, chunked and unchunked."""
    import flax.linen as fnn

    from vipformer_tpu.ops.pallas.attention import (
        fused_attention_packed,
        fused_attention_packed_kv_ln,
    )

    b, g, m, d, din, h = 2, 16, 512, 64, 128, 4
    q = jnp.asarray(rng.standard_normal((b, g, d)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((b, m, din)).astype(np.float32))
    lns = jnp.asarray(rng.standard_normal((din,)).astype(np.float32))
    lnb = jnp.asarray(rng.standard_normal((din,)).astype(np.float32))
    wk = jnp.asarray(rng.standard_normal((din, d)).astype(np.float32))
    wv = jnp.asarray(rng.standard_normal((din, d)).astype(np.float32))
    scale = (d // h) ** -0.5
    xn = fnn.LayerNorm(epsilon=1e-5).apply(
        {"params": {"scale": lns, "bias": lnb}}, x
    )
    want = np.asarray(
        fused_attention_packed(
            q, xn @ wk, xn @ wv, num_heads=h, scale=scale, interpret=True
        )
    )
    for chunk in (None, 128):
        got = np.asarray(
            fused_attention_packed_kv_ln(
                q, x, lns, lnb, wk, wv, num_heads=h, scale=scale,
                kv_chunk=chunk, interpret=True,
            )
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_cross_attention_kv_fused_branch_matches_xla(rng):
    """CrossAttention routed through the LN+kv-fused kernel == the module
    path (LN modules + MHA), same params, eval mode."""
    import vipformer_tpu.ops.pallas.attention as attn_mod
    from vipformer_tpu.nn.layers import CrossAttention

    b, g, m, d, h = 2, 8, 512, 64, 4
    x_q = jnp.asarray(rng.standard_normal((b, g, d)).astype(np.float32))
    x_kv = jnp.asarray(rng.standard_normal((b, m, 128)).astype(np.float32))
    ca = CrossAttention(num_heads=h, num_qk_channels=d)
    variables = ca.init(jax.random.key(0), x_q, x_kv)
    want = np.asarray(ca.apply(variables, x_q, x_kv, deterministic=True))
    old = attn_mod.USE_FUSED_ATTENTION
    attn_mod.USE_FUSED_ATTENTION = True
    try:
        got = np.asarray(
            ca.apply(variables, x_q, x_kv, deterministic=True)
        )
    finally:
        attn_mod.USE_FUSED_ATTENTION = old
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_centered_gather_matches_gather_then_sub(rng):
    """Signed one-hot gather+centering == gather -> subtract center xyz
    (the divide_patches documented-intent normalization), bit-exact in
    f32, including extra uncentered channels."""
    from vipformer_tpu.ops.pallas.gather import gather_rows_centered_pallas

    b, n, g, s = 3, 64, 8, 16
    for c in (3, 6):
        pts = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
        centers = jnp.asarray(
            rng.standard_normal((b, g, c)).astype(np.float32)
        )
        idx = jnp.asarray(
            rng.integers(0, n, size=(b, g * s)).astype(np.int32)
        )
        nb = jnp.take_along_axis(pts, idx[:, :, None], axis=1).reshape(
            b, g, s, c
        )
        delta = nb[..., :3] - centers[..., None, :3]
        want = np.asarray(
            jnp.concatenate([delta, nb[..., 3:]], axis=-1)
        ).reshape(b, g * s, c)
        got = np.asarray(
            gather_rows_centered_pallas(
                pts, centers, idx, s, interpret=True
            )
        )
        np.testing.assert_array_equal(got, want)


def test_centered_gather_grads(rng):
    """VJP: d_points is the (+) scatter-add, d_centers the (-S-fold) group
    sum, matching autodiff through the unfused reference path."""
    from vipformer_tpu.ops.pallas.gather import gather_rows_centered_pallas

    b, n, g, s, c = 2, 32, 4, 32, 3
    pts = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    centers = jnp.asarray(rng.standard_normal((b, g, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, size=(b, g * s)).astype(np.int32))
    cot = jnp.asarray(
        rng.standard_normal((b, g * s, c)).astype(np.float32)
    )

    def fused(p, cc):
        out = gather_rows_centered_pallas(p, cc, idx, s, interpret=True)
        return jnp.sum(out * cot)

    def ref(p, cc):
        nb = jnp.take_along_axis(p, idx[:, :, None], axis=1).reshape(
            b, g, s, c
        )
        out = (nb - cc[:, :, None, :]).reshape(b, g * s, c)
        return jnp.sum(out * cot)

    gp, gc = jax.grad(fused, argnums=(0, 1))(pts, centers)
    gp_r, gc_r = jax.grad(ref, argnums=(0, 1))(pts, centers)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gp_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gc_r), atol=1e-5)


def test_divide_patches_fused_centered_path(rng):
    """divide_patches with the fused kernel forced on == the XLA path,
    for both 3- and 6-channel inputs (extra channels uncentered)."""
    from vipformer_tpu.ops import geometry
    from vipformer_tpu.ops.pallas import gather as gmod

    for c in (3, 6):
        pts = jnp.asarray(
            rng.standard_normal((2, 256, c)).astype(np.float32)
        )
        want_nb, want_c = geometry.divide_patches(pts, 8, 16)
        old = gmod.USE_MXU_GATHER
        gmod.USE_MXU_GATHER = True
        try:
            got_nb, got_c = geometry.divide_patches(pts, 8, 16)
        finally:
            gmod.USE_MXU_GATHER = old
        np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))
        np.testing.assert_allclose(
            np.asarray(got_nb), np.asarray(want_nb), atol=1e-6
        )


def test_knn_pallas_matches_packed(rng):
    from vipformer_tpu.ops.geometry import knn
    from vipformer_tpu.ops.pallas.knn import knn_pallas

    pts = jnp.asarray(rng.standard_normal((3, 256, 3)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((3, 32, 3)).astype(np.float32))
    want = np.asarray(knn(16, pts, q, method="packed"))
    got = np.asarray(knn_pallas(16, pts, q, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_knn_pallas_self_queries(rng):
    """Queries drawn from the point set (the FPS-center case): each query's
    own index must appear first."""
    from vipformer_tpu.ops.pallas.knn import knn_pallas

    pts = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    q = pts[:, :8]
    got = np.asarray(knn_pallas(4, pts, q, interpret=True))
    np.testing.assert_array_equal(got[:, :, 0], np.arange(8)[None].repeat(2, 0))


def test_patchify_fused_matches_composition(rng):
    from vipformer_tpu.ops.geometry import farthest_point_sample, index_points, knn
    from vipformer_tpu.ops.pallas.patchify import fps_knn_pallas

    xyz = jnp.asarray(rng.standard_normal((4, 128, 3)).astype(np.float32))
    cidx, nidx = fps_knn_pallas(xyz, 16, 8, interpret=True)
    want_c = np.asarray(farthest_point_sample(xyz, 16))
    np.testing.assert_array_equal(np.asarray(cidx), want_c)
    centers = index_points(xyz, jnp.asarray(want_c))
    want_n = np.asarray(knn(8, xyz, centers, method="packed"))
    got_n = np.asarray(nidx)
    # neighbor sets must match; ordering ties only at sub-ulp distances
    np.testing.assert_array_equal(np.sort(got_n, -1), np.sort(want_n, -1))


def test_patchify_fused_random_start(rng):
    from vipformer_tpu.ops.pallas.patchify import fps_knn_pallas

    xyz = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    start = jnp.asarray([5, 11], dtype=jnp.int32)
    cidx, nidx = fps_knn_pallas(xyz, 8, 4, start, interpret=True)
    np.testing.assert_array_equal(np.asarray(cidx)[:, 0], np.asarray(start))
    # each center's own index appears in its neighborhood
    for b in range(2):
        for gi in range(8):
            assert int(cidx[b, gi]) in set(np.asarray(nidx)[b, gi].tolist())


def test_packed_small_attention_matches_xla(rng):
    """Batch-blocked small-M eval kernel == head-split XLA attention,
    including a batch size that is not a multiple of the block (bt
    fallback) and a non-128 sequence length (image SA shape)."""
    from vipformer_tpu.ops.attention import dot_product_attention
    from vipformer_tpu.ops.pallas.attention import (
        fused_attention_packed_small,
        packed_small_attention_enabled,
    )

    for b, n, h, dh in ((4, 16, 4, 8), (6, 24, 2, 16)):
        d = h * dh
        q = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))

        def split(x):
            return x.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        o = dot_product_attention(
            split(q), split(k), split(v), scale=dh**-0.5,
            deterministic=True,
        )
        want = np.asarray(o.transpose(0, 2, 1, 3).reshape(b, n, d))
        got = np.asarray(
            fused_attention_packed_small(
                q, k, v, num_heads=h, scale=dh**-0.5, interpret=True
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-5)

    # gate: ON by default on TPU since the r3 batched-dot rewrite (the old
    # per-(row, head) version measured slower and was opt-in only)
    on_tpu = jax.default_backend() == "tpu"
    assert (
        packed_small_attention_enabled(4, 256, 256, 128, 128, None, 0.1, True)
        == on_tpu
    )
    from vipformer_tpu.ops.pallas import attention as pattn

    pattn.USE_FUSED_ATTENTION = False
    try:
        assert not packed_small_attention_enabled(
            4, 256, 256, 128, 128, None, 0.1, True
        )
    finally:
        pattn.USE_FUSED_ATTENTION = None
    # training-mode dropout and large M stay out regardless of backend
    assert not packed_small_attention_enabled(
        4, 256, 256, 128, 128, None, 0.1, False
    )
    assert not packed_small_attention_enabled(
        4, 256, 256, 128, 2048, None, 0.0, True
    )


def test_dense_grads_pallas_matches_einsum(rng):
    """Fused (dW, db) row-stream kernel vs the plain einsum grads, f32
    and bf16 inputs (interpret mode; the r3 kernel behind nn.layers.Dense
    custom-VJP)."""
    from vipformer_tpu.ops.pallas.dense import dense_grads_pallas

    for dt in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.standard_normal((2048, 64)), dt)
        dy = jnp.asarray(rng.standard_normal((2048, 256)), dt)
        dw, db = dense_grads_pallas(x, dy, interpret=True)
        ref_dw = jnp.einsum(
            "ri,rj->ij", x.astype(jnp.float32), dy.astype(jnp.float32)
        )
        ref_db = jnp.sum(dy.astype(jnp.float32), axis=0)
        tol = 1e-5 if dt == jnp.float32 else 1e-2
        np.testing.assert_allclose(dw, ref_dw, rtol=tol, atol=tol * 10)
        np.testing.assert_allclose(db, ref_db, rtol=tol, atol=tol * 10)


def test_dense_apply_custom_vjp_matches_autodiff(rng):
    """dense_apply's custom VJP (XLA dx + Pallas dW/db) == autodiff of
    the inline einsum on an N-D operand."""
    from vipformer_tpu.ops.pallas import dense as dense_mod

    x = jnp.asarray(rng.standard_normal((8, 256, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 128)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((128,)) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.standard_normal((8, 256, 128)), jnp.float32)

    def ref(x, w, b):
        return jnp.sum(
            (jnp.einsum("...i,ij->...j", x, w) + b) * cot
        )

    gx_r, gw_r, gb_r = jax.grad(ref, argnums=(0, 1, 2))(x, w, b)

    # off-TPU the call site routes the backward kernel through interpret
    # mode automatically (ops/pallas/dense.py _dense_bwd)
    def fused(x, w, b):
        return jnp.sum(dense_mod.dense_apply(x, w, b) * cot)

    gx_f, gw_f, gb_f = jax.grad(fused, argnums=(0, 1, 2))(x, w, b)

    np.testing.assert_allclose(gx_f, gx_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(gw_f, gw_r, rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(gb_f, gb_r, rtol=2e-5, atol=2e-4)


def test_layernorm_kernel_matches_flax(rng):
    """Pallas LayerNorm (interpret): forward + custom-VJP grads vs
    flax.linen.LayerNorm autodiff.  The kernel is OFF by default (it
    measured slower than XLA's fused LN at every model site — see
    ops/pallas/layernorm.py) but stays correct and forceable."""
    import flax.linen as nn

    import vipformer_tpu.ops.pallas.layernorm as pln

    x = jnp.asarray(rng.standard_normal((2048, 256)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((256,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((256,)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((2048, 256)), jnp.float32)
    pv = {"params": {"scale": scale, "bias": bias}}
    ref_mod = nn.LayerNorm(epsilon=1e-5)

    def ref(p, x):
        return jnp.sum(ref_mod.apply(p, x) * cot)

    def fused(s, b, x):
        return jnp.sum(pln.layernorm_apply(x, s, b) * cot)

    y_ref = ref_mod.apply(pv, x)
    gp_r, gx_r = jax.grad(ref, argnums=(0, 1))(pv, x)

    pln.USE_LAYERNORM = True
    try:
        assert pln.layernorm_enabled(2048, 256, 4)
        y = pln.layernorm_apply(x, scale, bias)
        gs, gb, gx = jax.grad(fused, argnums=(0, 1, 2))(scale, bias, x)
    finally:
        pln.USE_LAYERNORM = None

    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gx, gx_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        gs, gp_r["params"]["scale"], rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        gb, gp_r["params"]["bias"], rtol=1e-4, atol=1e-3
    )


def test_layernorm_module_bit_matches_flax(rng):
    """nn.layers.LayerNorm's inline path (the default) is op-for-op the
    flax computation: bit-identical outputs and grads, identical param
    tree, in f32 and bf16."""
    import flax.linen as nn

    from vipformer_tpu.nn.layers import layer_norm

    scale = jnp.asarray(rng.standard_normal((64,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((64,)), jnp.float32)
    pv = {"params": {"scale": scale, "bias": bias}}
    for dt in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.standard_normal((4, 32, 64)), dt)
        ours = layer_norm(dt, name="n")
        ref = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="n")
        assert jax.tree_util.tree_structure(
            ours.init(jax.random.key(0), x)
        ) == jax.tree_util.tree_structure(ref.init(jax.random.key(0), x))
        yo = ours.apply(pv, x)
        yr = ref.apply(pv, x)
        assert yo.dtype == yr.dtype
        np.testing.assert_array_equal(
            np.asarray(yo, np.float32), np.asarray(yr, np.float32)
        )
    # grads bit-match too (f32)
    x = jnp.asarray(rng.standard_normal((4, 32, 64)), jnp.float32)
    go = jax.grad(
        lambda p: jnp.sum(jnp.sin(layer_norm(None, name="n").apply(p, x)))
    )(pv)
    gr = jax.grad(
        lambda p: jnp.sum(
            jnp.sin(nn.LayerNorm(epsilon=1e-5, name="n").apply(p, x))
        )
    )(pv)
    for k in ("scale", "bias"):
        np.testing.assert_array_equal(go["params"][k], gr["params"][k])


def test_gelu_exact_erf_form_accuracy():
    """gelu_exact (torch's erf form, f32) vs jax.nn.gelu(approximate=False)
    evaluated in f64: the erf form must be at least as accurate as the
    erfc form at f32, and within 2e-6 absolute of the true function."""
    from vipformer_tpu.nn.layers import gelu_exact

    from scipy.special import erf as np_erf

    xn = np.linspace(-10, 10, 100_001)
    oracle = 0.5 * xn * (1.0 + np_erf(xn / np.sqrt(2.0)))
    ours = np.asarray(gelu_exact(jnp.asarray(xn, jnp.float32)), np.float64)
    assert np.max(np.abs(ours - oracle)) < 2e-6
    # bf16 path: upcasts internally, result dtype preserved
    xb = jnp.asarray(xn, jnp.bfloat16)
    yb = gelu_exact(xb)
    assert yb.dtype == jnp.bfloat16
    yb_ref = (
        0.5
        * xb.astype(jnp.float32)
        * (1.0 + jax.lax.erf(xb.astype(jnp.float32) * 0.7071067811865476))
    ).astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(yb, np.float32), np.asarray(yb_ref, np.float32)
    )


def test_fps_pallas_return_centers(rng):
    """return_centers banks the selected xyz from in-kernel registers;
    must bit-match the gather it replaces, with identical indices."""
    from vipformer_tpu.ops.pallas.fps import fps_pallas

    xyz = jnp.asarray(rng.standard_normal((8, 256, 3)), jnp.float32)
    idx0 = fps_pallas(xyz, 32, interpret=True)
    idx1, centers = fps_pallas(
        xyz, 32, interpret=True, return_centers=True
    )
    np.testing.assert_array_equal(idx0, idx1)
    ref = jnp.take_along_axis(xyz, idx0[:, :, None], axis=1)
    np.testing.assert_array_equal(centers, ref)


def test_batchnorm_module_matches_flax(rng):
    """nn.layers.BatchNorm (train-mode drop-in, XLA fallback path on
    CPU) == flax.linen.BatchNorm(use_running_average=False): outputs,
    running-stat updates, and grads through the batch."""
    import flax.linen as nn

    from vipformer_tpu.nn.layers import BatchNorm

    x = jnp.asarray(rng.standard_normal((4, 32, 48)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((4, 32, 48)), jnp.float32)

    ours = BatchNorm()
    flaxm = nn.BatchNorm(use_running_average=False, momentum=0.9)
    v_ours = ours.init(jax.random.key(0), x)
    v_flax = flaxm.init(jax.random.key(0), x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        v_ours,
        v_flax,
    )

    y_o, m_o = ours.apply(v_ours, x, mutable=["batch_stats"])
    y_f, m_f = flaxm.apply(v_flax, x, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(y_o), np.asarray(y_f), rtol=1e-6, atol=1e-6
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        ),
        m_o,
        m_f,
    )

    def loss(mod, v, xx):
        y, _ = mod.apply(v, xx, mutable=["batch_stats"])
        return jnp.sum(y * cot), jnp.sum(y)

    (g_o, _), (g_f, _) = (
        jax.grad(lambda xx: loss(ours, v_ours, xx), has_aux=True)(x),
        jax.grad(lambda xx: loss(flaxm, v_flax, xx), has_aux=True)(x),
    )
    np.testing.assert_allclose(
        np.asarray(g_o), np.asarray(g_f), rtol=1e-5, atol=1e-5
    )

    gp_o = jax.grad(lambda p: loss(ours, {**v_ours, "params": p}, x)[0])(
        v_ours["params"]
    )
    gp_f = jax.grad(lambda p: loss(flaxm, {**v_flax, "params": p}, x)[0])(
        v_flax["params"]
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        ),
        gp_o,
        gp_f,
    )


def test_batchnorm_kernel_matches_fallback(rng):
    """bn_train_apply with the Pallas kernels forced (interpret on CPU)
    == the module's XLA-fallback math: y, mean/var, and all three grads,
    f32 and bf16."""
    import vipformer_tpu.ops.pallas.batchnorm as pbn

    for dt, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 2e-2)):
        x = jnp.asarray(rng.standard_normal((512, 64)), dt)
        scale = jnp.asarray(1 + 0.1 * rng.standard_normal(64), jnp.float32)
        bias = jnp.asarray(0.1 * rng.standard_normal(64), jnp.float32)
        cot = jnp.asarray(rng.standard_normal((512, 64)), dt)

        def ref(x, s, b):
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, 0)
            var = jnp.maximum(0.0, jnp.mean(xf * xf, 0) - mean * mean)
            mul = jax.lax.rsqrt(var + jnp.float32(1e-5)) * s
            y = ((xf - mean) * mul + b).astype(x.dtype)
            return y, mean, var

        def fused(x, s, b):
            return pbn.bn_train_apply(x, s, b, 1e-5)

        pbn.USE_BN_TRAIN = True
        try:
            y_k, mean_k, var_k = fused(x, scale, bias)
            gx_k, gs_k, gb_k = jax.grad(
                lambda *a: jnp.sum(
                    fused(*a)[0].astype(jnp.float32) * cot.astype(jnp.float32)
                ),
                argnums=(0, 1, 2),
            )(x, scale, bias)
        finally:
            pbn.USE_BN_TRAIN = None

        y_r, mean_r, var_r = ref(x, scale, bias)
        gx_r, gs_r, gb_r = jax.grad(
            lambda *a: jnp.sum(
                ref(*a)[0].astype(jnp.float32) * cot.astype(jnp.float32)
            ),
            argnums=(0, 1, 2),
        )(x, scale, bias)

        np.testing.assert_allclose(
            np.asarray(y_k, np.float32), np.asarray(y_r, np.float32),
            rtol=tol, atol=tol,
        )
        np.testing.assert_allclose(mean_k, mean_r, rtol=tol, atol=tol)
        np.testing.assert_allclose(var_k, var_r, rtol=tol, atol=tol)
        np.testing.assert_allclose(
            np.asarray(gx_k, np.float32), np.asarray(gx_r, np.float32),
            rtol=tol, atol=tol * 10,
        )
        np.testing.assert_allclose(gs_k, gs_r, rtol=tol, atol=tol * 30)
        np.testing.assert_allclose(gb_k, gb_r, rtol=tol, atol=tol * 30)


def test_packed_small_qkv_ln_matches_module_math(rng):
    """LN+qkv-folded small-M self-attention kernel (interpret) == the
    module path: nn.layers LayerNorm -> q/k/v Dense (no bias) ->
    dot_product_attention, f32 and bf16."""
    from vipformer_tpu.ops.attention import dot_product_attention
    from vipformer_tpu.ops.pallas.attention import (
        fused_attention_packed_small_qkv_ln,
    )

    b, g, din, h, d = 4, 16, 32, 4, 32
    for dt, tol in ((jnp.float32, 2e-5), (jnp.bfloat16, 2e-2)):
        x = jnp.asarray(rng.standard_normal((b, g, din)), dt)
        lns = jnp.asarray(1 + 0.1 * rng.standard_normal(din), jnp.float32)
        lnb = jnp.asarray(0.1 * rng.standard_normal(din), jnp.float32)
        wq = jnp.asarray(0.2 * rng.standard_normal((din, d)), dt)
        wk = jnp.asarray(0.2 * rng.standard_normal((din, d)), dt)
        wv = jnp.asarray(0.2 * rng.standard_normal((din, d)), dt)
        scale = (d // h) ** -0.5

        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.maximum(
            0.0, jnp.mean(xf * xf, -1, keepdims=True) - mu * mu
        )
        xn = ((xf - mu) * (jax.lax.rsqrt(var + 1e-5) * lns) + lnb).astype(dt)

        def proj(w):
            y = jnp.einsum(
                "bgd,de->bge", xn, w, preferred_element_type=dt
            )
            return y.reshape(b, g, h, d // h).transpose(0, 2, 1, 3)

        want = dot_product_attention(
            proj(wq), proj(wk), proj(wv), scale=scale
        )
        want = want.transpose(0, 2, 1, 3).reshape(b, g, d)

        got = fused_attention_packed_small_qkv_ln(
            x, lns, lnb, wq, wk, wv,
            num_heads=h, scale=scale, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(want, np.float32),
            rtol=tol, atol=tol,
        )


def test_sa_qkv_ln_wiring_matches_module_path(rng):
    """SelfAttention with the LN+qkv-folded kernel forced (interpret on
    CPU) == the module path, at a whole-model eval forward."""
    import vipformer_tpu.ops.pallas.attention as pattn
    from vipformer_tpu.nn.layers import SelfAttention

    b, g, d, h = 4, 16, 32, 4
    x = jnp.asarray(rng.standard_normal((b, g, d)), jnp.float32)
    sa = SelfAttention(num_heads=h)
    v = sa.init(jax.random.key(0), x)
    want = sa.apply(v, x, deterministic=True)
    pattn.USE_SA_QKV_LN = True
    try:
        got = sa.apply(v, x, deterministic=True)
    finally:
        pattn.USE_SA_QKV_LN = None
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
    # param tree untouched by the fast path (it reads, never creates)
    v2 = sa.init(jax.random.key(0), x)
    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(c)
        ),
        v,
        v2,
    )
