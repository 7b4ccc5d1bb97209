"""Compiled Mosaic kernels under shard_map on the real chip.

The CPU suite proves the shard_map dispatch layer's *semantics* in
interpret mode (tests/test_shard_kernels.py,
test_parallel.py::test_tp_and_dp_steps_with_kernels_match_xla); this
hardware suite proves the same wrappers *lower*: a pallas_call inside
shard_map's mesh context compiles through Mosaic and runs on the chip,
including the in-backward psums, the axis_index dropout-seed offsets,
and the custom-VJP plumbing.

Only one physical chip exists in this image, so the mesh is 1x1
('data', 'model') with `sharding_active()` forced on — every wrapper in
ops/pallas/shard.py, flash_train.py, dense.py and g2e_train.py then
takes exactly the code path it takes on a multi-chip mesh (specs, seed
offsets, size-1-axis psums). Caveat stated honestly: XLA's SPMD
partitioner may simplify the 1-partition Manual region, so true
multi-partition lowering still needs real multi-chip hardware; what
this DOES rule out is any trace-time or Mosaic-lowering breakage
introduced by the wrappers themselves (the failure class r3 hit with
the G2E kernel: interpret-fine, hardware-invalid).

Run via `make test-tpu` (VIPFORMER_TEST_TPU=1). Parity target is the
same compiled kernel called directly — the direct calls are themselves
validated against XLA/flax by the other hardware tests.

Reference analogue: none — the reference's kernels are stock torch ops
whose multi-GPU path is DDP allreduce (`/root/reference/pretrain.py:104-109`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from vipformer_tpu.ops.pallas import shard

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled-Mosaic-under-shard_map validation needs the real chip",
)


@pytest.fixture
def forced_mesh(monkeypatch):
    """1x1 ('data', 'model') mesh with the multi-device dispatch forced.

    `sharding_active()` normally requires >1 device; patching it makes
    every kernel call site wrap itself in shard_map over this mesh while
    the per-shard shapes equal the global ones.
    """
    mesh = Mesh(
        np.asarray(jax.devices()[:1]).reshape(1, 1), ("data", "model")
    )
    shard.register_mesh(mesh)
    # active whenever a mesh is registered (tests clear it with
    # register_mesh(None) to trace their direct-call references)
    monkeypatch.setattr(
        shard, "sharding_active", lambda: shard.active_mesh() is not None
    )
    yield mesh
    shard.register_mesh(None)


def test_flash_train_sharded_compiled(forced_mesh):
    """flash_attention_train (fwd + custom-VJP bwd, in-kernel dropout)
    under shard_map == the direct compiled call. rate > 0 exercises
    prng_seed inside the Manual region; the size-1 axis_index seed
    offsets are 0, so the masks are identical to the direct call's."""
    from vipformer_tpu.ops.pallas.flash_train import flash_attention_train

    rng = np.random.default_rng(3)
    b, g, m, hd, h = 8, 64, 256, 256, 4
    q = jnp.asarray(rng.standard_normal((b, g, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, m, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, m, hd)), jnp.float32)
    seed = jnp.asarray([7], jnp.int32)
    scale = (hd // h) ** -0.5

    def loss(q, k, v):
        return jnp.sum(
            flash_attention_train(q, k, v, seed, h, scale, 0.2) ** 2
        )

    # direct (mesh cleared for the reference trace only)
    shard.register_mesh(None)
    ref_val, ref_grads = jax.jit(
        jax.value_and_grad(loss, argnums=(0, 1, 2))
    )(q, k, v)
    ref_val = float(ref_val)
    ref_grads = jax.device_get(ref_grads)

    # mesh dispatch is a trace-time decision: drop any trace the
    # direct run cached (module-level jits would otherwise reuse it)
    jax.clear_caches()
    shard.register_mesh(forced_mesh)
    val, grads = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))(
        q, k, v
    )
    np.testing.assert_allclose(float(val), ref_val, rtol=1e-5)
    for a, r in zip(grads, ref_grads):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=1e-4, atol=1e-4
        )


def test_dense_grads_sharded_compiled(forced_mesh):
    """The Pallas dW/db backward + explicit psum over the data axis,
    compiled inside shard_map == direct compiled kernel grads."""
    import vipformer_tpu.ops.pallas.dense as pdense

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((4096, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 256)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((256,)) * 0.05, jnp.float32)
    cot = jnp.asarray(rng.standard_normal((4096, 256)), jnp.float32)

    def loss(x, w, b):
        return jnp.sum(pdense.dense_apply(x, w, b) * cot)

    pdense.USE_DENSE_GRAD = True
    try:
        assert pdense.dense_grad_enabled(4096, 256, 256, 4)
        shard.register_mesh(None)
        ref = jax.device_get(
            jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x, w, b)
        )
        # the sharded run must not reuse any trace cached by the direct
        # run (mesh dispatch is a trace-time decision)
        jax.clear_caches()
        shard.register_mesh(forced_mesh)
        assert pdense.dense_grad_enabled(4096, 256, 256, 4)
        got = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x, w, b)
    finally:
        pdense.USE_DENSE_GRAD = None

    for a, r in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=1e-5, atol=1e-5
        )


def test_g2e_sharded_compiled(forced_mesh):
    """Fused train-mode Group2Emb under shard_map (psummed BN batch
    sum/sumsq + weight grads) == the direct compiled kernel."""
    from vipformer_tpu.nn.pointnet import Group2Emb
    from vipformer_tpu.ops.pallas.g2e_train import g2e_train_apply

    rng = np.random.default_rng(5)
    b, g, s, cin, d = 4, 64, 32, 3, 256
    x = jnp.asarray(rng.standard_normal((b, g, s, cin)), jnp.float32)
    model = Group2Emb(dim_model=d)
    variables = model.init(jax.random.key(0), x, deterministic=True)
    p = variables["params"]
    wb = (
        p["Dense_0"]["kernel"], p["Dense_0"]["bias"],
        p["BatchNorm_0"]["scale"], p["BatchNorm_0"]["bias"],
        p["Dense_1"]["kernel"], p["Dense_1"]["bias"],
        p["Dense_2"]["kernel"], p["Dense_2"]["bias"],
        p["BatchNorm_1"]["scale"], p["BatchNorm_1"]["bias"],
        p["Dense_3"]["kernel"], p["Dense_3"]["bias"],
    )
    cot = jnp.asarray(rng.standard_normal((b, g, d)), jnp.float32)

    def loss(x, wb):
        out, stats = g2e_train_apply(x, wb, s, False)
        return jnp.sum(out * cot), stats

    shard.register_mesh(None)
    (ref_v, ref_stats), ref_g = jax.jit(
        jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)
    )(x, wb)
    ref_v, ref_stats, ref_g = jax.device_get((ref_v, ref_stats, ref_g))

    # mesh dispatch is a trace-time decision: drop any trace the
    # direct run cached (module-level jits would otherwise reuse it)
    jax.clear_caches()
    shard.register_mesh(forced_mesh)
    (v, stats), gr = jax.jit(
        jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)
    )(x, wb)

    np.testing.assert_allclose(float(v), float(ref_v), rtol=1e-5)
    for a, r in zip(stats, ref_stats):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=1e-5, atol=1e-6
        )
    for a, r in zip(
        jax.tree_util.tree_leaves(gr), jax.tree_util.tree_leaves(ref_g)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=1e-4, atol=1e-4
        )


def test_geometry_kernels_sharded_compiled(forced_mesh):
    """The data_sharded_call family — FPS, kNN, MXU gather — compiled
    per-shard == direct. Integer index outputs compare exactly."""
    import vipformer_tpu.ops.geometry as geometry
    import vipformer_tpu.ops.pallas.gather as pgather

    rng = np.random.default_rng(6)
    pts = jnp.asarray(rng.standard_normal((8, 1024, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((8, 1024, 64)), jnp.float32)
    idx = jnp.asarray(
        rng.integers(0, 1024, size=(8, 2048)), jnp.int32
    )

    geometry.USE_PALLAS_FPS = True
    geometry.KNN_METHOD = "pallas"
    pgather.USE_MXU_GATHER = True
    try:
        shard.register_mesh(None)
        f_ref = np.asarray(
            jax.jit(
                lambda p: geometry.farthest_point_sample(p, 128)
            )(pts)
        )
        q_ref = geometry.index_points(pts, jnp.asarray(f_ref))
        k_ref = np.asarray(
            jax.jit(lambda p, q: geometry.knn(32, p, q))(pts, q_ref)
        )
        g_ref = np.asarray(
            jax.jit(pgather.gather_rows_pallas)(feats, idx)
        )

        # farthest_point_sample is module-level jitted and its mesh
        # dispatch is a trace-time decision: the sharded run must not
        # reuse the trace cached by the direct run
        jax.clear_caches()
        shard.register_mesh(forced_mesh)
        f_got = np.asarray(
            jax.jit(
                lambda p: geometry.farthest_point_sample(p, 128)
            )(pts)
        )
        k_got = np.asarray(
            jax.jit(lambda p, q: geometry.knn(32, p, q))(pts, q_ref)
        )
        g_got = np.asarray(
            jax.jit(pgather.gather_rows_pallas)(feats, idx)
        )
    finally:
        geometry.USE_PALLAS_FPS = None
        geometry.KNN_METHOD = None
        pgather.USE_MXU_GATHER = None

    np.testing.assert_array_equal(f_got, f_ref)
    np.testing.assert_array_equal(k_got, k_ref)
    np.testing.assert_allclose(g_got, g_ref, rtol=1e-6, atol=1e-6)


def test_attention_sharded_call_compiled(forced_mesh):
    """attention_sharded_call around the packed flash-eval kernel,
    compiled == direct (the TP head-split spec with t=1)."""
    from vipformer_tpu.ops.pallas.attention import fused_attention_packed
    from vipformer_tpu.ops.pallas.shard import attention_sharded_call

    rng = np.random.default_rng(7)
    b, g, m, hd, h = 8, 128, 1024, 256, 4
    q = jnp.asarray(rng.standard_normal((b, g, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, m, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, m, hd)), jnp.float32)
    scale = (hd // h) ** -0.5

    def kernel(a, bb, c, hh):
        return fused_attention_packed(a, bb, c, num_heads=hh, scale=scale)

    shard.register_mesh(None)
    ref = np.asarray(jax.jit(lambda a, bb, c: kernel(a, bb, c, h))(q, k, v))

    # mesh dispatch is a trace-time decision: drop any trace the
    # direct run cached (module-level jits would otherwise reuse it)
    jax.clear_caches()
    shard.register_mesh(forced_mesh)
    got = np.asarray(
        jax.jit(
            lambda a, bb, c: attention_sharded_call(
                kernel, a, bb, c, num_heads=h
            )
        )(q, k, v)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
