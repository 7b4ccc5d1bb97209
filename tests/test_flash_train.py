"""Training flash-attention kernel: parity with the XLA path.

CPU CI runs the rate=0 fwd/bwd parity in interpret mode. The dropout path
uses the TPU hardware PRNG (`pltpu.prng_*`), which has no interpret-mode
lowering — those checks live in the tpu-gated test below and run via
`python tools/tpu_train_smoke.py --flash` on the real chip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vipformer_tpu.ops.pallas.flash_train import (
    flash_attention_train,
    flash_train_enabled,
)

B, G, M, H, D = 2, 16, 64, 4, 32
SCALE = (D // H) ** -0.5


def _ref(q, k, v):
    qh = q.reshape(B, G, H, D // H).transpose(0, 2, 1, 3)
    kh = k.reshape(B, M, H, D // H).transpose(0, 2, 1, 3)
    vh = v.reshape(B, M, H, D // H).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhgc,bhmc->bhgm", qh, kh) * SCALE
    p = jax.nn.softmax(logits, -1)
    o = jnp.einsum("bhgm,bhmc->bhgc", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(B, G, D)


@pytest.fixture
def qkv(rng):
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    return f(B, G, D), f(B, M, D), f(B, M, D)


SEED = jnp.array([7], jnp.int32)


@pytest.mark.parametrize("mc", [64, 16])
def test_forward_matches_xla_no_dropout(qkv, mc):
    q, k, v = qkv
    out = flash_attention_train(q, k, v, SEED, H, SCALE, 0.0, mc, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(q, k, v)), rtol=2e-5, atol=2e-5
    )


def test_gradients_match_xla_no_dropout(qkv):
    q, k, v = qkv

    def loss_flash(q, k, v):
        return jnp.sum(
            jnp.sin(flash_attention_train(q, k, v, SEED, H, SCALE, 0.0, 16, True))
        )

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_ref(q, k, v)))

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


DIN = 128


def _ref_kv_chain(q, x, lns, lnb, wk, wv):
    """LayerNorm (inline nn.layers math) -> bias-free k/v Dense -> ref
    attention: the module chain the kv-folded kernel replaces."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    xn = ((xf - mu) * (jax.lax.rsqrt(var + 1e-5) * lns) + lnb).astype(
        x.dtype
    )
    return _ref(q, xn @ wk, xn @ wv)


@pytest.fixture
def kv_setup(rng):
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    # projection weights at realistic init scale (~1/sqrt(fan_in)): with
    # unit-normal weights the chain's outputs reach O(60) and XLA:CPU's
    # shape-dependent oneDNN matmul ordering leaves ~1e-5 relative noise
    # that a flat atol can't express
    return (
        f(B, G, D), f(B, M, DIN), f(DIN), f(DIN),
        f(DIN, D) * 0.1, f(DIN, D) * 0.1,
    )


def _assert_close(a, b, tol, nm=""):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    dn = max(np.abs(b).max(), 1e-3)
    rel = np.abs(a - b).max() / dn
    assert rel < tol, (nm, rel)


@pytest.mark.parametrize("mc", [64, 16])
def test_kv_forward_matches_module_chain(kv_setup, mc):
    from vipformer_tpu.ops.pallas.flash_train import flash_attention_train_kv

    q, x, lns, lnb, wk, wv = kv_setup
    out = flash_attention_train_kv(
        q, x, lns, lnb, wk, wv, SEED, H, SCALE, 0.0, mc, True
    )
    _assert_close(out, _ref_kv_chain(q, x, lns, lnb, wk, wv), 1e-4)


@pytest.mark.parametrize("mc", [64, 16])
def test_kv_gradients_match_module_chain(kv_setup, mc):
    """Grads w.r.t. q, raw x, LN scale/bias AND both projection weights:
    the in-kernel dW/dLN accumulators vs autodiff through the chain."""
    from vipformer_tpu.ops.pallas.flash_train import flash_attention_train_kv

    q, x, lns, lnb, wk, wv = kv_setup
    cot = jnp.asarray(
        np.random.default_rng(5).standard_normal((B, G, D)), jnp.float32
    )

    def loss_flash(q, x, lns, lnb, wk, wv):
        return jnp.sum(
            flash_attention_train_kv(
                q, x, lns, lnb, wk, wv, SEED, H, SCALE, 0.0, mc, True
            ) * cot
        )

    def loss_ref(q, x, lns, lnb, wk, wv):
        return jnp.sum(_ref_kv_chain(q, x, lns, lnb, wk, wv) * cot)

    g1 = jax.grad(loss_flash, argnums=tuple(range(6)))(
        q, x, lns, lnb, wk, wv
    )
    g2 = jax.grad(loss_ref, argnums=tuple(range(6)))(
        q, x, lns, lnb, wk, wv
    )
    names = ["dq", "dx", "dlns", "dlnb", "dwk", "dwv"]
    for a, b, nm in zip(g1, g2, names):
        _assert_close(a, b, 3e-4, nm)


def test_kv_gate():
    from vipformer_tpu.ops.pallas.flash_train import flash_train_kv_enabled

    # eval mode rejected (fwd-only eval kernels own that path)
    assert not flash_train_kv_enabled(4, 256, 256, 128, 2048, 256, None,
                                      True)
    on_tpu = jax.default_backend() == "tpu"
    assert (
        flash_train_kv_enabled(4, 256, 256, 128, 2048, 256, None, False)
        == on_tpu
    )
    # unaligned kv width rejected
    assert not flash_train_kv_enabled(4, 256, 256, 128, 2048, 192, None,
                                      False)


def test_cross_attention_kv_train_branch_matches_module_path(rng):
    """CrossAttention routed through the kv-folded TRAIN kernel: forward
    and a full grad step vs the module path (dropout 0, f32)."""
    import vipformer_tpu.ops.pallas.attention as attn_mod
    from vipformer_tpu.nn.layers import CrossAttention

    b, g, m, d, h = 2, 8, 64, 32, 4
    x_q = jnp.asarray(rng.standard_normal((b, g, d)), jnp.float32)
    x_kv = jnp.asarray(rng.standard_normal((b, m, DIN)), jnp.float32)
    ca = CrossAttention(num_heads=h, num_qk_channels=d)
    variables = ca.init(jax.random.key(0), x_q, x_kv)
    cot = jnp.asarray(rng.standard_normal((b, g, d)), jnp.float32)

    def loss(p):
        out = ca.apply(
            {"params": p}, x_q, x_kv, deterministic=False,
            rngs={"dropout": jax.random.key(1)},
        )
        return jnp.sum(out * cot)

    l_ref, g_ref = jax.value_and_grad(loss)(variables["params"])
    old = attn_mod.USE_FUSED_ATTENTION
    attn_mod.USE_FUSED_ATTENTION = True
    try:
        l_got, g_got = jax.value_and_grad(loss)(variables["params"])
    finally:
        attn_mod.USE_FUSED_ATTENTION = old
    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    got_map = dict(jax.tree_util.tree_leaves_with_path(g_got))
    for path, leaf in flat_ref:
        _assert_close(got_map[path], leaf, 3e-4, str(path))


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="hardware PRNG has no interpret lowering",
)
def test_kv_dropout_on_tpu(kv_setup):
    """kv-folded kernel under dropout on the chip: masks extracted with
    the dump harness (same seeding/draw order and the SAME blocking the
    kv kernel uses), then fwd + all six grads vs the plain-jnp chain with
    those masks applied. Guards the silent-corruption failure mode where
    fwd and bwd regenerate DIFFERENT masks."""
    from vipformer_tpu.ops.pallas.flash_train import (
        _kv_blocking,
        flash_attention_train_kv,
    )

    q, x, lns, lnb, wk, wv = kv_setup
    rate = 0.3
    mc = 16
    assert _kv_blocking(B, G, D, M, DIN, mc) == (16, 2)  # matches dump
    o1 = flash_attention_train_kv(
        q, x, lns, lnb, wk, wv, SEED, H, SCALE, rate, mc, False
    )
    o2 = flash_attention_train_kv(
        q, x, lns, lnb, wk, wv, jnp.array([8], jnp.int32), H, SCALE, rate,
        mc, False,
    )
    assert bool(jnp.any(o1 != o2))

    mask = _dump_masks(rate, 7, B, G, M, mc)

    def ref_dropped(q, x, lns, lnb, wk, wv):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
        var = jnp.maximum(0.0, mu2 - mu * mu)
        xn = (
            (xf - mu) * (jax.lax.rsqrt(var + 1e-5) * lns) + lnb
        ).astype(x.dtype)
        k, v = xn @ wk, xn @ wv
        qh = q.reshape(B, G, H, D // H).transpose(0, 2, 1, 3)
        kh = k.reshape(B, M, H, D // H).transpose(0, 2, 1, 3)
        vh = v.reshape(B, M, H, D // H).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhgc,bhmc->bhgm", qh, kh) * SCALE
        p = jax.nn.softmax(logits, -1)
        p = jnp.where(mask, p / (1 - rate), 0.0)
        o = jnp.einsum("bhgm,bhmc->bhgc", p, vh)
        return o.transpose(0, 2, 1, 3).reshape(B, G, D)

    np.testing.assert_allclose(
        np.asarray(o1),
        np.asarray(ref_dropped(q, x, lns, lnb, wk, wv)),
        atol=1e-2,
    )
    g1 = jax.grad(
        lambda *a: jnp.sum(jnp.sin(flash_attention_train_kv(
            *a, SEED, H, SCALE, rate, mc, False
        ))),
        argnums=tuple(range(6)),
    )(q, x, lns, lnb, wk, wv)
    g2 = jax.grad(
        lambda *a: jnp.sum(jnp.sin(ref_dropped(*a))),
        argnums=tuple(range(6)),
    )(q, x, lns, lnb, wk, wv)
    names = ["dq", "dx", "dlns", "dlnb", "dwk", "dwv"]
    for a, b, nm in zip(g1, g2, names):
        _assert_close(a, b, 1e-2, nm)


def test_gate():
    # packed invariants + TPU requirement
    assert not flash_train_enabled(4, 256, 256, 128, 2048, None, True)
    on_tpu = jax.default_backend() == "tpu"
    assert (
        flash_train_enabled(4, 256, 256, 128, 2048, None, False) == on_tpu
    )
    assert not flash_train_enabled(4, 256, 192, 128, 2048, None, False)
    assert not flash_train_enabled(
        4, 256, 256, 128, 2048, jnp.ones((2, 2048), bool), False
    )


def _dump_masks(rate, seedv, b, g, m, mc):
    """Extract the exact keep masks the kernel draws: one seeding per
    (cell, chunk), per-head (BT, G, Mc) draws in head order — mirroring
    _fwd_kernel/_bwd_kernel exactly."""
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from vipformer_tpu.ops.pallas.flash_train import _auto_bt, _keep_mask

    bt = _auto_bt(b, g, D, mc)

    def dump_kernel(j, seed_ref, o_ref):
        i = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0], i * 4096 + j)
        for head in range(H):
            keep = _keep_mask(rate, (bt, g, mc))
            o_ref[:, head] = keep.astype(jnp.int32)

    chunks = [
        pl.pallas_call(
            partial(dump_kernel, j),
            grid=(b // bt,),
            out_shape=jax.ShapeDtypeStruct((b, H, g, mc), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(
                (bt, H, g, mc), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )(jnp.array([seedv], jnp.int32))
        for j in range(m // mc)
    ]
    return jnp.concatenate(chunks, axis=3).astype(bool)


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="TPU hardware PRNG required"
)
def test_dropout_on_tpu(qkv):
    """Mask-extracted exact parity: dump the kernel's own keep masks, build
    the same dropout in plain jnp, and compare fwd AND custom-vjp grads.
    (A finite-difference check is useless here: TPU default f32 matmul
    precision puts ~0.3% noise on f, drowning the quotient.)"""
    q, k, v = qkv
    rate = 0.3
    o1 = flash_attention_train(q, k, v, SEED, H, SCALE, rate, 16, False)
    o2 = flash_attention_train(q, k, v, SEED, H, SCALE, rate, 16, False)
    o3 = flash_attention_train(
        q, k, v, jnp.array([8], jnp.int32), H, SCALE, rate, 16, False
    )
    assert bool(jnp.all(o1 == o2))  # mask is a pure function of the seed
    assert bool(jnp.any(o1 != o3))

    mask = _dump_masks(rate, 7, B, G, M, 16)
    frac = float(mask.mean())
    assert abs(frac - (1 - rate)) < 0.02, frac

    def ref_dropped(q, k, v):
        qh = q.reshape(B, G, H, D // H).transpose(0, 2, 1, 3)
        kh = k.reshape(B, M, H, D // H).transpose(0, 2, 1, 3)
        vh = v.reshape(B, M, H, D // H).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhgc,bhmc->bhgm", qh, kh) * SCALE
        p = jax.nn.softmax(logits, -1)
        p = jnp.where(mask, p / (1 - rate), 0.0)
        o = jnp.einsum("bhgm,bhmc->bhgc", p, vh)
        return o.transpose(0, 2, 1, 3).reshape(B, G, D)

    np.testing.assert_allclose(
        np.asarray(o1), np.asarray(ref_dropped(q, k, v)), atol=1e-2
    )
    g1 = jax.grad(
        lambda q, k, v: jnp.sum(
            jnp.sin(flash_attention_train(q, k, v, SEED, H, SCALE, rate, 16, False))
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    g2 = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(ref_dropped(q, k, v))),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2)
