"""Parity tests for the fused train-mode Group2Emb kernel.

The fused path (ops/pallas/g2e_train.py) must reproduce the flax XLA
lowering of nn.pointnet.Group2Emb under training BatchNorm: forward
values, gradients w.r.t. input and every parameter, and the running-stat
momentum updates. Run in interpret mode on the CPU so CI covers the
kernel math without TPU hardware (the real-chip run is covered by the
train-smoke tools and the bench).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipformer_tpu.nn.pointnet import Group2Emb
from vipformer_tpu.ops.pallas import g2e_train


@pytest.fixture
def g2e_setup():
    rng = np.random.default_rng(7)
    b, g, s, cin, d = 4, 8, 16, 3, 64
    x0 = jnp.asarray(rng.standard_normal((b, g, s, cin)), jnp.float32)
    model = Group2Emb(dim_model=d)
    variables = model.init(jax.random.key(0), x0, deterministic=True)
    return model, variables, x0, (b, g, s, cin, d)


def _wb_from(variables):
    p = variables["params"]
    return (
        p["Dense_0"]["kernel"], p["Dense_0"]["bias"],
        p["BatchNorm_0"]["scale"], p["BatchNorm_0"]["bias"],
        p["Dense_1"]["kernel"], p["Dense_1"]["bias"],
        p["Dense_2"]["kernel"], p["Dense_2"]["bias"],
        p["BatchNorm_1"]["scale"], p["BatchNorm_1"]["bias"],
        p["Dense_3"]["kernel"], p["Dense_3"]["bias"],
    )


def test_forward_matches_flax_train_mode(g2e_setup):
    model, variables, x0, (b, g, s, cin, d) = g2e_setup
    ref, refstate = model.apply(
        variables, x0, deterministic=False, mutable=["batch_stats"]
    )
    out, (mu0, var0, mu1, var1) = g2e_train.g2e_train_apply(
        x0, _wb_from(variables), s, True
    )
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    # running stats: flax update ra = 0.9 ra + 0.1 batch must match the
    # kernel's emitted batch stats pushed through the same formula
    for name, mu, var in (
        ("BatchNorm_0", mu0, var0), ("BatchNorm_1", mu1, var1)
    ):
        ra0 = variables["batch_stats"][name]
        want = refstate["batch_stats"][name]
        np.testing.assert_allclose(
            0.9 * ra0["mean"] + 0.1 * mu, want["mean"], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            0.9 * ra0["var"] + 0.1 * var, want["var"], rtol=1e-5, atol=1e-6
        )


def test_grads_match_flax_train_mode(g2e_setup):
    model, variables, x0, (b, g, s, cin, d) = g2e_setup
    cot = jnp.asarray(
        np.random.default_rng(3).standard_normal((b, g, d)), jnp.float32
    )

    def ref_loss(params, x):
        out, _ = model.apply(
            {**variables, "params": params}, x,
            deterministic=False, mutable=["batch_stats"],
        )
        return jnp.sum(out * cot)

    ref_gp, ref_gx = jax.grad(ref_loss, argnums=(0, 1))(
        variables["params"], x0
    )

    def fused_loss(params, x):
        wb = _wb_from({"params": params})
        out, _ = g2e_train.g2e_train_apply(x, wb, s, True)
        return jnp.sum(out * cot)

    got_gp, got_gx = jax.grad(fused_loss, argnums=(0, 1))(
        variables["params"], x0
    )

    np.testing.assert_allclose(got_gx, ref_gx, rtol=2e-4, atol=2e-5)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_gp)
    got_map = dict(jax.tree_util.tree_leaves_with_path(got_gp))
    for path, leaf in flat_ref:
        # atol accommodates analytically-zero grads (BN backward
        # outputs are zero-mean, so bias grads of post-BN Denses cancel
        # to f32 rounding noise; summation ORDER differs between the
        # blocked kernel and XLA's reduces)
        np.testing.assert_allclose(
            got_map[path], leaf, rtol=2e-4, atol=1e-4,
            err_msg=str(path),
        )


def test_module_fused_branch_matches_xla(g2e_setup, monkeypatch):
    """Group2Emb.__call__ takes the fused branch when forced on and
    produces the XLA path's outputs + mutated batch_stats."""
    model, variables, x0, (b, g, s, cin, d) = g2e_setup
    ref, refstate = model.apply(
        variables, x0, deterministic=False, mutable=["batch_stats"]
    )
    monkeypatch.setattr(g2e_train, "USE_G2E_TRAIN", True)
    out, state = model.apply(
        variables, x0, deterministic=False, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
    for name in ("BatchNorm_0", "BatchNorm_1"):
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                state["batch_stats"][name][k],
                refstate["batch_stats"][name][k],
                rtol=1e-5, atol=1e-6, err_msg=f"{name}/{k}",
            )


def test_eval_mode_ignores_fused_train(g2e_setup, monkeypatch):
    model, variables, x0, (b, g, s, cin, d) = g2e_setup
    monkeypatch.setattr(g2e_train, "USE_G2E_TRAIN", True)
    ref = model.apply(variables, x0, deterministic=True)
    assert ref.shape == (b, g, d)


def test_supported_gate():
    assert g2e_train.g2e_train_supported(384, 128, 32, 3)
    assert not g2e_train.g2e_train_supported(1, 1, 1, 3)  # s < 2
    assert not g2e_train.g2e_train_supported(4, 8, 16, 32)  # cin too wide


def test_pretrain_step_equivalent_with_fused_g2e(rng, monkeypatch):
    """Full jitted pretrain step with the fused Group2Emb forced on must
    track the XLA-path step: same loss trajectory and matching params
    after a few optimizer updates (f32, interpret mode)."""
    from vipformer_tpu.config import Config
    from vipformer_tpu.models import build_model
    from vipformer_tpu.train import (
        create_state, init_variables, make_pretrain_step,
    )

    cfg = Config(
        num_pc_latents=8, num_img_latents=8, num_groups=8, group_size=4,
        num_latent_channels=32, num_ca_heads=4, num_sa_heads=4,
        num_sa_layers=2, mlp_widen_factor=2, img_height=24, img_width=24,
        patch_size=12, compute_dtype="float32", optim="adamw", lr=1e-3,
        max_dpr=0.0, atten_drop=0.0, mlp_drop=0.0, batch_size=8,
    )
    pc_model, img_model = build_model(cfg)
    pc = rng.standard_normal((8, 64, 3)).astype(np.float32)
    imgs = rng.standard_normal((8, 24, 24, 3)).astype(np.float32)
    batch = {
        "pc_t1": jnp.asarray(pc),
        "pc_t2": jnp.asarray(
            pc + 0.01 * rng.standard_normal((8, 64, 3)).astype(np.float32)
        ),
        "imgs": jnp.asarray(imgs),
    }

    def run(n_steps=3):
        from vipformer_tpu.train import trainer as _t

        pc_params, pc_stats = init_variables(pc_model, (batch["pc_t1"],))
        img_params, img_stats = init_variables(img_model, (batch["imgs"],))
        state, tx = create_state(
            cfg,
            {"pc": pc_params, "img": img_params},
            {"pc": pc_stats, "img": img_stats},
        )
        step = make_pretrain_step(cfg, pc_model, img_model, tx, neg_groups=1)
        losses = []
        for i in range(n_steps):
            state, m = step(state, batch, 1e-3, jax.random.key(i))
            losses.append(float(m["loss"]))
        return losses, state

    ref_losses, ref_state = run()
    monkeypatch.setattr(g2e_train, "USE_G2E_TRAIN", True)
    got_losses, got_state = run()
    # Per-step bounds widen with AdamW's chaotic amplification (~30x/step
    # here): the kernel's summation-order epsilon (~1e-7 rel at step 0,
    # pinned elementwise in test_grads_match_flax_train_mode) compounds
    # through ~lr*sign(m/sqrt(v)) updates. Measured [3e-7, 4.5e-5, 1.3e-3];
    # bounds leave ~10x margin without becoming vacuous.
    for i, (got, ref) in enumerate(zip(got_losses, ref_losses)):
        np.testing.assert_allclose(
            got, ref, rtol=(1e-5, 1e-3, 1.5e-2)[i], err_msg=f"step {i}"
        )
    # Per-element param comparison is NOT meaningful after optimizer steps:
    # AdamW maps a gradient to ~lr*sign(m/sqrt(v)), so analytically-zero
    # grads (post-BN bias columns) whose f32 rounding noise merely flips
    # sign between the blocked kernel and XLA's reduces walk apart by
    # +-lr per step. Grad math is pinned elementwise in
    # test_grads_match_flax_train_mode; here we check integration (stats
    # threading, update plumbing) via the loss trajectory above and a
    # global relative param distance.
    ref_flat, _ = jax.flatten_util.ravel_pytree(ref_state.params)
    got_flat, _ = jax.flatten_util.ravel_pytree(got_state.params)
    rel = float(
        jnp.linalg.norm(got_flat - ref_flat) / jnp.linalg.norm(ref_flat)
    )
    assert rel < 5e-3, rel


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled-Mosaic validation needs the real chip",
)
def test_compiled_matches_flax_on_tpu():
    """Compiled (Mosaic) kernel vs the flax XLA path at flagship dims on
    the chip. Guards against TPU-only lowering bugs the CPU interpret
    suite cannot see (r3 caught an invalid i1-mask relayout and
    unsupported bf16 compares only on hardware). Grads compare in f32
    (bf16 maxpool ties route different-but-valid subgradients); forward
    also checks bf16. Interpret mode is NOT used as the on-chip baseline:
    its emulation compiles pathologically slowly over the remote backend."""
    rng = np.random.default_rng(11)
    b, g, s, cin, d = 6, 64, 32, 3, 256
    x32 = jnp.asarray(rng.standard_normal((b, g, s, cin)), jnp.float32)
    model = Group2Emb(dim_model=d)
    variables = model.init(jax.random.key(0), x32, deterministic=True)
    wb = _wb_from(variables)
    cot = jnp.asarray(rng.standard_normal((b, g, d)), jnp.float32)

    def fused_loss(x, wb):
        out, _ = g2e_train.g2e_train_apply(x, wb, s, False)
        return jnp.sum(out.astype(jnp.float32) * cot)

    def ref_loss(x, params):
        out, _ = model.apply(
            {**variables, "params": params}, x,
            deterministic=False, mutable=["batch_stats"],
        )
        return jnp.sum(out.astype(jnp.float32) * cot)

    (f_c, (gx_c, gw_c)) = jax.jit(jax.value_and_grad(
        fused_loss, argnums=(0, 1)
    ))(x32, wb)
    (f_r, (gx_r, gp_r)) = jax.jit(jax.value_and_grad(
        ref_loss, argnums=(0, 1)
    ))(x32, variables["params"])

    # TPU default f32 matmul runs bf16 passes; compare at that noise level
    np.testing.assert_allclose(float(f_c), float(f_r), rtol=2e-2)
    denom = float(jnp.abs(gx_r).max())
    assert float(jnp.abs(gx_c - gx_r).max()) / max(denom, 1e-3) < 5e-2
    names = [
        ("Dense_0", "kernel"), ("Dense_0", "bias"),
        ("BatchNorm_0", "scale"), ("BatchNorm_0", "bias"),
        ("Dense_1", "kernel"), ("Dense_1", "bias"),
        ("Dense_2", "kernel"), ("Dense_2", "bias"),
        ("BatchNorm_1", "scale"), ("BatchNorm_1", "bias"),
        ("Dense_3", "kernel"), ("Dense_3", "bias"),
    ]
    for got, (mod, leaf) in zip(gw_c, names):
        want = gp_r[mod][leaf]
        dn = max(float(jnp.abs(want).max()), 1e-3)
        rel = float(jnp.abs(got - want).max()) / dn
        assert rel < 5e-2, (mod, leaf, rel)

    # bf16 forward parity (the production pretrain dtype)
    xb = x32.astype(jnp.bfloat16)
    out_c, stats_c = jax.jit(
        lambda x: g2e_train.g2e_train_apply(x, wb, s, False)
    )(xb)
    out_r = jax.jit(
        lambda x: model.apply(
            variables, x, deterministic=False, mutable=["batch_stats"]
        )[0]
    )(xb)
    df = float(
        jnp.abs(out_c.astype(jnp.float32) - out_r.astype(jnp.float32)).max()
    )
    assert df / max(float(jnp.abs(out_r).max()), 1e-3) < 3e-2, df


@pytest.mark.parametrize(
    "b,g,s,cin,d,dt",
    [
        (2, 8, 16, 3, 64, jnp.float32),
        (3, 10, 24, 3, 96, jnp.float32),   # non-pow2 s, odd group count
        (4, 8, 64, 6, 64, jnp.float32),    # wide s, 6-channel input
        (2, 8, 16, 3, 64, jnp.bfloat16),
        (5, 12, 32, 3, 128, jnp.bfloat16),
    ],
)
def test_shape_fuzz_forward_and_grads(b, g, s, cin, d, dt):
    """Interpret-mode parity across the supported shape envelope (odd
    group counts, non-pow2 group sizes, 6-channel semseg-style input,
    both compute dtypes).

    Grads are compared in f32 only: in bf16 ~1% of maxpool cells have
    tied maxima (values round together), where the kernel routes the
    gradient torch-style to the FIRST argmax (matching the reference's
    torch.max semantics) while jax's reduce-max VJP splits it evenly —
    both valid subgradients, pointwise different at ties."""
    from vipformer_tpu.ops.pallas.g2e_train import g2e_train_supported

    assert g2e_train_supported(b, g, s, cin)
    rng = np.random.default_rng(b * 100 + s)
    x0 = jnp.asarray(rng.standard_normal((b, g, s, cin)), dt)
    model = Group2Emb(dim_model=d, dtype=dt if dt != jnp.float32 else None)
    variables = model.init(
        jax.random.key(1), x0.astype(jnp.float32), deterministic=True
    )
    wb = _wb_from(variables)
    cot = jnp.asarray(rng.standard_normal((b, g, d)), jnp.float32)

    def fused_loss(x, wb):
        out, _ = g2e_train.g2e_train_apply(x, wb, s, True)
        return jnp.sum(out.astype(jnp.float32) * cot)

    def ref_loss(x, params):
        out, _ = model.apply(
            {**variables, "params": params}, x,
            deterministic=False, mutable=["batch_stats"],
        )
        return jnp.sum(out.astype(jnp.float32) * cot)

    f_got, (gx_got, gp_got) = jax.value_and_grad(
        fused_loss, argnums=(0, 1)
    )(x0, wb)
    f_ref, (gx_ref, gp_ref) = jax.value_and_grad(
        lambda x, p: ref_loss(x, p), argnums=(0, 1)
    )(x0, variables["params"])

    tol = 5e-5 if dt == jnp.float32 else 3e-2
    np.testing.assert_allclose(f_got, f_ref, rtol=tol)
    if dt != jnp.float32:
        return  # grads diverge at bf16 maxpool ties (see docstring)
    np.testing.assert_allclose(
        np.asarray(gx_got, np.float32), np.asarray(gx_ref, np.float32),
        rtol=tol * 4, atol=5e-4,
    )
    ref_leaves = dict(jax.tree_util.tree_leaves_with_path(gp_ref))
    # wb order mirrors _wb_from; compare against the named flax leaves
    names = [
        ("Dense_0", "kernel"), ("Dense_0", "bias"),
        ("BatchNorm_0", "scale"), ("BatchNorm_0", "bias"),
        ("Dense_1", "kernel"), ("Dense_1", "bias"),
        ("Dense_2", "kernel"), ("Dense_2", "bias"),
        ("BatchNorm_1", "scale"), ("BatchNorm_1", "bias"),
        ("Dense_3", "kernel"), ("Dense_3", "bias"),
    ]
    for wb_leaf, (mod, leaf) in zip(gp_got, names):
        want = variables["params"][mod][leaf]  # shape template
        ref = None
        for path, arr in ref_leaves.items():
            keys = [getattr(pk, "key", None) for pk in path]
            if keys == [mod, leaf]:
                ref = arr
        assert ref is not None, (mod, leaf)
        assert wb_leaf.shape == want.shape
        np.testing.assert_allclose(
            np.asarray(wb_leaf, np.float32), np.asarray(ref, np.float32),
            rtol=tol * 4, atol=5e-4, err_msg=f"{mod}/{leaf}",
        )
