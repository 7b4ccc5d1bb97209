"""Training-subsystem tests: schedule oracles (vs torch), optimizer
trajectory parity (vs torch), jitted step smoke training, checkpoint
round-trip, explicit backbone restore, vectorized partseg refinement."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vipformer_tpu.config import Config
from vipformer_tpu.losses import nt_xent_grouped, nt_xent_loss
from vipformer_tpu.models import build_ft_cls, build_model
from vipformer_tpu.train import (
    Schedule,
    build_optimizer,
    create_state,
    init_variables,
    load_checkpoint,
    make_cls_step,
    make_pretrain_step,
    refine_partseg_pred,
    restore_backbone,
    save_checkpoint,
    set_learning_rate,
)
from vipformer_tpu.train.schedules import (
    cosine_lr,
    cosine_warmup_restarts_lr,
    step_lr,
)


# --- schedules ---------------------------------------------------------------


def test_cosine_matches_torch():
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.1)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=50)
    for epoch in range(50):
        want = opt.param_groups[0]["lr"]
        got = cosine_lr(epoch, 0.1, 50)
        assert abs(got - want) < 1e-5, epoch
        opt.step()
        sch.step()


def test_step_matches_torch():
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.1)
    sch = torch.optim.lr_scheduler.StepLR(opt, step_size=10, gamma=0.5)
    for epoch in range(35):
        want = opt.param_groups[0]["lr"]
        got = step_lr(epoch, 0.1, 10, 0.5)
        assert abs(got - want) < 1e-7, epoch
        opt.step()
        sch.step()


def test_coswarm_shape():
    # warmup rises linearly from min_lr to max_lr, then cosine decays;
    # next cycle peaks at gamma * max_lr (reference pretrain.py:136-142)
    args = dict(first_cycle_steps=100, max_lr=0.001, min_lr=0.0,
                warmup_steps=5, gamma=0.6)
    assert cosine_warmup_restarts_lr(0, **args) == 0.0
    peak = cosine_warmup_restarts_lr(5, **args)
    assert abs(peak - 0.001) < 1e-9
    assert cosine_warmup_restarts_lr(50, **args) < peak
    peak2 = cosine_warmup_restarts_lr(105, **args)
    assert abs(peak2 - 0.0006) < 1e-9


def test_plateau_schedule():
    cfg = Config(scheduler="plateau", lr=1.0, factor=0.1, patience=2)
    s = Schedule(cfg)
    lrs = [s.lr(e, metric=1.0) for e in range(6)]
    # best=1.0 at epoch 0; epochs 1..3 are bad (patience 2) -> drop at #3
    assert lrs[:3] == [1.0, 1.0, 1.0]
    assert abs(lrs[3] - 0.1) < 1e-9


def test_plateau_matches_torch():
    """PlateauState == torch ReduceLROnPlateau trajectory, including the
    rel-threshold 1e-4 improvement rule, cooldown suspension, and the
    min_lr floor (reference `pretrain.py:146-152` passes factor/patience
    and leaves the rest at torch defaults)."""
    import torch

    from vipformer_tpu.train.schedules import PlateauState

    metrics = [
        1.0, 0.9, 0.89995, 0.8999, 0.8990, 0.95, 0.94, 0.93, 0.92,
        0.91, 0.905, 0.904, 0.9035, 0.903, 0.9025, 0.902, 0.9015,
    ] + [0.9] * 10

    for cooldown, min_lr in ((0, 0.0), (2, 0.0), (0, 0.05), (3, 0.02)):
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=0.5)
        sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="min", factor=0.3, patience=2, cooldown=cooldown,
            min_lr=min_lr,
        )
        ours = PlateauState(
            lr=0.5, factor=0.3, patience=2, cooldown=cooldown, min_lr=min_lr
        )
        for i, m in enumerate(metrics):
            sch.step(m)
            want = opt.param_groups[0]["lr"]
            got = ours.update(m)
            assert abs(got - want) < 1e-12, (cooldown, min_lr, i, got, want)


# --- optimizers vs torch -----------------------------------------------------


@pytest.mark.parametrize("optim", ["sgd", "adam", "adamw"])
def test_optimizer_trajectory_matches_torch(optim, rng):
    import torch

    w0 = rng.standard_normal(7).astype(np.float32)
    grads = [rng.standard_normal(7).astype(np.float32) for _ in range(5)]

    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    if optim == "sgd":
        topt = torch.optim.SGD([p], lr=0.1, momentum=0.9)
    elif optim == "adam":
        topt = torch.optim.Adam([p], lr=0.01, weight_decay=1e-6)
    else:
        topt = torch.optim.AdamW([p], lr=0.01)
    for g in grads:
        p.grad = torch.tensor(g.copy())
        topt.step()
    want = p.detach().numpy()

    cfg = Config(optim=optim, lr=0.1 if optim == "sgd" else 0.01)
    tx = build_optimizer(cfg)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for g in grads:
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    got = np.asarray(params["w"])
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_set_learning_rate_with_clip():
    cfg = Config(optim="adamw", lr=0.01, grad_clip_norm=10.0)
    tx = build_optimizer(cfg)
    params = {"w": jnp.zeros(3)}
    s = tx.init(params)
    s2 = set_learning_rate(s, 0.5)
    updates, _ = tx.update({"w": jnp.ones(3)}, s2, params)
    # lr actually applied
    assert np.allclose(np.abs(np.asarray(updates["w"])), 0.5, atol=1e-3)


# --- grouped NT-Xent ---------------------------------------------------------


def test_grouped_ntxent_equals_mean_of_groups(rng):
    z0 = rng.standard_normal((8, 16)).astype(np.float32)
    z1 = rng.standard_normal((8, 16)).astype(np.float32)
    got = float(nt_xent_grouped(jnp.asarray(z0), jnp.asarray(z1), 2))
    want = 0.5 * (
        float(nt_xent_loss(jnp.asarray(z0[:4]), jnp.asarray(z1[:4])))
        + float(nt_xent_loss(jnp.asarray(z0[4:]), jnp.asarray(z1[4:])))
    )
    assert abs(got - want) < 1e-5


# --- partseg refinement ------------------------------------------------------


def test_refine_partseg_pred_masks_to_category(rng):
    logits = jnp.asarray(rng.standard_normal((3, 10, 50)).astype(np.float32))
    obj = jnp.asarray([0, 4, 15])  # airplane, chair, table
    refined = np.asarray(refine_partseg_pred(logits, obj))
    from vipformer_tpu.train.trainer import INDEX_START, SEG_NUM

    for i, c in enumerate([0, 4, 15]):
        lo, hi = INDEX_START[c], INDEX_START[c] + SEG_NUM[c]
        assert refined[i].min() >= lo and refined[i].max() < hi


# --- end-to-end smoke training ----------------------------------------------


def _tiny_cfg(**kw):
    base = dict(
        num_pc_latents=8, num_img_latents=8, num_groups=8, group_size=4,
        num_latent_channels=32, num_ca_heads=4, num_sa_heads=4,
        num_sa_layers=2, mlp_widen_factor=2, img_height=24, img_width=24,
        patch_size=12, compute_dtype="float32", optim="adamw", lr=1e-3,
        max_dpr=0.0, atten_drop=0.0, mlp_drop=0.0,
    )
    base.update(kw)
    return Config(**base)


def test_pretrain_step_loss_decreases(rng):
    cfg = _tiny_cfg(batch_size=8)
    pc_model, img_model = build_model(cfg)
    pc = rng.standard_normal((8, 64, 3)).astype(np.float32)
    imgs = rng.standard_normal((8, 24, 24, 3)).astype(np.float32)
    batch = {
        "pc_t1": jnp.asarray(pc),
        "pc_t2": jnp.asarray(pc + 0.01 * rng.standard_normal((8, 64, 3)).astype(np.float32)),
        "imgs": jnp.asarray(imgs),
    }
    pc_params, pc_stats = init_variables(pc_model, (batch["pc_t1"],))
    img_params, img_stats = init_variables(img_model, (batch["imgs"],))
    params = {"pc": pc_params, "img": img_params}
    stats = {"pc": pc_stats, "img": img_stats}
    state, tx = create_state(cfg, params, stats)
    step = make_pretrain_step(cfg, pc_model, img_model, tx, neg_groups=1)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, 1e-3, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_cls_step_overfits_small_batch(rng):
    cfg = _tiny_cfg(num_obj_classes=4, optim="adamw", lr=3e-3)
    model = build_ft_cls(cfg)
    pts = rng.standard_normal((8, 64, 3)).astype(np.float32)
    labels = np.arange(8) % 4
    batch = {"points": jnp.asarray(pts), "labels": jnp.asarray(labels)}
    params, stats = init_variables(model, (batch["points"],))
    state, tx = create_state(cfg, params, stats)
    step = make_cls_step(cfg, model, tx)
    accs = []
    for i in range(30):
        state, metrics = step(state, batch, 3e-3, jax.random.key(i))
        accs.append(float(metrics["acc"]))
    assert accs[-1] > 0.8, accs[-5:]


# --- checkpointing -----------------------------------------------------------


def test_checkpoint_roundtrip(tmp_path, rng):
    tree = {
        "a": jnp.asarray(rng.standard_normal((3, 4)).astype(np.float32)),
        "nested": {"b": jnp.arange(5)},
    }
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, tree, {"epoch": 3})
    back = load_checkpoint(path, template=tree)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(
        np.asarray(back["nested"]["b"]), np.asarray(tree["nested"]["b"])
    )
    from vipformer_tpu.train import load_metadata

    assert load_metadata(path)["epoch"] == 3


def test_backbone_restore(rng):
    pre = {"stem": {"w": np.ones(3)}, "encoder": {"w": np.full(2, 2.0)},
           "latent_head": {"w": np.full(2, 9.0)}}
    ft = {"stem": {"w": np.zeros(3)}, "encoder": {"w": np.zeros(2)},
          "finetune_head": {"w": np.full(2, 5.0)}}
    msgs = []
    out = restore_backbone(ft, pre, ("stem", "encoder"), log=msgs.append)
    np.testing.assert_array_equal(out["stem"]["w"], 1.0)
    np.testing.assert_array_equal(out["encoder"]["w"], 2.0)
    np.testing.assert_array_equal(out["finetune_head"]["w"], 5.0)
    assert "latent_head" not in out
    assert "2 tensors" in msgs[0] and "finetune_head" in msgs[0]


def test_backbone_restore_deeper_finetune(rng):
    """The reference's partseg recipe restores an 8-SA-layer pretrain into a
    12-SA-layer finetune encoder via load_state_dict(strict=False)
    (`ft_partseg.py:83`, `scripts/finetune/ft-partseg.sh --num_sa_layers 12`).
    The merge must be leaf-wise: layers beyond the pretrain depth keep their
    fresh init instead of disappearing with a subtree swap."""
    pre = {"encoder": {"sa_0": {"w": np.ones(2)}, "sa_1": {"w": np.full(2, 2.0)}}}
    ft = {
        "encoder": {
            "sa_0": {"w": np.zeros(2)},
            "sa_1": {"w": np.zeros(2)},
            "sa_2": {"w": np.full(2, 7.0)},  # deeper than the pretrain
        },
        "head": {"w": np.full(2, 5.0)},
    }
    msgs = []
    out = restore_backbone(ft, pre, ("encoder",), log=msgs.append)
    np.testing.assert_array_equal(out["encoder"]["sa_0"]["w"], 1.0)
    np.testing.assert_array_equal(out["encoder"]["sa_1"]["w"], 2.0)
    np.testing.assert_array_equal(out["encoder"]["sa_2"]["w"], 7.0)
    np.testing.assert_array_equal(out["head"]["w"], 5.0)
    assert "encoder/sa_2" in msgs[0], msgs  # fresh layers are reported


def test_backbone_restore_shape_mismatch_kept_fresh(rng):
    pre = {"encoder": {"w": np.ones((4, 4))}}
    ft = {"encoder": {"w": np.zeros((4, 8))}}
    msgs = []
    out = restore_backbone(ft, pre, ("encoder",), log=msgs.append)
    np.testing.assert_array_equal(out["encoder"]["w"], 0.0)
    assert "SHAPE MISMATCH" in msgs[0], msgs
