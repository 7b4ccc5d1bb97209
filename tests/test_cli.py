"""End-to-end CLI smoke tests on synthetic data: every entry point runs a
couple of epochs, checkpoints, and (where applicable) resumes."""

import numpy as np
import pytest

from vipformer_tpu.config import Config

TINY = dict(
    epochs=2,
    batch_size=8,
    test_batch_size=16,
    num_pt_points=64,
    num_ft_points=64,
    num_test_points=64,
    num_pc_latents=8,
    num_img_latents=8,
    num_groups=8,
    group_size=4,
    num_latent_channels=32,
    num_ca_heads=4,
    num_sa_heads=4,
    num_sa_layers=2,
    mlp_widen_factor=2,
    img_height=24,
    img_width=24,
    patch_size=12,
    compute_dtype="float32",
    optim="adamw",
    lr=1e-3,
    max_dpr=0.0,
    atten_drop=0.0,
    mlp_drop=0.0,
    log_to_file=True,
    print_freq=1000,
)


def tiny_cfg(tmp_path, **kw):
    d = dict(TINY)
    d.update(
        data_dir=str(tmp_path / "data"),
        run_dir=str(tmp_path / "runs"),
        synthetic_data=True,
    )
    d.update(kw)
    return Config(**d)


def test_pretrain_cli(tmp_path):
    from vipformer_tpu.cli import pretrain

    cfg = tiny_cfg(tmp_path, exp_name="pt", save_freq=1)
    out = pretrain.main(cfg)
    assert 0.0 <= out["best_acc"] <= 1.0
    models = tmp_path / "runs" / cfg.proj_name / "pt" / "models"
    assert (models / "pc_model_best.ckpt").exists()
    # periodic save_freq checkpoints too
    assert (models / "pc_model_epoch0.ckpt").exists()
    # resume continues from the checkpoint without error, and the
    # best-probe tracker survives the restart: the resumed run must never
    # report a best below the pre-kill best (else pc_model_best gets
    # silently overwritten by a worse model — seen in the r4 soak)
    out2 = pretrain.main(cfg.replace(resume=True, epochs=3))
    assert out2["best_epoch"] >= 0
    assert out2["best_acc"] >= out["best_acc"]


def test_ft_cls_cli_with_pretrained(tmp_path):
    from vipformer_tpu.cli import ft_cls, pretrain

    cfg = tiny_cfg(tmp_path, exp_name="pt2", epochs=1)
    pretrain.main(cfg)
    ft_cfg = tiny_cfg(
        tmp_path, exp_name="pt2", epochs=2, num_obj_classes=40,
        resume=True, pc_model_file="pc_model_best",
    )
    out = ft_cls.main(ft_cfg)
    assert 0.0 <= out["best_acc"] <= 1.0


def test_ft_cls_cli_from_scratch(tmp_path):
    from vipformer_tpu.cli import ft_cls

    out = ft_cls.main(
        tiny_cfg(tmp_path, exp_name="cls", num_obj_classes=40)
    )
    assert 0.0 <= out["best_acc"] <= 1.0


def test_ft_cls_cli_crash_resume(tmp_path):
    """Finetune crash-resume (r4): a killed ft_cls run continues from the
    rolling model_last snapshot at the next epoch, with the best-acc
    bookkeeping restored. The reference cannot do this at all — its ft
    loops only bootstrap weights from a pretrain ckpt (`ft_cls.py:92-101`)
    and restart at epoch 0."""
    import json

    from vipformer_tpu.cli import ft_cls

    cfg = tiny_cfg(
        tmp_path, exp_name="cr", num_obj_classes=40, epochs=2, save_freq=1
    )
    ft_cls.main(cfg)  # "dies" after epoch 1 (epochs=2)
    out = ft_cls.main(cfg.replace(resume_training=True, epochs=4))
    assert out["best_epoch"] >= 0
    rows = [
        json.loads(l)
        for l in open(
            tmp_path / "runs" / cfg.proj_name / "cr" / "metrics.jsonl"
        )
    ]
    epochs = [r["step"] for r in rows]
    # resumed run appended epochs 2..3 exactly once — no epoch 0/1 rerun
    assert epochs == [0, 1, 2, 3]
    # best-acc monotone across the boundary (bookkeeping restored)
    bests = [r["best_acc"] for r in rows]
    assert bests == sorted(bests)


def test_ft_cls_cli_eval_only(tmp_path):
    """Reference `--eval` mode (parser.py:30, dormant there; live here):
    load model_best and report test accuracy without training."""
    from vipformer_tpu.cli import ft_cls

    cfg = tiny_cfg(tmp_path, exp_name="ev", num_obj_classes=40)
    trained = ft_cls.main(cfg)
    out = ft_cls.main(cfg.replace(eval_only=True))
    assert out["best_epoch"] == -1
    # same checkpoint + same synthetic test split => same accuracy
    assert out["best_acc"] == pytest.approx(trained["best_acc"], abs=1e-6)


def test_ft_partseg_cli(tmp_path):
    from vipformer_tpu.cli import ft_partseg

    cfg = tiny_cfg(
        tmp_path, exp_name="seg", num_sa_layers=4, layer_idx=(1, 2, 4),
    )
    out = ft_partseg.main(cfg)
    assert 0.0 <= out["best"]["mean_category_iou"] <= 1.0


def test_ft_semseg_cli(tmp_path):
    from vipformer_tpu.cli import ft_semseg

    cfg = tiny_cfg(
        tmp_path, exp_name="sem", num_sa_layers=4, layer_idx=(1, 2, 4),
        point_channels=6, num_obj_classes=13, num_ft_points=4096,
        batch_size=8, test_batch_size=8,
    )
    out = ft_semseg.main(cfg)
    assert 0.0 <= out["best"]["miou"] <= 1.0


def test_eval_fewshot_cli(tmp_path):
    from vipformer_tpu.cli import eval_fewshot

    cfg = tiny_cfg(
        tmp_path, exp_name="fs", n_runs=2, k_way=3, n_shot=3, n_query=3,
    )
    out = eval_fewshot.main(cfg)
    assert 0.0 <= out["mean"] <= 100.0
    assert len(out["accs"]) == 2


def test_eval_zeroshot_cli(tmp_path):
    from vipformer_tpu.cli import eval_zeroshot

    cfg = tiny_cfg(tmp_path, exp_name="zs", test_batch_size=8)
    out = eval_zeroshot.main(cfg)
    assert 0.0 <= out["linear_acc"] <= 1.0
    assert out["params"] > 0


def test_pretrain_cli_device_augs(tmp_path):
    from vipformer_tpu.cli import pretrain

    cfg = tiny_cfg(tmp_path, exp_name="ptdev", epochs=1, device_augs=True)
    out = pretrain.main(cfg)
    assert 0.0 <= out["best_acc"] <= 1.0


def test_plateau_fires_through_cli(tmp_path):
    """The plateau scheduler must actually receive the epoch metric from the
    CLI loop (the reference's plateau could never fire: its scheduler.step()
    at pretrain.py:311 passes no metric, which raises in torch). lr=100
    guarantees the loss doesn't improve, so patience=0 must halve the lr
    from epoch 2 on."""
    import json

    from vipformer_tpu.cli import ft_cls

    cfg = tiny_cfg(
        tmp_path,
        epochs=4,
        lr=100.0,
        scheduler="plateau",
        factor=0.5,
        patience=0,
        exp_name="plateau",
    )
    ft_cls.main(cfg)
    path = (
        tmp_path / "runs" / cfg.proj_name / "plateau" / "metrics.jsonl"
    )
    lrs = [json.loads(l)["lr"] for l in path.read_text().splitlines()]
    # the diverged (NaN) loss never improves, so patience=0 halves the lr
    # every epoch after the first — exactly torch ReduceLROnPlateau's
    # treatment of a non-improving metric
    assert lrs == [100.0, 50.0, 25.0, 12.5]


def test_wandb_channel_mirrors_metrics(tmp_path, monkeypatch):
    """With cfg.wandb=True and a wandb module importable, the CLIs init the
    channel (self-hosted url honored, reference pretrain.py:44-47) and
    Logger.metrics mirrors every JSONL record into wandb.log."""
    import sys
    import types

    calls = {"init": [], "log": [], "login": []}
    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: calls["init"].append(kw)
    fake.login = lambda key=None: calls["login"].append(key)
    fake.log = lambda kv, step=None: calls["log"].append((step, kv))
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from vipformer_tpu.cli import ft_cls

    cfg = tiny_cfg(
        tmp_path,
        wandb=True,
        wb_url="http://wb.example:28282",
        wb_key="sekrit",
        exp_name="wb",
    )
    ft_cls.main(cfg)
    import os

    assert os.environ.get("WANDB_BASE_URL") == "http://wb.example:28282"
    assert calls["login"] == ["sekrit"]
    assert calls["init"] == [{"project": cfg.proj_name, "name": "wb"}]
    assert len(calls["log"]) == cfg.epochs
    step0, kv0 = calls["log"][0]
    assert step0 == 0 and "lr" in kv0 and "train_loss" in kv0


def test_dump_feats_artifacts_and_viewer(tmp_path):
    """--dump_feats writes the {pt,ft}_test_feats_labels.npz artifacts the
    t-SNE viewer consumes (reference {ft,pt}_{MN,SO}_test_feats_labels.pth
    -> show_feats.ipynb flow), and show_feats.py --feats_file renders them."""
    import subprocess
    import sys

    import numpy as np

    from vipformer_tpu.cli import ft_cls, pretrain

    cfg = tiny_cfg(tmp_path, dump_feats=True, exp_name="dumpft")
    ft_cls.main(cfg)
    ft_npz = (
        tmp_path / "runs" / cfg.proj_name / "dumpft" / "files"
        / "ft_test_feats_labels.npz"
    )
    blob = np.load(ft_npz)
    assert blob["feats"].ndim == 2
    assert blob["feats"].shape[0] == blob["labels"].shape[0] > 0

    pt_cfg = tiny_cfg(tmp_path, dump_feats=True, epochs=1, exp_name="dumppt")
    pretrain.main(pt_cfg)
    pt_npz = (
        tmp_path / "runs" / cfg.proj_name / "dumppt" / "files"
        / "pt_test_feats_labels.npz"
    )
    assert np.load(pt_npz)["feats"].shape[0] > 0

    out_png = tmp_path / "tsne.png"
    import os

    res = subprocess.run(
        [
            sys.executable,
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "tools", "visualization", "show_feats.py",
            ),
            "--feats_file", str(ft_npz),
            "--out", str(out_png),
            "--max_samples", "100",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr
    assert out_png.exists() and out_png.stat().st_size > 0
