"""Finetune training soaks with kill+resume (VERDICT r3 item 7).

The finetune loops (the actual TABLE I/III workloads, reference
`ft_cls.py:151-213` and `ft_partseg.py:135-219`) have only ever had
minutes-long smokes; this runs both at flagship dims on the chip through
the FULL reference schedule (epochs=300, coswarm step_size=100 -> lr
restarts at 100/200, warm_epochs=5, gamma=0.6 - the exact flags of
scripts/finetune/ft-E1CL8SL-H4D256-L128-MR2.sh and ft-partseg.sh), with a
SIGKILL mid-run and `model_last` crash-resume to completion. Synthetic
data stands in for the absent corpora; its clouds are class-structured so
accuracy/IoU have real signal to climb.

Usage:  python tools/soak_finetune.py [--task cls|partseg|both]
Artifacts: artifacts/soak_ft_r4/{cls,partseg}/{metrics.jsonl,soak_report.json,...}

Per-task checks (nonzero exit on failure):
* every logged train loss is finite;
* epoch numbering is contiguous across the kill/resume boundary and the
  run reached the final epoch;
* the quality metric (test_acc / mean_category_iou) improved: late-window
  mean > early-window mean, and the best epoch is past the first quarter.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROJ = "ViPFormerTPU"

TMP_ROOT = "/tmp/soak_ft_r4"

# Flagship TABLE I config: scripts/finetune/ft-E1CL8SL-H4D256-L128-MR2.sh
# (batch 330 -> 128 here: the synthetic train split is 800 samples and
# drop_last would starve the loop at 330; 128 keeps 6 steps/epoch).
CLS = {
    "task": "ft_cls",
    "exp_name": "soakcls",
    "metric": "test_acc",
    "flags": {
        "arch": "E1CL8SL-H4D256-L128-MR2",
        "ft_dataset": "ModelNet40", "num_obj_classes": 40,
        "batch_size": 128, "test_batch_size": 128,
        "num_ft_points": 1024, "num_test_points": 1024, "group_size": 32,
        "optim": "adamw", "lr": 1e-3, "scheduler": "coswarm",
        "max_lr": 1e-3, "min_lr": 0.0, "warm_epochs": 5,
        "max_dpr": 0.0, "atten_drop": 0.1, "mlp_drop": 0.5,
        "compute_dtype": "bfloat16",
        "synthetic_data": "true", "save_freq": 10, "print_freq": 1000,
    },
}

# TABLE III config: scripts/finetune/ft-partseg.sh (H6D384, 12 SA layers,
# layer taps 2/6/10; batch 96 = 4 steps/epoch on the 400-sample split).
PARTSEG = {
    "task": "ft_partseg",
    "exp_name": "soakseg",
    "metric": "mean_category_iou",
    "flags": {
        "num_latent_channels": 384, "num_ca_heads": 6, "num_sa_heads": 6,
        "num_sa_layers": 12, "mlp_widen_factor": 4,
        "num_pc_latents": 128, "group_size": 32,
        "batch_size": 96, "test_batch_size": 96,
        "num_ft_points": 1024, "num_test_points": 1024,
        "optim": "adamw", "lr": 1e-3, "scheduler": "coswarm",
        "max_lr": 1e-3, "min_lr": 0.0, "warm_epochs": 5,
        "max_dpr": 0.1, "atten_drop": 0.0, "mlp_drop": 0.0,
        "compute_dtype": "bfloat16",
        "synthetic_data": "true", "save_freq": 10, "print_freq": 1000,
    },
}
# --layer_idx is multi-valued; appended separately in cli_args.
PARTSEG_LAYER_IDX = ["2", "6", "10"]


def cli_args(spec, overrides):
    flags = {**spec["flags"], **overrides}
    args = [sys.executable, "-m", f"vipformer_tpu.cli.{spec['task']}"]
    for k, v in flags.items():
        args += [f"--{k}", str(v)]
    if spec["task"] == "ft_partseg":
        args += ["--layer_idx"] + PARTSEG_LAYER_IDX
    args += [
        "--run_dir", os.path.join(TMP_ROOT, "runs"),
        "--data_dir", os.path.join(TMP_ROOT, "data"),
        "--exp_name", spec["exp_name"],
    ]
    return args


def run_phase(spec, label, overrides, kill_after_s=None, timeout_s=None):
    """Run one CLI phase; if kill_after_s is set, SIGKILL the process
    that many seconds AFTER the first rolling model_last snapshot
    appears (a wall-clock-anchored kill can land inside the multi-minute
    first compile, before any snapshot exists — then the 'resume' phase
    silently starts fresh and the soak proves nothing). timeout_s caps
    the incarnation's wall clock (bounded-incarnation chaining — the
    tunneled backend leaks host RSS on long runs, see
    soak_pretrain.py --resume_phase_timeout_s)."""
    print(f"=== {spec['task']} phase: {label} "
          f"(kill_after_snapshot={kill_after_s}) ===", flush=True)
    cmd = cli_args(spec, overrides)
    if timeout_s:
        cmd = ["timeout", "--signal=KILL", str(timeout_s)] + cmd
    proc = subprocess.Popen(cmd, cwd=REPO)
    if kill_after_s is None:
        proc.wait()
    else:
        import time
        snap = os.path.join(TMP_ROOT, "runs", PROJ, spec["exp_name"],
                            "models", "model_last.ckpt")
        deadline = None
        while proc.poll() is None:
            time.sleep(2)
            if deadline is None and os.path.exists(snap):
                deadline = time.monotonic() + kill_after_s
            if deadline is not None and time.monotonic() >= deadline:
                proc.kill()
                proc.wait()
                break
    print(f"=== {label} exited rc={proc.returncode} ===", flush=True)
    return proc.returncode


def analyze(spec, epochs, art_root):
    run_root = os.path.join(TMP_ROOT, "runs", PROJ, spec["exp_name"])
    metrics_path = os.path.join(run_root, "metrics.jsonl")
    rows = [json.loads(l) for l in open(metrics_path)]
    report = {"task": spec["task"], "rows": len(rows)}
    ok = True

    losses = [r["train_loss"] for r in rows]
    report["all_losses_finite"] = all(
        l == l and abs(l) != float("inf") for l in losses
    )
    ok &= report["all_losses_finite"]

    uniq = sorted(set(r["step"] for r in rows))
    report["epoch_min_max"] = [uniq[0], uniq[-1]]
    report["epochs_contiguous"] = uniq == list(range(uniq[0], uniq[-1] + 1))
    report["reached_final_epoch"] = uniq[-1] == epochs - 1
    ok &= report["epochs_contiguous"] and report["reached_final_epoch"]

    # the kill+resume evidence requires the resume phase to have actually
    # restored a model_last snapshot (not fall back to a fresh start
    # because the kill preceded the first rolling save)
    resumed_epochs = []
    for f in os.listdir(run_root):
        if f.endswith(".log"):
            for line in open(os.path.join(run_root, f)):
                if "resumed training from" in line:
                    resumed_epochs.append(int(line.rsplit(" ", 1)[-1]))
    report["resumed_from_snapshot_at"] = resumed_epochs
    ok &= bool(resumed_epochs) and all(e > 0 for e in resumed_epochs)

    metric = spec["metric"]
    accs = {r["step"]: r[metric] for r in rows if metric in r}
    xs = sorted(accs)
    early_win = [e for e in xs if e < max(5, epochs // 10)]
    late_win = [e for e in xs if e >= (3 * epochs) // 4]
    early_mean = sum(accs[e] for e in early_win) / len(early_win)
    late_mean = sum(accs[e] for e in late_win) / len(late_win)
    best_epoch = max(accs, key=accs.get)
    report["metric"] = metric
    report["early_mean"] = round(early_mean, 4)
    report["late_mean"] = round(late_mean, 4)
    report["best"] = round(max(accs.values()), 4)
    report["best_epoch"] = best_epoch
    report["metric_improved"] = late_mean > early_mean
    report["best_past_first_quarter"] = best_epoch >= epochs // 4
    ok &= report["metric_improved"] and report["best_past_first_quarter"]

    report["ok"] = bool(ok)
    art = os.path.join(art_root, spec["task"].replace("ft_", ""))
    os.makedirs(art, exist_ok=True)
    shutil.copy(metrics_path, os.path.join(art, "metrics.jsonl"))
    for f in os.listdir(run_root):
        if f.endswith(".log") or f == "config.json":
            shutil.copy(os.path.join(run_root, f), os.path.join(art, f))
    with open(os.path.join(art, "soak_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return ok


def soak_one(spec, args):
    sched = {
        "epochs": args.epochs, "step_size": args.step_size,
        "gamma": args.gamma,
    }
    if not args.analyze_only:
        run_root = os.path.join(TMP_ROOT, "runs", PROJ, spec["exp_name"])
        shutil.rmtree(run_root, ignore_errors=True)
        rc = run_phase(
            spec, "initial (will be SIGKILLed mid-run)", sched,
            kill_after_s=args.kill_after_s,
        )
        print(f"phase A rc={rc} (137/124 = killed as planned)")
        # NOTE --resume means "bootstrap backbone from a pretrain ckpt" in
        # the finetune CLIs; crash-resume is --resume_training (model_last)
        rc = run_phase(spec, "resume to completion",
                       {**sched, "resume_training": "true"},
                       timeout_s=args.resume_phase_timeout_s or None)
        tries = 0
        while rc != 0 and args.resume_phase_timeout_s and tries < 12:
            tries += 1
            rc = run_phase(spec, f"re-resume {tries}",
                           {**sched, "resume_training": "true"},
                           timeout_s=args.resume_phase_timeout_s)
        if rc != 0:
            print(f"{spec['task']} resume phase FAILED", file=sys.stderr)
            return False
    return analyze(spec, args.epochs, os.path.join(REPO, "artifacts",
                                                   args.art_name))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=["cls", "partseg", "both"],
                    default="both")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--step_size", type=int, default=100)
    ap.add_argument("--gamma", type=float, default=0.6)
    ap.add_argument("--art_name", default="soak_ft_r4")
    ap.add_argument("--kill_after_s", type=int, default=120,
                    help="SIGKILL the first phase this many seconds after "
                    "its first rolling snapshot lands (anchoring to the "
                    "snapshot, not the wall clock, keeps the kill out of "
                    "the first compile)")
    ap.add_argument("--resume_phase_timeout_s", type=int, default=3300,
                    help="cap each resume incarnation and re-resume until "
                    "completion (0 = uncapped); see soak_pretrain.py")
    ap.add_argument("--analyze_only", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny-arch CPU dry run of the harness (~3 min)")
    args = ap.parse_args()

    global TMP_ROOT
    if args.smoke:
        os.environ["VIPFORMER_PLATFORM"] = "cpu"
        args.epochs, args.step_size, args.kill_after_s = 8, 3, 8
        args.art_name = "soak_ft_smoke"
        for spec in (CLS, PARTSEG):
            spec["flags"].update(
                arch="E1CL2SL-H4D32-L8-MR2", batch_size=16,
                test_batch_size=32, num_ft_points=64, num_test_points=64,
                group_size=8, compute_dtype="float32", save_freq=1,
            )
            spec["flags"].pop("num_latent_channels", None)
            spec["flags"].pop("num_sa_layers", None)
            spec["flags"].pop("mlp_widen_factor", None)
            spec["flags"].pop("num_ca_heads", None)
            spec["flags"].pop("num_sa_heads", None)
            spec["flags"].pop("num_pc_latents", None)
        global PARTSEG_LAYER_IDX
        PARTSEG_LAYER_IDX = ["1"]
    TMP_ROOT = "/tmp/" + args.art_name

    specs = {"cls": [CLS], "partseg": [PARTSEG], "both": [CLS, PARTSEG]}
    ok = all(soak_one(spec, args) for spec in specs[args.task])
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
