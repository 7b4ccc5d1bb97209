"""Benchmark: classification-inference throughput of the flagship model.

Prints ONE JSON line:
  {"metric": "clouds_per_sec_per_chip_1024pt_cls", "value": N,
   "unit": "clouds/s", "vs_baseline": R}

Baseline: the reference's most direct published latency row — TABLE I
(assets/tab1.png): 1,015 ms finetune latency for the 5.1 M-param
H4D256-L128-MR2 classification model at test batch 160 on the 6-GPU CUDA
10.2 node => 160 / 1.015 s = 157.6 clouds/s for the whole node. We report
per-chip throughput, so vs_baseline = ours_per_chip / 157.6 (conservative:
the denominator is a 6-GPU aggregate).

Run on the TPU: python bench.py            (full batch sweep, ~1 min)
               python bench.py --quick    (single batch size)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from vipformer_tpu.config import Config, decode_arch_name
from vipformer_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
from vipformer_tpu.models import build_ft_cls

BASELINE_CLOUDS_PER_SEC = 160.0 / 1.015  # reference TABLE I latency row
FLAGSHIP = "E1CL8SL-H4D256-L128-MR2"
NUM_POINTS = 1024

# bf16 matmul peak per chip, used for the MFU figure in the report.
_PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5e": 197.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,  # v6e / Trillium
}


def _chip_peak_tflops() -> float | None:
    kind = jax.devices()[0].device_kind
    for prefix, peak in _PEAK_TFLOPS.items():
        if kind.startswith(prefix):
            return peak
    return None


def bench_forward(batch_size: int, reps: int = 5):
    """Time K chained forwards inside one jit and difference two K values.

    On a tunneled/remote PJRT backend, per-call `block_until_ready` measures
    dispatch + link latency, not device time; chaining K iterations in one
    executable (each consuming the previous output so nothing folds away)
    and fetching one scalar at the end gives
    device_time_per_step = (t[K2] - t[K1]) / (K2 - K1) with the constant
    overhead cancelled.
    """
    on_tpu = jax.default_backend() == "tpu"
    cfg = Config(
        compute_dtype="bfloat16" if on_tpu else "float32",
        num_obj_classes=40,
        **decode_arch_name(FLAGSHIP),
    )
    model = build_ft_cls(cfg)
    pts = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch_size, NUM_POINTS, 3)
        ),
        dtype=jnp.float32,
    )
    variables = model.init({"params": jax.random.key(0)}, pts)

    @jax.jit
    def chain(v, x, k):  # k dynamic -> one compilation for any k
        def body(_, carry):
            # perturb the input with the previous logits' mean so every
            # iteration depends on the last (no loop-invariant hoisting)
            x_i, acc = carry
            logits, _ = model.apply(v, x_i, deterministic=True)
            s = jnp.mean(logits).astype(x_i.dtype)
            return x_i + s * 1e-6, acc + jnp.sum(logits)

        _, acc = jax.lax.fori_loop(
            0, k, body, (x, jnp.float32(0))
        )
        return acc

    k1, k2 = 2, 12

    def run(k):
        # scalar fetch = real barrier even on async/tunneled backends
        return float(chain(variables, pts, jnp.int32(k)))

    run(k1)  # compile + warmup
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(k1)
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(k2)
        t2s.append(time.perf_counter() - t0)
    step = (np.median(t2s) - np.median(t1s)) / (k2 - k1)
    step = max(step, 1e-9)
    return {
        "batch": batch_size,
        "p50_batch_latency_s": step,
        "clouds_per_sec_p50": batch_size / step,
        "p50_per_cloud_ms": 1000.0 * step / batch_size,
    }


def bench_partseg(batch_size: int = 128, reps: int = 5):
    """Part-segmentation inference throughput (TABLE III workload: dense
    per-point decode, H6D384 12-layer encoder with 3 feature taps)."""
    from vipformer_tpu.models import build_ft_partseg

    on_tpu = jax.default_backend() == "tpu"
    cfg = Config(
        compute_dtype="bfloat16" if on_tpu else "float32",
        num_latent_channels=384,
        num_ca_heads=6,
        num_sa_heads=6,
        num_sa_layers=12,
        mlp_widen_factor=4,
        layer_idx=(2, 6, 10),
        max_dpr=0.1,
        atten_drop=0.0,
        mlp_drop=0.0,
    )
    model = build_ft_partseg(cfg)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(
        rng.standard_normal((batch_size, NUM_POINTS, 3)), dtype=jnp.float32
    )
    onehot = jnp.zeros((batch_size, 16), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, pts, onehot)


    @jax.jit
    def chain(v, x, k):
        def body(_, carry):
            x_i, acc = carry
            logits = model.apply(v, x_i, onehot, deterministic=True)
            s = jnp.mean(logits).astype(x_i.dtype)
            return x_i + s * 1e-6, acc + jnp.sum(logits)

        _, acc = jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))
        return acc

    k1, k2 = 2, 8

    def run(k):
        return float(chain(variables, pts, jnp.int32(k)))

    run(k1)
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(k1)
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(k2)
        t2s.append(time.perf_counter() - t0)
    step = max((np.median(t2s) - np.median(t1s)) / (k2 - k1), 1e-9)
    return {
        "batch": batch_size,
        "clouds_per_sec_p50": batch_size / step,
        "p50_per_cloud_ms": 1000.0 * step / batch_size,
    }


def bench_train_step(batch_size: int = 192, reps: int = 4):
    """Full dual-branch pretrain-step throughput (fwd+bwd+optimizer for the
    pc and img branches, IMID+CMID NT-Xent). Reference baseline: 22.2 s per
    epoch over ~43k ShapeNetRender samples on the 6-GPU node (TABLE I)
    = ~1,940 clouds/s node-wide."""
    from vipformer_tpu.models import build_img_model, build_pc_model
    from vipformer_tpu.train import (
        create_state, init_variables, make_pretrain_step,
    )

    on_tpu = jax.default_backend() == "tpu"
    cfg = Config(
        compute_dtype="bfloat16" if on_tpu else "float32",
        img_height=144, img_width=144, patch_size=12,
        optim="adamw", lr=1e-3, max_dpr=0.0, atten_drop=0.1, mlp_drop=0.5,
        batch_size=batch_size,
        **decode_arch_name(FLAGSHIP),
    )
    pc_model = build_pc_model(cfg)
    img_model = build_img_model(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "pc_t1": jnp.asarray(
            rng.standard_normal((batch_size, 2048, 3)), dtype=jnp.float32
        ),
        "pc_t2": jnp.asarray(
            rng.standard_normal((batch_size, 2048, 3)), dtype=jnp.float32
        ),
        "imgs": jnp.asarray(
            rng.standard_normal((batch_size, 144, 144, 3)),
            dtype=jnp.float32,
        ),
    }
    pc_params, pc_stats = init_variables(pc_model, (batch["pc_t1"],))
    img_params, img_stats = init_variables(img_model, (batch["imgs"],))
    state, tx = create_state(
        cfg,
        {"pc": pc_params, "img": img_params},
        {"pc": pc_stats, "img": img_stats},
    )
    step = make_pretrain_step(cfg, pc_model, img_model, tx, neg_groups=1)
    sec = _time_chained_steps(step, state, batch, reps)
    out = {
        "batch": batch_size,
        "step_s": sec,
        "clouds_per_sec": batch_size / sec,
        "epoch_43k_s": 43000 / (batch_size / sec),
    }
    peak = _chip_peak_tflops()
    if peak:
        try:
            flops = _train_step_flops(step, state, batch)
            out["flops_per_step"] = flops
            out["train_mfu"] = flops / sec / (peak * 1e12)
        except Exception as e:
            print(f"# pretrain train flops failed: {e}", file=sys.stderr)
    return out


def _train_step_flops(step, state, batch) -> float:
    """Analytical FLOPs of one compiled train step (fwd+bwd+optimizer),
    lowered with every Pallas kernel on its XLA path — the cost model
    reports 0 for custom calls, so counting with kernels live would drop
    the attention/dense matmuls (same rationale as
    evaluation/flops.forward_flops)."""
    from vipformer_tpu.ops.pallas import xla_reference_mode
    from vipformer_tpu.utils.cache import train_key

    with xla_reference_mode():
        lowered = jax.jit(step).lower(state, batch, 1e-3, train_key(1))
        try:
            cost = lowered.compile().cost_analysis()
        except Exception:
            cost = lowered.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", -1.0))


def _time_chained_steps(step, state, batch, reps: int = 4):
    """Median per-step device seconds of a jitted train step.

    K steps run inside ONE executable (lax.fori_loop carrying the train
    state; the dropout key folds per iteration so no compute hoists) and
    two K values are differenced — the exact protocol bench_forward uses.
    The previous per-dispatch loop measured ~9 ms/step of tunnel dispatch
    latency on top of device time (r4 profile: jit_step device wall
    94.6 ms vs 103.4 ms per-dispatch at B=192); production streams steps
    asynchronously and never pays that floor.
    """
    from vipformer_tpu.utils.cache import train_key

    key = train_key(0)

    @jax.jit
    def chain(st, b, k):
        def body(i, carry):
            st, _ = carry
            st, m = step(st, b, 1e-3, jax.random.fold_in(key, i))
            return (st, m["loss"])

        _, last = jax.lax.fori_loop(
            0, k, body, (st, jnp.float32(0))
        )
        return last

    k1, k2 = 1, 5

    def run(k):
        return float(chain(state, batch, jnp.int32(k)))

    run(k1)  # compile + warmup
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(k1)
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(k2)
        t2s.append(time.perf_counter() - t0)
    return max(
        (float(np.median(t2s)) - float(np.median(t1s))) / (k2 - k1), 1e-9
    )


def bench_ft_cls_train(batch_size: int = 160, reps: int = 4):
    """Classification FINETUNE training-step throughput — the actual
    TABLE I workload (reference `ft_cls.py:151-213`): flagship H4D256
    model at 1024 points, smoothed-CE, adamw, dropout profile from
    scripts/finetune/ft-E1CL8SL-H4D256-L128-MR2.sh. Baseline: TABLE I
    "finetune latency" 1,015 ms at batch 160 on the 6-GPU node
    = 157.6 clouds/s node-wide."""
    from vipformer_tpu.train import (
        create_state, init_variables, make_cls_step,
    )

    on_tpu = jax.default_backend() == "tpu"
    cfg = Config(
        compute_dtype="bfloat16" if on_tpu else "float32",
        num_obj_classes=15,  # ScanObjectNN, the TABLE I dataset
        optim="adamw", lr=1e-3,
        max_dpr=0.0, atten_drop=0.1, mlp_drop=0.5,
        batch_size=batch_size,
        **decode_arch_name(FLAGSHIP),
    )
    model = build_ft_cls(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "points": jnp.asarray(
            rng.standard_normal((batch_size, NUM_POINTS, 3)),
            dtype=jnp.float32,
        ),
        "labels": jnp.asarray(
            rng.integers(0, 15, size=(batch_size,)), dtype=jnp.int32
        ),
    }
    params, stats = init_variables(model, (batch["points"],))
    state, tx = create_state(cfg, params, stats)
    sec = _time_chained_steps(make_cls_step(cfg, model, tx), state, batch, reps)
    return {
        "batch": batch_size,
        "step_s": sec,
        "clouds_per_sec": batch_size / sec,
        "vs_tab1_node": (batch_size / sec) / BASELINE_CLOUDS_PER_SEC,
    }


# ShapeNetPart trainval (reference `ft_partseg.py:46`) = 14,007 clouds;
# TABLE III reports 42.1 s latency for the 6-GPU node — read as one
# training epoch, that is 332.7 clouds/s node-wide.
_PARTSEG_TRAINVAL = 14007
_PARTSEG_BASELINE_CPS = _PARTSEG_TRAINVAL / 42.1


def bench_partseg_train(batch_size: int = 96, reps: int = 4):
    """Part-segmentation FINETUNE training-step throughput — the TABLE III
    workload (reference `ft_partseg.py:135-219`): H6D384 12-layer encoder
    with taps (2,6,10), FeaturePropagation dense decode, BN-heavy heads,
    per-point smoothed-CE over 50 parts; batch 96 per
    scripts/finetune/ft-partseg.sh."""
    from vipformer_tpu.models import build_ft_partseg
    from vipformer_tpu.train import (
        create_state, init_variables, make_partseg_step,
    )

    on_tpu = jax.default_backend() == "tpu"
    cfg = Config(
        compute_dtype="bfloat16" if on_tpu else "float32",
        num_latent_channels=384, num_ca_heads=6, num_sa_heads=6,
        num_sa_layers=12, mlp_widen_factor=4, layer_idx=(2, 6, 10),
        optim="adamw", lr=1e-3,
        max_dpr=0.1, atten_drop=0.0, mlp_drop=0.0,
        batch_size=batch_size,
    )
    model = build_ft_partseg(cfg)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(
        rng.standard_normal((batch_size, NUM_POINTS, 3)), dtype=jnp.float32
    )
    batch = {
        "points": pts,
        "seg": jnp.asarray(
            rng.integers(0, 50, size=(batch_size, NUM_POINTS)),
            dtype=jnp.int32,
        ),
        "obj_labels": jnp.asarray(
            rng.integers(0, 16, size=(batch_size,)), dtype=jnp.int32
        ),
    }
    onehot = jnp.zeros((batch_size, 16), jnp.float32)
    params, stats = init_variables(model, (pts, onehot))
    state, tx = create_state(cfg, params, stats)
    step = make_partseg_step(cfg, model, tx)
    sec = _time_chained_steps(step, state, batch, reps)
    out = {
        "batch": batch_size,
        "step_s": sec,
        "clouds_per_sec": batch_size / sec,
        "epoch_trainval_s": _PARTSEG_TRAINVAL / (batch_size / sec),
        "vs_tab3_node": (batch_size / sec) / _PARTSEG_BASELINE_CPS,
    }
    peak = _chip_peak_tflops()
    if peak:
        try:
            flops = _train_step_flops(step, state, batch)
            out["flops_per_step"] = flops
            out["train_mfu"] = flops / sec / (peak * 1e12)
        except Exception as e:
            print(f"# partseg train flops failed: {e}", file=sys.stderr)
    return out


def bench_probe(reps: int = 3):
    """SVM linear-probe wall time at the exact pretrain epoch-gate scale
    (reference `pretrain.py:228-276`: fit on ModelNet40 train features,
    score on test, EVERY epoch): [9840, 512] train / [2468, 512] test,
    40 classes — 512 = concat(max, mean) of D=256 backbone latents.
    Times the on-device fit (evaluation/svm.fit_svm, 300 Adam steps in
    one jit) plus host-side score, the quantity every s/epoch claim
    composes with. Feature extraction itself is the cls-inference bench
    (~12.3k clouds at the measured clouds/s)."""
    from vipformer_tpu.evaluation.svm import fit_svm

    rng = np.random.default_rng(0)
    d, k = 512, 40
    # class-structured features so score() does real argmax work
    centers = rng.standard_normal((k, d)).astype(np.float32)
    ytr = rng.integers(0, k, size=9840)
    yte = rng.integers(0, k, size=2468)
    xtr = (centers[ytr] + rng.standard_normal((9840, d))).astype(np.float32)
    xte = (centers[yte] + rng.standard_normal((2468, d))).astype(np.float32)

    fit_svm(xtr, ytr, c=1.0, num_classes=k).score(xte, yte)  # compile
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        svm = fit_svm(xtr, ytr, c=1.0, num_classes=k)
        acc = svm.score(xte, yte)
        walls.append(time.perf_counter() - t0)
    return {
        "fit_score_wall_s": float(np.median(walls)),
        "sanity_acc": acc,
        "train_shape": [9840, d],
        "test_shape": [2468, d],
    }


def main():
    quick = "--quick" in sys.argv
    # full 32-512 sweep: per-op profiles show on-device compute is
    # batch-flat (~47.6 us/cloud); the chained stream's small-batch edge
    # is pipelined-away fixed dispatch overhead (ROADMAP item 0), and
    # the per-batch MFU sweep below records the whole curve either way
    if "--partseg" in sys.argv:
        # targeted partseg eval+train run (endgame docs sync without the
        # full sweep's compile bill)
        seg = bench_partseg()
        print(f"# partseg: {seg}", file=sys.stderr)
        ps = bench_partseg_train()
        print(f"# partseg train: {ps}", file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": "partseg_clouds_per_sec",
                    "value": round(seg["clouds_per_sec_p50"], 1),
                    "unit": "clouds/s",
                    "vs_baseline": round(
                        ps["vs_tab3_node"], 2
                    ),
                    "detail": {
                        "partseg_p50_per_cloud_ms": round(
                            seg["p50_per_cloud_ms"], 4
                        ),
                        "partseg_train_clouds_per_sec": round(
                            ps["clouds_per_sec"], 1
                        ),
                        "partseg_train_epoch_trainval_s": round(
                            ps["epoch_trainval_s"], 1
                        ),
                    },
                }
            )
        )
        return
    if "--train" in sys.argv:
        out = bench_train_step()
        print(
            json.dumps(
                {
                    "metric": "pretrain_clouds_per_sec_per_chip_2048pt",
                    "value": round(out["clouds_per_sec"], 1),
                    "unit": "clouds/s",
                    "vs_baseline": round(
                        out["clouds_per_sec"] / (43000 / 22.2), 2
                    ),
                    "detail": {
                        **{k: round(v, 3) for k, v in out.items()},
                        "baseline": "TABLE I: 22.2 s/epoch over ~43k "
                        "samples on 6-GPU node = 1,937 clouds/s",
                    },
                }
            )
        )
        return
    # 512 joined the sweep in r4 (VERDICT item 5: record the point either
    # way); per-cloud curve must be non-decreasing through 256
    batches = [256] if quick else [32, 64, 128, 256, 512]
    results = []
    for b in batches:
        try:
            results.append(bench_forward(b))
            print(f"# cls batch {b}: {results[-1]}", file=sys.stderr)
        except Exception as e:  # e.g. OOM at large batch
            print(f"# cls batch {b} failed: {e}", file=sys.stderr)
    if not results:
        raise SystemExit("no benchmark configuration succeeded")
    bestcfg = max(results, key=lambda r: r["clouds_per_sec_p50"])
    value = bestcfg["clouds_per_sec_p50"]

    detail = {
        "flagship": FLAGSHIP,
        "backend": jax.default_backend(),
        "best_batch": bestcfg["batch"],
        "p50_per_cloud_ms": round(bestcfg["p50_per_cloud_ms"], 4),
        "baseline": "TABLE I: 160-cloud batch / 1.015 s on "
        "6-GPU node = 157.6 clouds/s",
    }
    try:
        from vipformer_tpu.evaluation.flops import forward_flops

        on_tpu = jax.default_backend() == "tpu"
        cfg = Config(
            compute_dtype="bfloat16" if on_tpu else "float32",
            num_obj_classes=40,
            **decode_arch_name(FLAGSHIP),
        )
        model = build_ft_cls(cfg)
        rng0 = np.random.default_rng(0)
        variables = model.init(
            {"params": jax.random.key(0)},
            jnp.asarray(
                rng0.standard_normal((2, NUM_POINTS, 3)), dtype=jnp.float32
            ),
        )
        peak = _chip_peak_tflops()
        # per-batch MFU (r4 VERDICT item 1: the batch curve must be
        # visible in the bench record, not just its best point) —
        # forward_flops lowers in xla_reference_mode, so the Pallas
        # custom calls' matmuls (attention/stem/kNN) ARE in the
        # denominator (r3 fix of the r2 MFU under-count)
        sweep = []
        for r in results:
            flops = forward_flops(
                model,
                variables,
                jnp.asarray(
                    rng0.standard_normal((r["batch"], NUM_POINTS, 3)),
                    dtype=jnp.float32,
                ),
            )
            eff_tflops = flops / r["p50_batch_latency_s"] / 1e12
            point = {
                "batch": r["batch"],
                "p50_per_cloud_ms": round(r["p50_per_cloud_ms"], 4),
                "effective_tflops": round(eff_tflops, 1),
            }
            if peak:
                point["mfu"] = round(eff_tflops / peak, 4)
            sweep.append(point)
            if r["batch"] == bestcfg["batch"]:
                detail["flops_per_batch"] = flops
                detail["effective_tflops"] = point["effective_tflops"]
                if peak:
                    detail["mfu"] = point["mfu"]
                    detail["chip_peak_tflops_bf16"] = peak
        if len(sweep) > 1:
            detail["batch_sweep"] = sweep
    except Exception as e:
        print(f"# mfu calc failed: {e}", file=sys.stderr)
    if not quick:
        try:
            seg = bench_partseg()
            print(f"# partseg: {seg}", file=sys.stderr)
            detail["partseg_clouds_per_sec"] = round(
                seg["clouds_per_sec_p50"], 1
            )
            detail["partseg_p50_per_cloud_ms"] = round(
                seg["p50_per_cloud_ms"], 4
            )
        except Exception as e:
            print(f"# partseg failed: {e}", file=sys.stderr)
        try:
            tr = bench_train_step()
            print(f"# train: {tr}", file=sys.stderr)
            detail["pretrain_clouds_per_sec_2048pt"] = round(
                tr["clouds_per_sec"], 1
            )
            detail["pretrain_step_ms_b192"] = round(1e3 * tr["step_s"], 1)
            detail["pretrain_vs_baseline_node"] = round(
                tr["clouds_per_sec"] / (43000 / 22.2), 2
            )
            if "train_mfu" in tr:
                detail["pretrain_train_mfu"] = round(tr["train_mfu"], 4)
        except Exception as e:
            print(f"# train bench failed: {e}", file=sys.stderr)
        try:
            ft = bench_ft_cls_train()
            print(f"# ft_cls train: {ft}", file=sys.stderr)
            detail["ft_cls_train_clouds_per_sec"] = round(
                ft["clouds_per_sec"], 1
            )
            detail["ft_cls_train_step_ms_b160"] = round(
                1e3 * ft["step_s"], 1
            )
            detail["ft_cls_train_vs_tab1_node"] = round(
                ft["vs_tab1_node"], 2
            )
        except Exception as e:
            print(f"# ft_cls train bench failed: {e}", file=sys.stderr)
        try:
            ps = bench_partseg_train()
            print(f"# partseg train: {ps}", file=sys.stderr)
            detail["partseg_train_clouds_per_sec"] = round(
                ps["clouds_per_sec"], 1
            )
            detail["partseg_train_epoch_trainval_s"] = round(
                ps["epoch_trainval_s"], 1
            )
            detail["partseg_train_vs_tab3_node"] = round(
                ps["vs_tab3_node"], 2
            )
        except Exception as e:
            print(f"# partseg train bench failed: {e}", file=sys.stderr)
        try:
            pr = bench_probe()
            print(f"# svm probe: {pr}", file=sys.stderr)
            detail["svm_probe_fit_score_s"] = round(
                pr["fit_score_wall_s"], 3
            )
        except Exception as e:
            print(f"# svm probe bench failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "clouds_per_sec_per_chip_1024pt_cls",
                "value": round(value, 1),
                "unit": "clouds/s",
                "vs_baseline": round(value / BASELINE_CLOUDS_PER_SEC, 2),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
