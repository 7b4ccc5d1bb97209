"""Per-HLO-op device profile of a workload on the real chip.

Captures a jax.profiler trace around K executions of a jitted workload,
parses the raw xplane proto (no TensorBoard needed), aggregates device-side
event durations by HLO instruction name, and prints the top sinks.

This is the evidence-grade replacement for the chained-k ablation guesses in
tools/profile_forward.py: the numbers are the TPU's own timeline.
(Reference has no equivalent; its tracing story is datetime deltas,
SURVEY.md §5.)

Usage:
  python tools/profile_ops.py cls [batch]        # flagship eval forward
  python tools/profile_ops.py pretrain [batch]   # full dual-branch step
  python tools/profile_ops.py img_train [batch]  # image branch fwd+bwd
  python tools/profile_ops.py pc_train [batch]   # pc branch fwd+bwd
  python tools/profile_ops.py partseg [batch]    # TABLE III eval forward
  python tools/profile_ops.py partseg_train [b]  # TABLE III train step
Artifacts: trace under /tmp/vipformer_trace*, summary to stdout.
"""

from __future__ import annotations

import collections
import glob
import os
import shutil
import sys
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vipformer_tpu.utils.cache import enable_compile_cache, train_key

enable_compile_cache()

from vipformer_tpu.config import Config, decode_arch_name

FLAGSHIP = "E1CL8SL-H4D256-L128-MR2"
ITERS = 10


def _flagship_cfg(**over):
    on_tpu = jax.default_backend() == "tpu"
    base = dict(
        compute_dtype="bfloat16" if on_tpu else "float32",
        img_height=144,
        img_width=144,
        patch_size=12,
        optim="adamw",
        lr=1e-3,
        max_dpr=0.0,
        atten_drop=0.1,
        mlp_drop=0.5,
    )
    base.update(over)
    return Config(**base, **decode_arch_name(FLAGSHIP))


def make_workload(name: str, batch: int):
    """Returns run() -> None executing ITERS device steps."""
    rng = np.random.default_rng(0)
    if name == "cls":
        from vipformer_tpu.models import build_ft_cls

        cfg = _flagship_cfg(num_obj_classes=40)
        model = build_ft_cls(cfg)
        pts = jnp.asarray(
            rng.standard_normal((batch, 1024, 3)), jnp.float32
        )
        variables = model.init({"params": jax.random.key(0)}, pts)

        fwd = jax.jit(
            lambda v, x: jnp.sum(
                model.apply(v, x, deterministic=True)[0]
            ).astype(jnp.float32)
        )

        def run():
            for _ in range(ITERS):
                out = fwd(variables, pts)
            jax.block_until_ready(out)

        run()  # compile outside the trace
        return run

    if name == "pretrain":
        from vipformer_tpu.models import build_img_model, build_pc_model
        from vipformer_tpu.train import (
            create_state,
            init_variables,
            make_pretrain_step,
        )

        cfg = _flagship_cfg(batch_size=batch)
        pc_model = build_pc_model(cfg)
        img_model = build_img_model(cfg)
        batch_d = {
            "pc_t1": jnp.asarray(
                rng.standard_normal((batch, 2048, 3)), jnp.float32
            ),
            "pc_t2": jnp.asarray(
                rng.standard_normal((batch, 2048, 3)), jnp.float32
            ),
            "imgs": jnp.asarray(
                rng.standard_normal((batch, 144, 144, 3)), jnp.float32
            ),
        }
        pc_params, pc_stats = init_variables(pc_model, (batch_d["pc_t1"],))
        img_params, img_stats = init_variables(img_model, (batch_d["imgs"],))
        state, tx = create_state(
            cfg,
            {"pc": pc_params, "img": img_params},
            {"pc": pc_stats, "img": img_stats},
        )
        step = make_pretrain_step(cfg, pc_model, img_model, tx, neg_groups=1)
        key = train_key(0)

        def run():
            nonlocal state
            for _ in range(ITERS):
                state, m = step(state, batch_d, 1e-3, key)
            jax.block_until_ready(m["loss"])

        run()
        return run

    if name in ("img_train", "pc_train"):
        from vipformer_tpu.models import build_img_model, build_pc_model
        from vipformer_tpu.train import init_variables
        from vipformer_tpu.train.trainer import _apply_train, _rngs

        cfg = _flagship_cfg(batch_size=batch)
        if name == "img_train":
            model = build_img_model(cfg)
            x = jnp.asarray(
                rng.standard_normal((batch, 144, 144, 3)), jnp.float32
            )
        else:
            model = build_pc_model(cfg)
            x = jnp.asarray(
                rng.standard_normal((batch, 2048, 3)), jnp.float32
            )
        params, stats = init_variables(model, (x,))
        key = train_key(0)

        @jax.jit
        def fwd_bwd(p, xx):
            def loss(pp):
                (out, _), _ = _apply_train(model, pp, stats, xx, _rngs(key))
                return jnp.sum(out).astype(jnp.float32)

            l, g = jax.value_and_grad(loss)(p)
            flat = sum(
                jnp.sum(t).astype(jnp.float32)
                for t in jax.tree_util.tree_leaves(g)
            )
            return l + flat

        def run():
            for _ in range(ITERS):
                out = fwd_bwd(params, x)
            jax.block_until_ready(out)

        run()
        return run

    if name in ("partseg", "partseg_train"):
        # TABLE III workload (reference ft_partseg.py:135-219): H6D384
        # 12-layer encoder, taps (2,6,10), FeaturePropagation dense
        # decode, BN-heavy heads — same config as bench.bench_partseg*
        from vipformer_tpu.models import build_ft_partseg
        from vipformer_tpu.train import (
            create_state,
            init_variables,
            make_partseg_step,
        )

        on_tpu = jax.default_backend() == "tpu"
        cfg = Config(
            compute_dtype="bfloat16" if on_tpu else "float32",
            num_latent_channels=384, num_ca_heads=6, num_sa_heads=6,
            num_sa_layers=12, mlp_widen_factor=4, layer_idx=(2, 6, 10),
            optim="adamw", lr=1e-3,
            max_dpr=0.1, atten_drop=0.0, mlp_drop=0.0,
            batch_size=batch,
        )
        model = build_ft_partseg(cfg)
        pts = jnp.asarray(
            rng.standard_normal((batch, 1024, 3)), jnp.float32
        )
        onehot = jnp.zeros((batch, 16), jnp.float32)
        if name == "partseg":
            variables = model.init(
                {"params": jax.random.key(0)}, pts, onehot
            )
            fwd = jax.jit(
                lambda v, x, oh: jnp.sum(
                    model.apply(v, x, oh, deterministic=True)
                ).astype(jnp.float32)
            )

            def run():
                for _ in range(ITERS):
                    out = fwd(variables, pts, onehot)
                jax.block_until_ready(out)

            run()
            return run

        batch_d = {
            "points": pts,
            "seg": jnp.asarray(
                rng.integers(0, 50, size=(batch, 1024)), jnp.int32
            ),
            "obj_labels": jnp.asarray(
                rng.integers(0, 16, size=(batch,)), jnp.int32
            ),
        }
        params, stats = init_variables(model, (pts, onehot))
        state, tx = create_state(cfg, params, stats)
        step = make_partseg_step(cfg, model, tx)
        key = train_key(0)

        def run():
            nonlocal state
            for _ in range(ITERS):
                state, m = step(state, batch_d, 1e-3, key)
            jax.block_until_ready(m["loss"])

        run()
        return run

    raise SystemExit(f"unknown workload {name!r}")


def parse_trace(trace_dir: str, top: int = 25):
    """Aggregate device-plane event durations from the captured xplane."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        space.ParseFromString(f.read())

    def _short(nm: str) -> str:
        # '%fusion.12 = bf16[...] fusion(...), calls=...' -> 'fusion.12 bf16[...]'
        if nm.startswith("%") and " = " in nm:
            head, rest = nm[1:].split(" = ", 1)
            shape = rest.split(" ", 1)[0]
            return f"{head}  {shape[:90]}"
        return nm[:110]

    modules = collections.Counter()
    sync = collections.Counter()
    async_ = collections.Counter()
    counts = collections.Counter()
    for plane in space.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if "Steps" in line.name:
                continue
            is_module = "Module" in line.name
            for ev in line.events:
                nm = names.get(ev.metadata_id, str(ev.metadata_id))
                if is_module:
                    modules[nm] += ev.duration_ps
                    continue
                # async DMA spans (copy/slice/all-gather -start) overlap
                # compute; report them separately from the sync timeline
                if "-start" in nm.split(" = ")[0]:
                    async_[nm] += ev.duration_ps
                else:
                    sync[nm] += ev.duration_ps
                counts[nm] += 1

    print("== modules (wall time per iter) ==")
    for nm, ps in modules.most_common(5):
        print(f"{ps/1e6/ITERS:10.1f} us/iter  {nm[:100]}")
    total_sync = sum(sync.values()) / 1e6 / ITERS

    # family rollup: strip the %name and .N instance suffixes so every
    # instruction lands in an op-family bucket, print families covering
    # >= 99% of the step — this is the table that must SUM to the
    # measured wall (r4 VERDICT item 5), not a top-K excerpt
    import re as _re

    fams = collections.Counter()
    for nm, ps in sync.items():
        head = nm[1:].split(" = ", 1)[0] if nm.startswith("%") else nm
        fams[_re.sub(r"[.\-]\d+$", "", head)] += ps
    print(f"== sync families (sum {total_sync:.1f} us/iter) ==")
    run_sum = 0.0
    for nm, ps in fams.most_common():
        us = ps / 1e6 / ITERS
        run_sum += us
        print(
            f"{us:10.1f} us/iter  {100*us/total_sync:5.1f}%  "
            f"(cum {100*run_sum/total_sync:5.1f}%)  {nm[:80]}"
        )
        if run_sum / total_sync >= 0.99:
            break

    print(f"== top sync ops (total {total_sync:.1f} us/iter) ==")
    for nm, ps in sync.most_common(top):
        print(
            f"{ps/1e6/ITERS:10.1f} us/iter x{counts[nm]:4d}  {_short(nm)}"
        )
    print(f"== top async (DMA; overlaps compute) ==")
    for nm, ps in async_.most_common(10):
        print(
            f"{ps/1e6/ITERS:10.1f} us/iter x{counts[nm]:4d}  {_short(nm)}"
        )
    return []


def main():
    # VIPFORMER_NO_PALLAS=attention|dense|all profiles the XLA lowering of
    # the named kernel group for A/B reads of a kernel's in-model win
    off = os.environ.get("VIPFORMER_NO_PALLAS")
    if off:
        from vipformer_tpu.ops.pallas import (
            attention,
            batchnorm,
            dense,
            layernorm,
        )

        if off in ("attention", "all"):
            attention.USE_FUSED_ATTENTION = False
        if off in ("dense", "all"):
            dense.USE_DENSE_GRAD = False
        if off in ("layernorm", "all"):
            layernorm.USE_LAYERNORM = False
        if off in ("batchnorm", "all"):
            batchnorm.USE_BN_TRAIN = False
    # VIPFORMER_FORCE_PALLAS=batchnorm force-enables a default-off kernel
    # for A/B profiles (the BN custom-VJP is default-off per its measured
    # in-model loss — ops/pallas/batchnorm.py bn_train_enabled)
    on = os.environ.get("VIPFORMER_FORCE_PALLAS")
    if on:
        from vipformer_tpu.ops.pallas import attention, batchnorm

        if on in ("batchnorm", "all"):
            batchnorm.USE_BN_TRAIN = True
        if on in ("sa_qkv_ln", "all"):
            attention.USE_SA_QKV_LN = True
    name = sys.argv[1] if len(sys.argv) > 1 else "cls"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    global _TOP
    _TOP = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    run = make_workload(name, batch)
    trace_dir = tempfile.mkdtemp(prefix=f"vipformer_trace_{name}_")
    jax.profiler.start_trace(trace_dir)
    run()
    jax.profiler.stop_trace()
    parse_trace(trace_dir, top=_TOP)
    print(f"# trace: {trace_dir}")
    # keep only the latest couple of traces around
    old = sorted(
        glob.glob(tempfile.gettempdir() + "/vipformer_trace_*"),
        key=os.path.getmtime,
    )
    for d in old[:-4]:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
