"""Isolate the XLA TPU SIGABRT (pad lowering) at toy eval shapes.

ROADMAP "Known upstream issues": compiling *eval-mode* forwards at
degenerate toy shapes (num_latents=16, group_size=8, N=256) aborts the
XLA TPU compiler — with and without our Pallas kernels. This harness
bisects which module triggers it by compiling each piece in a SUBPROCESS
(a SIGABRT kills the process, so probes must be isolated).

Usage:
  python tools/repro_pad_crash.py          # run all probes, print verdicts
  python tools/repro_pad_crash.py <name>   # run one probe in-process
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TOY = dict(
    num_pc_latents=16, num_groups=16, group_size=8,
    num_latent_channels=64, num_ca_heads=4, num_sa_heads=4,
    num_sa_layers=2, mlp_widen_factor=2,
    img_height=48, img_width=48, patch_size=12,
    optim="adamw", lr=1e-3, batch_size=16,
    max_dpr=0.0, atten_drop=0.0, mlp_drop=0.0,
    compute_dtype="float32",
)
B, N = 16, 256


def _model_and_pts():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vipformer_tpu.config import Config
    from vipformer_tpu.models import build_ft_cls

    cfg = Config(num_obj_classes=16, **TOY)
    model = build_ft_cls(cfg)
    pts = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, N, 3)), jnp.float32
    )
    variables = model.init({"params": jax.random.key(0)}, pts)
    return cfg, model, variables, pts


def probe_full_eval():
    import jax

    _, model, variables, pts = _model_and_pts()
    out = jax.jit(
        lambda v, x: model.apply(v, x, deterministic=True)
    )(variables, pts)
    jax.block_until_ready(out)


def probe_full_train():
    import jax

    _, model, variables, pts = _model_and_pts()
    out = jax.jit(
        lambda v, x: model.apply(
            v, x, deterministic=False,
            rngs={"dropout": jax.random.key(1), "fps": jax.random.key(2)},
            mutable=["batch_stats"],
        )
    )(variables, pts)
    jax.block_until_ready(out)


def probe_stem_eval():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vipformer_tpu.ops.geometry import divide_patches

    pts = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, N, 3)), jnp.float32
    )
    out = jax.jit(lambda x: divide_patches(x, 16, 8))(pts)
    jax.block_until_ready(out)


def probe_g2e_eval():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vipformer_tpu.nn.pointnet import Group2Emb

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, 16, 8, 3)), jnp.float32
    )
    mod = Group2Emb(64, dtype=jnp.float32)
    v = mod.init({"params": jax.random.key(0)}, x)
    out = jax.jit(lambda v, x: mod.apply(v, x, True))(v, x)
    jax.block_until_ready(out)


def probe_encoder_eval():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vipformer_tpu.models.crossformer import MPEncoder

    enc = MPEncoder(
        num_latent_channels=64, num_self_attention_layers=2,
        num_cross_attention_heads=4, num_self_attention_heads=4,
        modal_prior=True, dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((B, 16, 64)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((1, 16, 64)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((B, 16, 64)), jnp.float32)
    v = enc.init({"params": jax.random.key(0)}, g, pos, kv)
    out = jax.jit(
        lambda v, a, b, c: enc.apply(v, a, b, c, deterministic=True)
    )(v, g, pos, kv)
    jax.block_until_ready(out)


PROBES = [
    "probe_full_eval",
    "probe_full_train",
    "probe_stem_eval",
    "probe_g2e_eval",
    "probe_encoder_eval",
]


def main():
    if len(sys.argv) > 1:
        globals()[sys.argv[1]]()
        print(f"{sys.argv[1]}: OK")
        return
    for name in PROBES:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            capture_output=True, text=True, timeout=420, cwd=REPO,
        )
        verdict = "OK" if r.returncode == 0 else f"rc={r.returncode}"
        tail = (r.stderr or "").strip().splitlines()[-3:]
        print(f"{name}: {verdict}")
        if r.returncode != 0:
            for line in tail:
                print(f"    {line}")


if __name__ == "__main__":
    main()
