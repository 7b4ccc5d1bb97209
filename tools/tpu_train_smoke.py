"""One real pretrain step + one partseg step on the TPU.

Proves the full backward pass runs through every Pallas kernel on hardware
(FPS int-output kernel, MXU gather custom VJP) — the CPU test suite covers
the lax fallbacks only.
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from vipformer_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from vipformer_tpu.config import Config
from vipformer_tpu.models import (
    build_ft_partseg,
    build_img_model,
    build_pc_model,
)
from vipformer_tpu.train import (
    create_state,
    init_variables,
    make_partseg_step,
    make_pretrain_step,
)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    # --- pretrain step (dual branch, bf16)
    cfg = Config(
        compute_dtype="bfloat16", num_pc_latents=64, num_groups=64,
        group_size=16, num_latent_channels=128, num_ca_heads=4,
        num_sa_heads=4, num_sa_layers=2, mlp_widen_factor=2,
        img_height=48, img_width=48, patch_size=12, optim="adamw",
        lr=1e-3, batch_size=16,
    )
    pc_model = build_pc_model(cfg)
    img_model = build_img_model(cfg)
    batch = {
        "pc_t1": jnp.asarray(rng.standard_normal((16, 512, 3)),
                             dtype=jnp.float32),
        "pc_t2": jnp.asarray(rng.standard_normal((16, 512, 3)),
                             dtype=jnp.float32),
        "imgs": jnp.asarray(rng.standard_normal((16, 48, 48, 3)),
                            dtype=jnp.float32),
    }
    pc_params, pc_stats = init_variables(pc_model, (batch["pc_t1"],))
    img_params, img_stats = init_variables(img_model, (batch["imgs"],))
    state, tx = create_state(
        cfg, {"pc": pc_params, "img": img_params},
        {"pc": pc_stats, "img": img_stats},
    )
    step = make_pretrain_step(cfg, pc_model, img_model, tx, neg_groups=1)
    losses = []
    for i in range(3):
        state, m = step(state, batch, 1e-3, jax.random.key(i))
        losses.append(float(m["loss"]))
    print("pretrain losses:", [round(l, 4) for l in losses])
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], "loss did not decrease"

    # --- partseg step (grad clip, label conditioning, propagation)
    cfg2 = cfg.replace(
        num_sa_layers=4, layer_idx=(1, 2, 4), grad_clip_norm=10.0,
        max_dpr=0.1, atten_drop=0.0, mlp_drop=0.0,
    )
    seg_model = build_ft_partseg(cfg2)
    pts = jnp.asarray(rng.standard_normal((8, 512, 3)), dtype=jnp.float32)
    seg_batch = {
        "points": pts,
        "obj_labels": jnp.asarray(rng.integers(0, 16, 8)),
        "seg": jnp.asarray(rng.integers(0, 50, (8, 512))),
    }
    params, stats = init_variables(
        seg_model, (pts, jnp.zeros((8, 16)))
    )
    state2, tx2 = create_state(cfg2, params, stats)
    sstep = make_partseg_step(cfg2, seg_model, tx2)
    state2, m2 = sstep(state2, seg_batch, 1e-3, jax.random.key(0))
    loss2 = float(m2["loss"])
    print("partseg loss:", round(loss2, 4))
    assert np.isfinite(loss2)
    print("TPU train smoke OK")


if __name__ == "__main__":
    main()
