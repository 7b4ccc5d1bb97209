"""Programmatic quickstart: the framework as a library.

Builds the flagship model, runs a few pretraining steps on synthetic data,
probes the features with the on-device linear SVM, and serves predictions
through the bucketed inference wrapper — everything the CLI entry points do,
composed by hand.

Run: python examples/quickstart.py    (tiny sizes; runs on CPU or TPU.
The toy dims used to SIGABRT the XLA TPU compiler — fusion_util.cc
TransformWindow check-fail on the Group2Emb broadcast+concat+reduce graph
at G=16/S=8 — until Dense grew the implicit-concat split-dot path that
avoids the offending fusion; see tools/repro_pad_crash.py for the probes.)
"""

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from vipformer_tpu.config import Config
from vipformer_tpu.data import synthetic
from vipformer_tpu.evaluation import fit_svm
from vipformer_tpu.inference import classifier_predictor
from vipformer_tpu.models import build_ft_cls, build_img_model, build_pc_model
from vipformer_tpu.train import (
    create_state,
    init_variables,
    make_feats_fn,
    make_pretrain_step,
)
from vipformer_tpu.utils.cache import enable_compile_cache, train_key

enable_compile_cache()

# tiny architecture so this runs anywhere in seconds
cfg = Config(
    compute_dtype="float32",
    num_pc_latents=16, num_groups=16, group_size=8,
    num_latent_channels=64, num_ca_heads=4, num_sa_heads=4,
    num_sa_layers=2, mlp_widen_factor=2,
    img_height=48, img_width=48, patch_size=12,
    optim="adamw", lr=1e-3, batch_size=16,
    max_dpr=0.0, atten_drop=0.0, mlp_drop=0.0,
)

# --- synthetic "ShapeNetRender" batch: two point views + rendered images
rng = np.random.default_rng(0)
clouds, labels = synthetic.synthetic_classification(64, 256, 16, seed=0)
imgs = np.stack([synthetic.splat_image(c, size=48) for c in clouds[:16]])
batch = {
    "pc_t1": jnp.asarray(clouds[:16]),
    "pc_t2": jnp.asarray(clouds[:16] + 0.01 * rng.standard_normal(
        clouds[:16].shape).astype(np.float32)),
    "imgs": jnp.asarray(imgs, dtype=jnp.float32) / 255.0,
}

# --- contrastive pretraining, a few steps
pc_model = build_pc_model(cfg)
img_model = build_img_model(cfg)
pc_params, pc_stats = init_variables(pc_model, (batch["pc_t1"],))
img_params, img_stats = init_variables(img_model, (batch["imgs"],))
state, tx = create_state(
    cfg, {"pc": pc_params, "img": img_params},
    {"pc": pc_stats, "img": img_stats},
)
step = make_pretrain_step(cfg, pc_model, img_model, tx, neg_groups=1)
key = train_key(0)
for i in range(5):
    key, sub = jax.random.split(key)
    state, metrics = step(state, batch, 1e-3, sub)
    print(f"step {i}: imid {float(metrics['loss_imid']):.4f} "
          f"cmid {float(metrics['loss_cmid']):.4f}")

# --- linear probe of the learned features
feats_fn = make_feats_fn(pc_model)
feats = np.asarray(
    feats_fn(state.params["pc"], state.batch_stats["pc"], jnp.asarray(clouds))
)
svm = fit_svm(feats[:48], labels[:48], c=1.0)
print(f"probe accuracy on held-out synthetic shapes: "
      f"{svm.score(feats[48:], labels[48:]):.3f}")

# --- serving: bucketed compiled predictor over a finetune model
ft = build_ft_cls(cfg.replace(num_obj_classes=16))
variables = ft.init({"params": jax.random.key(0)}, jnp.asarray(clouds[:4]))
predictor = classifier_predictor(ft, variables, max_batch=32)
out = predictor(clouds[:5])
print("served logits:", out["logits"].shape,
      "feats:", out["backbone_feats"].shape)
print("quickstart OK")
