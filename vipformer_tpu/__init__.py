"""ViPFormer-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for unsupervised
image + point-cloud contrastive pretraining and downstream 3D understanding.

Built from scratch with the capabilities of the ViPFormer reference (ICRA 2023):
contrastive pretraining on ShapeNetRender (intra-modal + cross-modal NT-Xent),
3D shape classification (ModelNet40 / ScanObjectNN), part segmentation
(ShapeNetPart), semantic segmentation (S3DIS), few-shot classification and SVM
linear-probe evaluation — redesigned TPU-first: jittable geometry kernels,
bf16 training, pjit data parallelism over a device mesh, explicit PRNG
plumbing, and pytree checkpoints.
"""

__version__ = "0.1.0"

import os as _os

# Honor an explicit platform request (VIPFORMER_PLATFORM=cpu|tpu) even in
# images whose sitecustomize force-registers a remote-TPU PJRT plugin and
# overwrites jax_platforms at interpreter start (plain JAX_PLATFORMS=cpu is
# silently ignored there).  Must run before any backend is initialized —
# importing this package is the CLIs' first act, so this is early enough.
if _os.environ.get("VIPFORMER_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["VIPFORMER_PLATFORM"])
