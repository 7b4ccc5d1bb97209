"""Worker for the true multi-process test (tests/test_multiprocess.py).

Run as: python tests/_mp_worker.py <coordinator_port> <process_id>

Each worker owns 4 virtual CPU devices; two workers form one 8-device JAX
job via `maybe_initialize_distributed` (the path TPU pod launches take in
`cli/common.py:setup`). The worker builds the global 8-device DP mesh,
trains a tiny classifier for 3 steps on identical data, and prints the
per-step losses — the parent asserts both processes print the same
trajectory (i.e. the cross-process gradient reduction really ran).
"""

import os
import sys

port, pid = sys.argv[1], sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = pid
# the persistent compile cache is keyed per-topology; harmless either way

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

# the image's sitecustomize force-registers a remote-TPU platform; re-assert
# CPU before any backend (and before distributed bring-up)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from vipformer_tpu.parallel import maybe_initialize_distributed

assert maybe_initialize_distributed(), "distributed bring-up did not happen"
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4, jax.local_device_count()
assert jax.device_count() == 8, jax.device_count()

from vipformer_tpu.config import Config
from vipformer_tpu.models import build_ft_cls
from vipformer_tpu.parallel import make_mesh, place_state, shard_batch
from vipformer_tpu.train import create_state, init_variables
from vipformer_tpu.train.logging import is_chief
from vipformer_tpu.train.trainer import make_cls_step

assert is_chief() == (pid == "0"), (is_chief(), pid)

cfg = Config(
    compute_dtype="float32",
    num_obj_classes=10,
    num_pc_latents=8,
    num_groups=8,
    group_size=4,
    num_latent_channels=32,
    num_ca_heads=4,
    num_sa_heads=4,
    num_sa_layers=2,
    mlp_widen_factor=2,
    optim="adamw",
    lr=1e-3,
    max_dpr=0.0,
    atten_drop=0.0,
    mlp_drop=0.0,
    batch_size=16,
)
model = build_ft_cls(cfg)
rng = np.random.default_rng(0)
pts = rng.standard_normal((16, 64, 3)).astype(np.float32)
labels = rng.integers(0, 10, size=(16,)).astype(np.int32)

params, stats = init_variables(model, (jnp.asarray(pts[:2]),))
state, tx = create_state(cfg, params, stats)

mesh = make_mesh(8, model_axis=1)
state = place_state(state, mesh)
batch = shard_batch({"points": pts, "labels": labels}, mesh)

step = make_cls_step(cfg, model, tx)
key = jax.random.key(0)
for i in range(3):
    state, metrics = step(state, batch, 1e-3, key)
    print(f"step {i} loss {float(metrics['loss']):.6f}", flush=True)

# --- multi-controller save -> resume -> eval (VERDICT r2 item 5) ----------
# save_checkpoint gathers collectively on every process and writes on the
# chief only; the checkpoint must round-trip into a resumed step and a
# feature-extraction eval whose batch-sharded outputs span both processes.
from jax.experimental import multihost_utils

from vipformer_tpu.cli.common import collate_points_labels, extract_features
from vipformer_tpu.train import load_checkpoint, save_checkpoint

ckpt_dir = os.environ["VIPFORMER_MP_CKPT_DIR"]
ckpt = os.path.join(ckpt_dir, "mp_state.ckpt")
save_checkpoint(ckpt, state, metadata={"step": 3})
multihost_utils.sync_global_devices("ckpt written")
print(f"saved exists={os.path.exists(ckpt)}", flush=True)

restored = load_checkpoint(ckpt, template=jax.device_get(state))
restored = place_state(restored, mesh)
_, m_resumed = step(restored, batch, 1e-3, key)
state, m_cont = step(state, batch, 1e-3, key)
resumed, cont = float(m_resumed["loss"]), float(m_cont["loss"])
# the resumed step must bit-continue the in-memory trajectory
assert resumed == cont, (resumed, cont)
print(f"resume loss {resumed:.6f} cont {cont:.6f}", flush=True)


# probe-style eval: backbone features over sharded batches, allgathered
class _DS:
    def __len__(self):
        return 16

    def get(self, i, rng):
        return pts[i], int(labels[i])


def feats_fn(params, stats, pts_dev):
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    _, backbone = model.apply(variables, pts_dev, deterministic=True)
    return backbone


feats, out_labels = extract_features(
    feats_fn,
    state.params,
    state.batch_stats,
    _DS(),
    batch_size=8,
    mesh=mesh,
    collate=collate_points_labels,
)
assert feats.shape[0] == 16 and out_labels.shape == (16,), feats.shape
print(f"feats_sum {float(np.abs(feats).sum()):.4f}", flush=True)
print("worker done", flush=True)
