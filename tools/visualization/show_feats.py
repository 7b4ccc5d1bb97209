"""t-SNE visualization of backbone features (reference `show_feats.ipynb`).

Extracts backbone features for a classification split with a (pretrained or
finetuned) point model, embeds them with t-SNE, and writes a scatter plot
colored by class.

Usage:
  python show_feats.py --ckpt runs/<...>/pc_model_best.ckpt \
      --dataset ModelNet40 --out tsne.png
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

BASE_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(BASE_DIR, "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="data")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--dataset", default="ModelNet40",
                    choices=["ModelNet40", "ScanObjectNN"])
    ap.add_argument("--split", default="test")
    ap.add_argument("--num_points", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--out", default="tsne.png")
    ap.add_argument("--max_samples", type=int, default=2000)
    ap.add_argument(
        "--feats_file",
        default=None,
        help="npz produced by a CLI run with --dump_feats "
        "(<run>/files/{pt,ft}_test_feats_labels.npz); skips the "
        "model+dataset pass entirely (reference show_feats.ipynb flow)",
    )
    args = ap.parse_args()

    if args.feats_file:
        blob = np.load(args.feats_file)
        _plot(
            blob["feats"][: args.max_samples],
            blob["labels"][: args.max_samples],
            f"{os.path.basename(args.feats_file)} (t-SNE)",
            args.out,
        )
        return

    import jax.numpy as jnp
    from vipformer_tpu.cli.common import collate_points_labels
    from vipformer_tpu.config import Config, decode_arch_name
    from vipformer_tpu.data import Loader, ModelNet40SVM, ScanObjectNNSVM, pad_batch
    from vipformer_tpu.models import build_pc_model
    from vipformer_tpu.train import init_variables, load_checkpoint, make_feats_fn

    ds_cls = {"ModelNet40": ModelNet40SVM, "ScanObjectNN": ScanObjectNNSVM}[
        args.dataset
    ]
    ds = ds_cls(args.data_dir, args.split, args.num_points)

    cfg = Config(compute_dtype="float32",
                 **decode_arch_name("E1CL8SL-H4D256-L128-MR2"))
    model = build_pc_model(cfg)
    pts0, _ = ds.get(0)
    params, stats = init_variables(model, (jnp.asarray(pts0[None]),))
    if args.ckpt:
        from flax import serialization

        raw = load_checkpoint(args.ckpt)
        pre = raw["params"]["pc"] if "params" in raw else raw
        params = serialization.from_state_dict(params, pre)
        if "batch_stats" in raw:
            stats = serialization.from_state_dict(
                stats, raw["batch_stats"]["pc"]
            )

    feats_fn = make_feats_fn(model)
    loader = Loader(ds, args.batch, collate_points_labels, shuffle=False)
    feats, labels = [], []
    for batch in loader:
        batch, mask = pad_batch(batch, args.batch)
        out = np.asarray(
            feats_fn(params, stats, jnp.asarray(batch["points"]))
        )
        feats.append(out[mask])
        labels.append(batch["labels"][mask])
        if sum(len(f) for f in feats) >= args.max_samples:
            break
    feats = np.concatenate(feats)[: args.max_samples]
    labels = np.concatenate(labels)[: args.max_samples]
    _plot(
        feats,
        labels,
        f"{args.dataset} {args.split} backbone features (t-SNE)",
        args.out,
    )


def _plot(feats, labels, title, out):
    from sklearn.manifold import TSNE

    perplexity = min(30, max(2, len(feats) // 4))
    emb = TSNE(
        n_components=2, init="pca", perplexity=perplexity
    ).fit_transform(np.asarray(feats))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(8, 8))
    plt.scatter(emb[:, 0], emb[:, 1], c=labels, cmap="tab20", s=6, alpha=0.8)
    plt.axis("off")
    plt.title(title)
    plt.savefig(out, dpi=150, bbox_inches="tight")
    print(f"wrote {out} ({len(feats)} samples)")


if __name__ == "__main__":
    main()
