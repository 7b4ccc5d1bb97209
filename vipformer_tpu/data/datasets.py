"""Dataset readers with configurable roots and synthetic fallbacks.

Reference equivalents: `datasets/data.py`, `datasets/shapenet_part.py`,
`datasets/s3dis.py` — there the roots are hard-coded to a private mount;
here every reader takes `data_dir` and, when the real files are absent and
`synthetic=True`, generates a deterministic synthetic stand-in
(data/synthetic.py) of the same shapes so every pipeline runs end-to-end.

Readers are plain array-backed containers (`__len__` / `get(i, rng)`);
batching/shuffling/prefetch live in data/pipeline.py — there is no torch
DataLoader anywhere in this framework.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np

from vipformer_tpu.data import augment, synthetic
from vipformer_tpu.data.ply import load_ply


def _load_h5_concat(paths, keys):
    import h5py

    out = {k: [] for k in keys}
    for p in sorted(paths):
        with h5py.File(p, "r") as f:
            for k in keys:
                out[k].append(np.asarray(f[k][:]))
    return tuple(np.concatenate(out[k], axis=0) for k in keys)


class ModelNet40SVM:
    """ModelNet40 HDF5 classification set (reference `data.py:120-132`)."""

    num_classes = 40

    def __init__(self, data_dir, partition="train", num_points=1024,
                 synthetic_ok=True):
        paths = glob.glob(
            os.path.join(
                data_dir, "modelnet40_ply_hdf5_2048", f"ply_data_{partition}*.h5"
            )
        )
        if paths:
            self.data, self.label = _load_h5_concat(paths, ["data", "label"])
            self.label = self.label.reshape(-1).astype(np.int64)
        elif synthetic_ok:
            n = 800 if partition == "train" else 200
            self.data, self.label = synthetic.synthetic_classification(
                n, 2048, self.num_classes, seed=0 if partition == "train" else 1
            )
        else:
            raise FileNotFoundError(f"ModelNet40 not found under {data_dir}")
        self.num_points = num_points

    def __len__(self):
        return len(self.data)

    def get(self, i, rng=None):
        return self.data[i][: self.num_points].astype(np.float32), int(
            self.label[i]
        )


class ScanObjectNNSVM:
    """ScanObjectNN main_split classification set (reference `data.py:134-146`)."""

    num_classes = 15

    def __init__(self, data_dir, partition="train", num_points=1024,
                 synthetic_ok=True):
        path = os.path.join(data_dir, "ScanObjectNN", "main_split",
                            f"{partition}.h5")
        if os.path.exists(path):
            self.data, self.label = _load_h5_concat([path], ["data", "label"])
            self.label = self.label.reshape(-1).astype(np.int64)
        elif synthetic_ok:
            n = 600 if partition == "train" else 150
            self.data, self.label = synthetic.synthetic_classification(
                n, 2048, self.num_classes, seed=2 if partition == "train" else 3
            )
        else:
            raise FileNotFoundError(f"ScanObjectNN not found under {data_dir}")
        self.num_points = num_points

    def __len__(self):
        return len(self.data)

    def get(self, i, rng=None):
        return self.data[i][: self.num_points].astype(np.float32), int(
            self.label[i]
        )


class ShapeNetRender:
    """Pretraining pairs: two augmented views of a ShapeNet cloud + one
    random rendered view (reference `data.py:92-118`).

    Real layout: <data_dir>/ShapeNet/<cls>/<id>.ply and
    <data_dir>/ShapeNetRendering/<cls>/<id>/rendering/*.png.
    """

    def __init__(self, data_dir, img_height=144, img_width=144,
                 num_points=2048, synthetic_ok=True, synthetic_size=512,
                 raw_views=False):
        self.img_height, self.img_width = img_height, img_width
        self.num_points = num_points
        # raw_views=True ships the un-augmented cloud once; the two
        # augmentation chains then run on-device (data/augment_device.py)
        self.raw_views = raw_views
        self.paths = sorted(
            glob.glob(os.path.join(data_dir, "ShapeNet", "*", "*"))
        )
        self.synthetic = not self.paths
        if self.synthetic:
            if not synthetic_ok:
                raise FileNotFoundError(f"ShapeNet not found under {data_dir}")
            self._data, self._labels = synthetic.synthetic_classification(
                synthetic_size, num_points, 16, seed=7
            )

    def __len__(self):
        return len(self.paths) if not self.synthetic else len(self._data)

    def _render_paths(self, pcd_path):
        parts = pcd_path.split(os.sep)
        parts[-3] = "ShapeNetRendering"
        parts[-1] = os.path.splitext(parts[-1])[0]
        d = os.sep.join(parts + ["rendering"])
        return glob.glob(os.path.join(d, "*.png"))

    def get(self, i, rng: np.random.Generator):
        if self.synthetic:
            raw = self._data[i]
            img = synthetic.splat_image(raw)
        else:
            raw = load_ply(self.paths[i])
            imgs = self._render_paths(self.paths[i])
            if imgs:
                from PIL import Image

                img = np.asarray(
                    Image.open(imgs[rng.integers(len(imgs))]).convert("RGB")
                )
            else:
                img = synthetic.splat_image(raw)
        if len(raw) >= self.num_points:
            raw = raw[: self.num_points]
        else:
            pad = rng.integers(0, len(raw), self.num_points - len(raw))
            raw = np.concatenate([raw, raw[pad]], axis=0)
        if self.raw_views:
            # device_augs mode: the host only decodes and uint8-resizes
            # (static shape); the jitter/flip/normalize chain runs inside
            # the train step (data/augment_device.py:image_pretrain_chain)
            from PIL import Image

            u8 = np.asarray(img, dtype=np.uint8)
            if u8.shape[:2] != (self.img_height, self.img_width):
                u8 = np.asarray(
                    Image.fromarray(u8).resize(
                        (self.img_width, self.img_height), Image.BILINEAR
                    )
                )
            return raw.astype(np.float32), u8
        im = augment.image_transform(img, rng, self.img_height, self.img_width)
        t1 = augment.pretrain_transform(raw, rng)
        t2 = augment.pretrain_transform(raw, rng)
        return t1, t2, im


class ShapeNetPart:
    """ShapeNetPart HDF5 part-segmentation set
    (reference `shapenet_part.py:71-108`)."""

    CAT2ID = {
        "airplane": 0, "bag": 1, "cap": 2, "car": 3, "chair": 4,
        "earphone": 5, "guitar": 6, "knife": 7, "lamp": 8, "laptop": 9,
        "motor": 10, "mug": 11, "pistol": 12, "rocket": 13,
        "skateboard": 14, "table": 15,
    }
    SEG_NUM = synthetic.SEG_NUM
    INDEX_START = synthetic.INDEX_START

    def __init__(self, data_dir, partition="train", num_points=1024,
                 class_choice: Optional[str] = None, synthetic_ok=True):
        root = os.path.join(data_dir, "shapenet_part_seg_hdf5_data")
        if partition == "trainval":
            paths = glob.glob(os.path.join(root, "*train*.h5")) + glob.glob(
                os.path.join(root, "*val*.h5")
            )
        else:
            paths = glob.glob(os.path.join(root, f"*{partition}*.h5"))
        if paths:
            self.data, self.label, self.seg = _load_h5_concat(
                paths, ["data", "label", "pid"]
            )
            self.label = self.label.astype(np.int64)
        elif synthetic_ok:
            n = 400 if partition == "trainval" else 120
            self.data, self.label, self.seg = synthetic.synthetic_partseg(
                n, 2048, seed=4 if partition == "trainval" else 5
            )
        else:
            raise FileNotFoundError(f"ShapeNetPart not found under {data_dir}")
        self.partition = partition
        self.num_points = num_points
        self.class_choice = class_choice.lower() if class_choice else None
        if self.class_choice is not None:
            cid = self.CAT2ID[self.class_choice]
            sel = (self.label == cid).reshape(-1)
            self.data, self.label, self.seg = (
                self.data[sel], self.label[sel], self.seg[sel]
            )
            self.seg_num_all = self.SEG_NUM[cid]
            self.seg_start_index = self.INDEX_START[cid]
        else:
            self.seg_num_all = 50
            self.seg_start_index = 0

    def __len__(self):
        return len(self.data)

    def get(self, i, rng: Optional[np.random.Generator] = None):
        pts = self.data[i][: self.num_points]
        seg = self.seg[i][: self.num_points]
        if self.partition == "trainval" and rng is not None:
            # per-sample point-order shuffle (shapenet_part.py:100-104)
            idx = rng.permutation(len(pts))
            pts, seg = pts[idx], seg[idx]
        return (
            pts.astype(np.float32),
            int(np.asarray(self.label[i]).reshape(-1)[0]),
            seg.astype(np.int64),
        )


class S3DIS:
    """S3DIS chopped-scene semantic-segmentation blocks with Area-k holdout
    (reference `s3dis.py:5-56`)."""

    num_classes = 13

    def __init__(self, data_dir, split="train", test_area=5,
                 synthetic_ok=True):
        root = os.path.join(data_dir, "indoor3d_sem_seg_hdf5_data")
        listing = os.path.join(root, "all_files.txt")
        if os.path.exists(listing):
            import h5py

            files = [l.strip() for l in open(listing)]
            rooms = [l.strip() for l in open(
                os.path.join(root, "room_filelist.txt"))]
            data, label = [], []
            for fn in files:
                with h5py.File(os.path.join(root, os.path.basename(fn)),
                               "r") as f:
                    data.append(f["data"][:])
                    label.append(f["label"][:])
            data = np.concatenate(data, 0)
            label = np.concatenate(label, 0)
            area = f"Area_{test_area}"
            test_idx = [i for i, r in enumerate(rooms) if area in r]
            train_idx = [i for i, r in enumerate(rooms) if area not in r]
            idx = train_idx if split == "train" else test_idx
            self.data = data[idx]
            self.label = label[idx].astype(np.int64)
        elif synthetic_ok:
            n = 200 if split == "train" else 60
            self.data, self.label = synthetic.synthetic_semseg(
                n, 4096, seed=6 if split == "train" else 8
            )
        else:
            raise FileNotFoundError(f"S3DIS not found under {data_dir}")

    def __len__(self):
        return len(self.data)

    def get(self, i, rng=None):
        return self.data[i].astype(np.float32), self.label[i].astype(np.int64)
