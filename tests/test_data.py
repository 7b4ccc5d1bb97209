"""Data layer tests: PLY round-trip, augmentation properties, dataset shapes,
loader determinism."""

import numpy as np
import pytest

from vipformer_tpu.data import (
    Loader,
    ModelNet40SVM,
    S3DIS,
    ScanObjectNNSVM,
    ShapeNetPart,
    ShapeNetRender,
    collate_cls,
    collate_partseg,
    collate_pretrain,
    load_ply,
    pad_batch,
    save_ply,
)
from vipformer_tpu.data import augment


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    p = str(tmp_path / "x.ply")
    save_ply(p, pts)
    back = load_ply(p)
    np.testing.assert_allclose(back, pts, rtol=1e-6)


def test_ply_ascii(tmp_path):
    p = tmp_path / "a.ply"
    p.write_text(
        "ply\nformat ascii 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n0 1 2\n3 4 5\n"
    )
    out = load_ply(str(p))
    np.testing.assert_allclose(out, [[0, 1, 2], [3, 4, 5]])


# --- augmentation properties -------------------------------------------------


def test_normalize_unit_sphere(rng):
    pts = (rng.standard_normal((200, 3)) * 5 + 3).astype(np.float32)
    out = augment.normalize_unit_sphere(pts)
    np.testing.assert_allclose(out.mean(0), 0, atol=1e-5)
    assert abs(np.max(np.linalg.norm(out, axis=1)) - 1.0) < 1e-5


def test_rotate_preserves_norms(rng):
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    out = augment.random_rotate(pts, np.random.default_rng(0))
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=1), np.linalg.norm(pts, axis=1), atol=1e-4
    )


def test_rotate_y_axis_preserves_y(rng):
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    out = augment.random_rotate(pts, np.random.default_rng(0))
    np.testing.assert_allclose(out[:, 1], pts[:, 1], atol=1e-5)


def test_jitter_bounded(rng):
    pts = np.zeros((100, 3), dtype=np.float32)
    out = augment.random_jitter(pts, np.random.default_rng(0))
    assert np.abs(out).max() <= 0.05 + 1e-6


def test_input_dropout_keeps_shape_and_substitutes_first(rng):
    pts = rng.standard_normal((128, 3)).astype(np.float32)
    out = augment.random_input_dropout(pts, np.random.default_rng(3))
    assert out.shape == pts.shape
    changed = ~np.all(out == pts, axis=1)
    assert np.all(out[changed] == pts[0])


def test_augment_determinism(rng):
    pts = rng.standard_normal((64, 3)).astype(np.float32)
    a = augment.pretrain_transform(pts, np.random.default_rng(42))
    b = augment.pretrain_transform(pts, np.random.default_rng(42))
    np.testing.assert_array_equal(a, b)
    c = augment.pretrain_transform(pts, np.random.default_rng(43))
    assert not np.array_equal(a, c)


def test_image_transform_shapes(rng):
    img = (rng.uniform(size=(137, 137, 3)) * 255).astype(np.uint8)
    out = augment.image_transform(img, np.random.default_rng(0), 144, 144)
    assert out.shape == (144, 144, 3)
    assert out.dtype == np.float32


def test_scale_and_translate_batch(rng):
    pts = rng.standard_normal((4, 32, 3)).astype(np.float32)
    out = augment.scale_and_translate_batch(pts, np.random.default_rng(0))
    assert out.shape == pts.shape
    assert not np.allclose(out, pts)


# --- datasets (synthetic fallback) ------------------------------------------


def test_modelnet_synthetic(tmp_path):
    ds = ModelNet40SVM(str(tmp_path), "train", num_points=256)
    pts, label = ds.get(0)
    assert pts.shape == (256, 3)
    assert 0 <= label < 40


def test_shapenet_render_synthetic(tmp_path):
    ds = ShapeNetRender(str(tmp_path), img_height=48, img_width=48,
                        num_points=128, synthetic_size=8)
    t1, t2, img = ds.get(0, np.random.default_rng(0))
    assert t1.shape == (128, 3) and t2.shape == (128, 3)
    assert img.shape == (48, 48, 3)
    assert not np.allclose(t1, t2)  # independent augmentation chains


def test_shapenet_part_synthetic(tmp_path):
    ds = ShapeNetPart(str(tmp_path), "trainval", num_points=256)
    pts, label, seg = ds.get(0, np.random.default_rng(0))
    assert pts.shape == (256, 3) and seg.shape == (256,)
    lo = ShapeNetPart.INDEX_START[label]
    hi = lo + ShapeNetPart.SEG_NUM[label]
    assert seg.min() >= lo and seg.max() < hi


def test_shapenet_part_class_choice(tmp_path):
    ds = ShapeNetPart(str(tmp_path), "trainval", num_points=128,
                      class_choice="chair")
    assert ds.seg_num_all == 4 and ds.seg_start_index == 12
    for i in range(min(4, len(ds))):
        _, label, _ = ds.get(i, np.random.default_rng(i))
        assert label == 4


def test_s3dis_synthetic(tmp_path):
    ds = S3DIS(str(tmp_path), "train")
    pts, seg = ds.get(0)
    assert pts.shape == (4096, 9) and seg.shape == (4096,)
    assert seg.max() < 13


# --- loader -----------------------------------------------------------------


def test_loader_epoch_determinism(tmp_path):
    ds = ModelNet40SVM(str(tmp_path), "train", num_points=64)
    loader = Loader(ds, 16, collate_cls, shuffle=True, seed=0, drop_last=True)
    loader.set_epoch(0)
    b0 = next(iter(loader))
    loader2 = Loader(ds, 16, collate_cls, shuffle=True, seed=0, drop_last=True)
    loader2.set_epoch(0)
    b1 = next(iter(loader2))
    np.testing.assert_array_equal(b0["points"], b1["points"])
    loader2.set_epoch(1)
    b2 = next(iter(loader2))
    assert not np.array_equal(b0["points"], b2["points"])


def test_loader_workers_match_inline(tmp_path):
    ds = ShapeNetPart(str(tmp_path), "trainval", num_points=64)
    a = next(iter(Loader(ds, 8, collate_partseg, seed=5)))
    b = next(iter(Loader(ds, 8, collate_partseg, seed=5, num_workers=4)))
    np.testing.assert_array_equal(a["points"], b["points"])
    np.testing.assert_array_equal(a["seg"], b["seg"])
    # process-pool workers produce the same deterministic batches too
    c = next(
        iter(
            Loader(
                ds, 8, collate_partseg, seed=5, num_workers=2,
                worker_backend="process",
            )
        )
    )
    np.testing.assert_array_equal(a["points"], c["points"])
    np.testing.assert_array_equal(a["seg"], c["seg"])


def test_pretrain_loader_shapes(tmp_path):
    ds = ShapeNetRender(str(tmp_path), img_height=48, img_width=48,
                        num_points=128, synthetic_size=10)
    batch = next(iter(Loader(ds, 4, collate_pretrain, shuffle=True)))
    assert batch["pc_t1"].shape == (4, 128, 3)
    assert batch["imgs"].shape == (4, 48, 48, 3)


def test_pad_batch():
    batch = {"x": np.arange(10).reshape(5, 2)}
    padded, mask = pad_batch(batch, 8)
    assert padded["x"].shape == (8, 2)
    assert mask.sum() == 5
    np.testing.assert_array_equal(padded["x"][5:], np.tile(batch["x"][-1:], (3, 1)))


def test_rotate_perturbation_small_angles(rng):
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    out = augment.random_rotate_perturbation(pts, np.random.default_rng(0))
    # small perturbation: points move, norms preserved
    assert not np.allclose(out, pts)
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=1), np.linalg.norm(pts, axis=1), atol=1e-4
    )


def test_remove_invalid():
    # reference semantics (data_utils.py:224-232): drop rows whose channel
    # SUM equals the invalid value — both zero-sum rows go
    pts = np.array([[1, 1, 1], [0, 0, 0], [2, -1, -1]], dtype=np.float32)
    out = augment.remove_invalid(pts)
    assert len(out) == 1
    np.testing.assert_array_equal(out[0], [1, 1, 1])


def test_random_crop_bounds(rng):
    pts = rng.uniform(-1, 1, (5000, 3)).astype(np.float32)
    out = augment.random_crop(pts, np.random.default_rng(1),
                              min_num_points=1000)
    assert 1000 <= len(out) <= len(pts)


def test_random_cutout_removes_points(rng):
    pts = rng.uniform(-1, 1, (5000, 3)).astype(np.float32)
    out = augment.random_cutout(pts, np.random.default_rng(1),
                                min_num_points=1000)
    assert 1000 <= len(out) < len(pts)


def test_upsample_pads_to_target(rng):
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    out = augment.upsample(pts, np.random.default_rng(0), 256)
    assert out.shape == (256, 3)
    np.testing.assert_array_equal(out[:100], pts)  # originals kept


def test_random_sample(rng):
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    out = augment.random_sample(pts, np.random.default_rng(0), 32)
    assert out.shape == (32, 3)
    # every sampled point is an input point
    for row in out:
        assert np.min(np.sum((pts - row) ** 2, axis=1)) < 1e-12


def test_loader_len_semantics(tmp_path):
    ds = ModelNet40SVM(str(tmp_path), "test", num_points=32)  # 200 samples
    assert len(Loader(ds, 64, collate_cls, drop_last=True)) == 3
    assert len(Loader(ds, 64, collate_cls, drop_last=False)) == 4
    batches = list(Loader(ds, 64, collate_cls, drop_last=False))
    assert len(batches) == 4
    assert len(batches[-1]["points"]) == 200 - 3 * 64
