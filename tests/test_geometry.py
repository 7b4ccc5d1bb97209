"""Unit tests for geometry ops against plain-numpy oracles.

The reference has no tests at all (SURVEY.md §4); these pin the semantics of
every kernel the models depend on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipformer_tpu.ops import (
    divide_patches,
    farthest_point_sample,
    fps,
    index_points,
    knn,
    square_distance,
    three_nn_interpolate,
)


def np_square_distance(src, dst):
    return np.sum((src[:, :, None, :] - dst[:, None, :, :]) ** 2, axis=-1)


def test_square_distance_matches_numpy(rng):
    src = rng.standard_normal((2, 17, 3)).astype(np.float32)
    dst = rng.standard_normal((2, 9, 3)).astype(np.float32)
    got = np.asarray(square_distance(jnp.asarray(src), jnp.asarray(dst)))
    want = np_square_distance(src, dst)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_index_points(rng):
    pts = rng.standard_normal((3, 10, 4)).astype(np.float32)
    idx = rng.integers(0, 10, size=(3, 5)).astype(np.int32)
    got = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx)))
    want = np.stack([pts[b][idx[b]] for b in range(3)])
    np.testing.assert_allclose(got, want)


def test_index_points_3d_idx(rng):
    pts = rng.standard_normal((2, 12, 3)).astype(np.float32)
    idx = rng.integers(0, 12, size=(2, 4, 6)).astype(np.int32)
    got = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx)))
    assert got.shape == (2, 4, 6, 3)
    want = np.stack([pts[b][idx[b].reshape(-1)].reshape(4, 6, 3) for b in range(2)])
    np.testing.assert_allclose(got, want)


def test_knn_matches_numpy(rng):
    pts = rng.standard_normal((2, 50, 3)).astype(np.float32)
    q = rng.standard_normal((2, 7, 3)).astype(np.float32)
    k = 5
    got = np.asarray(knn(k, jnp.asarray(pts), jnp.asarray(q)))
    d = np_square_distance(q, pts)
    want = np.argsort(d, axis=-1)[..., :k]
    # compare as sets per query (ties can reorder)
    for b in range(2):
        for i in range(7):
            assert set(got[b, i].tolist()) == set(want[b, i].tolist())


def test_fps_first_index_and_coverage(rng):
    pts = rng.standard_normal((2, 64, 3)).astype(np.float32)
    idx = np.asarray(farthest_point_sample(jnp.asarray(pts), 16))
    assert idx.shape == (2, 16)
    # deterministic start at 0 when no key given
    assert (idx[:, 0] == 0).all()
    # all indices distinct (FPS never revisits a selected point for n < N)
    for b in range(2):
        assert len(set(idx[b].tolist())) == 16


def np_fps(pts, npoint, start):
    """Direct transcription of the FPS recurrence as a numpy oracle."""
    N = pts.shape[0]
    dist = np.full((N,), 1e10)
    far = start
    out = []
    for _ in range(npoint):
        out.append(far)
        d = np.sum((pts[:, :3] - pts[far, :3]) ** 2, axis=-1)
        dist = np.minimum(dist, d)
        far = int(np.argmax(dist))
    return np.array(out)


def test_fps_matches_oracle(rng):
    pts = rng.standard_normal((1, 40, 3)).astype(np.float32)
    got = np.asarray(farthest_point_sample(jnp.asarray(pts), 10))[0]
    want = np_fps(pts[0], 10, start=0)
    np.testing.assert_array_equal(got, want)


def test_fps_random_start(key, rng):
    pts = rng.standard_normal((4, 32, 3)).astype(np.float32)
    idx = np.asarray(farthest_point_sample(jnp.asarray(pts), 8, key))
    # random starts should not all be zero
    assert not (idx[:, 0] == 0).all()


def test_fps_extra_channels_ignored(rng):
    xyz = rng.standard_normal((2, 30, 3)).astype(np.float32)
    rgb = rng.standard_normal((2, 30, 3)).astype(np.float32)
    a = np.asarray(farthest_point_sample(jnp.asarray(xyz), 8))
    b = np.asarray(
        farthest_point_sample(jnp.asarray(np.concatenate([xyz, rgb], -1)), 8)
    )
    np.testing.assert_array_equal(a, b)


def test_fps_points_shape(rng):
    pts = rng.standard_normal((2, 64, 6)).astype(np.float32)
    sampled = fps(jnp.asarray(pts), 12)
    assert sampled.shape == (2, 12, 6)


def test_divide_patches_shapes_and_centering(rng):
    pts = rng.standard_normal((2, 128, 3)).astype(np.float32)
    neighbors, centers = divide_patches(jnp.asarray(pts), 16, 8)
    assert neighbors.shape == (2, 16, 8, 3)
    assert centers.shape == (2, 16, 3)
    neighbors = np.asarray(neighbors)
    centers = np.asarray(centers)
    # every patch contains its own center (distance 0 after normalization)
    mins = np.min(np.sum(neighbors**2, axis=-1), axis=-1)
    np.testing.assert_allclose(mins, 0.0, atol=1e-5)
    # un-centered neighbors must be actual input points
    restored = neighbors + centers[:, :, None, :]
    for b in range(2):
        d = np_square_distance(
            restored[b].reshape(1, -1, 3), pts[b : b + 1]
        ).min(axis=-1)
        np.testing.assert_allclose(d, 0.0, atol=1e-4)


def test_divide_patches_extra_channels(rng):
    """xyz centered, extra channels passed through untouched (documented
    intent of the reference, see ops/geometry.py docstring)."""
    xyz = rng.standard_normal((1, 64, 3)).astype(np.float32)
    rgb = rng.uniform(size=(1, 64, 3)).astype(np.float32)
    pts = np.concatenate([xyz, rgb], axis=-1)
    neighbors, centers = divide_patches(jnp.asarray(pts), 8, 4)
    neighbors = np.asarray(neighbors)
    # rgb channels of each neighbor must be one of the input rgb rows
    flat = neighbors[..., 3:].reshape(-1, 3)
    for row in flat:
        assert np.min(np.sum((rgb[0] - row) ** 2, axis=-1)) < 1e-10


def test_three_nn_interpolate_exact_at_sources(rng):
    xyz_src = rng.standard_normal((1, 10, 3)).astype(np.float32)
    feats = rng.standard_normal((1, 10, 5)).astype(np.float32)
    # query exactly at the sources -> weight collapses onto the source point
    out = np.asarray(
        three_nn_interpolate(
            jnp.asarray(xyz_src), jnp.asarray(xyz_src), jnp.asarray(feats)
        )
    )
    np.testing.assert_allclose(out, feats, atol=1e-3)


def test_three_nn_interpolate_oracle(rng):
    xyz_dst = rng.standard_normal((1, 20, 3)).astype(np.float32)
    xyz_src = rng.standard_normal((1, 6, 3)).astype(np.float32)
    feats = rng.standard_normal((1, 6, 4)).astype(np.float32)
    out = np.asarray(
        three_nn_interpolate(
            jnp.asarray(xyz_dst), jnp.asarray(xyz_src), jnp.asarray(feats)
        )
    )
    d = np_square_distance(xyz_dst, xyz_src)[0]
    idx = np.argsort(d, axis=-1)[:, :3]
    want = np.zeros((20, 4))
    for i in range(20):
        dd = d[i, idx[i]]
        w = 1.0 / (dd + 1e-8)
        w = w / w.sum()
        want[i] = (feats[0][idx[i]] * w[:, None]).sum(0)
    np.testing.assert_allclose(out[0], want, atol=1e-3)


def test_ops_jit_and_grad(rng):
    """Kernels must compose under jit+grad (they sit inside the train step)."""
    pts = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))

    @jax.jit
    def f(p):
        n, c = divide_patches(p, 8, 4)
        return jnp.sum(n**2) + jnp.sum(c**2)

    g = jax.grad(f)(pts)
    assert g.shape == pts.shape
    assert np.isfinite(np.asarray(g)).all()


def test_knn_packed_matches_exact(rng):
    """Packed-key kNN (single-operand sort) must agree with exact top_k on
    generic point sets (see knn docstring for the tie-regime deviation)."""
    pts = jnp.asarray(rng.standard_normal((4, 256, 3)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((4, 32, 3)).astype(np.float32))
    a = np.asarray(knn(16, pts, q, method="exact"))
    b = np.asarray(knn(16, pts, q, method="packed"))
    np.testing.assert_array_equal(a, b)


def test_knn_packed_duplicate_points(rng):
    """Duplicated points (exact distance ties) resolve by ascending index,
    deterministically."""
    base = rng.standard_normal((1, 8, 3)).astype(np.float32)
    pts = jnp.asarray(np.concatenate([base, base], axis=1))  # every point twice
    q = jnp.asarray(base[:, :2])
    b = np.asarray(knn(4, pts, q, method="packed"))
    for j in range(2):
        got = set(b[0, j].tolist())
        assert j in got and j + 8 in got  # both copies of the query point
