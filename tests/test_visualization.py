"""C++ renderer tests (built on demand; skipped if no g++)."""

import os
import shutil
import subprocess

import numpy as np
import pytest

BASE = os.path.join(os.path.dirname(__file__), "..", "tools", "visualization")


@pytest.fixture(scope="module")
def renderer():
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    so = os.path.join(BASE, "render_balls.so")
    if not os.path.exists(so):
        subprocess.check_call(["sh", os.path.join(BASE, "build_render_balls.sh")])
    import sys

    sys.path.insert(0, BASE)
    from show_balls import BallRenderer

    return BallRenderer(size=128, ballradius=4)


def test_render_produces_pixels(renderer, rng):
    xyz = rng.standard_normal((200, 3)).astype(np.float32)
    colors = np.full((200, 3), 255.0, dtype=np.float32)
    img = renderer.render(xyz, colors)
    assert img.shape == (128, 128, 3)
    assert img.max() > 0  # something was drawn
    assert (img > 0).sum() > 100


def test_render_depth_test(renderer):
    # two points at the same screen position: the nearer one (larger z after
    # projection) must win the z-buffer
    xyz = np.array([[0, 0, -0.5], [0, 0, 0.5]], dtype=np.float32)
    red = np.array([[255, 0, 0], [0, 0, 0]], dtype=np.float32)
    green = np.array([[0, 0, 0], [255, 0, 0]], dtype=np.float32)
    # color channel c0 feeds the green output channel (reference quirk)
    img_front = renderer.render(xyz, green)
    center = img_front[60:68, 60:68]
    assert center[..., 1].max() > 0  # front point's color visible
    img_back = renderer.render(xyz, red)
    assert img_back[60:68, 60:68][..., 1].max() == 0


def test_render_rotation_changes_image(renderer, rng):
    xyz = rng.standard_normal((300, 3)).astype(np.float32)
    colors = np.full((300, 3), 200.0, dtype=np.float32)
    a = renderer.render(xyz, colors, rot_x=0.0)
    b = renderer.render(xyz, colors, rot_x=1.0)
    assert not np.array_equal(a, b)
