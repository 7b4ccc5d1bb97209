"""Interactive part-segmentation viewer.

Equivalent of the reference's `visualization/show_balls.py`: renders a
point cloud through the C++ `render_balls.so` rasterizer (ctypes), with
mouse rotate/zoom, ground-truth vs prediction color toggles, and screenshot
save. Works headless too (`--out image.png` renders without a window).

Usage:
  ./build_render_balls.sh
  python show_balls.py --ckpt runs/<proj>/<exp>/models/model_best.ckpt \
      [--sample 0] [--out shot.png]
With no checkpoint it renders a synthetic ShapeNetPart sample's ground
truth.
"""

from __future__ import annotations

import argparse
import ctypes as ct
import os
import sys

import numpy as np

BASE_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(BASE_DIR, "..", ".."))

PART_COLORS = (
    np.array(
        [
            [65, 105, 225], [220, 20, 60], [34, 139, 34], [255, 165, 0],
            [138, 43, 226], [0, 206, 209], [255, 105, 180], [154, 205, 50],
            [255, 69, 0], [72, 61, 139], [0, 128, 128], [210, 105, 30],
            [188, 143, 143], [46, 139, 87], [218, 165, 32], [199, 21, 133],
            [30, 144, 255], [178, 34, 34], [85, 107, 47], [255, 140, 0],
            [147, 112, 219], [64, 224, 208], [219, 112, 147], [107, 142, 35],
            [205, 92, 92], [106, 90, 205], [32, 178, 170], [160, 82, 45],
            [205, 133, 63], [60, 179, 113], [184, 134, 11], [216, 112, 147],
            [70, 130, 180], [165, 42, 42], [128, 128, 0], [255, 99, 71],
            [123, 104, 238], [0, 139, 139], [255, 182, 193], [173, 255, 47],
            [233, 150, 122], [72, 209, 204], [250, 128, 114], [143, 188, 143],
            [244, 164, 96], [95, 158, 160], [255, 215, 0], [221, 160, 221],
            [100, 149, 237], [250, 235, 215],
        ],
        dtype=np.float32,
    )
)


def load_renderer():
    path = os.path.join(BASE_DIR, "render_balls.so")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} missing - run build_render_balls.sh first"
        )
    return np.ctypeslib.load_library("render_balls", BASE_DIR)


class BallRenderer:
    def __init__(self, size: int = 800, ballradius: int = 10):
        self.dll = load_renderer()
        self.size = size
        self.ballradius = ballradius

    def render(
        self,
        xyz: np.ndarray,
        colors: np.ndarray,
        rot_x: float = 0.0,
        rot_y: float = 0.0,
        zoom: float = 1.0,
        background=(0, 0, 0),
    ) -> np.ndarray:
        pts = xyz - xyz.mean(axis=0)
        radius = np.max(np.linalg.norm(pts, axis=1)) + 1e-9
        pts = pts / radius

        cx, sx = np.cos(rot_x), np.sin(rot_x)
        cy, sy = np.cos(rot_y), np.sin(rot_y)
        rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], np.float32)
        ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32)
        pts = pts @ (ry @ rx).T

        half = self.size / 2.0
        scale = half * 0.7 * zoom
        ixyz = np.empty((len(pts), 3), dtype=np.int32)
        ixyz[:, 0] = (pts[:, 1] * scale + half).astype(np.int32)
        ixyz[:, 1] = (pts[:, 0] * scale + half).astype(np.int32)
        ixyz[:, 2] = (pts[:, 2] * scale).astype(np.int32)

        show = np.zeros((self.size, self.size, 3), dtype=np.uint8)
        show[:] = np.asarray(background, dtype=np.uint8)
        c0 = np.ascontiguousarray(colors[:, 0], dtype=np.float32)
        c1 = np.ascontiguousarray(colors[:, 1], dtype=np.float32)
        c2 = np.ascontiguousarray(colors[:, 2], dtype=np.float32)
        self.dll.render_ball(
            ct.c_int(self.size),
            ct.c_int(self.size),
            show.ctypes.data_as(ct.c_void_p),
            ct.c_int(len(ixyz)),
            np.ascontiguousarray(ixyz).ctypes.data_as(ct.c_void_p),
            c0.ctypes.data_as(ct.c_void_p),
            c1.ctypes.data_as(ct.c_void_p),
            c2.ctypes.data_as(ct.c_void_p),
            ct.c_int(self.ballradius),
        )
        return show


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="data")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--sample", type=int, default=0)
    ap.add_argument("--num_points", type=int, default=1024)
    ap.add_argument("--ballradius", type=int, default=10)
    ap.add_argument("--out", default=None, help="render to file, no window")
    args = ap.parse_args()

    from vipformer_tpu.data import ShapeNetPart

    ds = ShapeNetPart(args.data_dir, "test", args.num_points)
    pts, obj_label, seg = ds.get(args.sample, np.random.default_rng(0))

    pred = seg
    if args.ckpt:
        import jax, jax.numpy as jnp
        from vipformer_tpu.config import Config
        from vipformer_tpu.models import build_ft_partseg
        from vipformer_tpu.train import (
            init_variables, load_checkpoint, make_partseg_eval,
        )

        cfg = Config(
            compute_dtype="float32", num_sa_layers=12, layer_idx=(2, 6, 10),
            max_dpr=0.1, atten_drop=0.0, mlp_drop=0.0,
        )
        model = build_ft_partseg(cfg)
        params, stats = init_variables(
            model, (jnp.asarray(pts[None]), jnp.zeros((1, 16))),
        )
        raw = load_checkpoint(args.ckpt)
        from flax import serialization

        params = serialization.from_state_dict(params, raw["params"])
        stats = serialization.from_state_dict(stats, raw["batch_stats"])
        _, refined = make_partseg_eval(model)(
            params, stats, jnp.asarray(pts[None]),
            jnp.asarray([obj_label]),
        )
        pred = np.asarray(refined)[0]

    renderer = BallRenderer(ballradius=args.ballradius)
    state = {"rx": 0.0, "ry": 0.0, "zoom": 1.0, "use_pred": True}

    def colors():
        ids = pred if state["use_pred"] else seg
        return PART_COLORS[np.asarray(ids) % len(PART_COLORS)]

    if args.out:
        img = renderer.render(pts, colors())
        try:
            import cv2

            cv2.imwrite(args.out, img)
        except ImportError:
            from PIL import Image

            Image.fromarray(img[..., ::-1]).save(args.out)
        print(f"wrote {args.out}")
        return

    import cv2

    win = "vipformer-tpu partseg"
    cv2.namedWindow(win)
    drag = {"on": False, "x": 0, "y": 0}

    def on_mouse(event, x, y, flags, _):
        if event == cv2.EVENT_LBUTTONDOWN:
            drag.update(on=True, x=x, y=y)
        elif event == cv2.EVENT_LBUTTONUP:
            drag["on"] = False
        elif event == cv2.EVENT_MOUSEMOVE and drag["on"]:
            state["ry"] += (x - drag["x"]) * 0.01
            state["rx"] += (y - drag["y"]) * 0.01
            drag.update(x=x, y=y)

    cv2.setMouseCallback(win, on_mouse)
    print("drag: rotate | +/-: zoom | g: gt colors | p: pred colors | "
          "s: screenshot | q: quit")
    while True:
        img = renderer.render(
            pts, colors(), state["rx"], state["ry"], state["zoom"]
        )
        cv2.imshow(win, img)
        k = cv2.waitKey(16) & 0xFF
        if k == ord("q"):
            break
        elif k == ord("+") or k == ord("="):
            state["zoom"] *= 1.1
        elif k == ord("-"):
            state["zoom"] /= 1.1
        elif k == ord("g"):
            state["use_pred"] = False
        elif k == ord("p"):
            state["use_pred"] = True
        elif k == ord("s"):
            cv2.imwrite("screenshot.png", img)
            print("saved screenshot.png")
    cv2.destroyAllWindows()


if __name__ == "__main__":
    main()
