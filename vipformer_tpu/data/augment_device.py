"""On-device (jitted, batched) point-cloud augmentations.

Device-side counterparts of the host chain in `data/augment.py` (itself a
functional rewrite of the reference's `datasets/data_utils.py:56-422`).
Every function is a pure jax transform over a whole [B, N, C] batch with an
explicit PRNG key, so the full two-view ShapeNetRender pretrain chain
(reference `datasets/data.py:16-36`) fuses into the train step: raw clouds
ship to the device once and both augmented views are produced on the
accelerator — removing the host's per-sample augmentation work (the
reference needed 18 DataLoader workers per rank) and halving host→device
bytes. Wired behind `Config.device_augs` (train/trainer.py).

Per-cloud random draws use one uniform of shape [B, 1, 1] so each cloud in
the batch gets an independent factor, matching the host chain's per-sample
semantics (distributionally — the streams are different RNGs by design).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _split_xyz(pts: Array):
    """(xyz, extra) for [B, N, C>=3] batches; extra may be empty."""
    return pts[..., :3], pts[..., 3:]


def _join_xyz(xyz: Array, extra: Array) -> Array:
    if extra.shape[-1] == 0:
        return xyz
    return jnp.concatenate([xyz, extra], axis=-1)


def normalize_unit_sphere(pts: Array) -> Array:
    """Per-cloud: center xyz at the centroid, scale to the unit sphere
    (reference `PointcloudNormalize`, `data_utils.py:206-221`)."""
    xyz, extra = _split_xyz(pts)
    xyz = xyz - jnp.mean(xyz, axis=-2, keepdims=True)
    m = jnp.max(
        jnp.sqrt(jnp.sum(xyz * xyz, axis=-1)), axis=-1, keepdims=True
    )
    xyz = xyz / m[..., None]
    return _join_xyz(xyz, extra)


def random_scale(
    pts: Array, key: Array, lo: float = 0.5, hi: float = 2.0
) -> Array:
    """Per-cloud isotropic scale factor in [lo, hi] (reference
    `PointcloudScale`, `data_utils.py:56-66`; pretrain chain uses
    [0.5, 2], `datasets/data.py:23`)."""
    b = pts.shape[0]
    s = jax.random.uniform(
        key, (b, 1, 1), minval=lo, maxval=hi, dtype=pts.dtype
    )
    xyz, extra = _split_xyz(pts)
    return _join_xyz(xyz * s, extra)


def random_rotate_y(pts: Array, key: Array) -> Array:
    """Per-cloud rotation about the y axis by a uniform angle in [0, 2pi)
    (reference `PointcloudRotate` with the default y axis,
    `data_utils.py:69-97`). Rotates normals too when C >= 6."""
    b = pts.shape[0]
    angle = jax.random.uniform(
        key, (b, 1), minval=0.0, maxval=2.0 * jnp.pi, dtype=jnp.float32
    )
    c = jnp.cos(angle).astype(pts.dtype)
    s = jnp.sin(angle).astype(pts.dtype)

    def rot(v):  # [B, N, 3] -> rotated about y
        x, y, z = v[..., 0], v[..., 1], v[..., 2]
        return jnp.stack([c * x + s * z, y, -s * x + c * z], axis=-1)

    out = jnp.concatenate([rot(pts[..., :3]), pts[..., 3:]], axis=-1)
    if pts.shape[-1] >= 6:
        out = out.at[..., 3:6].set(rot(pts[..., 3:6]))
    return out


def random_translate(
    pts: Array, key: Array, translate_range: float = 0.1
) -> Array:
    """Per-cloud translation proportional to the bbox extent (reference
    `PointcloudTranslate`, `data_utils.py:151-166`; pretrain chain uses
    range 0.5, `datasets/data.py:25`)."""
    b = pts.shape[0]
    xyz, extra = _split_xyz(pts)
    diff = jnp.max(xyz, axis=-2, keepdims=True) - jnp.min(
        xyz, axis=-2, keepdims=True
    )
    t = jax.random.uniform(
        key,
        (b, 1, 3),
        minval=-translate_range,
        maxval=translate_range,
        dtype=pts.dtype,
    )
    return _join_xyz(xyz + t * diff, extra)


def random_jitter(
    pts: Array, key: Array, std: float = 0.01, clip: float = 0.05
) -> Array:
    """Clipped gaussian jitter on xyz (reference `PointcloudJitter`,
    `data_utils.py:134-148`)."""
    xyz, extra = _split_xyz(pts)
    noise = jnp.clip(
        std * jax.random.normal(key, xyz.shape, dtype=xyz.dtype),
        -clip,
        clip,
    )
    return _join_xyz(xyz + noise, extra)


def random_input_dropout(
    pts: Array, key: Array, max_dropout_ratio: float = 0.875
) -> Array:
    """Per-cloud: drop a random fraction of points by overwriting them with
    the cloud's first point (reference `PointcloudRandomInputDropout`,
    `data_utils.py:174-190`) — static output shape, exactly what the jitted
    consumer needs."""
    b, n = pts.shape[0], pts.shape[1]
    k_ratio, k_mask = jax.random.split(key)
    ratio = (
        jax.random.uniform(k_ratio, (b, 1), dtype=jnp.float32)
        * max_dropout_ratio
    )
    u = jax.random.uniform(k_mask, (b, n), dtype=jnp.float32)
    drop = u <= ratio  # [B, N]
    first = pts[:, :1, :]  # [B, 1, C]
    return jnp.where(drop[..., None], first, pts)


def pretrain_view(pts: Array, key: Array) -> Array:
    """One ShapeNetRender augmentation chain, all p=1 (reference
    `datasets/data.py:16-36`): Normalize -> Scale[0.5, 2] -> Rotate(y) ->
    Translate(0.5) -> Jitter -> RandomInputDropout."""
    ks = jax.random.split(key, 5)
    pts = normalize_unit_sphere(pts)
    pts = random_scale(pts, ks[0], lo=0.5, hi=2.0)
    pts = random_rotate_y(pts, ks[1])
    pts = random_translate(pts, ks[2], translate_range=0.5)
    pts = random_jitter(pts, ks[3])
    pts = random_input_dropout(pts, ks[4])
    return pts


def pretrain_two_views(pts: Array, key: Array) -> tuple[Array, Array]:
    """Two independent augmented views of each raw cloud — the device-side
    equivalent of `ShapeNetRender` loading the ply twice through `trans_1`
    and `trans_2` (reference `datasets/data.py:107-116`)."""
    k1, k2 = jax.random.split(key)
    return pretrain_view(pts, k1), pretrain_view(pts, k2)


def scale_and_translate_device(
    pts: Array,
    key: Array,
    scale_low: float = 2.0 / 3.0,
    scale_high: float = 3.0 / 2.0,
    translate_range: float = 0.2,
) -> Array:
    """Per-cloud anisotropic scale + translation — the finetune-time batch
    augmentation (reference `PointcloudScaleAndTranslate`,
    `data_utils.py:407-423`)."""
    b = pts.shape[0]
    k_s, k_t = jax.random.split(key)
    s = jax.random.uniform(
        k_s, (b, 1, 3), minval=scale_low, maxval=scale_high, dtype=pts.dtype
    )
    t = jax.random.uniform(
        k_t,
        (b, 1, 3),
        minval=-translate_range,
        maxval=translate_range,
        dtype=pts.dtype,
    )
    xyz, extra = _split_xyz(pts)
    return _join_xyz(xyz * s + t, extra)


# ---------------------------------------------------------------------------
# image chain (reference `utils.py:21-25`: Resize -> ColorJitter(.4,.4,.4)
# -> RandomHorizontalFlip -> ToTensor -> Normalize)

_IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
_IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)
_LUMA = jnp.array([0.299, 0.587, 0.114], jnp.float32)
# the 6 possible application orders of (brightness, contrast, saturation)
_JITTER_ORDERS = jnp.array(
    [[0, 1, 2], [0, 2, 1], [1, 0, 2], [1, 2, 0], [2, 0, 1], [2, 1, 0]],
    jnp.int32,
)


def _jitter_affine(factors: Array, mean_rgb: Array, order: Array):
    """Compose one sample's ColorJitter into a single (M [3,3], d [3]).

    Every PIL ImageEnhance op is affine in RGB — brightness `b*x`,
    saturation `s*x + (1-s)*(luma.x)*1`, contrast `c*x + (1-c)*g*1` with
    `g` the mean luma of its *input* — and per-channel means transform
    affinely too, so the randomly-ordered chain collapses exactly to one
    matrix+offset. One pixel pass applies it (vs. PIL's three sequential
    image rewrites); the [3,3] composition cost is nothing on the VPU.
    """
    b, c, s = factors[0], factors[1], factors[2]
    eye = jnp.eye(3, dtype=jnp.float32)
    m_b, d_b = b * eye, jnp.zeros(3)
    m_s = s * eye + (1.0 - s) * jnp.outer(jnp.ones(3), _LUMA)
    d_s = jnp.zeros(3)
    m_c = c * eye  # contrast offset depends on the running mean (below)

    M, d, mu = eye, jnp.zeros(3), mean_rgb

    def apply_op(i, M, d, mu):
        g = jnp.dot(_LUMA, mu)
        d_c = (1.0 - c) * g * jnp.ones(3)
        Ms = jnp.stack([m_b, m_c, m_s])
        ds = jnp.stack([d_b, d_c, d_s])
        m_i, d_i = Ms[i], ds[i]
        return m_i @ M, m_i @ d + d_i, m_i @ mu + d_i

    for step in range(3):
        M, d, mu = apply_op(order[step], M, d, mu)
    return M, d


def image_pretrain_chain(
    imgs: Array, key: Array, height: int | None = None,
    width: int | None = None,
) -> Array:
    """Batched on-device image augmentation: [B, H, W, 3] uint8 (or [0,255]
    float) -> normalized float32 [B, height, width, 3].

    Resize (bilinear, when a target size is given and differs), per-sample
    randomly-ordered ColorJitter(0.4, 0.4, 0.4) as one fused affine pass,
    p=.5 horizontal flip, ImageNet normalize — the whole reference chain
    (`utils.py:21-25`) inside the train step, so the host ships ONE uint8
    image per sample and does no per-pixel float work at all
    (tools/bench_pipeline.py measures the host freed from ~1.2 ms/sample).
    """
    b = imgs.shape[0]
    x = imgs.astype(jnp.float32)
    if height and width and imgs.shape[1:3] != (height, width):
        x = jax.image.resize(
            x, (b, height, width, 3), method="linear"
        )
    k_f, k_o, k_flip = jax.random.split(key, 3)
    factors = jax.random.uniform(
        k_f, (b, 3), minval=0.6, maxval=1.4, dtype=jnp.float32
    )
    orders = _JITTER_ORDERS[
        jax.random.randint(k_o, (b,), 0, _JITTER_ORDERS.shape[0])
    ]
    mean_rgb = jnp.mean(x, axis=(1, 2))  # [B, 3]
    M, d = jax.vmap(_jitter_affine)(factors, mean_rgb, orders)
    x = jnp.einsum("bhwc,bkc->bhwk", x, M) + d[:, None, None, :]
    x = jnp.clip(x, 0.0, 255.0) / 255.0
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    return (x - _IMAGENET_MEAN) / _IMAGENET_STD
