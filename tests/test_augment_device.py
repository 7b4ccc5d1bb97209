"""On-device augmentation tests: invariants + distributional agreement with
the host-side (reference-faithful) chain."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vipformer_tpu.data import augment
from vipformer_tpu.data import augment_device as dev


@pytest.fixture
def batch(rng):
    return jnp.asarray(
        rng.standard_normal((8, 128, 3)).astype(np.float32) * 2 + 1
    )


def test_normalize_matches_host(batch):
    out = np.asarray(dev.normalize_unit_sphere(batch))
    for i in range(len(out)):
        want = augment.normalize_unit_sphere(np.asarray(batch[i]))
        np.testing.assert_allclose(out[i], want, atol=1e-5)


def test_rotate_y_preserves_y_and_norms(batch, key):
    out = np.asarray(dev.random_rotate_y(batch, key))
    np.testing.assert_allclose(
        out[..., 1], np.asarray(batch)[..., 1], atol=1e-5
    )
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1),
        np.linalg.norm(np.asarray(batch), axis=-1),
        atol=1e-4,
    )


def test_scale_range(batch, key):
    out = np.asarray(dev.random_scale(batch, key))
    ratio = out / np.asarray(batch)
    # per-cloud single isotropic factor in [0.5, 2]
    for i in range(len(out)):
        r = ratio[i]
        assert np.allclose(r, r.flat[0], atol=1e-5)
        assert 0.5 <= r.flat[0] <= 2.0


def test_jitter_bounded(key):
    pts = jnp.zeros((4, 64, 3))
    out = np.asarray(dev.random_jitter(pts, key))
    assert np.abs(out).max() <= 0.05 + 1e-6


def test_input_dropout_static_shape_first_point(batch, key):
    out = np.asarray(dev.random_input_dropout(batch, key))
    assert out.shape == batch.shape
    b = np.asarray(batch)
    changed = ~np.all(out == b, axis=-1)
    for i in range(len(out)):
        if changed[i].any():
            sel = out[i][changed[i]]
            np.testing.assert_allclose(
                sel, np.broadcast_to(b[i, 0], sel.shape)
            )


def test_full_chain_and_two_views(batch, key):
    t1, t2 = dev.pretrain_two_views(batch, key)
    assert t1.shape == batch.shape
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
    # deterministic under the same key
    t1b, _ = dev.pretrain_two_views(batch, key)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t1b))
    assert np.isfinite(np.asarray(t1)).all()


def test_scale_and_translate_device(batch, key):
    out = np.asarray(dev.scale_and_translate_device(batch, key))
    assert out.shape == batch.shape
    assert not np.allclose(out, np.asarray(batch))


def test_chain_feeds_model(batch, key):
    """Augmented batch must flow into the pretrain forward under jit."""
    from vipformer_tpu.config import Config
    from vipformer_tpu.models import build_pc_model

    cfg = Config(
        compute_dtype="float32", num_pc_latents=8, num_groups=8,
        group_size=4, num_latent_channels=32, num_ca_heads=4,
        num_sa_heads=4, num_sa_layers=2, mlp_widen_factor=2,
    )
    model = build_pc_model(cfg)
    variables = model.init({"params": jax.random.key(0)}, batch)

    @jax.jit
    def fwd(v, x, k):
        t1, t2 = dev.pretrain_two_views(x, k)
        p1, _ = model.apply(v, t1, deterministic=True)
        p2, _ = model.apply(v, t2, deterministic=True)
        return jnp.sum(p1) + jnp.sum(p2)

    out = float(fwd(variables, batch, key))
    assert np.isfinite(out)


def test_image_jitter_affine_matches_sequential():
    """The composed single-pass (M, d) ColorJitter must equal applying the
    three affine ops sequentially in the same order."""
    import jax
    import jax.numpy as jnp

    from vipformer_tpu.data.augment_device import (
        _JITTER_ORDERS,
        _LUMA,
        _jitter_affine,
    )

    rng = np.random.default_rng(5)
    x = rng.uniform(0, 255, (9, 11, 3)).astype(np.float32)
    luma = np.asarray(_LUMA)
    for oi in range(6):
        order = np.asarray(_JITTER_ORDERS)[oi]
        factors = rng.uniform(0.6, 1.4, 3).astype(np.float32)
        b, c, s = factors

        ref = x.copy()
        for k in order:
            if k == 0:  # brightness
                ref = b * ref
            elif k == 1:  # contrast: blend with mean luma of current input
                g = float(np.mean(ref @ luma))
                ref = c * ref + (1 - c) * g
            else:  # saturation: blend with per-pixel luma
                ref = s * ref + (1 - s) * (ref @ luma)[..., None]

        M, d = _jitter_affine(
            jnp.asarray(factors), jnp.asarray(x.mean(axis=(0, 1))),
            jnp.asarray(order),
        )
        got = x @ np.asarray(M).T + np.asarray(d)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-2)


def test_image_pretrain_chain_shapes_and_stats():
    import jax
    import jax.numpy as jnp

    from vipformer_tpu.data.augment_device import image_pretrain_chain

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (6, 137, 137, 3)).astype(np.uint8)
    out = jax.jit(
        lambda x, k: image_pretrain_chain(x, k, 144, 144)
    )(jnp.asarray(imgs), jax.random.key(1))
    assert out.shape == (6, 144, 144, 3)
    assert out.dtype == jnp.float32
    # ImageNet-normalized output of a uniform-noise image sits near 0 +- 1
    assert abs(float(out.mean())) < 0.6
    assert 0.4 < float(out.std()) < 2.0
    # two keys give different augmentations
    out2 = image_pretrain_chain(jnp.asarray(imgs), jax.random.key(2), 144, 144)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
