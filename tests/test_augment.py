"""Statistical checks of the GDR-Net augmentation distributions."""

import numpy as np
import jax
import jax.numpy as jnp

from zebrapose_tpu.ops.augment import augment_batch, augment_image


def _flat(n=64, size=16, value=100.0):
    return jnp.full((n, size, size, 3), value, jnp.float32)


def test_apply_gate_rate():
    # color_aug_prob=0.8: ~80% of samples change (a flat image changes
    # under almost any sub-op; a sample where no Sometimes fires stays)
    imgs = _flat(256)
    out = np.asarray(augment_batch(imgs, jax.random.PRNGKey(0)))
    changed = (np.abs(out - 100.0) > 1e-3).any(axis=(1, 2, 3))
    assert 0.55 < changed.mean() < 0.9


def test_outputs_clipped_and_finite():
    rng = np.random.default_rng(150)
    imgs = jnp.asarray(rng.uniform(0, 255, (32, 16, 16, 3)).astype(
        np.float32))
    out = np.asarray(augment_batch(imgs, jax.random.PRNGKey(1),
                                   use_pepper_salt=True,
                                   use_motion_blur=True))
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 255.0


def test_coarse_dropout_produces_dark_patches():
    # CoarseDropout zeroes patches of a bright flat image; later ops
    # (add/multiply/contrast) shift the zeros but keep them far darker
    # than any purely multiplicative path from 200 could reach
    imgs = _flat(128, value=200.0)
    out = np.asarray(augment_batch(imgs, jax.random.PRNGKey(2),
                                   color_aug_prob=1.0))
    dark = (out.min(axis=(1, 2, 3)) < 60.0)
    assert dark.mean() > 0.1  # CoarseDropout fires at p=0.4


def test_invert_shows_up():
    imgs = _flat(128, value=10.0)
    out = np.asarray(augment_batch(imgs, jax.random.PRNGKey(3),
                                   color_aug_prob=1.0))
    # inverted channels land near 245 before other ops; look for values
    # far above anything multiplicative ops could reach from 10
    high = (out > 150).any(axis=(1, 2, 3))
    assert high.mean() > 0.1  # Invert fires at 0.4 x 0.2/channel


def test_single_image_deterministic_per_key():
    rng = np.random.default_rng(151)
    img = jnp.asarray(rng.uniform(0, 255, (16, 16, 3)).astype(np.float32))
    a = np.asarray(augment_image(img, jax.random.PRNGKey(7)))
    b = np.asarray(augment_image(img, jax.random.PRNGKey(7)))
    c = np.asarray(augment_image(img, jax.random.PRNGKey(8)))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-3
