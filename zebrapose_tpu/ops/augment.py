"""GDR-Net color augmentation recipe as pure-JAX image ops.

The reference builds a fresh imgaug pipeline per sample on CPU workers
(`zebrapose/GDR_Net_Augmentation.py:161-178`, applied at
bop_dataset_pytorch.py:349-355 with color_aug_prob=0.8):

  [Sometimes(0.3, SaltAndPepper(0.05))]        (use_peper_salt)
  [Sometimes(0.2, MotionBlur(k=5))]            (use_motion_blur)
  Sometimes(0.4, CoarseDropout(p=0.1, size_percent=0.05))
  Sometimes(0.5, GaussianBlur(sigma ~ U(0,1)))
  Sometimes(0.5, Add(U(-20,20), per_channel 0.3))
  Sometimes(0.4, Invert(0.2, per_channel))
  Sometimes(0.5, Multiply(U(0.7,1.4), per_channel 0.8))
  Sometimes(0.5, Multiply(U(0.7,1.4)))
  Sometimes(0.5, LinearContrast(U(0.5,2.0), per_channel 0.3))

Here the same distributions are expressed with `jax.random` on device and
vmapped over the batch, so augmentation fuses into the preprocessing
program. Deviation (documented): the reference augments the full image
before cropping; we augment the 256x256 crop — identical for pixelwise
ops, and the neighborhood ops (blur/dropout) differ only in grain scale
relative to the object.

Images are float32 [H, W, 3] in [0, 255] (BGR, matching cv2 ingestion).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _sometimes(key, p, fn, img):
    apply = jax.random.uniform(key) < p
    return jnp.where(apply, fn(img), img)


def _clip(img):
    return jnp.clip(img, 0.0, 255.0)


def _per_channel_values(key, p_per_channel, low, high):
    """imgaug per_channel semantics: with prob p use 3 per-channel draws,
    else one shared draw."""
    k1, k2, k3 = jax.random.split(key, 3)
    per = jax.random.uniform(k1, (3,), minval=low, maxval=high)
    shared = jax.random.uniform(k2, (), minval=low, maxval=high)
    use_per = jax.random.uniform(k3) < p_per_channel
    return jnp.where(use_per, per, jnp.broadcast_to(shared, (3,)))


def _salt_and_pepper(key, img, p=0.05):
    h, w, _ = img.shape
    k1, k2 = jax.random.split(key)
    hit = jax.random.uniform(k1, (h, w, 1)) < p
    salt = jax.random.uniform(k2, (h, w, 1)) < 0.5
    noise = jnp.where(salt, 255.0, 0.0)
    return jnp.where(hit, noise, img)


def _coarse_dropout(key, img, p=0.1, size_percent=0.05):
    h, w, _ = img.shape
    gh = max(int(round(h * size_percent)), 1)
    gw = max(int(round(w * size_percent)), 1)
    drop = jax.random.uniform(key, (gh, gw)) < p
    # nearest-neighbor upsample of the coarse grid
    ys = (jnp.arange(h) * gh // h).clip(0, gh - 1)
    xs = (jnp.arange(w) * gw // w).clip(0, gw - 1)
    full = drop[ys[:, None], xs[None, :]]
    return jnp.where(full[..., None], 0.0, img)


def _gaussian_blur(key, img, max_sigma=1.0, radius=3):
    sigma = jax.random.uniform(key, (), minval=0.0, maxval=max_sigma)
    sigma = jnp.maximum(sigma, 1e-3)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    # separable conv over H then W (channels vectorized)
    pad = [(radius, radius), (0, 0), (0, 0)]
    xp = jnp.pad(img, pad, mode="edge")
    rows = sum(k[i] * xp[i:i + img.shape[0]] for i in range(2 * radius + 1))
    pad = [(0, 0), (radius, radius), (0, 0)]
    yp = jnp.pad(rows, pad, mode="edge")
    return sum(k[i] * yp[:, i:i + img.shape[1]]
               for i in range(2 * radius + 1))


def _motion_blur(key, img, k=5):
    angle = jax.random.uniform(key, (), minval=0.0, maxval=jnp.pi)
    r = k // 2
    yy = jax.lax.broadcasted_iota(jnp.float32, (k, k), 0) - r
    xx = jax.lax.broadcasted_iota(jnp.float32, (k, k), 1) - r
    # distance from the line through the center at `angle`
    d = jnp.abs(-jnp.sin(angle) * xx + jnp.cos(angle) * yy)
    along = jnp.abs(jnp.cos(angle) * xx + jnp.sin(angle) * yy)
    kern = ((d < 0.5) & (along <= r + 0.5)).astype(jnp.float32)
    kern = kern / jnp.maximum(jnp.sum(kern), 1.0)
    out = jax.lax.conv_general_dilated(
        img.transpose(2, 0, 1)[:, None],         # [C,1,H,W]
        kern[None, None],                         # [1,1,k,k]
        window_strides=(1, 1), padding="SAME")
    return out[:, 0].transpose(1, 2, 0)


def _add(key, img):
    vals = _per_channel_values(key, 0.3, -20.0, 20.0)
    return _clip(img + vals)


def _invert(key, img, p=0.2):
    flips = jax.random.uniform(key, (3,)) < p
    return jnp.where(flips[None, None, :], 255.0 - img, img)


def _multiply(key, img, p_per_channel):
    vals = _per_channel_values(key, p_per_channel, 0.7, 1.4)
    return _clip(img * vals)


def _linear_contrast(key, img):
    alpha = _per_channel_values(key, 0.3, 0.5, 2.0)
    return _clip(127.0 + alpha * (img - 127.0))


@partial(jax.jit, static_argnames=("use_pepper_salt", "use_motion_blur"))
def augment_image(img: jnp.ndarray, key: jax.Array,
                  use_pepper_salt: bool = False,
                  use_motion_blur: bool = False) -> jnp.ndarray:
    """One sample of the GDR-Net pipeline. img: [H,W,3] f32 in [0,255]."""
    keys = jax.random.split(key, 18)
    i = iter(range(18))

    if use_pepper_salt:
        img = _sometimes(keys[next(i)], 0.3,
                         lambda x: _salt_and_pepper(keys[next(i)], x), img)
    if use_motion_blur:
        img = _sometimes(keys[next(i)], 0.2,
                         lambda x: _motion_blur(keys[next(i)], x), img)
    img = _sometimes(keys[next(i)], 0.4,
                     lambda x: _coarse_dropout(keys[next(i)], x), img)
    img = _sometimes(keys[next(i)], 0.5,
                     lambda x: _gaussian_blur(keys[next(i)], x), img)
    img = _sometimes(keys[next(i)], 0.5,
                     lambda x: _add(keys[next(i)], x), img)
    img = _sometimes(keys[next(i)], 0.4,
                     lambda x: _invert(keys[next(i)], x), img)
    img = _sometimes(keys[next(i)], 0.5,
                     lambda x: _multiply(keys[next(i)], x, 0.8), img)
    img = _sometimes(keys[next(i)], 0.5,
                     lambda x: _multiply(keys[next(i)], x, 0.0), img)
    img = _sometimes(keys[next(i)], 0.5,
                     lambda x: _linear_contrast(keys[next(i)], x), img)
    return _clip(img)


@partial(jax.jit, static_argnames=("use_pepper_salt", "use_motion_blur",
                                   "color_aug_prob"))
def augment_batch(images: jnp.ndarray, key: jax.Array,
                  use_pepper_salt: bool = False,
                  use_motion_blur: bool = False,
                  color_aug_prob: float = 0.8) -> jnp.ndarray:
    """vmapped augmentation with the per-sample 0.8 apply gate
    (bop_dataset_pytorch.apply_augmentation)."""
    n = images.shape[0]
    keys = jax.random.split(key, n + 1)
    gate = jax.random.uniform(keys[0], (n,)) < color_aug_prob
    auged = jax.vmap(lambda im, k: augment_image(
        im, k, use_pepper_salt, use_motion_blur))(images, keys[1:])
    return jnp.where(gate[:, None, None, None], auged, images)
