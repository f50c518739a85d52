"""Surface-code codec: RGB label <-> class id <-> base-d code planes.

The reference stores each mesh face's hierarchical surface class id in the
pixel colors of rendered GT label images (id = B<<16 | G<<8 | R, cv2 BGR
channel order) and converts ids to per-level code planes with Python loops
over bit shifts (`zebrapose/binary_code_helper/class_id_encoder_decoder.py`).

Here every conversion is a vectorized fixed-shape jnp expression (no loops,
no dicts) so it fuses into the surrounding XLA program: the decode of a
[128,128] label crop into 16 bit planes is a couple of shift/and ops on
int32 lanes, and id reconstruction from predicted bits is a dot with a
powers-of-d vector that XLA maps onto the VPU/MXU.

All functions accept leading batch dimensions.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def rgb_to_class_id(bgr_image: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] BGR uint8 label image -> [..., H, W] int32 class id.

    Channel order matches cv2.imread as used by the reference
    (class_id_encoder_decoder.py:6-15): id = ch0<<16 | ch1<<8 | ch2.
    """
    img = bgr_image.astype(jnp.int32)
    return (img[..., 0] << 16) + (img[..., 1] << 8) + img[..., 2]


def class_id_to_rgb(class_id: jnp.ndarray) -> jnp.ndarray:
    """[...,] int32 class id -> [..., 3] BGR uint8 (inverse of above)."""
    cid = class_id.astype(jnp.int32)
    b = (cid >> 16) & 0xFF
    g = (cid >> 8) & 0xFF
    r = cid & 0xFF
    return jnp.stack([b, g, r], axis=-1).astype(jnp.uint8)


def class_id_to_code(class_id: jnp.ndarray, base: int = 2,
                     n_digits: int = 16,
                     dtype=jnp.float32) -> jnp.ndarray:
    """[...] int class id -> [..., n_digits] base-`base` digits, MSD first.

    Matches class_id_image_to_class_code_images (reference :43-63) but emits
    the digit axis last (TPU lane axis) instead of a channel loop. `base`
    must be a power of two (reference requires this too: it uses log2 shifts;
    ablations use d in {2,4,16,256}).
    """
    bit_step = int(math.log2(base))
    if (1 << bit_step) != base:
        raise ValueError(f"base must be a power of 2, got {base}")
    shifts = jnp.arange(n_digits - 1, -1, -1, dtype=jnp.int32) * bit_step
    cid = class_id.astype(jnp.int32)[..., None]
    digits = (cid >> shifts) & (base - 1)
    return digits.astype(dtype)


def code_to_class_id(code: jnp.ndarray, base: int = 2) -> jnp.ndarray:
    """[..., n_digits] digits (MSD first) -> [...] int32 class id.

    Matches class_code_images_to_class_id_image (reference :17-28); the
    accumulation loop becomes a single dot with powers of `base`.
    """
    n = code.shape[-1]
    weights = (base ** jnp.arange(n - 1, -1, -1, dtype=jnp.float32))
    # float32 dot is exact for ids < 2^24; for n*log2(base) > 24 use a
    # two-limb int accumulation instead.
    bits = int(math.log2(base)) * n
    if bits <= 24:
        cid = jnp.einsum("...n,n->...", code.astype(jnp.float32), weights)
        return cid.astype(jnp.int32)
    iweights = (base ** jnp.arange(n - 1, -1, -1, dtype=jnp.int64))
    return jnp.sum(code.astype(jnp.int64) * iweights, axis=-1).astype(
        jnp.int32)
