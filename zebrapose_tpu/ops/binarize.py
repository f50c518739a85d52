"""Network-output binarization (stays on device, unlike the reference).

The reference round-trips logits GPU->CPU->numpy to threshold them
(`zebrapose/common_ops.py:5-32`, flagged as an avoidable device boundary
crossing in SURVEY.md §3.1). These are pure jnp ops that fuse into the
decode program.

Layout: NHWC (channel/bit axis last — the TPU lane axis). The reference
uses NCHW; conversions happen only at the torch-parity test boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mask_from_logits(mask_logits: jnp.ndarray,
                     threshold: float = 0.5) -> jnp.ndarray:
    """sigmoid + threshold -> {0,1} float mask. Ref: from_output_to_class_mask."""
    p = jax.nn.sigmoid(mask_logits)
    return jnp.where(p > threshold, 1.0, 0.0).astype(jnp.float32)


def code_from_logits(code_logits: jnp.ndarray, loss_type: str = "BCE",
                     threshold: float = 0.5, base: int = 2) -> jnp.ndarray:
    """Logits -> hard base-d code planes. Ref: from_output_to_class_binary_code.

    BCE/L1: per-plane sigmoid threshold. CE: the channel axis holds
    n_digits groups of `base` logits; argmax within each group.
    code_logits: [..., H, W, C].
    """
    if loss_type in ("BCE", "L1"):
        p = jax.nn.sigmoid(code_logits)
        return jnp.where(p > threshold, 1.0, 0.0).astype(jnp.float32)
    if loss_type == "CE":
        shape = code_logits.shape
        n_digits = shape[-1] // base
        grouped = code_logits.reshape(shape[:-1] + (n_digits, base))
        return jnp.argmax(grouped, axis=-1).astype(jnp.float32)
    raise NotImplementedError(f"unknown loss type: {loss_type}")


def split_batch_sizes(second_dataset_ratio: float, batch_size: int):
    """Mixed real/pbr batch split. Ref: common_ops.get_batch_size."""
    batch_2 = int(batch_size * second_dataset_ratio)
    return batch_size - batch_2, batch_2
