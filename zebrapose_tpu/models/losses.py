"""Loss stack: mask L1, binary-code losses, histogram-weighted curriculum.

Functional re-design of the reference losses (`zebrapose/model/
BinaryCodeNet.py:8-110`). The reference keeps the bit-error histogram EMA
as Python module state (`self.histogram`); here it is explicit data
threaded through the train step's carry, so it works under jit/scan and is
averaged across data-parallel replicas with one `pmean` (fixing the
reference's replica-divergent copies, SURVEY.md §7.4 item 8).

Layout: NHWC; code planes [N, H, W, n_bits]; masks [N, H, W] or
[N, H, W, 1] logits.

Reference semantics preserved exactly:
  * MaskLoss = L1(sigmoid(logits), gt)                        (:84-93)
  * Hamming histogram h_b = sum(|hard_code - gt| * hard_mask)
      / (sum(hard_mask) + 1), per bit                         (:96-109)
  * EMA: hist <- 0.95 * hist + 0.05 * hist_new                (:38-41)
  * bin_weights = exp(3 * min(hist, 0.51 - hist))             (:43-45)
  * weighted BCE: per-bit mean over batch/pixels, then weighted
      mean over bits                                          (:70-81)
  * optional masking of code logits by detached predicted
      mask prob                                               (:47-48)
  * total = binary_loss_weight * code + mask (+ entire_mask)
      (train_v2.py:266)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def sigmoid_l1_mask_loss(mask_logits: jnp.ndarray,
                         gt_mask: jnp.ndarray) -> jnp.ndarray:
    """MaskLoss: mean |sigmoid(logit) - gt|."""
    if mask_logits.ndim == gt_mask.ndim + 1:
        mask_logits = mask_logits[..., 0]
    return jnp.mean(jnp.abs(jax.nn.sigmoid(mask_logits) - gt_mask))


def hamming_histogram(code_logits: jnp.ndarray, gt_code: jnp.ndarray,
                      mask_hard: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(mean hamming loss, per-bit error histogram [n_bits]).

    mask_hard is the binarized {0,1} predicted mask — the reference's
    train loop binarizes before the loss (train_v2.py:258-260,
    from_output_to_class_mask).
    """
    if mask_hard.ndim == code_logits.ndim:
        mask_hard = mask_hard[..., 0]
    mask_hard = jnp.clip(jnp.round(mask_hard), 0.0, 1.0)
    pred_hard = jnp.clip(jnp.round(jax.nn.sigmoid(code_logits)), 0.0, 1.0)
    gt_hard = jnp.clip(jnp.round(gt_code), 0.0, 1.0)
    hamm = jnp.abs(pred_hard - gt_hard) * mask_hard[..., None]
    histogram = jnp.sum(hamm, axis=(0, 1, 2)) / (jnp.sum(mask_hard) + 1.0)
    return jnp.mean(histogram), histogram


def _bce_with_logits(logits: jnp.ndarray,
                     targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise BCEWithLogitsLoss (stable log-sum-exp form)."""
    return jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def weighted_bce_per_bit(code_logits: jnp.ndarray, gt_code: jnp.ndarray,
                         bin_weights: jnp.ndarray) -> jnp.ndarray:
    """BinaryLossWeighted: per-bit mean BCE, weighted mean over bits."""
    per_elem = _bce_with_logits(code_logits, gt_code)
    per_bit = jnp.mean(per_elem, axis=(0, 1, 2))
    return jnp.sum(per_bit * bin_weights) / jnp.sum(bin_weights)


def histogram_bin_weights(histogram: jnp.ndarray) -> jnp.ndarray:
    """Soft 'coarse bits first' curriculum weights."""
    hist_soft = jnp.minimum(histogram, 0.51 - histogram)
    return jnp.exp(hist_soft * 3.0)


@dataclasses.dataclass(frozen=True)
class CodeLossConfig:
    loss_type: str = "BCE"               # L1 | BCE | CE
    mask_code_loss: bool = True          # mask logits by detached mask prob
    use_histogram_weighting: bool = True
    base: int = 2                        # divided_number_each_iteration
    n_bits: int = 16
    ema_old: float = 0.95
    ema_new: float = 0.05


def binary_code_loss(code_logits: jnp.ndarray, mask_logits: jnp.ndarray,
                     gt_code: jnp.ndarray,
                     histogram: Optional[jnp.ndarray],
                     cfg: CodeLossConfig
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """BinaryCodeLoss.forward: returns (loss, new_histogram, hamming).

    The reference binarizes the predicted mask before this loss
    (train_v2.py:258-260): both the hamming histogram and the optional
    code-logit masking use the hard {0,1} mask, detached.

    `histogram` is the EMA state [n_bits]; pass `fresh_histogram(n)` (a
    negative sentinel) on step 0 to reproduce `self.histogram is None`.
    """
    mask_hard = jax.lax.stop_gradient(
        (mask_logits > 0).astype(code_logits.dtype))  # sigmoid(x)>0.5
    if mask_hard.ndim == code_logits.ndim and mask_hard.shape[-1] == 1:
        mask_b = mask_hard
    else:
        mask_b = mask_hard[..., None]

    hamm_loss = jnp.zeros(())
    new_hist = histogram
    bin_weights = None
    if cfg.use_histogram_weighting:
        hamm_loss, hist_new = hamming_histogram(
            code_logits, gt_code, mask_hard)
        # EMA; a negative sentinel histogram means "uninitialized"
        init = jnp.all(histogram < 0)
        new_hist = jnp.where(init, hist_new,
                             hist_new * cfg.ema_new +
                             histogram * cfg.ema_old)
        bin_weights = histogram_bin_weights(new_hist)

    if cfg.mask_code_loss:
        code_logits = mask_b * code_logits

    if cfg.loss_type == "L1":
        loss = jnp.mean(jnp.abs(jax.nn.sigmoid(code_logits) - gt_code))
    elif cfg.loss_type == "BCE" and not cfg.use_histogram_weighting:
        loss = jnp.mean(_bce_with_logits(code_logits, gt_code))
    elif cfg.loss_type == "BCE":
        loss = weighted_bce_per_bit(code_logits, gt_code, bin_weights)
    elif cfg.loss_type == "CE":
        # channels = n_bits groups of `base` logits; gt digits in [0, base)
        sh = code_logits.shape
        grouped = code_logits.reshape(sh[:-1] + (cfg.n_bits, cfg.base))
        logp = jax.nn.log_softmax(grouped, axis=-1)
        gt = gt_code.astype(jnp.int32)
        picked = jnp.take_along_axis(logp, gt[..., None], axis=-1)[..., 0]
        loss = -jnp.mean(picked)
    else:
        raise NotImplementedError(cfg.loss_type)

    return loss, new_hist, hamm_loss


def total_loss(outputs: Dict[str, jnp.ndarray],
               gt_mask: jnp.ndarray,
               gt_entire_mask: Optional[jnp.ndarray],
               gt_code: jnp.ndarray,
               histogram: jnp.ndarray,
               cfg: CodeLossConfig,
               binary_loss_weight: float = 3.0
               ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Train objective (train_v2.py:262-269). Returns
    (loss, new_histogram, metrics)."""
    # losses always in f32 (the model may run bf16 compute)
    outputs = {k: v.astype(jnp.float32) for k, v in outputs.items()}
    code_l, new_hist, hamm = binary_code_loss(
        outputs["code"], outputs["mask"], gt_code, histogram, cfg)
    mask_l = sigmoid_l1_mask_loss(outputs["mask"], gt_mask)
    metrics = {"loss_code": code_l, "loss_mask": mask_l,
               "hamming": hamm}
    loss = binary_loss_weight * code_l + mask_l
    if "entire_mask" in outputs and gt_entire_mask is not None:
        em_l = sigmoid_l1_mask_loss(outputs["entire_mask"], gt_entire_mask)
        metrics["loss_entire_mask"] = em_l
        loss = loss + em_l
    metrics["loss_total"] = loss
    return loss, new_hist, metrics


def fresh_histogram(n_bits: int) -> jnp.ndarray:
    """Uninitialized-EMA sentinel (reference: self.histogram = None)."""
    return -jnp.ones((n_bits,), jnp.float32)
