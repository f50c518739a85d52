"""The jitted training step (data-parallel by sharding, not by code).

One compiled program per batch shape: forward (BN in train mode over the
GLOBAL batch — GSPMD turns the batch-axis mean into a cross-device
collective), loss with histogram-EMA carry, grads, Adam update. The
reference's equivalent is train_v2.py:252-269 plus DDP's implicit
allreduce (train_v5.py:253); here gradient averaging falls out of the
sharding annotations.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from zebrapose_tpu.models.losses import CodeLossConfig, total_loss
from zebrapose_tpu.train.state import TrainState


def _loss_grads(state: TrainState, batch: Dict[str, jnp.ndarray],
                loss_cfg: CodeLossConfig, binary_loss_weight: float,
                predict_entire_mask: bool):
    """Shared loss/gradient body for `_train_step_impl` and `grad_step`
    — one definition so the fused and accumulated paths cannot drift
    (the k=1 parity test pins them equal)."""

    def loss_fn(params):
        outputs, mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            batch["image"], train=True, mutable=["batch_stats"])
        gt_entire = batch.get("entire_mask") if predict_entire_mask else None
        loss, new_hist, metrics = total_loss(
            outputs, batch["mask"], gt_entire, batch["code"],
            state.histogram, loss_cfg, binary_loss_weight)
        return loss, (mutated["batch_stats"], new_hist, metrics)

    return jax.grad(loss_fn, has_aux=True)(state.params)


def _train_step_impl(state: TrainState, batch: Dict[str, jnp.ndarray],
                     loss_cfg: CodeLossConfig,
                     binary_loss_weight: float = 3.0,
                     predict_entire_mask: bool = True
                     ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """batch: {"image" [N,H,W,3] (normalized), "mask" [N,h,w],
    "entire_mask" [N,h,w], "code" [N,h,w,bits]}.

    Unjitted body so `train.fleet` can vmap it over a stacked fleet of
    per-object states; use the jitted `train_step` everywhere else."""

    grads, (new_stats, new_hist, metrics) = _loss_grads(
        state, batch, loss_cfg, binary_loss_weight, predict_entire_mask)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt,
        histogram=new_hist,
    )
    metrics["grad_norm"] = jnp.sqrt(sum(
        jnp.sum(g.astype(jnp.float32) ** 2)
        for g in jax.tree.leaves(grads)))
    return new_state, metrics


train_step = partial(jax.jit, static_argnames=(
    "loss_cfg", "binary_loss_weight", "predict_entire_mask"),
    donate_argnames=("state",))(_train_step_impl)


# ---------------------------------------------------------------------------
# Gradient accumulation: k micro-batches -> one optimizer step.
#
# The reference has no equivalent (its only lever for a bigger batch is
# more GPUs via DDP, train_v5.py); here one chip trains at any effective
# batch size HBM can't hold at once. Semantics match k DDP micro-steps
# without the update: parameters are FROZEN across the k micro-batches
# (so the mean micro-gradient equals the gradient of the mean loss up to
# BN batch statistics, which in train mode are per-micro-batch exactly
# like per-replica BN under DDP), while BatchNorm running stats and the
# histogram EMA advance sequentially micro -> micro.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("loss_cfg", "binary_loss_weight",
                                   "predict_entire_mask"))
def grad_step(state: TrainState, batch: Dict[str, jnp.ndarray],
              loss_cfg: CodeLossConfig,
              binary_loss_weight: float = 3.0,
              predict_entire_mask: bool = True):
    """Gradients-only micro-batch step (no optimizer update).

    Returns (grads, new_batch_stats, new_histogram, metrics). In BN
    train mode the normalization uses the micro-batch's own statistics,
    so grads do not depend on `state.batch_stats` — only the running
    stats and the loss-histogram EMA carry between micro-batches.
    """
    grads, (new_stats, new_hist, metrics) = _loss_grads(
        state, batch, loss_cfg, binary_loss_weight, predict_entire_mask)
    return grads, new_stats, new_hist, metrics


@partial(jax.jit, donate_argnames=("acc", "grads"))
def _acc_add(acc, grads):
    # Both inputs are dead after the add; donating them keeps the
    # accumulation-mode HBM peak at params + opt state + ONE
    # gradient-sized buffer (the feature exists for HBM-limited configs).
    return jax.tree.map(jnp.add, acc, grads)


@partial(jax.jit, static_argnames=("accum_steps",),
         donate_argnames=("state", "grads"))
def apply_accumulated(state: TrainState, grads, accum_steps: int
                      ) -> Tuple[TrainState, jnp.ndarray]:
    """One optimizer update from summed micro-gradients (mean = sum/k).

    `state` must already carry the LAST micro-batch's batch_stats and
    histogram (accum_train_step threads them). Returns (state, grad_norm
    of the mean gradient)."""
    grads = jax.tree.map(lambda g: g / accum_steps, grads)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    grad_norm = jnp.sqrt(sum(
        jnp.sum(g.astype(jnp.float32) ** 2)
        for g in jax.tree.leaves(grads)))
    return state.replace(step=state.step + 1, params=new_params,
                         opt_state=new_opt), grad_norm


def accum_train_step(state: TrainState, micro_batches,
                     loss_cfg: CodeLossConfig,
                     binary_loss_weight: float = 3.0,
                     predict_entire_mask: bool = True
                     ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """Accumulated training step over an iterable of k micro-batches.

    Equivalent to `train_step` when k == 1 (same programs modulo the
    grad/apply jit split). Metrics are the mean over micro-batches;
    grad_norm is the norm of the applied (mean) gradient.
    """
    acc = None
    msum = None
    n = 0
    for batch in micro_batches:
        grads, new_stats, new_hist, metrics = grad_step(
            state, batch, loss_cfg,
            binary_loss_weight=binary_loss_weight,
            predict_entire_mask=predict_entire_mask)
        state = state.replace(batch_stats=new_stats, histogram=new_hist)
        acc = grads if acc is None else _acc_add(acc, grads)
        msum = metrics if msum is None else jax.tree.map(jnp.add, msum,
                                                         metrics)
        n += 1
    if n == 0:
        raise ValueError("accum_train_step needs at least one micro-batch")
    state, grad_norm = apply_accumulated(state, acc, n)
    metrics = jax.tree.map(lambda x: x / n, msum)
    metrics["grad_norm"] = grad_norm
    return state, metrics


@partial(jax.jit, static_argnames=("loss_cfg", "binary_loss_weight",
                                   "predict_entire_mask"))
def eval_loss_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   loss_cfg: CodeLossConfig,
                   binary_loss_weight: float = 3.0,
                   predict_entire_mask: bool = True
                   ) -> Dict[str, jnp.ndarray]:
    """Loss-only validation forward (reference train_v6.py:355-400 path)."""
    outputs = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["image"], train=False)
    gt_entire = batch.get("entire_mask") if predict_entire_mask else None
    _, _, metrics = total_loss(
        outputs, batch["mask"], gt_entire, batch["code"],
        state.histogram, loss_cfg, binary_loss_weight)
    return metrics


@partial(jax.jit, static_argnames=())
def forward_eval(state: TrainState, images: jnp.ndarray
                 ) -> Dict[str, jnp.ndarray]:
    """Inference forward with running BN stats."""
    return state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        images, train=False)
