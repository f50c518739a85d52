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


def _train_step_impl(state: TrainState, batch: Dict[str, jnp.ndarray],
                     loss_cfg: CodeLossConfig,
                     binary_loss_weight: float = 3.0,
                     predict_entire_mask: bool = True
                     ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """batch: {"image" [N,H,W,3] (normalized), "mask" [N,h,w],
    "entire_mask" [N,h,w], "code" [N,h,w,bits]}.

    Unjitted body so `train.fleet` can vmap it over a stacked fleet of
    per-object states; use the jitted `train_step` everywhere else."""

    def loss_fn(params):
        outputs, mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            batch["image"], train=True, mutable=["batch_stats"])
        gt_entire = batch.get("entire_mask") if predict_entire_mask else None
        loss, new_hist, metrics = total_loss(
            outputs, batch["mask"], gt_entire, batch["code"],
            state.histogram, loss_cfg, binary_loss_weight)
        return loss, (mutated["batch_stats"], new_hist, metrics)

    grads, (new_stats, new_hist, metrics) = jax.grad(
        loss_fn, has_aux=True)(state.params)
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
