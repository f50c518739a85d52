"""Train state: params, BN stats, optimizer, loss-EMA histogram.

Everything the reference persists in its checkpoint dicts
(`zebrapose/utils_v2.py`: model/optimizer/lr_scheduler state + step +
best_score) lives in one pytree so checkpointing, sharding and the jitted
step all see a single object. The bit-error histogram EMA — Python module
state in the reference (BinaryCodeNet.py:32) — is part of the state, so
it is saved/restored and globally consistent across data-parallel
replicas.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
import optax
from flax import struct

from zebrapose_tpu.models.losses import fresh_histogram


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    histogram: jnp.ndarray
    best_score: jnp.ndarray

    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def make_lr_schedule(base_lr: float, gamma: float = 1.0,
                     log_freq: int = 1000,
                     scheduler_step_size: int = 10) -> Callable:
    """StepLR-as-used-by-the-reference: lr_scheduler.step() is called once
    per `log_freq` train iterations (train_v2.py:333) and StepLR decays
    every `scheduler_step_size` of those calls -> lr = base *
    gamma^(step // (log_freq * scheduler_step_size))."""
    period = log_freq * scheduler_step_size

    def schedule(step):
        return base_lr * (gamma ** (step // period))

    return schedule


def make_optimizer(learning_rate: float, gamma: float = 1.0,
                   log_freq: int = 1000
                   ) -> optax.GradientTransformation:
    """Adam with the reference defaults (torch optim.Adam: b1=0.9,
    b2=0.999, eps=1e-8) and the StepLR-equivalent schedule."""
    return optax.adam(make_lr_schedule(learning_rate, gamma, log_freq))


def create_train_state(model, variables: dict, learning_rate: float,
                       n_bits: int = 16, gamma: float = 1.0,
                       log_freq: int = 1000) -> TrainState:
    tx = make_optimizer(learning_rate, gamma, log_freq)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        histogram=fresh_histogram(n_bits),
        best_score=jnp.zeros((), jnp.float32),
        apply_fn=model.apply,
        tx=tx,
    )
