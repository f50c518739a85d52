"""Profiling hook — the --profile flag SURVEY.md §5 plans for.

The reference has no tracing at all (only a thop FLOPs count); here a
context manager wraps any region in a JAX profiler trace viewable in
TensorBoard/Perfetto, plus a FLOPs/params estimator for the model (the
reference's `thop.profile` harness equivalent)."""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Trace the enclosed region when log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def model_cost(model, example_input) -> dict:
    """FLOPs + parameter count via XLA cost analysis (replaces the
    reference's thop __main__ harness, model/BinaryCodeNet.py:199-205)."""
    variables = model.init(jax.random.PRNGKey(0), example_input,
                           train=False)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))
    lowered = jax.jit(
        lambda v, x: model.apply(v, x, train=False)).lower(
        variables, example_input)
    try:
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
    except Exception:
        flops = float("nan")
    return {"params": n_params, "flops": flops}
