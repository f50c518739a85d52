"""Training-step tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from zebrapose_tpu.models.losses import CodeLossConfig
from zebrapose_tpu.models.zebra_net import ZebraPoseNet
from zebrapose_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    scale_for_world,
    shard_batch,
)
from zebrapose_tpu.train.state import (
    create_train_state,
    make_lr_schedule,
)
from zebrapose_tpu.train.train_step import (
    eval_loss_step,
    forward_eval,
    train_step,
)


def _tiny_batch(rng, n=8, img=64, out=32, bits=16):
    return {
        "image": rng.normal(size=(n, img, img, 3)).astype(np.float32),
        "mask": (rng.random((n, out, out)) > 0.5).astype(np.float32),
        "entire_mask": (rng.random((n, out, out)) > 0.3).astype(np.float32),
        "code": (rng.random((n, out, out, bits)) > 0.5).astype(np.float32),
    }


def test_lr_schedule_steplr_semantics():
    sched = make_lr_schedule(2e-4, gamma=0.7)
    assert float(sched(0)) == 2e-4
    assert float(sched(9_999)) == 2e-4
    np.testing.assert_allclose(float(sched(10_000)), 2e-4 * 0.7, rtol=1e-6)
    np.testing.assert_allclose(float(sched(25_000)), 2e-4 * 0.49, rtol=1e-6)


def test_scale_for_world():
    lr, iters = scale_for_world(2e-4, 380_000, 8)
    assert lr == 2e-4 * 8 and iters == 47_500


def test_sharded_train_step_runs_and_learns():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    model = ZebraPoseNet(binary_code_length=16, variant="v2", concat=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    state = create_train_state(model, variables, learning_rate=1e-3)
    state = state.replace(
        step=replicate(mesh, state.step),
        params=replicate(mesh, state.params),
        batch_stats=replicate(mesh, state.batch_stats),
        opt_state=replicate(mesh, state.opt_state),
        histogram=replicate(mesh, state.histogram),
        best_score=replicate(mesh, state.best_score),
    )
    rng = np.random.default_rng(40)
    batch = shard_batch(mesh, _tiny_batch(rng, img=32, out=16))
    cfg = CodeLossConfig()

    state, m0 = train_step(state, batch, cfg)
    assert np.all(np.asarray(state.histogram) >= 0)  # EMA initialized
    losses = [float(m0["loss_total"])]
    for _ in range(3):
        state, m = train_step(state, batch, cfg)
        losses.append(float(m["loss_total"]))
    # same batch repeated -> loss must drop
    assert losses[-1] < losses[0]
    assert int(state.step) == 4

    # eval paths compile and run on the same sharded batch
    em = eval_loss_step(state, batch, cfg)
    assert np.isfinite(float(em["loss_total"]))
    out = forward_eval(state, batch["image"])
    assert out["code"].shape == (8, 16, 16, 16)
    assert out["entire_mask"].shape == (8, 16, 16, 1)
    # histogram is one global vector, not per-device copies
    assert state.histogram.shape == (16,)


def test_shard_batch_multihost_branch_and_local_batch():
    """The multi-host assembly branch (make_array_from_process_local_data)
    and local-batch split are exercisable without a real multi-host job:
    n_processes overrides process_count. In a single-process run the
    local data IS the global batch, so the branch must produce the same
    sharded global array as the device_put path."""
    import pytest

    from zebrapose_tpu.parallel.mesh import local_batch_size

    mesh = make_mesh()
    rng = np.random.default_rng(41)
    batch = _tiny_batch(rng, n=8, img=16, out=8)

    a = shard_batch(mesh, batch)                    # device_put path
    b = shard_batch(mesh, batch, n_processes=8)     # multi-host assembly
    for k in batch:
        assert b[k].shape == batch[k].shape
        assert b[k].sharding.is_equivalent_to(a[k].sharding, b[k].ndim)
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        # really sharded: each device holds 1/8 of the batch axis
        shard_shapes = {s.data.shape for s in b[k].addressable_shards}
        assert shard_shapes == {(1,) + batch[k].shape[1:]}

    assert local_batch_size(32) == 32               # single process
    assert local_batch_size(32, n_processes=4) == 8
    assert local_batch_size(32, n_processes=1) == 32
    with pytest.raises(ValueError, match="divisible"):
        local_batch_size(33, n_processes=4)
