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



def _assert_tree_allclose(a, b, rtol=1e-6, atol=1e-7, exact=False):
    fa, ta = jax.tree_util.tree_flatten(a)
    fb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for i, (x, y) in enumerate(zip(fa, fb)):
        if exact:
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=f"leaf {i}")
        else:
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=rtol, atol=atol,
                                       err_msg=f"leaf {i}")


def _tiny_state(mesh, seed=0, lr=1e-3):
    model = ZebraPoseNet(binary_code_length=16, variant="v2", concat=True)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    state = create_train_state(model, variables, learning_rate=lr)
    return state.replace(**{
        f: replicate(mesh, getattr(state, f))
        for f in ("step", "params", "batch_stats", "opt_state",
                  "histogram", "best_score")})


def test_accum_train_step_k1_matches_train_step():
    """accum_steps=1 is the plain step (same grads/update, only the
    grad/apply jit split differs)."""
    from zebrapose_tpu.train.train_step import accum_train_step

    mesh = make_mesh()
    rng = np.random.default_rng(42)
    batch = shard_batch(mesh, _tiny_batch(rng, n=8, img=32, out=16))
    cfg = CodeLossConfig()

    s_ref, m_ref = train_step(_tiny_state(mesh), batch, cfg)
    s_acc, m_acc = accum_train_step(_tiny_state(mesh), [batch], cfg)

    assert int(s_acc.step) == int(s_ref.step) == 1
    _assert_tree_allclose(s_ref.params, s_acc.params)
    np.testing.assert_allclose(float(m_ref["loss_total"]),
                               float(m_acc["loss_total"]), rtol=1e-6)
    np.testing.assert_allclose(float(m_ref["grad_norm"]),
                               float(m_acc["grad_norm"]), rtol=1e-5)
    # sequential stats threading == the fused step's stats
    _assert_tree_allclose(s_ref.batch_stats, s_acc.batch_stats)
    np.testing.assert_allclose(np.asarray(s_ref.histogram),
                               np.asarray(s_acc.histogram), rtol=1e-6)


def test_accum_identical_micros_update_equals_single_step():
    """BN train mode normalizes with the micro-batch's OWN statistics,
    so with k identical micro-batches every micro-gradient is identical
    and the applied mean gradient equals the single-micro step's — the
    parameter update must match train_step on one micro-batch."""
    from zebrapose_tpu.train.train_step import accum_train_step

    mesh = make_mesh()
    rng = np.random.default_rng(43)
    micro = shard_batch(mesh, _tiny_batch(rng, n=8, img=32, out=16))
    cfg = CodeLossConfig()

    s_ref, _ = train_step(_tiny_state(mesh), micro, cfg)
    s_acc, m_acc = accum_train_step(_tiny_state(mesh), [micro, micro], cfg)

    assert int(s_acc.step) == 1  # k micros = ONE optimizer step
    _assert_tree_allclose(s_ref.params, s_acc.params,
                          rtol=1e-5, atol=1e-6)
    assert np.isfinite(float(m_acc["loss_total"]))


def test_accum_distinct_micros_mean_gradient():
    """With two DIFFERENT micro-batches the accumulated update applies
    the mean of the two micro-gradients: pin against composing the same
    grad/apply primitives by hand."""
    from zebrapose_tpu.train.train_step import (
        accum_train_step,
        apply_accumulated,
        grad_step,
    )

    mesh = make_mesh()
    rng = np.random.default_rng(44)
    m1 = shard_batch(mesh, _tiny_batch(rng, n=8, img=32, out=16))
    m2 = shard_batch(mesh, _tiny_batch(rng, n=8, img=32, out=16))
    cfg = CodeLossConfig()

    # manual composition
    st = _tiny_state(mesh)
    g1, stats1, hist1, met1 = grad_step(st, m1, cfg)
    st1 = st.replace(batch_stats=stats1, histogram=hist1)
    g2, stats2, hist2, met2 = grad_step(st1, m2, cfg)
    gsum = jax.tree.map(jnp.add, g1, g2)
    st2 = st1.replace(batch_stats=stats2, histogram=hist2)
    s_manual, gn = apply_accumulated(st2, gsum, 2)

    s_acc, m_acc = accum_train_step(_tiny_state(mesh), [m1, m2], cfg)

    _assert_tree_allclose(s_manual.params, s_acc.params, exact=True)
    np.testing.assert_array_equal(np.asarray(s_manual.histogram),
                                  np.asarray(s_acc.histogram))
    np.testing.assert_allclose(
        float(m_acc["loss_total"]),
        (float(met1["loss_total"]) + float(met2["loss_total"])) / 2,
        rtol=1e-6)
    np.testing.assert_allclose(float(m_acc["grad_norm"]), float(gn),
                               rtol=1e-6)


def test_accum_learns_and_histogram_advances():
    from zebrapose_tpu.train.train_step import accum_train_step

    mesh = make_mesh()
    rng = np.random.default_rng(45)
    m1 = shard_batch(mesh, _tiny_batch(rng, n=8, img=32, out=16))
    m2 = shard_batch(mesh, _tiny_batch(rng, n=8, img=32, out=16))
    cfg = CodeLossConfig()

    state = _tiny_state(mesh)
    losses = []
    for _ in range(4):
        state, m = accum_train_step(state, [m1, m2], cfg)
        losses.append(float(m["loss_total"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 4
    assert state.histogram.shape == (16,)
    assert np.all(np.asarray(state.histogram) >= 0)
