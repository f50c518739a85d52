"""Per-object fleet training (train/fleet.py).

The reference trains one network per object and parallelizes over
objects with one python process per GPU (train_v2.py:2-5 +
CUDA_VISIBLE_DEVICES launches). The fleet replaces that with ONE
program: per-object TrainStates stacked on a leading axis, sharded over
a 1-D mesh, advanced by one vmapped train step. These tests pin
(a) the vmapped step to the per-object jitted step numerically,
(b) the stack/slice round-trip, and (c) fit_fleet's cadence
(per-member logs, rolling checkpoints, best-checkpoint selection)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from test_eval_e2e import _build_scene
from test_trainer import TinyZebra
from zebrapose_tpu.config import ZebraConfig
from zebrapose_tpu.data.pipeline import CropDatasetHost, MixedBatchIterator
from zebrapose_tpu.models.losses import CodeLossConfig
from zebrapose_tpu.ops.pnp import PnPConfig
from zebrapose_tpu.train.checkpoints import CheckpointManager
from zebrapose_tpu.train.fleet import (
    FleetResources, fit_fleet, fleet_train_step, index_state,
    make_fleet_mesh, shard_fleet_state, stack_states)
from zebrapose_tpu.train.state import create_train_state
from zebrapose_tpu.train.trainer import TrainResources
from zebrapose_tpu.train.train_step import train_step
from zebrapose_tpu.utils.logging import MetricsLogger

LOSS_CFG = CodeLossConfig(loss_type="BCE", mask_code_loss=False,
                          use_histogram_weighting=True, base=2, n_bits=16)


def _tiny_state(seed):
    model = TinyZebra()
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    return model, create_train_state(model, dict(variables), 1e-3)


def _batch(seed, n=4):
    rng = np.random.default_rng(seed)
    return {
        "image": jnp.asarray(rng.normal(size=(n, 64, 64, 3)), jnp.float32),
        "mask": jnp.asarray(rng.integers(0, 2, (n, 32, 32)), jnp.float32),
        "entire_mask": jnp.asarray(rng.integers(0, 2, (n, 32, 32)),
                                   jnp.float32),
        "code": jnp.asarray(rng.integers(0, 2, (n, 32, 32, 16)),
                            jnp.float32),
    }


def test_fleet_step_matches_per_object_steps():
    """One vmapped fleet step == K independent train_steps (same math,
    same histogram EMA, same optimizer), per object."""
    _, s0 = _tiny_state(0)
    _, s1 = _tiny_state(1)
    b0, b1 = _batch(10), _batch(11)

    fleet = stack_states([s0, s1])
    cat = {k: jnp.concatenate([b0[k], b1[k]]) for k in b0}
    fleet2, fm = fleet_train_step(fleet, cat, n_models=2,
                                  loss_cfg=LOSS_CFG)

    # the shard_map path (one object per device) must agree with the
    # single-device vmap path
    mesh = make_fleet_mesh(jax.devices()[:2])
    _, sm0 = _tiny_state(0)
    _, sm1 = _tiny_state(1)
    sharded = shard_fleet_state(mesh, stack_states([sm0, sm1]))
    fleet_sm, fm_sm = fleet_train_step(sharded, cat, n_models=2,
                                       loss_cfg=LOSS_CFG, mesh=mesh)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6),
        fleet_sm.params, fleet2.params)
    for k in fm:
        np.testing.assert_allclose(np.asarray(fm_sm[k]),
                                   np.asarray(fm[k]),
                                   rtol=1e-4, atol=1e-5)

    # reference path: the standard jitted per-object step
    r0, m0 = train_step(s0, b0, LOSS_CFG)
    r1, m1 = train_step(s1, b1, LOSS_CFG)

    for i, (ref, mref) in enumerate([(r0, m0), (r1, m1)]):
        got = index_state(fleet2, i)
        assert int(got.step) == int(ref.step) == 1
        np.testing.assert_allclose(np.asarray(got.histogram),
                                   np.asarray(ref.histogram),
                                   rtol=1e-5, atol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
            got.params, ref.params)
        for k in mref:
            np.testing.assert_allclose(float(fm[k][i]), float(mref[k]),
                                       rtol=1e-4, atol=1e-5)


def test_stack_index_roundtrip_and_sharding():
    _, s0 = _tiny_state(2)
    _, s1 = _tiny_state(3)
    fleet = stack_states([s0, s1])
    back = index_state(fleet, 1)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        back.params, s1.params)

    mesh = make_fleet_mesh(jax.devices()[:2])
    sharded = shard_fleet_state(mesh, fleet)
    leaf = jax.tree.leaves(sharded.params)[0]
    assert leaf.sharding.is_equivalent_to(
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("model")), leaf.ndim)

    # K not divisible by mesh size -> loud error
    mesh8 = make_fleet_mesh()
    assert mesh8.devices.size == 8
    try:
        shard_fleet_state(mesh8, fleet)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "not divisible" in str(e)


def _member(tmp_path, scene, seed, name):
    ds_dir, lists, lut = scene
    rgb, mask, maskv, gts, gtis, cams = lists
    mk = lambda train: CropDatasetHost(
        ds_dir, "test", rgb, mask, maskv, gts, gtis, cams,
        is_train=train, crop_size_img=64, crop_size_gt=32)
    cfg = ZebraConfig.from_dict({
        "BoundingBox_CropSize_image": 64,
        "BoundingBox_CropSize_GT": 32,
        "batch_size": 4, "total_iteration": 1000,
        "predict_entire_mask": True})
    model, state = _tiny_state(seed)
    out = str(tmp_path / name)
    return TrainResources(
        cfg=cfg, model=model, state=state, mesh=None,
        train_iter=MixedBatchIterator(mk(True), None, batch_size=4),
        val_dataset=mk(False), lut=lut,
        vertices=lut.points[lut.valid][::11], diameter=80.0,
        symmetric=False, obj_id=1, obj_name=name,
        ckpt=CheckpointManager(os.path.join(out, "ck")),
        logger=MetricsLogger(os.path.join(out, "logs"),
                             also_stdout=False),
        total_iterations=1000,
        pnp_cfg=PnPConfig(n_hypotheses=16, max_points=256),
        val_batch_size=3)


def test_fit_fleet_cadence(tmp_path):
    """Two objects, one program: per-member logging, rolling + best
    checkpoints, per-object best recall returned."""
    scene = _build_scene(tmp_path, n_imgs=3)
    members = [_member(tmp_path, scene, 4, "ape"),
               _member(tmp_path, scene, 5, "cat")]
    mesh = make_fleet_mesh(jax.devices()[:2])
    state = shard_fleet_state(mesh,
                              stack_states([m.state for m in members]))
    fleet = FleetResources(members=members, mesh=mesh, state=state)

    best = fit_fleet(fleet, log_freq=5, validate=True, max_steps=5)
    assert len(best) == 2

    for name in ("ape", "cat"):
        assert CheckpointManager(
            os.path.join(str(tmp_path / name), "ck")).latest_step() == 5
        rows = [json.loads(l) for l in
                open(os.path.join(str(tmp_path / name), "logs",
                                  "metrics.jsonl"))]
        tags = {r["tag"] for r in rows}
        assert "train/loss_total" in tags
        assert "train/bit_err_0" in tags
        assert "val/ADD_recall_0.1d" in tags
        losses = [r["value"] for r in rows
                  if r["tag"] == "train/loss_total"]
        assert np.isfinite(losses).all()

    # per-object metrics differ (different inits) -> the two members are
    # genuinely independent models, not one replicated model
    l_ape = [json.loads(l)["value"] for l in
             open(os.path.join(str(tmp_path / "ape"), "logs",
                               "metrics.jsonl"))
             if json.loads(l)["tag"] == "train/loss_total"]
    l_cat = [json.loads(l)["value"] for l in
             open(os.path.join(str(tmp_path / "cat"), "logs",
                               "metrics.jsonl"))
             if json.loads(l)["tag"] == "train/loss_total"]
    assert l_ape != l_cat


def test_fit_fleet_resume(tmp_path):
    """Per-member rolling checkpoints written from the SHARDED fleet
    state restore into fresh members and the fleet continues: the
    index_state -> ckpt.save -> restore -> stack_states round trip."""
    scene = _build_scene(tmp_path, n_imgs=2)
    mesh = make_fleet_mesh(jax.devices()[:2])

    members = [_member(tmp_path, scene, 8, "a"),
               _member(tmp_path, scene, 9, "b")]
    state = shard_fleet_state(mesh,
                              stack_states([m.state for m in members]))
    fit_fleet(FleetResources(members=members, mesh=mesh, state=state),
              log_freq=5, validate=False, max_steps=5)

    members2 = [_member(tmp_path, scene, 10, "a"),
                _member(tmp_path, scene, 11, "b")]
    for m in members2:  # same ckpt dirs (same member names)
        m.state = m.ckpt.restore(m.state)
        assert int(m.state.step) == 5
    state2 = shard_fleet_state(mesh,
                               stack_states([m.state for m in members2]))
    fit_fleet(FleetResources(members=members2, mesh=mesh, state=state2),
              log_freq=5, validate=False, max_steps=5)
    for m in members2:
        assert m.ckpt.latest_step() == 10


def test_fleet_padding_step_matches_per_object_steps():
    """K=3 on a 4-device mesh: stack_states(pad_to=4) adds one ghost row
    (a copy of the last state) so the model axis divides the mesh; the
    real rows' math must be untouched by the ghost."""
    states = [_tiny_state(s)[1] for s in (0, 1, 2)]
    batches = [_batch(20), _batch(21), _batch(22)]

    mesh = make_fleet_mesh(jax.devices()[:4])
    fleet = shard_fleet_state(mesh, stack_states(states, pad_to=4))
    cat = {k: jnp.concatenate([b[k] for b in batches]
                              + [batches[-1][k]]) for k in batches[0]}
    fleet2, fm = fleet_train_step(fleet, cat, n_models=4,
                                  loss_cfg=LOSS_CFG, mesh=mesh)

    for i in range(3):
        ref, mref = train_step(states[i], batches[i], LOSS_CFG)
        got = index_state(fleet2, i)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
            got.params, ref.params)
        for k in mref:
            np.testing.assert_allclose(float(fm[k][i]), float(mref[k]),
                                       rtol=1e-4, atol=1e-5)
    # the ghost row trained on the last member's batch from the last
    # member's init -> bit-identical to the real last row
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        index_state(fleet2, 3).params, index_state(fleet2, 2).params)


def test_fit_fleet_padded_cadence(tmp_path):
    """3 members on a 2-device mesh (n_pad=1), full fit cadence incl.
    the padded fleet VALIDATION program; only real members get
    checkpoints/logs/bests."""
    scene = _build_scene(tmp_path, n_imgs=3)
    members = [_member(tmp_path, scene, s, n)
               for s, n in ((12, "pa"), (13, "pb"), (14, "pc"))]
    mesh = make_fleet_mesh(jax.devices()[:2])
    state = shard_fleet_state(
        mesh, stack_states([m.state for m in members], pad_to=4))
    fleet = FleetResources(members=members, mesh=mesh, state=state,
                           n_pad=1)

    best = fit_fleet(fleet, log_freq=5, validate=True, max_steps=5)
    assert len(best) == 3
    for name in ("pa", "pb", "pc"):
        assert CheckpointManager(
            os.path.join(str(tmp_path / name), "ck")).latest_step() == 5
        rows = [json.loads(l) for l in
                open(os.path.join(str(tmp_path / name), "logs",
                                  "metrics.jsonl"))]
        assert "val/ADD_recall_0.1d" in {r["tag"] for r in rows}


def test_fleet_step_k16():
    """Dataset-scale fleet axis: 16 independent models advance in one
    vmapped step on the 8-device mesh (2 objects/device) and stay
    independent."""
    states = [_tiny_state(s)[1] for s in range(16)]
    batches = [_batch(100 + s, n=2) for s in range(16)]
    mesh = make_fleet_mesh()
    fleet = shard_fleet_state(mesh, stack_states(states))
    cat = {k: jnp.concatenate([b[k] for b in batches])
           for k in batches[0]}
    fleet2, fm = fleet_train_step(fleet, cat, n_models=16,
                                  loss_cfg=LOSS_CFG, mesh=mesh)
    losses = np.asarray(fm["loss_total"])
    assert losses.shape == (16,)
    assert np.isfinite(losses).all()
    assert len(set(np.round(losses, 6))) > 8   # independent models
    # spot-check one member against its independent step
    ref, _ = train_step(states[5], batches[5], LOSS_CFG)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        index_state(fleet2, 5).params, ref.params)


def test_fit_fleet_rejects_mismatched_steps(tmp_path):
    scene = _build_scene(tmp_path, n_imgs=2)
    members = [_member(tmp_path, scene, 6, "a"),
               _member(tmp_path, scene, 7, "b")]
    members[1].state = members[1].state.replace(
        step=jnp.full((), 3, jnp.int32))
    mesh = make_fleet_mesh(jax.devices()[:2])
    state = shard_fleet_state(mesh,
                              stack_states([m.state for m in members]))
    fleet = FleetResources(members=members, mesh=mesh, state=state)
    try:
        fit_fleet(fleet, log_freq=5, validate=False, max_steps=2)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "different steps" in str(e)
    finally:
        for m in members:
            m.train_iter.close()
