"""Trainer-loop orchestration test with a tiny stand-in model (the real
ZebraPoseNet compile is exercised in test_train_step; here we verify the
fit() cadence: stepping, histogram logging, rolling checkpoints,
validation and resume)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from test_eval_e2e import _build_scene
from zebrapose_tpu.config import ZebraConfig
from zebrapose_tpu.data.pipeline import CropDatasetHost, MixedBatchIterator
from zebrapose_tpu.ops.pnp import PnPConfig
from zebrapose_tpu.parallel.mesh import make_mesh
from zebrapose_tpu.train.checkpoints import CheckpointManager
from zebrapose_tpu.train.state import create_train_state
from zebrapose_tpu.train.trainer import TrainResources, fit
from zebrapose_tpu.utils.logging import MetricsLogger


class TinyZebra(nn.Module):
    """Same output contract as ZebraPoseNet, 3 conv layers."""

    n_bits: int = 16

    @nn.compact
    def __call__(self, x, train=False):
        y = nn.Conv(16, (3, 3), strides=2, padding=1)(x)   # 64 -> 32
        y = nn.relu(y)
        y = nn.Conv(32, (3, 3), padding=1)(y)
        y = nn.relu(y)
        out = nn.Conv(self.n_bits + 2, (1, 1))(y)
        return {"mask": out[..., :1], "entire_mask": out[..., 1:2],
                "code": out[..., 2:]}


def test_fit_runs_logs_checkpoints_and_resumes(tmp_path):
    ds_dir, lists, lut = _build_scene(tmp_path, n_imgs=3)
    rgb, mask, maskv, gts, gtis, cams = lists
    mk = lambda train: CropDatasetHost(
        ds_dir, "test", rgb, mask, maskv, gts, gtis, cams,
        is_train=train, crop_size_img=64, crop_size_gt=32)
    cfg = ZebraConfig.from_dict({
        "BoundingBox_CropSize_image": 64,
        "BoundingBox_CropSize_GT": 32,
        "batch_size": 8, "total_iteration": 1000,
        "predict_entire_mask": True})

    model = TinyZebra()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    state = create_train_state(model, dict(variables), 1e-3)
    out_dir = str(tmp_path / "run")
    train_iter = MixedBatchIterator(mk(True), None, batch_size=8)
    res = TrainResources(
        cfg=cfg, model=model, state=state, mesh=make_mesh(),
        train_iter=train_iter, val_dataset=mk(False), lut=lut,
        vertices=lut.points[lut.valid][::11], diameter=80.0,
        symmetric=False, obj_id=1, obj_name="ape",
        ckpt=CheckpointManager(os.path.join(out_dir, "ck")),
        logger=MetricsLogger(os.path.join(out_dir, "logs"),
                             also_stdout=False),
        total_iterations=1000,
        pnp_cfg=PnPConfig(n_hypotheses=16, max_points=256),
        val_batch_size=3)

    fit(res, log_freq=5, validate=True, max_steps=10)
    train_iter.close()

    assert res.ckpt.latest_step() == 10
    rows = [json.loads(l) for l in
            open(os.path.join(out_dir, "logs", "metrics.jsonl"))]
    tags = {r["tag"] for r in rows}
    assert "train/loss_total" in tags
    assert "train/bit_err_0" in tags
    assert "val/ADD_recall_0.1d" in tags
    losses = [r["value"] for r in rows if r["tag"] == "train/loss_total"]
    assert np.isfinite(losses).all()

    # resume: restore into a fresh state and continue (fresh init —
    # the first state's buffers were donated to train_step)
    variables2 = model.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 64, 64, 3)), train=False)
    state2 = res.ckpt.restore(create_train_state(model, dict(variables2),
                                                 1e-3))
    assert int(state2.step) == 10
    train_iter2 = MixedBatchIterator(mk(True), None, batch_size=8)
    res2 = TrainResources(
        cfg=cfg, model=model, state=state2, mesh=res.mesh,
        train_iter=train_iter2, val_dataset=None, lut=lut,
        vertices=res.vertices, diameter=80.0, symmetric=False,
        obj_id=1, obj_name="ape", ckpt=res.ckpt, logger=res.logger,
        total_iterations=1000)
    fit(res2, log_freq=5, validate=False, max_steps=5)
    train_iter2.close()
    assert res.ckpt.latest_step() == 15


def test_fit_loss_only_validation(tmp_path):
    """val_mode='loss' (train_v6.py:364-399): validation logs mean
    mask/code losses, never pose metrics, and does not touch best."""
    ds_dir, lists, lut = _build_scene(tmp_path, n_imgs=3)
    rgb, mask, maskv, gts, gtis, cams = lists
    mk = lambda train: CropDatasetHost(
        ds_dir, "test", rgb, mask, maskv, gts, gtis, cams,
        is_train=train, crop_size_img=64, crop_size_gt=32)
    cfg = ZebraConfig.from_dict({
        "BoundingBox_CropSize_image": 64,
        "BoundingBox_CropSize_GT": 32,
        "batch_size": 8, "total_iteration": 1000,
        "predict_entire_mask": True})
    model = TinyZebra()
    variables = model.init(jax.random.PRNGKey(2),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    state = create_train_state(model, dict(variables), 1e-3)
    out_dir = str(tmp_path / "run_lossval")
    train_iter = MixedBatchIterator(mk(True), None, batch_size=8)
    res = TrainResources(
        cfg=cfg, model=model, state=state, mesh=make_mesh(),
        train_iter=train_iter, val_dataset=mk(False), lut=lut,
        vertices=lut.points[lut.valid][::11], diameter=80.0,
        symmetric=False, obj_id=1, obj_name="ape",
        ckpt=CheckpointManager(os.path.join(out_dir, "ck")),
        logger=MetricsLogger(os.path.join(out_dir, "logs"),
                             also_stdout=False),
        total_iterations=1000, val_batch_size=3)

    best = fit(res, log_freq=5, validate=True, max_steps=5,
               val_mode="loss")
    assert best == 0.0  # loss-only val never selects a best checkpoint
    rows = [json.loads(l) for l in
            open(os.path.join(out_dir, "logs", "metrics.jsonl"))]
    tags = {r["tag"] for r in rows}
    assert "val/loss_total" in tags
    assert not any(t.startswith("val/ADD") for t in tags)
    vals = [r["value"] for r in rows if r["tag"] == "val/loss_total"]
    assert np.isfinite(vals).all()
    # fit() closed the iterator (try/finally); a second close is a no-op
    train_iter.close()


def test_timed_steps_smoke(tmp_path):
    """timed_steps: the sustained-rate measurement harness runs the same
    step path as fit() (shared _make_batch_fn), returns a positive
    ms/step, and leaves the iterator open for the caller to close."""
    from zebrapose_tpu.train.trainer import timed_steps

    ds_dir, lists, lut = _build_scene(tmp_path, n_imgs=3)
    rgb, mask, maskv, gts, gtis, cams = lists
    ds = CropDatasetHost(
        ds_dir, "test", rgb, mask, maskv, gts, gtis, cams,
        is_train=True, crop_size_img=64, crop_size_gt=32)
    cfg = ZebraConfig.from_dict({
        "BoundingBox_CropSize_image": 64,
        "BoundingBox_CropSize_GT": 32,
        "batch_size": 8, "total_iteration": 1000,
        "predict_entire_mask": True})
    model = TinyZebra()
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    state = create_train_state(model, dict(variables), 1e-3)
    out_dir = str(tmp_path / "run_timed")
    train_iter = MixedBatchIterator(ds, None, batch_size=8)
    res = TrainResources(
        cfg=cfg, model=model, state=state, mesh=make_mesh(),
        train_iter=train_iter, val_dataset=None, lut=lut,
        vertices=lut.points[lut.valid][::11], diameter=80.0,
        symmetric=False, obj_id=1, obj_name="ape",
        ckpt=CheckpointManager(os.path.join(out_dir, "ck")),
        logger=MetricsLogger(os.path.join(out_dir, "logs"),
                             also_stdout=False),
        total_iterations=1000)

    ms = timed_steps(res, n_steps=3, warm=2, sync_freq=2)
    assert np.isfinite(ms) and ms > 0
    # timed_steps does NOT close the iterator (caller owns it)
    assert next(res.train_iter) is not None
    train_iter.close()


def test_train_step_cost_analysis(tmp_path):
    """train_step_cost: XLA's compiled-step cost model is queryable at
    the trainer's real argument shapes and reports a positive flop
    count (the MFU corroboration path, scripts/train_sustained.py
    --cost_analysis). Lowering must not consume res.state."""
    from zebrapose_tpu.train.trainer import train_step_cost

    ds_dir, lists, lut = _build_scene(tmp_path, n_imgs=3)
    rgb, mask, maskv, gts, gtis, cams = lists
    ds = CropDatasetHost(
        ds_dir, "test", rgb, mask, maskv, gts, gtis, cams,
        is_train=True, crop_size_img=64, crop_size_gt=32)
    cfg = ZebraConfig.from_dict({
        "BoundingBox_CropSize_image": 64,
        "BoundingBox_CropSize_GT": 32,
        "batch_size": 8, "total_iteration": 1000,
        "predict_entire_mask": True})
    model = TinyZebra()
    variables = model.init(jax.random.PRNGKey(5),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    state = create_train_state(model, dict(variables), 1e-3)
    out_dir = str(tmp_path / "run_cost")
    train_iter = MixedBatchIterator(ds, None, batch_size=8)
    res = TrainResources(
        cfg=cfg, model=model, state=state, mesh=make_mesh(),
        train_iter=train_iter, val_dataset=None, lut=lut,
        vertices=lut.points[lut.valid][::11], diameter=80.0,
        symmetric=False, obj_id=1, obj_name="ape",
        ckpt=CheckpointManager(os.path.join(out_dir, "ck")),
        logger=MetricsLogger(os.path.join(out_dir, "logs"),
                             also_stdout=False),
        total_iterations=1000)
    ca = train_step_cost(res)
    assert isinstance(ca, dict)
    # XLA:CPU reports flops; tolerate a backend that omits the key,
    # but when present it must be a sane positive count
    if "flops" in ca:
        assert ca["flops"] > 1e6   # 3 convs over 8x64x64 >> 1 MFLOP
    # res is still usable afterwards (lowering executes nothing)
    assert next(res.train_iter) is not None
    train_iter.close()
