"""Multi-instance (test_vivo) path: two instances of the same object in
one image, both recovered through the flattened batched pipeline."""

import os

import cv2
import numpy as np

from zebrapose_tpu.codec.lut import CorrespondenceLUT
from zebrapose_tpu.eval.evaluate import make_eval_step
from zebrapose_tpu.eval.vivo import build_vivo_dataset, evaluate_vivo
from zebrapose_tpu.ops.pnp import PnPConfig

H, W = 96, 160
K = np.array([[500.0, 0, 80.0], [0, 500.0, 48.0], [0, 0, 1]], np.float32)
N_BITS = 16


def _pose(rng):
    a = rng.normal(size=(3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32), np.array([0, 0, 600], np.float32)


def _gt_oracle_forward(batch, variables=None):
    mask_logits = (batch["mask"] * 20.0 - 10.0)[..., None]
    return {"mask": mask_logits, "entire_mask": mask_logits,
            "code": batch["code"] * 20.0 - 10.0}


def test_vivo_two_instances(tmp_path):
    ds = tmp_path / "bop" / "tless"
    scene = ds / "test" / "000007"
    (scene / "rgb").mkdir(parents=True)
    gt_dir = ds / "test_GT_v2" / "000007"
    gt_dir.mkdir(parents=True)
    rng = np.random.default_rng(70)
    Kinv = np.linalg.inv(K)

    lut_pts = np.zeros((2 ** N_BITS, 3), np.float32)
    lut_valid = np.zeros((2 ** N_BITS,), bool)
    label = np.zeros((H, W, 3), np.uint8)
    regions = [(30, 70, 10, 55), (25, 65, 90, 140)]  # two instances
    poses = []
    next_id = 1
    R0, t0 = _pose(rng)  # both instances share object geometry? No —
    # vivo instances are separate physical objects; give each its own pose
    for (y0, y1, x0, x1) in regions:
        R, t = _pose(rng)
        poses.append((R, t))
        for y in range(y0, y1):
            for x in range(x0, x1):
                depth = 600.0 + 6 * np.sin(x * 0.25) * np.cos(y * 0.2)
                pc = Kinv @ np.array([x * depth, y * depth, depth])
                pw = R.T @ (pc - t)
                cid = next_id
                next_id += 1
                lut_pts[cid] = pw
                lut_valid[cid] = True
                label[y, x] = ((cid >> 16) & 255, (cid >> 8) & 255,
                               cid & 255)

    rgb_fn = str(scene / "rgb" / "000000.png")
    cv2.imwrite(rgb_fn, np.full((H, W, 3), 100, np.uint8))
    cv2.imwrite(str(gt_dir / "000000_000000.png"), label)
    lut = CorrespondenceLUT(lut_pts, lut_valid, base=2, n_digits=N_BITS)

    # the vivo dataset has no mask files; the oracle needs batch["mask"],
    # which comes from the (empty) mask crop -> use the label's occupancy
    # via the entire-label crop instead: feed mask from code planes
    def oracle(batch, variables=None):
        occupancy = (batch["code"].sum(-1) > 0).astype(np.float32)
        mask_logits = (occupancy * 20.0 - 10.0)[..., None]
        return {"mask": mask_logits, "entire_mask": mask_logits,
                "code": batch["code"] * 20.0 - 10.0}

    detections = {"7/0": [
        {"obj_id": 3, "bbox_est": [10, 30, 45, 40], "score": 0.95},
        {"obj_id": 3, "bbox_est": [90, 25, 50, 40], "score": 0.80},
        {"obj_id": 3, "bbox_est": [0, 0, 10, 10], "score": 0.10},  # < thr
        {"obj_id": 4, "bbox_est": [10, 30, 45, 40], "score": 0.99},
    ]}

    # vivo GT-label trick: point the per-instance dataset at the GT label
    # dir (the CropDatasetHost resolves it from mask_visib name; for vivo
    # entries the mask name is empty -> zeros; patch _gt_label_path)
    dataset, scores = build_vivo_dataset(
        str(ds), "test", [rgb_fn], {rgb_fn: {"cam_K": K}}, detections,
        obj_id=3, score_threshold=0.2, crop_size_img=128, crop_size_gt=64)
    assert len(dataset) == 2 and scores == [0.95, 0.80]
    dataset._gt_label_path = lambda idx: str(gt_dir / "000000_000000.png")

    step = make_eval_step(oracle, lut, crop_img=128, crop_gt=64, base=2,
                          n_bits=N_BITS,
                          resize_method="crop_square_resize",
                          loss_type="BCE",
                          pnp_cfg=PnPConfig(n_hypotheses=64,
                                            max_points=1024))
    Rs, ts, ok = evaluate_vivo(dataset, scores, step, obj_id=3,
                               dataset_name="tless", obj_name="obj03",
                               output_dir=str(tmp_path / "out"),
                               batch_size=2)
    assert ok.all()
    for i, (R, t) in enumerate(poses):
        c = (np.trace(R.T @ Rs[i]) - 1) / 2
        assert np.degrees(np.arccos(np.clip(c, -1, 1))) < 3.0
        assert np.linalg.norm(ts[i] - t) < 15.0

    csv = str(tmp_path / "out" / "pose_result_bop" / "tless_obj03.csv")
    lines = open(csv).read().splitlines()
    assert len(lines) == 3
    assert ",3,0.95," in lines[1] and ",3,0.8," in lines[2]


def _rle_encode(mask: np.ndarray) -> dict:
    """Column-major COCO uncompressed RLE (counts start with background)."""
    flat = mask.reshape(-1, order="F").astype(np.uint8)
    changes = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate([[0], changes, [flat.size]])
    counts = np.diff(bounds).tolist()
    if flat[0] == 1:  # must start with a background run
        counts = [0] + counts
    return {"counts": counts, "size": list(mask.shape)}


def test_vivo_mask_rcnn_rle_replaces_dead_mask_head(tmp_path):
    """Mask-RCNN variant semantics (test_for_mask_rcnn.py:248-251): the
    detector's RLE mask replaces the network mask head at decode time.
    Here the 'model' has a DEAD mask head (all-background logits) and a
    perfect code head — pose recovery must succeed iff the detector
    segmentation is used."""
    ds = tmp_path / "bop" / "tless"
    scene = ds / "test" / "000007"
    (scene / "rgb").mkdir(parents=True)
    gt_dir = ds / "test_GT_v2" / "000007"
    gt_dir.mkdir(parents=True)
    rng = np.random.default_rng(71)
    Kinv = np.linalg.inv(K)

    lut_pts = np.zeros((2 ** N_BITS, 3), np.float32)
    lut_valid = np.zeros((2 ** N_BITS,), bool)
    label = np.zeros((H, W, 3), np.uint8)
    det_mask = np.zeros((H, W), np.uint8)
    R, t = _pose(rng)
    next_id = 1
    for y in range(30, 70):
        for x in range(10, 55):
            depth = 600.0 + 6 * np.sin(x * 0.25) * np.cos(y * 0.2)
            pc = Kinv @ np.array([x * depth, y * depth, depth])
            pw = R.T @ (pc - t)
            cid = next_id
            next_id += 1
            lut_pts[cid] = pw
            lut_valid[cid] = True
            label[y, x] = ((cid >> 16) & 255, (cid >> 8) & 255, cid & 255)
            det_mask[y, x] = 1

    rgb_fn = str(scene / "rgb" / "000000.png")
    cv2.imwrite(rgb_fn, np.full((H, W, 3), 100, np.uint8))
    cv2.imwrite(str(gt_dir / "000000_000000.png"), label)
    lut = CorrespondenceLUT(lut_pts, lut_valid, base=2, n_digits=N_BITS)

    def dead_mask_oracle(batch, variables=None):
        dead = np.full(batch["code"].shape[:3] + (1,), -10.0, np.float32)
        return {"mask": dead, "entire_mask": dead,
                "code": batch["code"] * 20.0 - 10.0}

    detections = {"7/0": [{"obj_id": 3, "bbox_est": [10, 30, 45, 40],
                           "score": 0.95,
                           "segmentation": _rle_encode(det_mask)}]}

    results = {}
    for use_seg in (False, True):
        dataset, scores = build_vivo_dataset(
            str(ds), "test", [rgb_fn], {rgb_fn: {"cam_K": K}}, detections,
            obj_id=3, score_threshold=0.2, crop_size_img=128,
            crop_size_gt=64, use_segmentation=use_seg)
        dataset._gt_label_path = \
            lambda idx: str(gt_dir / "000000_000000.png")
        step = make_eval_step(
            dead_mask_oracle, lut, crop_img=128, crop_gt=64, base=2,
            n_bits=N_BITS, resize_method="crop_square_resize",
            loss_type="BCE",
            pnp_cfg=PnPConfig(n_hypotheses=64, max_points=1024),
            mask_from_dataset=use_seg)
        Rs, ts, ok = evaluate_vivo(dataset, scores, step, obj_id=3,
                                   dataset_name="tless", obj_name="obj03",
                                   batch_size=1)
        results[use_seg] = (Rs[0], ts[0], bool(ok[0]))

    assert not results[False][2]  # dead mask head, no detector mask: fail
    Rr, tr, okr = results[True]
    assert okr  # detector RLE mask rescues the decode
    c = (np.trace(R.T @ Rr) - 1) / 2
    assert np.degrees(np.arccos(np.clip(c, -1, 1))) < 3.0
    assert np.linalg.norm(tr - t) < 15.0
