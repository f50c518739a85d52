"""End-to-end single-object evaluation on a synthetic scene with exact
geometry: GT label images encode class ids whose LUT points back-project
each pixel under a known pose. A GT-oracle forward (logits built from the
batch's own GT planes, i.e. a perfectly-trained network) must let the
full pipeline — dataset -> device preprocess -> binarize -> decode ->
EPnP+RANSAC -> ADD -> CSV — recover every pose well within 0.1d. This is
SURVEY.md §7.3's minimum end-to-end slice as a test.
"""

import os

import cv2
import numpy as np

from zebrapose_tpu.codec.lut import CorrespondenceLUT
from zebrapose_tpu.data.pipeline import CropDatasetHost
from zebrapose_tpu.eval.evaluate import evaluate_object, make_eval_step
from zebrapose_tpu.ops.pnp import PnPConfig

H, W = 96, 128
K = np.array([[500.0, 0, 64.0], [0, 500.0, 48.0], [0, 0, 1]], np.float32)
N_BITS = 16


def _pose(rng):
    a = rng.normal(size=(3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32), np.array([0, 0, 600], np.float32)


def _build_scene(tmp_path, n_imgs=3):
    ds = tmp_path / "bop" / "lmo"
    scene = ds / "test" / "000002"
    (scene / "rgb").mkdir(parents=True)
    (scene / "mask").mkdir()
    (scene / "mask_visib").mkdir()
    gt_dir = ds / "test_GT_v2" / "000002"
    gt_dir.mkdir(parents=True)
    rng = np.random.default_rng(60)
    Kinv = np.linalg.inv(K)

    lut_pts = np.zeros((2 ** N_BITS, 3), np.float32)
    lut_valid = np.zeros((2 ** N_BITS,), bool)
    next_id = 1

    rgb_files, mask_files, maskv_files, gts, gtis, cams = ([] for _ in
                                                           range(6))
    y0, y1, x0, x1 = 28, 72, 44, 96
    for im in range(n_imgs):
        R, t = _pose(rng)
        label = np.zeros((H, W, 3), np.uint8)
        m = np.zeros((H, W), np.uint8)
        for y in range(y0, y1):
            for x in range(x0, x1):
                depth = 600.0 + 8 * np.sin(x * 0.2) * np.cos(y * 0.15)
                pc = Kinv @ np.array([x * depth, y * depth, depth])
                pw = R.T @ (pc - t)
                cid = next_id
                next_id += 1
                lut_pts[cid] = pw
                lut_valid[cid] = True
                label[y, x] = ((cid >> 16) & 255, (cid >> 8) & 255,
                               cid & 255)
                m[y, x] = 255
        cv2.imwrite(str(scene / "rgb" / f"{im:06d}.png"),
                    np.full((H, W, 3), 128, np.uint8))
        cv2.imwrite(str(scene / "mask" / f"{im:06d}_000000.png"), m)
        cv2.imwrite(str(scene / "mask_visib" / f"{im:06d}_000000.png"), m)
        cv2.imwrite(str(gt_dir / f"{im:06d}_000000.png"), label)
        rgb_files.append(str(scene / "rgb" / f"{im:06d}.png"))
        mask_files.append([str(scene / "mask" / f"{im:06d}_000000.png")])
        maskv_files.append(
            [str(scene / "mask_visib" / f"{im:06d}_000000.png")])
        gts.append({"cam_R_m2c": R, "cam_t_m2c": t, "obj_id": 1})
        gtis.append({"bbox_visib": [x0, y0, x1 - x0, y1 - y0],
                     "visib_fract": 0.9})
        cams.append({"cam_K": K})

    lut = CorrespondenceLUT(lut_pts, lut_valid, base=2, n_digits=N_BITS)
    return str(ds), (rgb_files, mask_files, maskv_files, gts, gtis,
                     cams), lut


def _gt_oracle_forward(batch, variables=None):
    """A 'perfectly trained network': logits straight from the GT planes
    the preprocess program produced for this batch."""
    mask_logits = (batch["mask"] * 20.0 - 10.0)[..., None]
    code_logits = batch["code"] * 20.0 - 10.0
    return {"mask": mask_logits, "entire_mask": mask_logits,
            "code": code_logits}


def test_full_eval_recovers_poses(tmp_path):
    ds_dir, lists, lut = _build_scene(tmp_path)
    rgb, mask, maskv, gts, gtis, cams = lists
    dataset = CropDatasetHost(ds_dir, "test", rgb, mask, maskv, gts, gtis,
                              cams, is_train=False, crop_size_img=128,
                              crop_size_gt=64)

    step = make_eval_step(
        _gt_oracle_forward, lut, crop_img=128, crop_gt=64, base=2,
        n_bits=N_BITS, resize_method="crop_square_resize",
        loss_type="BCE", pnp_cfg=PnPConfig(n_hypotheses=64,
                                           max_points=1024))

    vertices = lut.points[lut.valid][::7]
    res = evaluate_object(dataset, step, vertices, diameter=80.0,
                          symmetric=False, obj_id=1, dataset_name="lmo",
                          obj_name="ape", output_dir=str(tmp_path / "out"),
                          batch_size=3)
    assert res.success.all()
    assert res.metrics["ADD_recall_0.1d"] == 1.0
    # integer-pixel quantization bounds accuracy
    assert (res.errors < 8.0).all()
    csv = str(tmp_path / "out" / "pose_result_bop" / "lmo_ape.csv")
    assert os.path.exists(csv)
    assert len(open(csv).read().splitlines()) == 4  # header + 3 images


def test_eval_with_ignore_bits(tmp_path):
    ds_dir, lists, lut = _build_scene(tmp_path, n_imgs=2)
    rgb, mask, maskv, gts, gtis, cams = lists
    dataset = CropDatasetHost(ds_dir, "test", rgb, mask, maskv, gts, gtis,
                              cams, is_train=False, crop_size_img=128,
                              crop_size_gt=64)
    step = make_eval_step(
        _gt_oracle_forward, lut, crop_img=128, crop_gt=64, base=2,
        n_bits=N_BITS, resize_method="crop_square_resize",
        loss_type="BCE", ignore_bits=2,
        pnp_cfg=PnPConfig(n_hypotheses=64, max_points=1024))
    vertices = lut.points[lut.valid][::7]
    res = evaluate_object(dataset, step, vertices, diameter=80.0,
                          symmetric=False, obj_id=1, dataset_name="lmo",
                          obj_name="ape", batch_size=2)
    # dropping the 2 finest bits merges groups of 4 ids; sequential ids
    # are spatial neighbours here, so the pose survives with some loss
    assert res.success.all()
    assert res.metrics["ADD_recall_0.1d"] == 1.0
