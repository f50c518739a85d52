"""roi_slice serving mode: host ships only the clamped square-bbox
bytes; the device resample must be BIT-IDENTICAL to the full-frame path.

The mode exists because sustained serving is host->device-bandwidth
bound (scripts/serving_bench.py): a 480x640 frame is ~921 KB while the
padded bbox region is typically 2-3x smaller. The slice is a pure byte
copy + integer bbox math (the host/device contract of data/pipeline.py),
and extract_roi_square's zero-read/validity semantics make every
out-of-slice tap contribute exactly what the full-frame program
contributes (zero), so equality must be exact — these tests pin it on
adversarial bboxes: interior, crossing each frame border, a square
larger than the frame, and the dummy no-detection bbox.
"""

import cv2
import numpy as np
import jax
import pytest

from zebrapose_tpu.data.pipeline import CropDatasetHost, preprocess_batch

H, W = 96, 128

# (x, y, w, h) detector bboxes chosen so the padded square (ratio 1.5)
# is interior / crosses left+top / crosses right+bottom / outgrows the
# whole frame / is the reference dummy for a missing detection.
BBOXES = [
    np.array([52.0, 38.0, 30.0, 22.0]),     # interior
    np.array([2.0, 1.0, 28.0, 30.0]),       # padded square crosses left/top
    np.array([100.0, 70.0, 26.0, 24.0]),    # crosses right/bottom
    np.array([10.0, 5.0, 110.0, 85.0]),     # square side > both frame dims
    np.array([-1.0, -1.0, -1.0, -1.0]),     # no detection (valid = 0)
]


def _write_scene(tmp_path, n_imgs):
    ds = tmp_path / "bop" / "lmo"
    scene = ds / "test" / "000002"
    (scene / "rgb").mkdir(parents=True)
    (scene / "mask").mkdir()
    (scene / "mask_visib").mkdir()
    gt_dir = ds / "test_GT_v2" / "000002"
    gt_dir.mkdir(parents=True)
    rng = np.random.default_rng(7)
    rgb_files, mask_files, maskv_files, gts, gtis, cams = ([] for _ in
                                                           range(6))
    for im in range(n_imgs):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(str(scene / "rgb" / f"{im:06d}.png"), img)
        m = np.zeros((H, W), np.uint8)
        m[20:80, 30:110] = 255
        cv2.imwrite(str(scene / "mask" / f"{im:06d}_000000.png"), m)
        cv2.imwrite(str(scene / "mask_visib" / f"{im:06d}_000000.png"), m)
        label = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(str(gt_dir / f"{im:06d}_000000.png"), label)
        rgb_files.append(str(scene / "rgb" / f"{im:06d}.png"))
        mask_files.append([str(scene / "mask" / f"{im:06d}_000000.png")])
        maskv_files.append(
            [str(scene / "mask_visib" / f"{im:06d}_000000.png")])
        gts.append({"cam_R_m2c": np.eye(3), "cam_t_m2c": np.zeros(3),
                    "obj_id": 1})
        gtis.append({"bbox_visib": [30, 20, 80, 60], "visib_fract": 0.9})
        cams.append({"cam_K": np.array([500.0, 0, 64, 0, 500, 48, 0, 0,
                                        1.0]).reshape(3, 3)})
    return str(ds), rgb_files, mask_files, maskv_files, gts, gtis, cams


def test_roi_slice_bit_exact_crops(tmp_path):
    tree = _write_scene(tmp_path, len(BBOXES))

    def _mk(roi_slice):
        ds_dir, rgb, mask, maskv, gts, gtis, cams = tree
        return CropDatasetHost(ds_dir, "test", rgb, mask, maskv, gts,
                               gtis, cams, is_train=False,
                               crop_size_img=64, crop_size_gt=32,
                               detect_bboxes=list(BBOXES),
                               roi_slice=roi_slice)

    idx = list(range(len(BBOXES)))
    full = _mk(roi_slice=False).collate(idx)
    sliced = _mk(roi_slice=True).collate(idx)

    # bookkeeping outputs are untouched (decode/PnP stay in original
    # frame coordinates)
    for k in ("final_bbox", "K", "R", "t", "valid"):
        np.testing.assert_array_equal(full[k], sliced[k])
    # roi_param differs exactly by the per-sample slice origin
    shift = full["roi_param"] - sliced["roi_param"]
    np.testing.assert_array_equal(shift[:, 0], shift[:, 2])
    np.testing.assert_array_equal(shift[:, 1], shift[:, 3])
    np.testing.assert_array_equal(shift[:, 4], 0)
    assert (shift[:, :4] >= 0).all()

    # buffer never exceeds the frame (the huge-square sample caps it AT
    # the frame here; the byte REDUCTION is asserted separately below on
    # a typical-detection dataset)
    assert sliced["rgb"].shape[1] <= H and sliced["rgb"].shape[2] <= W
    assert sliced["rgb"].nbytes <= full["rgb"].nbytes

    keys = ("rgb", "label", "mask", "entire_mask", "roi_param", "valid")
    out_full = preprocess_batch(
        {k: full[k] for k in keys}, jax.random.PRNGKey(0), crop_img=64,
        crop_gt=32, n_bits=16, is_train=False)
    out_sliced = preprocess_batch(
        {k: sliced[k] for k in keys}, jax.random.PRNGKey(0), crop_img=64,
        crop_gt=32, n_bits=16, is_train=False)
    for k in out_full:
        np.testing.assert_array_equal(
            np.asarray(out_full[k]), np.asarray(out_sliced[k]),
            err_msg=f"output {k} diverged under roi_slice")


def test_roi_slice_shrinks_h2d_bytes(tmp_path):
    """With typical detections (no frame-sized squares) the shipped
    pixel bytes shrink — the mode's entire purpose."""
    tree = _write_scene(tmp_path, 2)
    ds_dir, rgb, mask, maskv, gts, gtis, cams = tree
    dets = [np.array([52.0, 38.0, 30.0, 22.0]),
            np.array([100.0, 70.0, 26.0, 24.0])]
    a = CropDatasetHost(ds_dir, "test", rgb, mask, maskv, gts, gtis,
                        cams, is_train=False, detect_bboxes=dets,
                        roi_slice=False).collate([0, 1])
    b = CropDatasetHost(ds_dir, "test", rgb, mask, maskv, gts, gtis,
                        cams, is_train=False, detect_bboxes=dets,
                        roi_slice=True).collate([0, 1])
    assert b["rgb"].nbytes < a["rgb"].nbytes / 2


def test_roi_slice_guards(tmp_path):
    with pytest.raises(ValueError):
        ds_dir, rgb, mask, maskv, gts, gtis, cams = _write_scene(
            tmp_path / "a", 1)
        CropDatasetHost(ds_dir, "test", rgb, mask, maskv, gts, gtis,
                        cams, is_train=True, roi_slice=True)
    with pytest.raises(NotImplementedError):
        ds_dir, rgb, mask, maskv, gts, gtis, cams = _write_scene(
            tmp_path / "b", 1)
        CropDatasetHost(ds_dir, "test", rgb, mask, maskv, gts, gtis,
                        cams, is_train=False, roi_slice=True,
                        resize_method="crop_resize")
