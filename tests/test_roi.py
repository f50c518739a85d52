"""ROI parity tests: device sampling kernels vs a cv2 oracle.

The oracle re-creates the documented preprocessing contract (SURVEY.md
§2.2 / §7.4: square-expand with C truncation, zero-pad out-of-image,
cv2.resize; warpAffine with CenterNet triangle) using cv2 itself, which is
the ground truth the reference's outputs were produced with.
"""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from zebrapose_tpu.ops.roi import (
    padding_bbox,
    augment_bbox,
    square_bbox,
    final_bbox,
    warp_affine_params,
    extract_roi_square,
    extract_roi_clipped,
    extract_roi_affine,
    map_pixels_to_original,
)


def _oracle_square_crop(img, bbox, crop, interp):
    """Zero-padded square crop + cv2.resize, per the reference contract."""
    x1f, y1f, bw, bh = float(bbox[0]), float(bbox[1]), max(float(bbox[2]), 0), \
        max(float(bbox[3]), 0)
    x2f, y2f = x1f + bw, y1f + bh
    cx, cy = 0.5 * (x1f + x2f), 0.5 * (y1f + y2f)
    if bh > bw:
        x1f, x2f = cx - bh / 2, cx + bh / 2
    else:
        y1f, y2f = cy - bw / 2, cy + bw / 2
    x1, y1, x2, y2 = int(x1f), int(y1f), int(x2f), int(y2f)
    side = int(max(bh, bw))
    if img.ndim > 2:
        roi = np.zeros((side, side, img.shape[2]), img.dtype)
    else:
        roi = np.zeros((side, side), img.dtype)
    rx1 = max(-x1, 0)
    x1c = max(x1, 0)
    rx2 = rx1 + min(img.shape[1] - x1c, x2 - x1c)
    ry1 = max(-y1, 0)
    y1c = max(y1, 0)
    ry2 = ry1 + min(img.shape[0] - y1c, y2 - y1c)
    x2c = min(x2, img.shape[1])
    y2c = min(y2, img.shape[0])
    roi[ry1:ry2, rx1:rx2] = img[y1c:y2c, x1c:x2c]
    return cv2.resize(roi, (crop, crop), interpolation=interp)


@pytest.mark.parametrize("bbox", [
    (100, 60, 80, 120),     # fully inside, tall
    (-20, -10, 90, 70),     # crosses top-left corner
    (500, 300, 200, 150),   # crosses bottom-right (img 640x480)
    (30, 40, 64, 64),       # already square
])
@pytest.mark.parametrize("interp", ["linear", "nearest"])
def test_square_roi_matches_cv2(bbox, interp):
    rng = np.random.default_rng(3)
    img = rng.random((480, 640, 3)).astype(np.float32)
    cvi = cv2.INTER_LINEAR if interp == "linear" else cv2.INTER_NEAREST
    crop = 64
    expect = _oracle_square_crop(img, bbox, crop, cvi)
    sq = np.array(square_bbox(np.array(bbox)), dtype=np.int32)
    got = np.asarray(extract_roi_square(jnp.asarray(img), jnp.asarray(sq),
                                        crop, interp))
    atol = 1e-5 if interp == "nearest" else 2e-5
    np.testing.assert_allclose(got, expect, atol=atol)


@pytest.mark.parametrize("interp", ["linear", "nearest"])
def test_clipped_roi_matches_cv2(interp):
    rng = np.random.default_rng(4)
    img = rng.random((480, 640, 3)).astype(np.float32)
    bbox = np.array([-15, 30, 120, 200])
    fb = final_bbox(bbox, "crop_resize", 640, 480)
    x1, y1, w, h = (int(v) for v in fb)
    cvi = cv2.INTER_LINEAR if interp == "linear" else cv2.INTER_NEAREST
    expect = cv2.resize(img[y1:y1 + h, x1:x1 + w], (64, 64),
                        interpolation=cvi)
    got = np.asarray(extract_roi_clipped(
        jnp.asarray(img), jnp.asarray(fb.astype(np.int32)), 64, interp))
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_affine_roi_matches_cv2_warp():
    rng = np.random.default_rng(5)
    img = rng.random((480, 640, 3)).astype(np.float32)
    bbox = np.array([100, 60, 90, 130])
    cx, cy, scale = warp_affine_params(bbox, (480, 640))
    # cv2 oracle: CenterNet triangle affine, rot=0
    crop = 64
    src = np.array([[cx, cy], [cx, cy - scale * 0.5]], np.float32)
    dst = np.array([[crop * 0.5, crop * 0.5],
                    [crop * 0.5, crop * 0.5 - crop * 0.5]], np.float32)

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]], np.float32)

    src3 = np.vstack([src, third(src[0], src[1])])
    dst3 = np.vstack([dst, third(dst[0], dst[1])])
    M = cv2.getAffineTransform(src3, dst3)
    expect = cv2.warpAffine(img, M, (crop, crop), flags=cv2.INTER_LINEAR)
    got = np.asarray(extract_roi_affine(
        jnp.asarray(img),
        jnp.asarray(np.array([cx, cy, scale], np.float32)), crop, "linear"))
    # cv2.warpAffine uses 5-bit fixed-point interp coefficients -> tol
    np.testing.assert_allclose(got, expect, atol=2e-2)
    assert np.mean(np.abs(got - expect)) < 2e-3


def test_padding_bbox_matches_reference_math():
    bb = np.array([10, 20, 33, 47])
    pb = padding_bbox(bb, 1.5)
    # padded w,h = int(33*1.5)=49, int(47*1.5)=70; center (26.5, 43.5)
    assert pb.tolist() == [int(26.5 - 49 / 2), int(43.5 - 70 / 2), 49, 70]


def test_augment_bbox_bounds():
    rng = np.random.default_rng(6)
    bb = np.array([50, 50, 40, 60])
    for _ in range(50):
        ab = augment_bbox(bb, 1.5, rng)
        assert 40 * 0.75 * 1.5 - 1 <= ab[2] <= 40 * 1.25 * 1.5
        assert 60 * 0.75 * 1.5 - 1 <= ab[3] <= 60 * 1.25 * 1.5


def test_final_bbox_square_negative_trunc():
    # bbox crossing the border: truncation toward zero on negatives
    bb = np.array([-10, 5, 30, 50])
    fb = final_bbox(bb, "crop_square_resize", 640, 480)
    x1, y1, x2, y2, side = square_bbox(bb)
    assert fb.tolist() == [x1, y1, x2 - x1, y2 - y1]
    assert side == 50


def test_map_pixels_to_original_trunc():
    bbox = jnp.asarray(np.array([7, -3, 100, 100], np.int64))
    px = jnp.asarray(np.array([[0, 0], [127, 127], [64, 3]], np.float32))
    out = np.asarray(map_pixels_to_original(px, bbox, 128))
    expect_x = (100 / 128 * px[:, 0] + 7).astype(int)
    expect_y = (100 / 128 * px[:, 1] - 3).astype(int)
    np.testing.assert_array_equal(out[:, 0], np.asarray(expect_x))
    np.testing.assert_array_equal(out[:, 1], np.asarray(expect_y))
