"""Unit tests for eval runner helpers and debug visualization."""

import os

import cv2
import numpy as np

from zebrapose_tpu.eval.runner import extract_visible_contour
from zebrapose_tpu.utils.visualize import (
    save_code_grid,
    save_mask_panel,
    save_pose_overlay,
)


def test_extract_visible_contour_filters_by_visibility():
    entire = np.zeros((64, 64), np.float32)
    entire[10:50, 10:50] = 1.0
    visible = np.zeros((64, 64), np.float32)
    visible[10:30, 10:50] = 1.0  # bottom half occluded
    pts = extract_visible_contour(entire, visible)
    assert len(pts) > 0
    # all returned contour pixels touch the visible mask's neighborhood
    assert (pts[:, 1] <= 31).all()
    # occluded bottom edge (y=49) is not returned
    assert not ((pts[:, 1] > 40)).any()


def test_extract_visible_contour_drops_tiny_blobs():
    entire = np.zeros((64, 64), np.float32)
    entire[5:8, 5:8] = 1.0  # ~12 px contour < 20 threshold
    visible = entire.copy()
    assert len(extract_visible_contour(entire, visible)) == 0


def test_visualize_outputs(tmp_path):
    rng = np.random.default_rng(130)
    pred_mask = (rng.random((32, 32)) > 0.5).astype(np.float32)
    gt_mask = (rng.random((32, 32)) > 0.5).astype(np.float32)
    p1 = str(tmp_path / "mask.png")
    save_mask_panel(p1, pred_mask, gt_mask)
    img = cv2.imread(p1, 0)
    assert img.shape == (32, 96)  # pred | gt | diff

    code = (rng.random((16, 16, 8)) > 0.5).astype(np.float32)
    p2 = str(tmp_path / "code.png")
    save_code_grid(p2, code, code, cols=4)
    grid = cv2.imread(p2)
    assert grid.shape == (32, 64, 3)
    # identical codes -> all-green grid, no red
    assert grid[..., 2].max() == 0 and grid[..., 1].max() > 0

    # pose overlay draws a contour on the crop
    s = 25.0
    v = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                  for z in (-s, s)], np.float32)
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    K = np.array([[400.0, 0, 320.0], [0, 400.0, 240.0], [0, 0, 1]])
    crop = np.full((64, 64, 3), 50, np.uint8)
    p3 = str(tmp_path / "pose.png")
    save_pose_overlay(p3, crop, v, f, K, np.eye(3),
                      np.array([0, 0, 500.0]),
                      final_bbox=np.array([288, 208, 64, 64]),
                      crop_size=64)
    out = cv2.imread(p3)
    assert (out[..., 1] > 200).any()  # green contour pixels drawn
