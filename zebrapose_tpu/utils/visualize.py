"""Debug visualization (the reference's --debug dumps, test.py:315-441).

Writes per-image artifacts with cv2 (no GL, no matplotlib): predicted vs
GT mask, per-bit code-error grids, and a pose overlay drawn by rendering
the mesh silhouette under the predicted pose with the native rasterizer
and outlining it on the input crop.
"""

from __future__ import annotations

import os
from typing import Optional

import cv2
import numpy as np


def host_crop(img: np.ndarray, final_bbox, size: int,
              nearest: bool = False) -> np.ndarray:
    """Crop the final-bbox region (zero-padded outside the image) and
    resize to `size` — a host-side cv2 approximation of the device crop,
    good enough for debug artifacts (full cv2-parity crops live in
    ops/roi.py on device)."""
    x, y, w, h = (int(v) for v in final_bbox[:4])
    w, h = max(w, 1), max(h, 1)
    H, W = img.shape[:2]
    canvas_shape = (h, w) + img.shape[2:]
    canvas = np.zeros(canvas_shape, img.dtype)
    sx0, sy0 = max(x, 0), max(y, 0)
    sx1, sy1 = min(x + w, W), min(y + h, H)
    if sx1 > sx0 and sy1 > sy0:
        canvas[sy0 - y:sy1 - y, sx0 - x:sx1 - x] = img[sy0:sy1, sx0:sx1]
    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    return cv2.resize(canvas, (size, size), interpolation=interp)


def save_mask_panel(path: str, pred_mask: np.ndarray,
                    gt_mask: Optional[np.ndarray] = None) -> None:
    """Side-by-side mask comparison (u8 panel)."""
    panels = [np.clip(pred_mask * 255, 0, 255).astype(np.uint8)]
    if gt_mask is not None:
        panels.append(np.clip(gt_mask * 255, 0, 255).astype(np.uint8))
        panels.append((np.abs(pred_mask - gt_mask) * 255).astype(np.uint8))
    cv2.imwrite(path, np.concatenate(panels, axis=1))


def save_code_grid(path: str, pred_code: np.ndarray,
                   gt_code: Optional[np.ndarray] = None,
                   cols: int = 4) -> None:
    """Grid of bit planes; with GT, green=correct fg bit, red=wrong."""
    h, w, n = pred_code.shape
    rows = (n + cols - 1) // cols
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for b in range(n):
        r, c = divmod(b, cols)
        cell = grid[r * h:(r + 1) * h, c * w:(c + 1) * w]
        if gt_code is None:
            cell[..., :] = (pred_code[..., b, None] * 255).astype(np.uint8)
        else:
            ok = pred_code[..., b] == gt_code[..., b]
            cell[..., 1] = np.where(ok, 200, 0)
            cell[..., 2] = np.where(~ok, 200, 0)
    cv2.imwrite(path, grid)


def save_pose_overlay(path: str, crop_bgr: np.ndarray,
                      mesh_pts: np.ndarray, mesh_faces: np.ndarray,
                      K: np.ndarray, R: np.ndarray, t: np.ndarray,
                      final_bbox: np.ndarray, crop_size: int,
                      color=(0, 255, 0)) -> None:
    """Outline the mesh silhouette under (R, t) on the crop.

    The mesh is rendered at full-image resolution implied by the final
    bbox mapping, then the silhouette contour is mapped into crop pixel
    space and drawn.
    """
    from zebrapose_tpu import native

    h = w = crop_size
    # adjust intrinsics so the crop region fills the render target
    sx = crop_size / max(float(final_bbox[2]), 1.0)
    sy = crop_size / max(float(final_bbox[3]), 1.0)
    Kc = np.array(K, np.float64).copy()
    Kc[0, 0] *= sx
    Kc[1, 1] *= sy
    Kc[0, 2] = (K[0, 2] - float(final_bbox[0])) * sx
    Kc[1, 2] = (K[1, 2] - float(final_bbox[1])) * sy
    ids, _ = native.render_label(
        mesh_pts.astype(np.float32), mesh_faces.astype(np.int32),
        np.ones(len(mesh_faces), np.int32), Kc, np.asarray(R, np.float64),
        np.asarray(t, np.float64).reshape(3), w, h)
    mask = (ids > 0).astype(np.uint8) * 255
    contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_NONE)
    img = np.ascontiguousarray(crop_bgr.astype(np.uint8))
    cv2.drawContours(img, contours, -1, color, 1)
    cv2.imwrite(path, img)


def dump_debug_sample(out_dir: str, index: int, crop_bgr, pred_mask,
                      gt_mask, pred_code, gt_code, mesh_pts, mesh_faces,
                      K, R_pred, t_pred, final_bbox,
                      R_gt=None, t_gt=None,
                      render_pred: bool = True) -> None:
    """One-call debug dump for a single evaluated sample. Pose overlays
    are skipped when the mesh has no faces (point-cloud PLY) or the
    predicted pose is a failure placeholder (render_pred=False)."""
    os.makedirs(out_dir, exist_ok=True)
    p = lambda name: os.path.join(out_dir, f"{index:06d}_{name}.png")
    save_mask_panel(p("mask"), pred_mask, gt_mask)
    save_code_grid(p("code_err"), pred_code, gt_code)
    if mesh_faces is None or len(mesh_faces) == 0:
        return
    if render_pred:
        save_pose_overlay(p("pose"), crop_bgr, mesh_pts, mesh_faces, K,
                          R_pred, t_pred, final_bbox, crop_bgr.shape[0])
    if R_gt is not None:
        save_pose_overlay(p("pose_gt"), crop_bgr, mesh_pts, mesh_faces,
                          K, R_gt, t_gt, final_bbox, crop_bgr.shape[0],
                          color=(255, 0, 0))
