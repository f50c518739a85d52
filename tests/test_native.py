"""Native C++ library tests: rasterizer, partitioner, edge refiner."""

import numpy as np
import pytest

native = pytest.importorskip("zebrapose_tpu.native")

K = np.array([[400.0, 0, 64.0], [0, 400.0, 64.0], [0, 0, 1]])


def _cube_mesh(size=50.0):
    s = size / 2
    v = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                  for z in (-s, s)], np.float32)
    # 12 triangles, outward order not required (no culling)
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return v, f


def test_render_single_triangle_coverage_and_ids():
    v = np.array([[-20, -20, 0], [20, -20, 0], [0, 25, 0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    R = np.eye(3)
    t = np.array([0, 0, 400.0])
    cls, depth = native.render_label(v, f, np.array([7], np.int32), K, R,
                                     t, 128, 128, with_depth=True)
    assert set(np.unique(cls)) == {0, 7}
    ys, xs = np.nonzero(cls)
    # projected triangle: x in [44,84], y in [44,89] around center 64
    assert 40 < xs.min() < 50 and 78 < xs.max() < 88
    assert np.allclose(depth[cls == 7], 400.0, atol=0.5)
    # centroid pixel is inside
    assert cls[64, 64] == 7


def test_render_zbuffer_ordering():
    # two triangles, nearer one wins
    v = np.array([[-30, -30, 0], [30, -30, 0], [0, 40, 0],
                  [-30, -30, -100], [30, -30, -100], [0, 40, -100]],
                 np.float32)
    f = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    cls, depth = native.render_label(
        v, f, np.array([1, 2], np.int32), K, np.eye(3),
        np.array([0, 0, 500.0]), 128, 128, with_depth=True)
    assert cls[64, 64] == 2  # z=400 beats z=500
    assert abs(depth[64, 64] - 400.0) < 1.0


def test_render_matches_projection_of_cube():
    v, f = _cube_mesh()
    rng = np.random.default_rng(90)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = np.array([0, 0, 500.0])
    cls, depth = native.render_label(v, f, np.arange(1, 13, dtype=np.int32),
                                     K, q, t, 128, 128, with_depth=True)
    fg = cls > 0
    assert 500 < fg.sum() < 128 * 128  # object visible, not full frame
    # every foreground depth within the cube's depth range
    d = depth[fg]
    assert d.min() > 500 - 60 and d.max() < 500 + 60


def test_partition_balanced_hierarchical():
    rng = np.random.default_rng(91)
    pts = rng.normal(size=(4096, 3)).astype(np.float32) * 30
    ids = native.partition_mesh(pts, divide_number=2, n_levels=4)
    assert ids.min() >= 0 and ids.max() < 16
    counts = np.bincount(ids, minlength=16)
    assert counts.max() - counts.min() <= 4  # balanced leaves
    # hierarchical: coarse split (top bit) is spatially coherent —
    # mean positions of the two halves differ substantially
    m0 = pts[ids < 8].mean(axis=0)
    m1 = pts[ids >= 8].mean(axis=0)
    assert np.linalg.norm(m0 - m1) > 10

    # general d
    ids4 = native.partition_mesh(pts, divide_number=4, n_levels=2)
    counts4 = np.bincount(ids4, minlength=16)
    assert counts4.max() - counts4.min() <= 8


def test_face_classes_majority_vote():
    vc = np.array([5, 5, 9, 7, 9, 9], np.uint32)
    faces = np.array([[0, 1, 2],   # two 5s -> 5
                      [2, 4, 3],   # two 9s -> 9
                      [0, 3, 5]], np.int32)  # all distinct -> first (5)
    fc = native.face_classes(vc, faces)
    assert fc.tolist() == [5, 9, 5]


def test_class_centroids_with_nan():
    pts = np.array([[0, 0, 0], [2, 0, 0], [0, 4, 0]], np.float32)
    vc = np.array([0, 0, 2], np.uint32)
    cent = native.class_centroids(pts, vc, 4)
    np.testing.assert_allclose(cent[0], [1, 0, 0])
    np.testing.assert_allclose(cent[2], [0, 4, 0])
    assert np.isnan(cent[1]).all() and np.isnan(cent[3]).all()


def test_edge_refine_converges_toward_truth():
    v, f = _cube_mesh()
    R_true = np.eye(3)
    t_true = np.array([0, 0, 500.0])
    # "detected" contour: silhouette of the true pose
    cls, _ = native.render_label(v, f, np.ones(12, np.int32), K, R_true,
                                 t_true, 128, 128)
    contour = []
    for y in range(1, 127):
        for x in range(1, 127):
            if cls[y, x] and (cls[y, x - 1] == 0 or cls[y, x + 1] == 0 or
                              cls[y - 1, x] == 0 or cls[y + 1, x] == 0):
                contour.append((x, y))
    contour = np.array(contour, np.int32)

    # perturbed start: small rotation + in-plane translation offset
    # (depth is only weakly observable from a silhouette and is heavily
    # damped by design — the reference uses damp_trans=5e5)
    th = np.radians(4.0)
    Rp = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1]]) @ R_true
    tp = t_true + np.array([6.0, -4.0, 0.0])

    def err(R, t):
        pe = v @ R.T + t
        pg = v @ R_true.T + t_true
        return np.linalg.norm(pe - pg, axis=1).mean()

    e0 = err(Rp, tp)
    R2, t2 = native.edge_refine(v, f, K, 128, 128, contour, Rp, tp,
                                iterations=20, damp_rot=1e2,
                                damp_trans=1e2)
    e1 = err(R2, t2)
    assert e1 < e0 * 0.5  # refinement at least halves the ADD error


def test_edge_refine_debug_frames(tmp_path):
    import os

    """debug_dir writes one per-iteration introspection image
    (silhouette / rendered contour / target contour) — the reference's
    edge_refine_debug.cpp capability — and returns the SAME pose as the
    non-debug path."""
    import cv2

    v, f = _cube_mesh()
    R_true = np.eye(3)
    t_true = np.array([0, 0, 500.0])
    cls, _ = native.render_label(v, f, np.ones(12, np.int32), K, R_true,
                                 t_true, 128, 128)
    contour = []
    for y in range(1, 127):
        for x in range(1, 127):
            if cls[y, x] and (cls[y, x - 1] == 0 or cls[y, x + 1] == 0 or
                              cls[y - 1, x] == 0 or cls[y + 1, x] == 0):
                contour.append((x, y))
    contour = np.array(contour, np.int32)
    th = np.radians(4.0)
    Rp = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1]]) @ R_true
    tp = t_true + np.array([6.0, -4.0, 0.0])

    dbg = str(tmp_path / "refine_debug")
    R2, t2 = native.edge_refine(v, f, K, 128, 128, contour, Rp, tp,
                                iterations=5, damp_rot=1e2,
                                damp_trans=1e2, debug_dir=dbg)
    Rn, tn = native.edge_refine(v, f, K, 128, 128, contour, Rp, tp,
                                iterations=5, damp_rot=1e2,
                                damp_trans=1e2)
    np.testing.assert_array_equal(R2, Rn)
    np.testing.assert_array_equal(t2, tn)
    frames = sorted(os.listdir(dbg))
    assert frames == [f"iter_{i:02d}.png" for i in range(5)]
    img = cv2.imread(os.path.join(dbg, "iter_00.png"))
    assert img.shape == (128, 128, 3)
    # all three classes present: silhouette gray, rendered contour
    # green, target contour red (BGR)
    assert (img == (96, 96, 96)).all(-1).any()
    assert (img == (0, 255, 0)).all(-1).any()
    assert (img == (0, 0, 255)).all(-1).any()
