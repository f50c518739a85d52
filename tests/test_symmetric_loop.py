"""Pins the property the round-5 symmetric closed loop rests on
(scripts/rehearsal_symmetric.py, VALIDATION.md round 5): for a
continuous-z-symmetric object, the PRODUCTION label path
(render_label_image with a symmetries_continuous model_info — the
generate_training_labels_for_BOP_v2.py:90-208 equivalent) produces
labels that are PIXEL-IDENTICAL under z-rotated poses, and the
z-invariant texture recipe really is z-invariant. Together these are
what make the canonicalized learning task well-posed (and what the raw
-label control run demonstrably lacks: equal-budget val ADD-S 0.983
vs 0.733 at 0.1d, 0.958 vs 0.458 at 0.05d)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "scripts"))

from rehearsal_symmetric import IMG_H, IMG_W, K, sym_color  # noqa: E402

from zebrapose_tpu import native
from zebrapose_tpu.tools.generate_gt import render_label_image

Z_INFO = {"symmetries_continuous": [{"axis": [0, 0, 1],
                                     "offset": [0, 0, 0]}]}


def tiny_pear(n_u=40, n_phi=40):
    """Small surface of revolution (1600 verts >= 2^10 classes)."""
    u = np.linspace(0, 1, n_u)
    z = (u - 0.5) * 70.0
    r = 35.0 * np.sin(np.pi * u) ** 0.75 * (0.55 + 0.45 * u)
    phis = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    Rr, Pp = np.meshgrid(r, phis, indexing="ij")
    Zz = np.broadcast_to(z[:, None], Rr.shape)
    pts = np.stack([Rr * np.cos(Pp), Rr * np.sin(Pp), Zz],
                   axis=-1).reshape(-1, 3)
    idx = np.arange(n_u * n_phi).reshape(n_u, n_phi)
    faces = []
    for i in range(n_u - 1):
        for j in range(n_phi):
            j2 = (j + 1) % n_phi
            a, b = idx[i, j], idx[i, j2]
            c, d = idx[i + 1, j], idx[i + 1, j2]
            faces.append([a, b, c])
            faces.append([b, d, c])
    return pts.astype(np.float32), np.asarray(faces, np.int32)


def _rz(phi):
    c, s = np.cos(phi), np.sin(phi)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def test_canonical_label_invariant_under_z_rotation():
    pts, faces = tiny_pear()
    vc = native.partition_mesh(pts, 2, 10, seed=0)
    fc = native.face_classes(vc, faces)
    rng = np.random.default_rng(3)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = np.array([10.0, 5.0, 550.0])
    lab0 = render_label_image(pts, faces, fc, K, q, t,
                              IMG_W, IMG_H, Z_INFO)
    assert (lab0.sum(-1) > 0).sum() > 500, "object must be visible"
    for phi in (0.7, 2.1, -1.3):
        lab1 = render_label_image(pts, faces, fc, K, q @ _rz(phi), t,
                                  IMG_W, IMG_H, Z_INFO)
        # canonicalize_pose recovers the SAME representative, so the
        # render is bit-identical — not merely close
        assert (lab0 == lab1).all()


def test_label_without_symmetry_info_depends_on_azimuth():
    """Control direction: WITHOUT canonicalization the label rotates
    with the pose — the inconsistency the v2 recipe removes."""
    pts, faces = tiny_pear()
    vc = native.partition_mesh(pts, 2, 10, seed=0)
    fc = native.face_classes(vc, faces)
    rng = np.random.default_rng(4)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = np.array([0.0, 0.0, 550.0])
    lab0 = render_label_image(pts, faces, fc, K, q, t,
                              IMG_W, IMG_H, model_info=None)
    lab1 = render_label_image(pts, faces, fc, K, q @ _rz(2.0), t,
                              IMG_W, IMG_H, model_info=None)
    both = (lab0.sum(-1) > 0) & (lab1.sum(-1) > 0)
    assert both.sum() > 500
    agree = (lab0 == lab1).all(-1)[both].mean()
    assert agree < 0.5, f"raw labels should disagree, got {agree:.3f}"


def test_canonical_label_invariant_under_discrete_flip():
    """Discrete 2-fold branch (eggbox-class, rehearsal_symmetric
    --sym disc): canonicalization over symmetries_discrete = [Rz(pi)]
    makes labels bit-identical under the flip."""
    from rehearsal_symmetric import SPECS, Y_SQUASH

    pts, faces = tiny_pear()
    pts = pts.copy()
    pts[:, 1] *= Y_SQUASH                      # elliptic cross-section
    vc = native.partition_mesh(pts, 2, 10, seed=0)
    fc = native.face_classes(vc, faces)
    info = SPECS["disc"]["sym_info"]
    rng = np.random.default_rng(6)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = np.array([5.0, -8.0, 560.0])
    flip = np.diag([-1.0, -1.0, 1.0])
    lab0 = render_label_image(pts, faces, fc, K, q, t,
                              IMG_W, IMG_H, info)
    lab1 = render_label_image(pts, faces, fc, K, q @ flip, t,
                              IMG_W, IMG_H, info)
    assert (lab0.sum(-1) > 0).sum() > 500
    assert (lab0 == lab1).all()
    # ...but a NON-symmetry rotation must change the canonical label
    lab2 = render_label_image(pts, faces, fc, K, q @ _rz(0.9), t,
                              IMG_W, IMG_H, info)
    both = (lab0.sum(-1) > 0) & (lab2.sum(-1) > 0)
    assert (lab0 == lab2).all(-1)[both].mean() < 0.9


def test_sym_color_is_azimuth_invariant():
    pts, faces = tiny_pear()
    cen = pts[faces].mean(axis=1)
    c0 = sym_color(cen)
    c1 = sym_color(cen @ _rz(1.234).T)
    np.testing.assert_allclose(c0, c1, atol=1e-5)
    # and it genuinely varies over the surface (something to learn)
    assert c0.std(axis=0).max() > 0.1
