"""Offline GT generation: surface encoding + label rendering end-to-end.

The strongest check closes the loop: partition a sphere mesh, render its
label image under a known pose, then run the rendered labels through the
codec + LUT + PnP decoder — the recovered pose must match the render
pose. This validates partitioner ids, colored-label encoding, rasterizer
geometry and the decode path against each other.
"""

import os

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zebrapose_tpu.codec.lut import load_correspondence_lut
from zebrapose_tpu.codec.surface_code import rgb_to_class_id
from zebrapose_tpu.ops.pnp import PnPConfig, decode_to_pose
from zebrapose_tpu.tools.generate_gt import (
    generate_mesh_surface_code,
    load_obj,
    render_label_image,
)

K = np.array([[400.0, 0, 64.0], [0, 400.0, 64.0], [0, 0, 1]])


def _sphere_obj(tmp_path, n_theta=40, n_phi=80, radius=40.0):
    """Write a UV-sphere OBJ with ~n_theta*n_phi vertices."""
    lines = []
    for i in range(n_theta):
        th = np.pi * (i + 0.5) / n_theta
        for j in range(n_phi):
            ph = 2 * np.pi * j / n_phi
            x = radius * np.sin(th) * np.cos(ph)
            y = radius * np.sin(th) * np.sin(ph)
            z = radius * np.cos(th)
            lines.append(f"v {x} {y} {z}")

    def vid(i, j):
        return i * n_phi + (j % n_phi) + 1

    for i in range(n_theta - 1):
        for j in range(n_phi):
            lines.append(f"f {vid(i, j)} {vid(i + 1, j)} {vid(i, j + 1)}")
            lines.append(
                f"f {vid(i, j + 1)} {vid(i + 1, j)} {vid(i + 1, j + 1)}")
    p = tmp_path / "sphere.obj"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_obj_loader(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3\n"
                 "f 1/1 2/2 4/4 3/3\n")
    m = load_obj(str(p))
    assert m["pts"].shape == (4, 3)
    # quad fan-triangulated into 2 triangles
    assert m["faces"].shape == (3, 3)


def test_surface_code_generation_and_roundtrip(tmp_path):
    mesh = _sphere_obj(tmp_path)
    txt = str(tmp_path / "Class_CorresPoint000001.txt")
    ply = str(tmp_path / "colored.ply")
    lut, face_class = generate_mesh_surface_code(
        mesh, divide_number=2, n_levels=10, corres_txt_path=txt,
        colored_ply_path=ply, seed=1)
    assert lut.num_classes == 1024
    # balanced: ~3.1 vertices per class, most classes occupied
    assert lut.valid.mean() > 0.95
    # reload through the standard loader
    lut2 = load_correspondence_lut(txt)
    np.testing.assert_allclose(lut2.points, lut.points, atol=1e-4)
    assert (lut2.valid == lut.valid).all()
    # centroids lie near the sphere surface
    norms = np.linalg.norm(lut.points[lut.valid], axis=1)
    assert 30 < norms.min() and norms.max() < 41
    assert os.path.exists(ply)


def test_render_decode_closes_loop(tmp_path):
    mesh_path = _sphere_obj(tmp_path)
    txt = str(tmp_path / "corres.txt")
    lut, face_class = generate_mesh_surface_code(
        mesh_path, divide_number=2, n_levels=10, corres_txt_path=txt,
        seed=1)
    mesh = load_obj(mesh_path)
    pts = mesh["pts"].astype(np.float32)
    faces = mesh["faces"].astype(np.int32)

    rng = np.random.default_rng(95)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    R = q.astype(np.float64)
    t = np.array([0, 0, 450.0])

    label = render_label_image(pts, faces, face_class, K, R, t, 128, 128)
    ids = np.asarray(rgb_to_class_id(jnp.asarray(label)))
    fg = ids > 0
    assert fg.sum() > 800

    # decode with the full on-device path: mask + bit planes -> pose
    code = np.stack([(ids >> (9 - b)) & 1 for b in range(10)],
                    axis=-1).astype(np.float32)
    bbox = np.array([0, 0, 128, 128], np.int32)  # label already crop-space
    Re, te, ok, n_in = decode_to_pose(
        jnp.asarray(fg.astype(np.float32)), jnp.asarray(code),
        jnp.asarray(lut.points), jnp.asarray(lut.valid),
        jnp.asarray(bbox), jnp.asarray(K.astype(np.float32)),
        jax.random.PRNGKey(3), bbox_size=128, base=2,
        cfg=PnPConfig(n_hypotheses=128, max_points=2048,
                      reproj_threshold=4.0))
    assert bool(ok)
    # region centroids quantize the geometry (~sphere patches) — accept
    # a few degrees / mm
    cos = (np.trace(R.T @ np.asarray(Re)) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 8.0
    assert abs(float(te[2]) - 450.0) < 25.0


def test_symmetric_label_rendering_canonicalizes(tmp_path):
    mesh_path = _sphere_obj(tmp_path)
    txt = str(tmp_path / "c.txt")
    lut, face_class = generate_mesh_surface_code(
        mesh_path, divide_number=2, n_levels=8, corres_txt_path=txt,
        seed=2)
    mesh = load_obj(mesh_path)
    pts = mesh["pts"].astype(np.float32)
    faces = mesh["faces"].astype(np.int32)
    info = {"symmetries_continuous": [{"axis": [0, 0, 1],
                                       "offset": [0, 0, 0]}]}
    t = np.array([0, 0, 450.0])
    thetas = [0.3, 1.1, 2.5]
    labels = []
    for th in thetas:
        Rz = np.array([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        labels.append(render_label_image(pts, faces, face_class, K, Rz, t,
                                         96, 96, model_info=info))
    # all z-rotations canonicalize to the same label image
    np.testing.assert_array_equal(labels[0], labels[1])
    np.testing.assert_array_equal(labels[0], labels[2])
