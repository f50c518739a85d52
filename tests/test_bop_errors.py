"""Golden tests: BOP pose errors vs the reference's OWN vendored
bop_toolkit fork executing (lib/pysixd/pose_error.py, misc.py,
visibility.py — UNTRUSTED CONTENT: run as numeric oracles only).

The vendored modules import mmcv/numba/png, which are absent here and
unused by the error math; inert stand-ins are installed in sys.modules
first (the same pattern as test_reference_torch_oracle's torchvision
stubs). VSD's renderer is OUR native rasterizer for BOTH sides (wrapped
in the reference's renderer.render_object protocol), isolating the
error math under test from rasterization differences."""

import sys
import types

import numpy as np
import pytest

REF = "/root/reference/zebrapose"
if REF not in sys.path:
    sys.path.append(REF)  # append, not insert: never shadow our modules


def _passthrough_decorator(*args, **kwargs):
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def deco(f):
        return f

    return deco


for _name in ("mmcv", "png", "chardet"):
    if _name not in sys.modules:
        sys.modules[_name] = types.ModuleType(_name)
if "numba" not in sys.modules:
    _numba = types.ModuleType("numba")
    _numba.jit = _passthrough_decorator
    _numba.njit = _passthrough_decorator
    sys.modules["numba"] = _numba

ref_misc = pytest.importorskip("lib.pysixd.misc")
ref_pe = pytest.importorskip("lib.pysixd.pose_error")

from zebrapose_tpu.ops.bop_errors import (  # noqa: E402
    bop19_average_recalls, get_symmetry_transformations, mspd_batch,
    mssd_batch, vsd_batch)


def _rot(rng):
    from scipy.spatial.transform import Rotation
    return Rotation.from_rotvec(rng.normal(size=3)).as_matrix()


def _fuzz_poses(rng, n):
    R_est = np.stack([_rot(rng) for _ in range(n)]).astype(np.float64)
    R_gt = np.stack([_rot(rng) for _ in range(n)]).astype(np.float64)
    t_est = rng.normal([0, 0, 500], 30, (n, 3))
    t_gt = t_est + rng.normal(0, 8, (n, 3))
    return R_est, t_est, R_gt, t_gt


MODEL_INFOS = [
    {},  # no symmetry -> identity only
    {"symmetries_discrete": [
        list(np.block([[_r, np.array([[1.], [2.], [3.]])],
                       [np.zeros((1, 3)), np.ones((1, 1))]]).reshape(-1))
        for _r in (np.diag([1., -1., -1.]), np.diag([-1., 1., -1.]))]},
    {"symmetries_continuous": [{"axis": [0, 0, 1],
                                "offset": [1.0, -2.0, 0.5]}]},
    {"symmetries_discrete": [list(np.diag([-1., -1., 1., 1.]).reshape(-1))],
     "symmetries_continuous": [{"axis": [0, 1, 0], "offset": [0, 0, 0]}]},
]


@pytest.mark.parametrize("info", MODEL_INFOS)
def test_symmetry_transformations_golden(info):
    step = np.pi / 16  # 16 continuous steps keeps S small
    theirs = ref_misc.get_symmetry_transformations(info, step)
    Rs, ts = get_symmetry_transformations(info, step)
    assert len(theirs) == len(Rs)
    for i, tr in enumerate(theirs):
        np.testing.assert_allclose(Rs[i], tr["R"], atol=1e-6)
        np.testing.assert_allclose(ts[i], tr["t"].reshape(3), atol=1e-6)


@pytest.mark.parametrize("info", MODEL_INFOS)
def test_mssd_mspd_golden(info):
    rng = np.random.default_rng(3)
    n, p = 6, 157
    pts = rng.uniform(-40, 40, (p, 3))
    R_est, t_est, R_gt, t_gt = _fuzz_poses(rng, n)
    K = np.tile(np.array([[572.4, 0, 325.3], [0, 573.6, 242.0],
                          [0, 0, 1.0]]), (n, 1, 1))
    K[:, 0, 0] += rng.normal(0, 5, n)  # per-sample intrinsics

    step = np.pi / 16
    syms = ref_misc.get_symmetry_transformations(info, step)
    sym_R, sym_t = get_symmetry_transformations(info, step)

    ours_ssd = np.asarray(mssd_batch(
        R_est.astype(np.float32), t_est.astype(np.float32),
        R_gt.astype(np.float32), t_gt.astype(np.float32),
        pts.astype(np.float32), sym_R, sym_t))
    ours_spd = np.asarray(mspd_batch(
        R_est.astype(np.float32), t_est.astype(np.float32),
        R_gt.astype(np.float32), t_gt.astype(np.float32),
        K.astype(np.float32), pts.astype(np.float32), sym_R, sym_t))

    for i in range(n):
        theirs_ssd = ref_pe.mssd(R_est[i], t_est[i].reshape(3, 1),
                                 R_gt[i], t_gt[i].reshape(3, 1), pts, syms)
        theirs_spd = ref_pe.mspd(R_est[i], t_est[i].reshape(3, 1),
                                 R_gt[i], t_gt[i].reshape(3, 1), K[i],
                                 pts, syms)
        np.testing.assert_allclose(ours_ssd[i], theirs_ssd, rtol=2e-4)
        np.testing.assert_allclose(ours_spd[i], theirs_spd, rtol=2e-4)


def test_add_adi_golden_vs_vendored_pysixd():
    """ops/metrics.add_error/adi_error were oracled vs scipy cKDTree;
    pin them to the reference's own vendored pose_error.add/adi too."""
    from zebrapose_tpu.ops.metrics import add_error, adi_error

    rng = np.random.default_rng(8)
    pts = rng.uniform(-40, 40, (211, 3))
    R_est, t_est, R_gt, t_gt = _fuzz_poses(rng, 5)
    for i in range(5):
        ours_add = float(add_error(
            np.float32(R_est[i]), np.float32(t_est[i]),
            np.float32(R_gt[i]), np.float32(t_gt[i]), np.float32(pts)))
        ours_adi = float(adi_error(
            np.float32(R_est[i]), np.float32(t_est[i]),
            np.float32(R_gt[i]), np.float32(t_gt[i]), np.float32(pts)))
        theirs_add = ref_pe.add(R_est[i], t_est[i].reshape(3, 1),
                                R_gt[i], t_gt[i].reshape(3, 1), pts)
        theirs_adi = ref_pe.adi(R_est[i], t_est[i].reshape(3, 1),
                                R_gt[i], t_gt[i].reshape(3, 1), pts)
        np.testing.assert_allclose(ours_add, theirs_add, rtol=1e-4)
        np.testing.assert_allclose(ours_adi, theirs_adi, rtol=1e-4)


class _NativeRendererShim:
    """Adapter: our C++ rasterizer behind the reference renderer's
    render_object protocol (pose_error.py:62-64)."""

    def __init__(self, vertices, faces, w, h):
        self.vertices, self.faces, self.w, self.h = vertices, faces, w, h

    def render_object(self, obj_id, R, t, fx, fy, cx, cy):
        from zebrapose_tpu.native import render_label
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
        _, depth = render_label(
            self.vertices, self.faces, np.ones(len(self.faces), np.int32),
            K, np.asarray(R, np.float64), np.asarray(t, np.float64).reshape(3),
            self.w, self.h, with_depth=True)
        return {"depth": depth}


@pytest.mark.parametrize("cost_type", ["step", "tlinear"])
def test_vsd_golden(cost_type):
    from test_generate_gt import _sphere_obj
    from zebrapose_tpu.tools.generate_gt import load_obj

    import pathlib
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        mesh = load_obj(str(_sphere_obj(pathlib.Path(td), n_theta=12,
                                        n_phi=18)))
    verts = mesh["pts"].astype(np.float32)
    faces = mesh["faces"]
    diameter = 80.0

    rng = np.random.default_rng(5)
    n, h, w = 4, 96, 128
    R_est, t_est, R_gt, t_gt = _fuzz_poses(rng, n)
    K = np.tile(np.array([[140.0, 0, 64.0], [0, 140.0, 48.0],
                          [0, 0, 1.0]]), (n, 1, 1))

    shim = _NativeRendererShim(verts, faces, w, h)
    # synthetic scene depth: GT render + noise, a missing-depth hole and
    # a closer occluder patch (exercises every visibility branch)
    depth_test = np.zeros((n, h, w), np.float32)
    for i in range(n):
        d = shim.render_object(1, R_gt[i], t_gt[i], K[i, 0, 0],
                               K[i, 1, 1], K[i, 0, 2], K[i, 1, 2])["depth"]
        d = np.where(d > 0, d + rng.normal(0, 2, d.shape), 0)
        d[20:35, 30:50] = 0  # sensor dropout
        d[40:60, 60:90] = 300.0  # occluder in front
        depth_test[i] = d

    taus = list(np.arange(0.05, 0.51, 0.05))
    ours = vsd_batch(R_est, t_est, R_gt, t_gt, depth_test, K, verts,
                     faces, diameter, taus=taus, delta=15.0,
                     cost_type=cost_type)
    assert ours.shape == (n, len(taus))
    for i in range(n):
        theirs = ref_pe.vsd(R_est[i], t_est[i].reshape(3, 1), R_gt[i],
                            t_gt[i].reshape(3, 1), depth_test[i], K[i],
                            15.0, taus, True, diameter, shim, 1,
                            cost_type=cost_type, renderer_type="python")
        np.testing.assert_allclose(ours[i], np.asarray(theirs),
                                   rtol=1e-5, atol=1e-6)


def test_vsd_empty_union_is_one():
    """Both renders empty (object far behind the far plane / out of
    frame) -> visib union 0 -> error 1.0 for every tau
    (pose_error.py:113-114)."""
    import jax.numpy as jnp

    from zebrapose_tpu.ops.bop_errors import _vsd_costs

    n, h, w = 2, 16, 16
    zeros = jnp.zeros((n, h, w), jnp.float32)
    K = jnp.tile(jnp.asarray(np.array(
        [[100.0, 0, 8], [0, 100.0, 8], [0, 0, 1]], np.float32)),
        (n, 1, 1))
    taus = jnp.asarray(np.arange(0.05, 0.51, 0.05, dtype=np.float32))
    errs = np.asarray(_vsd_costs(zeros, zeros, zeros, K, taus, 15.0,
                                 jnp.ones((n,), jnp.float32)))
    np.testing.assert_array_equal(errs, np.ones((n, len(taus))))


def test_bop19_average_recalls():
    # hand-checked: errors straddle the thresholds
    errs_mssd = np.array([0.04 * 80, 0.26 * 80, np.inf])
    errs_mspd = np.array([4.0, 26.0, np.inf])
    out = bop19_average_recalls(None, errs_mssd, errs_mspd, 80.0,
                                im_width=640)
    # sample 1 passes all 10 thresholds, sample 2 passes 5 of 10
    # (0.30..0.50 / 30..50), sample 3 none -> mean = (10+5+0)/30
    assert np.isclose(out["AR_mssd"], 15 / 30)
    assert np.isclose(out["AR_mspd"], 15 / 30)
    assert np.isclose(out["AR"], 15 / 30)
    # with VSD: [N,T] errors, all below every threshold -> recall 1
    errs_vsd = np.zeros((3, 10))
    out = bop19_average_recalls(errs_vsd, errs_mssd, errs_mspd, 80.0)
    assert np.isclose(out["AR_vsd"], 1.0)
    assert np.isclose(out["AR"], (1.0 + 0.5 + 0.5) / 3)
