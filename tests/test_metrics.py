"""Metric parity tests vs scipy/numpy oracles of the bop_toolkit contract."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial import cKDTree

from zebrapose_tpu.ops.metrics import (
    add_error,
    adi_error,
    auc_posecnn,
    auc_step,
    recall_at,
    voc_ap,
)


def _random_pose(rng):
    a = rng.normal(size=(3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = rng.normal(size=3) * 50 + np.array([0, 0, 600])
    return q.astype(np.float32), t.astype(np.float32)


def test_add_matches_numpy():
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(500, 3)).astype(np.float32) * 40
    Re, te = _random_pose(rng)
    Rg, tg = _random_pose(rng)
    expect = np.mean(np.linalg.norm(
        (pts @ Re.T + te) - (pts @ Rg.T + tg), axis=1))
    got = float(add_error(jnp.asarray(Re), jnp.asarray(te), jnp.asarray(Rg),
                          jnp.asarray(tg), jnp.asarray(pts)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_adi_matches_kdtree():
    rng = np.random.default_rng(8)
    pts = rng.normal(size=(700, 3)).astype(np.float32) * 40
    Re, te = _random_pose(rng)
    Rg, tg = _random_pose(rng)
    pe = pts @ Re.T + te
    pg = pts @ Rg.T + tg
    nn = cKDTree(pe).query(pg, k=1)[0]
    expect = nn.mean()
    got = float(adi_error(jnp.asarray(Re), jnp.asarray(te), jnp.asarray(Rg),
                          jnp.asarray(tg), jnp.asarray(pts), chunk=128))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_adi_identity_pose_is_zero():
    rng = np.random.default_rng(9)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    R, t = _random_pose(rng)
    got = float(adi_error(jnp.asarray(R), jnp.asarray(t), jnp.asarray(R),
                          jnp.asarray(t), jnp.asarray(pts), chunk=64))
    assert got < 1e-3


def test_recall_and_step_auc():
    errs = np.array([1.0, 5.0, 11.0, 200.0])
    assert recall_at(errs, diameter=100.0, fraction=0.1) == 0.5
    assert recall_at(errs, diameter=200.0, fraction=0.1) == 0.75
    auc = auc_step(errs)
    # thresholds 10..100: err=1 passes all 10; err=200 passes none
    np.testing.assert_allclose(auc[0], 1.0)
    np.testing.assert_allclose(auc[3], 0.0)
    np.testing.assert_allclose(auc[2], 0.9)  # 11 < 20..100 (9 of 10)


def test_voc_ap_perfect_and_empty():
    assert voc_ap(np.array([np.inf]), np.array([1.0])) == 0.0
    rec = np.array([0.01, 0.05, 0.09])
    prec = np.array([1.0, 1.0, 1.0])
    np.testing.assert_allclose(voc_ap(rec, prec), 1.0, atol=1e-6)


def test_auc_posecnn_reference_behavior():
    # all errors beyond 0.1m -> nan; all tiny -> ~1
    assert np.isnan(auc_posecnn(np.array([0.5, 0.9])))
    good = auc_posecnn(np.array([0.001, 0.002, 0.003]))
    assert 0.9 < good <= 1.0
    mixed = auc_posecnn(np.array([0.001, 0.05, 0.5]))
    assert 0.0 < mixed < good


def test_pose_errors_batched_matches_per_sample():
    """pose_errors (chunked batch programs, one fetch per chunk) must
    equal the per-sample add/adi computation, across failures, missing
    GT, chunk-boundary padding, and both symmetric modes."""
    from zebrapose_tpu.eval.evaluate import pose_errors
    from zebrapose_tpu.ops.metrics import add_error, adi_error

    rng = np.random.default_rng(33)
    n = 11
    verts = rng.uniform(-40, 40, (200, 3)).astype(np.float32)

    def rot():
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        return q.astype(np.float32)

    Rs = np.stack([rot() for _ in range(n)])
    ts = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    ok = np.ones((n,), bool)
    ok[2] = False
    gts = []
    for i in range(n):
        gts.append({"cam_R_m2c": rot(),
                    "cam_t_m2c": rng.uniform(-10, 10, 3).astype(
                        np.float32)})
    gts[5] = None

    class FakeDS:
        def __init__(self):
            self.gts = gts

        def __len__(self):
            return n

    ds = FakeDS()

    for symmetric in (False, True):
        got = pose_errors(ds, Rs, ts, ok, verts, symmetric, chunk=4)
        err_fn = adi_error if symmetric else add_error
        for i in range(n):
            if not ok[i] or gts[i] is None:
                assert got[i] == 10000.0
            else:
                want = float(err_fn(
                    jnp.asarray(Rs[i]), jnp.asarray(ts[i]),
                    jnp.asarray(gts[i]["cam_R_m2c"]),
                    jnp.asarray(gts[i]["cam_t_m2c"]), jnp.asarray(verts)))
                np.testing.assert_allclose(got[i], want, rtol=2e-5,
                                           atol=1e-4)
