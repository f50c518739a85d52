"""Symmetry canonicalization: brute-force-verified minimality and
equivalence-class preservation."""

import numpy as np
import pytest

from zebrapose_tpu.tools.symmetry import canonicalize_pose, _axis_rot


def _rand_R(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def test_no_symmetry_identity():
    rng = np.random.default_rng(80)
    R = _rand_R(rng)
    t = rng.normal(size=(3, 1))
    R2, t2 = canonicalize_pose(R, t, {"diameter": 100})
    np.testing.assert_allclose(R2, R)
    np.testing.assert_allclose(t2, t)


@pytest.mark.parametrize("axis,vec", [("z", [0, 0, 1]), ("y", [0, 1, 0]),
                                      ("x", [1, 0, 0])])
def test_continuous_axis_minimizes_frobenius(axis, vec):
    rng = np.random.default_rng(81)
    info = {"symmetries_continuous": [{"axis": vec, "offset": [0, 0, 0]}]}
    for _ in range(20):
        R = _rand_R(rng)
        t = rng.normal(size=(3, 1))
        Rc, tc = canonicalize_pose(R, t, info)
        # rotation about the symmetry axis must not change the class:
        # Rc = R * S for some axis rotation
        S = R.T @ Rc
        v = np.array(vec, float)
        np.testing.assert_allclose(S @ v, v, atol=1e-8)
        # brute-force minimality over theta grid
        best = min(np.linalg.norm(R @ _axis_rot(th, axis) - np.eye(3))
                   for th in np.linspace(0, 2 * np.pi, 3600))
        got = np.linalg.norm(Rc - np.eye(3))
        assert got <= best + 1e-3
        np.testing.assert_allclose(tc, t)


def test_discrete_symmetry_picks_min():
    rng = np.random.default_rng(82)
    # 180-degree z flip symmetry (eggbox-like)
    flip = np.eye(4)
    flip[:3, :3] = _axis_rot(np.pi, "z")
    info = {"symmetries_discrete": [flip.reshape(-1).tolist()]}
    for _ in range(20):
        R = _rand_R(rng)
        t = rng.normal(size=(3, 1))
        Rc, _ = canonicalize_pose(R, t, info)
        n_id = np.linalg.norm(R - np.eye(3))
        n_fl = np.linalg.norm(R @ flip[:3, :3] - np.eye(3))
        np.testing.assert_allclose(np.linalg.norm(Rc - np.eye(3)),
                                   min(n_id, n_fl), atol=1e-9)


def test_discrete_with_translation_offset():
    rng = np.random.default_rng(83)
    sym = np.eye(4)
    sym[:3, :3] = _axis_rot(np.pi, "z")
    sym[:3, 3] = [5.0, 0, 0]
    info = {"symmetries_discrete": [sym.reshape(-1).tolist()]}
    # force the flip to win: R = flip^T (so R @ flip = I)
    R = _axis_rot(np.pi, "z").T
    t = np.zeros((3, 1))
    Rc, tc = canonicalize_pose(R, t, info)
    np.testing.assert_allclose(Rc, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(tc, R @ sym[:3, 3].reshape(3, 1), atol=1e-12)


def test_combined_discrete_and_continuous_z():
    rng = np.random.default_rng(84)
    flip = np.eye(4)
    flip[:3, :3] = _axis_rot(np.pi, "x")  # a flip that maps z -> -z
    info = {"symmetries_continuous": [{"axis": [0, 0, 1],
                                       "offset": [0, 0, 0]}],
            "symmetries_discrete": [flip.reshape(-1).tolist()]}
    R = _rand_R(rng)
    Rc, _ = canonicalize_pose(R, np.zeros((3, 1)), info)
    # must beat the continuous-only canonicalization of both candidates
    cand = []
    for D in (np.eye(3), flip[:3, :3]):
        best = min(np.linalg.norm(R @ D @ _axis_rot(th, "z") - np.eye(3))
                   for th in np.linspace(0, 2 * np.pi, 3600))
        cand.append(best)
    assert np.linalg.norm(Rc - np.eye(3)) <= min(cand) + 1e-3
