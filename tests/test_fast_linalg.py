"""fast_linalg vs numpy eigh/svd/cholesky oracles."""

import numpy as np
import jax.numpy as jnp

from zebrapose_tpu.ops.fast_linalg import (
    cholesky_small,
    cho_solve_small,
    polar_rotation,
    smallest_subspace,
    solve_psd_small,
)


def _psd(rng, n, batch=()):
    A = rng.normal(size=batch + (n, n))
    return (A @ np.swapaxes(A, -1, -2) +
            n * np.eye(n)).astype(np.float32)


def test_cholesky_and_solve_match_numpy():
    rng = np.random.default_rng(110)
    A = _psd(rng, 12, (50,))
    L = np.asarray(cholesky_small(jnp.asarray(A)))
    np.testing.assert_allclose(L, np.linalg.cholesky(A), rtol=2e-3,
                               atol=2e-3)
    B = rng.normal(size=(50, 12, 4)).astype(np.float32)
    X = np.asarray(cho_solve_small(jnp.asarray(L), jnp.asarray(B)))
    np.testing.assert_allclose(X, np.linalg.solve(A, B), rtol=2e-2,
                               atol=2e-3)
    X2 = np.asarray(solve_psd_small(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(X2, np.linalg.solve(A, B), rtol=2e-2,
                               atol=2e-3)


def test_smallest_subspace_spans_bottom_eigenvectors():
    rng = np.random.default_rng(111)
    # spectrum like an EPnP MtM: 4 tiny eigenvalues, 8 huge
    for _ in range(5):
        Q, _ = np.linalg.qr(rng.normal(size=(12, 12)))
        lam = np.concatenate([rng.uniform(0, 1e-2, 4),
                              rng.uniform(1e4, 1e7, 8)])
        A = (Q * lam) @ Q.T
        V = np.asarray(smallest_subspace(jnp.asarray(A.astype(np.float32)),
                                         k=4))
        # projector distance to the true bottom subspace
        idx = np.argsort(lam)[:4]
        U = Q[:, idx]
        P_true = U @ U.T
        P_got = V @ V.T
        assert np.abs(P_true - P_got).max() < 1e-3
        # every returned column lies in the bottom (tiny) cluster —
        # ordering inside a cluster is arbitrary and irrelevant to EPnP
        rq = np.array([V[:, i] @ A @ V[:, i] for i in range(4)])
        assert rq.max() < 1.0  # bottom cluster ~1e-2, top >= 1e4


def test_polar_rotation_matches_svd_procrustes():
    rng = np.random.default_rng(112)
    for _ in range(10):
        # H from a genuine rigid correspondence (det > 0)
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        pts = rng.normal(size=(30, 3))
        pc = pts @ q.T + rng.normal(scale=0.01, size=(30, 3))
        H = (pc - pc.mean(0)).T @ (pts - pts.mean(0))
        U, _, Vt = np.linalg.svd(H)
        D = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
        R_svd = U @ D @ Vt
        R = np.asarray(polar_rotation(jnp.asarray(H.astype(np.float32))))
        np.testing.assert_allclose(R, R_svd, atol=5e-4)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_polar_rotation_batched():
    rng = np.random.default_rng(113)
    H = rng.normal(size=(17, 3, 3)).astype(np.float32) + 3 * np.eye(
        3, dtype=np.float32)
    R = np.asarray(polar_rotation(jnp.asarray(H)))
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (17, 1, 1)),
                               atol=1e-3)
