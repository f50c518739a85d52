"""Iteration-based small linear algebra for TPU-friendly batching.

`jnp.linalg.eigh`/`svd` on tiny matrices lower to sequential QR-iteration
loops that do not vectorize across a vmapped batch on TPU — in the RANSAC
solver they dominate the whole pipeline (batch x hypotheses ~ thousands
of 12x12 eigh + 3x3 svd per step). These replacements use only matmuls
and elementwise ops, so the entire batch executes as a few fused MXU/VPU
kernels:

  * `smallest_subspace`: orthogonal (subspace) iteration on (sigma I - A)
    for the k-dim bottom eigen-subspace of a PSD matrix — exactly what
    EPnP needs (its beta parametrization only requires a basis of the
    near-null space, in roughly ascending eigenvalue order).
  * `polar_rotation`: Newton iteration for the orthogonal polar factor
    (Higham), with the determinant fix for proper rotations — replaces
    the 3x3 SVD in the weighted Procrustes step.

Both are differentiable and fully vmappable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def cholesky_small(A: jnp.ndarray) -> jnp.ndarray:
    """Unrolled Cholesky (lower) for small n, batch dims broadcast.

    n static Python steps, each a vectorized op over the whole batch —
    unlike lax.linalg.cholesky, which lowers to a sequential blocked
    algorithm that can't amortize across thousands of tiny matrices.
    """
    n = A.shape[-1]
    L = jnp.zeros_like(A)
    # floor pivots relative to the matrix scale (f32 cancellation can
    # drive s slightly negative for ill-conditioned inputs)
    floor = 1e-12 * jnp.maximum(
        jnp.max(jnp.abs(jnp.diagonal(A, axis1=-2, axis2=-1)), axis=-1),
        1e-30)
    for j in range(n):
        s = A[..., j, j] - jnp.sum(L[..., j, :j] ** 2, axis=-1)
        d = jnp.sqrt(jnp.maximum(s, floor))
        L = L.at[..., j, j].set(d)
        if j + 1 < n:
            r = A[..., j + 1:, j] - jnp.einsum(
                "...ik,...k->...i", L[..., j + 1:, :j], L[..., j, :j])
            L = L.at[..., j + 1:, j].set(r / d[..., None])
    return L


def cho_solve_small(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve A X = B given lower Cholesky L (A = L L^T), unrolled.

    B: [..., n, m]."""
    n = L.shape[-1]
    # forward: L Y = B
    Y = jnp.zeros_like(B)
    for i in range(n):
        acc = B[..., i, :] - jnp.einsum(
            "...k,...km->...m", L[..., i, :i], Y[..., :i, :])
        Y = Y.at[..., i, :].set(acc / L[..., i, i][..., None])
    # backward: L^T X = Y
    X = jnp.zeros_like(B)
    for i in range(n - 1, -1, -1):
        acc = Y[..., i, :] - jnp.einsum(
            "...k,...km->...m", L[..., i + 1:, i], X[..., i + 1:, :])
        X = X.at[..., i, :].set(acc / L[..., i, i][..., None])
    return X


def solve_psd_small(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """A X = B for small PSD A without lax.linalg (batched, unrolled)."""
    return cho_solve_small(cholesky_small(A), B)


def _gram_schmidt(Y: jnp.ndarray) -> jnp.ndarray:
    """Orthonormalize the k columns of [n, k] (small k, unrolled)."""
    cols = []
    for i in range(Y.shape[-1]):
        v = Y[..., i]
        for u in cols:
            v = v - jnp.sum(v * u, axis=-1, keepdims=True) * u
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                            1e-20)
        cols.append(v)
    return jnp.stack(cols, axis=-1)


def smallest_subspace(A: jnp.ndarray, k: int = 4,
                      iters: int = 4) -> jnp.ndarray:
    """[n, n] PSD -> [n, k] orthonormal basis of the bottom-k
    eigen-subspace, columns ordered (approximately) by ascending
    eigenvalue. Batch dims broadcast.

    Inverse (Cholesky) subspace iteration: near-null eigenvalues of the
    Tikhonov-regularized matrix have enormous relative gaps under
    inversion, so a handful of iterations converges where shifted power
    iteration cannot (the spectrum of sigma*I - A is too compressed).
    One Cholesky factorization is reused across iterations.
    """
    n = A.shape[-1]
    # normalize to O(1) entries — the subspace is scale-invariant and
    # float32 Cholesky needs the regularization floor to be meaningful
    tr = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None]
    s0 = jnp.maximum(tr / n, 1e-30)
    B = A / s0
    Breg = B + 1e-6 * jnp.eye(n, dtype=A.dtype)
    chol = cholesky_small(Breg)

    Y0 = jnp.eye(n, k, dtype=A.dtype) + 0.01
    Y = jnp.broadcast_to(Y0, A.shape[:-2] + (n, k))
    for _ in range(iters):
        Y = cho_solve_small(chol, Y)
        Y = _gram_schmidt(Y)
    # order columns by Rayleigh quotient of A (ascending eigenvalue)
    AY = jnp.matmul(A, Y, precision=_HI)
    rq = jnp.sum(Y * AY, axis=-2)                      # [..., k]
    order = jnp.argsort(rq, axis=-1)
    return jnp.take_along_axis(Y, order[..., None, :], axis=-1)


def _inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 inverse (adjugate / det), batch dims broadcast."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-20,
                    jnp.sign(det) * 1e-20 + (det == 0) * 1e-20, det)
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), (b * f - c * e)], -1),
        jnp.stack([B, (a * i - c * g), -(a * f - c * d)], -1),
        jnp.stack([C, -(a * h - b * g), (a * e - b * d)], -1),
    ], -2)
    return adj / det[..., None, None]


def _det3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 determinant, batch dims broadcast."""
    return (M[..., 0, 0] * (M[..., 1, 1] * M[..., 2, 2]
                            - M[..., 1, 2] * M[..., 2, 1])
            - M[..., 0, 1] * (M[..., 1, 0] * M[..., 2, 2]
                              - M[..., 1, 2] * M[..., 2, 0])
            + M[..., 0, 2] * (M[..., 1, 0] * M[..., 2, 1]
                              - M[..., 1, 1] * M[..., 2, 0]))


def polar_rotation(H: jnp.ndarray, iters: int = 12) -> jnp.ndarray:
    """[.., 3, 3] -> closest rotation matrix (det +1).

    Newton polar iteration X <- (X + X^-T)/2 with scaling; for det(H)<0
    the last row is flipped first (only degenerate RANSAC hypotheses hit
    this branch; real correspondence sets have det > 0, where the polar
    factor IS the Procrustes optimum).
    """
    det = _det3(H)
    # make det positive by flipping the last row when needed; the
    # Procrustes caller only needs the closest proper rotation
    flip = jnp.where(det < 0, -1.0, 1.0)[..., None, None]
    sign_fix = jnp.concatenate([
        jnp.ones_like(H[..., :2, :]),
        jnp.broadcast_to(flip, H[..., 2:3, :].shape)], axis=-2)
    X = H * sign_fix

    # normalize scale for convergence
    norm = jnp.sqrt(jnp.sum(X * X, axis=(-2, -1), keepdims=True))
    X = X / jnp.maximum(norm, 1e-20)

    def body(X, _):
        Xinv_t = jnp.swapaxes(_inv3(X), -1, -2)
        # scaled Newton step (gamma from determinant balancing)
        gamma = jnp.abs(_det3(X))[..., None, None]
        gamma = jnp.power(jnp.maximum(gamma, 1e-20), -1.0 / 3.0)
        X = 0.5 * (gamma * X + Xinv_t / gamma)
        return X, None

    X, _ = jax.lax.scan(body, X, None, length=iters)
    return X


def procrustes_rotation(H: jnp.ndarray) -> jnp.ndarray:
    """Rotation maximizing trace(R^T H) — drop-in for the SVD solution
    U diag(1,1,det) V^T of H = U S V^T (note: for H = sum w p_c p_w^T the
    Procrustes R is the polar factor of H)."""
    return polar_rotation(H)
