"""Batched EPnP + RANSAC pose solver, fully on device.

The reference recovers pose on the CPU per image: Python dict lookups per
foreground pixel, then Progressive-X or cv2.solvePnPRansac(EPnP)
(`zebrapose/binary_code_helper/CNN_output_to_pose.py:100-160`). That path
is the throughput ceiling of the whole system (SURVEY.md §7.4), so here it
is a fixed-shape JAX program:

  * correspondences: predicted code planes -> class ids -> one `take`
    gather from the dense LUT; every pixel participates with weight =
    foreground mask instead of `nonzero()` (no ragged shapes). Whenever
    P > cfg.max_points (e.g. the default 128x128 decode grid), ALL
    stages — sampling, scoring, refine, polish, the success gate and
    the reported n_inliers — operate on a <= max_points subset built by
    drawing one random foreground representative per contiguous raster
    block, i.e. uniform over foreground *blocks*, not foreground
    pixels as in cv2.solvePnPRansac (subset-relative n_inliers is
    documented in PARITY.md).
  * hypotheses: `n_hypotheses` minimal 6-point sets sampled with
    `jax.random.categorical` over foreground weights, each solved by a
    vmapped weighted EPnP (beta cases N=1,2,3 + Gauss-Newton on betas,
    the same estimator family as cv2 SOLVEPNP_EPNP).
  * scoring: reprojection of all K retained correspondences against every
    hypothesis in one batched matmul; inliers at `reproj_threshold` px
    (reference uses 2px, CNN_output_to_pose.py:137/157).
  * refinement: re-solve weighted EPnP on the best hypothesis' inliers
    (`refine_iters` rounds), mirroring cv2's final all-inlier solve.

Everything vmaps over a batch of instances, so the test_vivo multi-
instance path is the same compiled program with a leading axis.

All small dense algebra (12x12 eigh, 6xM least squares, 3x3 SVD) stays in
float32 with HIGHEST matmul precision — bf16 MXU passes are not accurate
enough for normal equations.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class PnPConfig:
    n_hypotheses: int = 128
    sample_size: int = 5    # minimal-sample size. cv2's RANSAC uses 5
    #                         model points for SOLVEPNP_EPNP (the
    #                         reference's executable path); 5 vs 6
    #                         raises the clean-sample odds ~2.4x at 60%
    #                         outliers (measured: solved 0.50 -> 0.62
    #                         at H=128, 1.00 at H=256, equal-or-better
    #                         accuracy at <=40% outliers — PERF.md
    #                         ProgX-gap study, 2026-08-19)
    reproj_threshold: float = 2.0
    refine_iters: int = 2
    max_points: int = 4096      # correspondence subset capacity (one
    #                             random rep per P/max_points block)
    min_points: int = 6         # reference: >=6 correspondences required
    gn_iters: int = 5           # Gauss-Newton iterations on betas
    fast_linalg: bool = True    # subspace-iteration/polar instead of
    #                             eigh/svd (TPU: batched tiny eigh/svd
    #                             lower to sequential loops)
    polish_iters: int = 3       # SE(3) Gauss-Newton reprojection polish
    #                             on the final inlier set (Progressive-X
    #                             runs local optimization; plain cv2 EPnP
    #                             does not — this closes that gap)
    hyp_solver: str = "epnp"    # minimal-set solver: "epnp" (cv2-family
    #                             3-beta-case solve) or "dlt" (P6P null
    #                             vector — ~3x cheaper but measured ~30x
    #                             worse on 0.5px-noisy minimal sets
    #                             [R err median .44 vs .013], so NOT the
    #                             default; see dlt_p6p)
    escalate_hypotheses: int = 0   # adaptive second stage: when the
    #                             first round's consensus is weak
    #                             (inlier fraction < escalate_inlier_
    #                             frac), redraw and re-solve with THIS
    #                             many hypotheses and keep the better
    #                             result. 0 = off. The reference's cv2
    #                             path adapts its iteration count to
    #                             the observed inlier ratio
    #                             (CNN_output_to_pose.py:154-159); this
    #                             is the fixed-shape equivalent: both
    #                             rounds compile once, the second runs
    #                             under lax.cond only when some
    #                             instance needs it. The ProgX-gap
    #                             study showed H=256 closes the
    #                             extreme-regime residue (60% outliers,
    #                             >=1.5 px noise) that H=128 leaves
    #                             open (PERF.md).
    escalate_inlier_frac: float = 0.4  # trigger threshold: escalate
    #                             when n_inliers < frac * n_fg (or the
    #                             solve failed outright)
    lo_top_k: int = 1           # LO-RANSAC width: run the refit+polish
    #                             local optimization on the top-k
    #                             hypotheses by inlier count and keep the
    #                             best refit (Progressive-X runs LO on
    #                             promising candidates, not only the
    #                             single best — CNN_output_to_pose.py:
    #                             132-152). k=1 reproduces the classic
    #                             refine-the-winner behavior; the
    #                             scripts/progx_gap_study.py sweep bounds
    #                             what larger k buys.


def project_points(pts3d: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
                   K: jnp.ndarray) -> jnp.ndarray:
    """[N,3] world -> [N,2] pixel coords under x_c = R X + t.

    HIGHEST precision: the default bf16 MXU pass perturbs pc by ~0.4%,
    which is ~1 px at f=572 — enough to move points across the 2 px
    inlier threshold (measured as a 5e-3 rotation orthonormality drift
    end-to-end before these pins; see PERF.md round 3).
    """
    pc = jnp.matmul(pts3d, R.T, precision=_HI) + t[None, :]
    z = jnp.maximum(jnp.abs(pc[:, 2]), 1e-8) * jnp.sign(
        jnp.where(pc[:, 2] == 0, 1.0, pc[:, 2]))
    u = K[0, 0] * pc[:, 0] / z + K[0, 2]
    v = K[1, 1] * pc[:, 1] / z + K[1, 2]
    return jnp.stack([u, v], axis=-1)


# ---------------------------------------------------------------------------
# Weighted EPnP core
# ---------------------------------------------------------------------------

def _control_points(pts: jnp.ndarray, w: jnp.ndarray, fast: bool = True
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World control points [4,3] + barycentric coords [N,4].

    c0 = weighted centroid. fast=True places c1..3 along the coordinate
    axes scaled by per-axis rms spread (no eigendecomposition — EPnP
    only needs a non-degenerate affine frame, the PCA rotation is a
    conditioning nicety); fast=False uses the classic weighted-PCA axes.
    Scales are floored so planar point sets stay non-degenerate.
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-8)
    c0 = jnp.sum(pts * w[:, None], axis=0) / wsum
    d = pts - c0[None, :]
    if fast:
        var = jnp.sum(d * d * w[:, None], axis=0) / wsum       # [3]
        scale = jnp.sqrt(jnp.maximum(var, 1e-6 * jnp.max(var) + 1e-9))
        ctrl = jnp.concatenate(
            [c0[None, :], c0[None, :] + jnp.diag(scale)], axis=0)
        a123 = d / scale[None, :]
    else:
        cov = jnp.matmul(d.T * w[None, :], d, precision=_HI) / wsum
        evals, evecs = jnp.linalg.eigh(cov)  # ascending
        scale = jnp.sqrt(jnp.maximum(evals, 1e-6 * jnp.max(evals) + 1e-9))
        axes = evecs * scale[None, :]        # columns = scaled axes
        ctrl = jnp.concatenate([c0[None, :], c0[None, :] + axes.T],
                               axis=0)
        inv_axes = (evecs / jnp.maximum(scale[None, :], 1e-12)).T
        a123 = jnp.matmul(d, inv_axes.T, precision=_HI)        # [N,3]
    a0 = 1.0 - jnp.sum(a123, axis=-1, keepdims=True)
    alphas = jnp.concatenate([a0, a123], axis=-1)              # [N,4]
    return ctrl, alphas


def _build_mtm(alphas: jnp.ndarray, pts2d: jnp.ndarray, w: jnp.ndarray,
               K: jnp.ndarray) -> jnp.ndarray:
    """Weighted M^T M [12,12] without materializing M [2N,12].

    Per point, M's two rows are kron(alpha, B) with
    B = [[fx, 0, cx-u], [0, fy, cy-v]], so
    M^T M = sum_i w_i kron(alpha_i alpha_i^T, B_i^T B_i): two rank-
    structured outer-product contractions that XLA maps to the MXU.
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    du = cx - pts2d[:, 0]
    dv = cy - pts2d[:, 1]
    n = alphas.shape[0]
    # B^T B rows: [fx^2, 0, fx*du; 0, fy^2, fy*dv; fx*du, fy*dv, du^2+dv^2]
    zeros = jnp.zeros((n,), alphas.dtype)
    btb = jnp.stack([
        jnp.full((n,), fx * fx), zeros, fx * du,
        zeros, jnp.full((n,), fy * fy), fy * dv,
        fx * du, fy * dv, du * du + dv * dv,
    ], axis=-1)                                   # [N, 9]
    aat = (alphas[:, :, None] * alphas[:, None, :]).reshape(n, 16)
    blocks = jnp.matmul((aat * w[:, None]).T, btb, precision=_HI)  # [16, 9]
    mtm = blocks.reshape(4, 4, 3, 3).transpose(0, 2, 1, 3).reshape(12, 12)
    return mtm


def _l6x10_and_rho(V: jnp.ndarray, ctrl_w: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """L [6,10] over control-point pairs + world squared distances rho [6].

    V: [12,4] null-space basis (ascending eigenvalue order, V[:,0] the
    smallest). Column order of L follows the beta-product order
    [b11,b12,b22,b13,b23,b33,b14,b24,b34,b44].
    """
    cc = V.reshape(4, 3, 4)  # [ctrl, xyz, basis]
    pairs = jnp.array([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])
    dv = cc[pairs[:, 0]] - cc[pairs[:, 1]]       # [6, 3, 4]
    dots = jnp.einsum("pxa,pxb->pab", dv, dv, precision=_HI)  # [6,4,4]
    L = jnp.stack([
        dots[:, 0, 0], 2 * dots[:, 0, 1], dots[:, 1, 1],
        2 * dots[:, 0, 2], 2 * dots[:, 1, 2], dots[:, 2, 2],
        2 * dots[:, 0, 3], 2 * dots[:, 1, 3], 2 * dots[:, 2, 3],
        dots[:, 3, 3],
    ], axis=-1)                                  # [6, 10]
    dw = ctrl_w[pairs[:, 0]] - ctrl_w[pairs[:, 1]]
    rho = jnp.sum(dw * dw, axis=-1)
    return L, rho


def _solve_ls(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Small least-squares via regularized normal equations (PSD ->
    unrolled batched Cholesky, no lax.linalg)."""
    from zebrapose_tpu.ops.fast_linalg import solve_psd_small
    ata = jnp.matmul(A.T, A, precision=_HI)
    ata = ata + 1e-9 * jnp.trace(ata) * jnp.eye(A.shape[1], dtype=A.dtype)
    atb = jnp.matmul(A.T, b, precision=_HI)
    return solve_psd_small(ata, atb[..., None])[..., 0]


def _betas_case1(L, rho):
    x = _solve_ls(L[:, jnp.array([0, 1, 3, 6])], rho)
    b1 = jnp.sqrt(jnp.abs(x[0]))
    s = jnp.sign(x[0]) + (x[0] == 0)
    rest = s * x[1:] / jnp.maximum(b1, 1e-12)
    return jnp.concatenate([b1[None], rest])


def _betas_case2(L, rho):
    x = _solve_ls(L[:, jnp.array([0, 1, 2])], rho)
    b1 = jnp.sqrt(jnp.abs(x[0]))
    b2 = jnp.sqrt(jnp.abs(x[2])) * jnp.sign(x[1]) * jnp.sign(x[0])
    return jnp.concatenate([b1[None], b2[None], jnp.zeros((2,), L.dtype)])


def _betas_case3(L, rho):
    x = _solve_ls(L[:, jnp.array([0, 1, 2, 3, 4])], rho)
    b1 = jnp.sqrt(jnp.abs(x[0]))
    b2 = jnp.sqrt(jnp.abs(x[2])) * jnp.sign(x[1]) * jnp.sign(x[0])
    b3 = x[3] / jnp.maximum(b1, 1e-12) * jnp.sign(x[0])
    return jnp.concatenate([b1[None], b2[None], b3[None],
                            jnp.zeros((1,), L.dtype)])


def _beta_products(b: jnp.ndarray) -> jnp.ndarray:
    return jnp.array([
        b[0] * b[0], b[0] * b[1], b[1] * b[1], b[0] * b[2], b[1] * b[2],
        b[2] * b[2], b[0] * b[3], b[1] * b[3], b[2] * b[3], b[3] * b[3],
    ])


def _gauss_newton_betas(L: jnp.ndarray, rho: jnp.ndarray, betas: jnp.ndarray,
                        iters: int) -> jnp.ndarray:
    """Refine betas minimizing ||L * prods(betas) - rho||, cv2-style."""

    def step(bs, _):
        b1, b2, b3, b4 = bs[0], bs[1], bs[2], bs[3]
        # d prods / d betas : [10, 4]
        z = jnp.zeros((), L.dtype)
        dp = jnp.array([
            [2 * b1, z, z, z],
            [b2, b1, z, z],
            [z, 2 * b2, z, z],
            [b3, z, b1, z],
            [z, b3, b2, z],
            [z, z, 2 * b3, z],
            [b4, z, z, b1],
            [z, b4, z, b2],
            [z, z, b4, b3],
            [z, z, z, 2 * b4],
        ])
        J = jnp.matmul(L, dp, precision=_HI)        # [6,4]
        r = rho - jnp.matmul(L, _beta_products(bs), precision=_HI)
        delta = _solve_ls(J, r)
        return bs + delta, None

    betas, _ = jax.lax.scan(step, betas, None, length=iters)
    return betas


def _procrustes(pw: jnp.ndarray, pc: jnp.ndarray, w: jnp.ndarray,
                fast: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted rigid fit: R, t with pc ~= R pw + t (Horn/Umeyama).

    fast=True replaces the 3x3 SVD with a Newton polar iteration
    (ops/fast_linalg.py) — identical for the det>0 case every real
    correspondence set produces.
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-8)
    cw = jnp.sum(pw * w[:, None], axis=0) / wsum
    cc = jnp.sum(pc * w[:, None], axis=0) / wsum
    H = jnp.matmul(((pc - cc) * w[:, None]).T, pw - cw, precision=_HI)
    # H maps world->camera directions: R = polar(H)
    if fast:
        from zebrapose_tpu.ops.fast_linalg import polar_rotation
        R = polar_rotation(H)
    else:
        U, _, Vt = jnp.linalg.svd(H)
        d = jnp.sign(jnp.linalg.det(
            jnp.matmul(U, Vt, precision=_HI)))
        D = jnp.diag(jnp.concatenate([jnp.ones((2,), pw.dtype), d[None]]))
        R = jnp.matmul(jnp.matmul(U, D, precision=_HI), Vt,
                       precision=_HI)
    t = cc - jnp.matmul(R, cw, precision=_HI)
    return R, t


def _pose_from_betas(betas: jnp.ndarray, V: jnp.ndarray, alphas: jnp.ndarray,
                     pts3d: jnp.ndarray, w: jnp.ndarray,
                     fast: bool = True
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    x = jnp.matmul(V, betas, precision=_HI)          # [12]
    cc = x.reshape(4, 3)
    pc = jnp.matmul(alphas, cc, precision=_HI)       # [N,3] camera frame
    wsum = jnp.maximum(jnp.sum(w), 1e-8)
    zmean = jnp.sum(pc[:, 2] * w) / wsum
    flip = jnp.where(zmean < 0, -1.0, 1.0)
    pc = pc * flip
    return _procrustes(pts3d, pc, w, fast)


def _so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential map [3] -> [3,3]."""
    th = jnp.linalg.norm(w)
    k = w / jnp.maximum(th, 1e-12)
    Km = jnp.array([[0.0, -k[2], k[1]],
                    [k[2], 0.0, -k[0]],
                    [-k[1], k[0], 0.0]])
    s, c = jnp.sin(th), jnp.cos(th)
    R = jnp.eye(3) + s * Km + (1.0 - c) * jnp.matmul(
        Km, Km, precision=_HI)
    return jnp.where(th < 1e-9, jnp.eye(3), R)


def gauss_newton_pose_polish(pts3d: jnp.ndarray, pts2d: jnp.ndarray,
                             w: jnp.ndarray, K: jnp.ndarray,
                             R: jnp.ndarray, t: jnp.ndarray,
                             iters: int = 3
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted reprojection Gauss-Newton on SE(3) (right-multiplied
    model-frame twist), all matmuls — refines the EPnP estimate over the
    consensus set like Progressive-X's local optimization step.
    """
    from zebrapose_tpu.ops.fast_linalg import solve_psd_small

    fx, fy = K[0, 0], K[1, 1]

    def step(carry, _):
        R, t = carry
        pc = jnp.matmul(pts3d, R.T, precision=_HI) + t[None, :]
        z = jnp.maximum(pc[:, 2], 1e-6)
        iz = 1.0 / z
        u = fx * pc[:, 0] * iz + K[0, 2]
        v = fy * pc[:, 1] * iz + K[1, 2]
        r = jnp.stack([pts2d[:, 0] - u, pts2d[:, 1] - v], -1)  # [N,2]
        # dPc/d(omega) = -R [p]_x ; dPc/d(nu) = R   (model-frame twist)
        px, py, pz = pts3d[:, 0], pts3d[:, 1], pts3d[:, 2]
        zeros = jnp.zeros_like(px)
        Px = jnp.stack([
            jnp.stack([zeros, -pz, py], -1),
            jnp.stack([pz, zeros, -px], -1),
            jnp.stack([-py, px, zeros], -1)], -2)          # [N,3,3]
        dPc = jnp.concatenate(
            [-jnp.einsum("ij,njk->nik", R, Px, precision=_HI),
             jnp.broadcast_to(R, Px.shape)], axis=-1)      # [N,3,6]
        Ju = fx * (dPc[:, 0] * iz[:, None]
                   - pc[:, 0:1] * iz[:, None] ** 2 * dPc[:, 2])
        Jv = fy * (dPc[:, 1] * iz[:, None]
                   - pc[:, 1:2] * iz[:, None] ** 2 * dPc[:, 2])
        J = jnp.stack([Ju, Jv], axis=1)                    # [N,2,6]
        Jw = J * w[:, None, None]
        Hm = jnp.einsum("nri,nrj->ij", Jw, J, precision=_HI)
        Hm = Hm + 1e-6 * jnp.trace(Hm) / 6.0 * jnp.eye(6)
        b = jnp.einsum("nri,nr->i", Jw, r, precision=_HI)
        xi = solve_psd_small(Hm, b[:, None])[:, 0]
        # HIGHEST: three bf16 3x3 updates accumulate ~5e-3
        # orthonormality error into the returned rotation
        R_new = jnp.matmul(R, _so3_exp(xi[:3]), precision=_HI)
        t_new = t + jnp.matmul(R, xi[3:], precision=_HI)
        # guard against a diverging step (all-outlier degenerate sets)
        ok = jnp.all(jnp.isfinite(xi)) & (jnp.linalg.norm(xi[3:]) < 1e3)
        R = jnp.where(ok, R_new, R)
        t = jnp.where(ok, t_new, t)
        return (R, t), None

    (R, t), _ = jax.lax.scan(step, (R, t), None, length=iters)
    return R, t


def dlt_p6p(pts3d: jnp.ndarray, pts2d: jnp.ndarray, K: jnp.ndarray,
            fast: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Direct P6P: one homogeneous null vector -> pose. [S>=6,3],[S,2].

    The DLT system rows are exactly EPnP's M rows with the 4 control
    points taken as the homogeneous frame (alphas = [X, 1]): the null
    vector stacks the columns of s*R and s*t. Recover s from det, fix
    orthogonality with one polar projection. ~3x cheaper than the
    3-beta-case EPnP as a RANSAC hypothesis solver (one k=1 subspace
    extraction + one polar instead of a k=4 basis + 3 x (betas-GN +
    polar)); hypotheses from near-planar minimal sets are poor (DLT's
    classic degeneracy — EPnP's beta cases 2/3 handle those), and the
    unconstrained 12-dof fit is noise-fragile: at 0.5 px pixel noise the
    median hypothesis R error measured ~30x worse than EPnP's, so this
    stays an opt-in (PnPConfig.hyp_solver), not the default.
    """
    S = pts3d.shape[0]
    alphas = jnp.concatenate(
        [pts3d, jnp.ones((S, 1), pts3d.dtype)], axis=-1)      # [S,4]
    mtm = _build_mtm(alphas, pts2d, jnp.ones((S,), pts3d.dtype), K)
    if fast:
        from zebrapose_tpu.ops.fast_linalg import smallest_subspace
        v = smallest_subspace(mtm, k=1)[..., 0]               # [12]
    else:
        _, evecs = jnp.linalg.eigh(mtm)
        v = evecs[:, 0]
    cols = v.reshape(4, 3)                # rows: columns of s*R, then s*t
    R_tilde = cols[:3].T                  # [3,3]
    t_tilde = cols[3]
    det = (R_tilde[0, 0] * (R_tilde[1, 1] * R_tilde[2, 2]
                            - R_tilde[1, 2] * R_tilde[2, 1])
           - R_tilde[0, 1] * (R_tilde[1, 0] * R_tilde[2, 2]
                              - R_tilde[1, 2] * R_tilde[2, 0])
           + R_tilde[0, 2] * (R_tilde[1, 0] * R_tilde[2, 1]
                              - R_tilde[1, 1] * R_tilde[2, 0]))
    s = jnp.sign(det) * jnp.cbrt(jnp.maximum(jnp.abs(det), 1e-20))
    R_n = R_tilde / s
    if fast:
        from zebrapose_tpu.ops.fast_linalg import polar_rotation
        R = polar_rotation(R_n)
    else:
        U, _, Vt = jnp.linalg.svd(R_n)
        d = jnp.sign(jnp.linalg.det(
            jnp.matmul(U, Vt, precision=_HI)))
        R = jnp.matmul(jnp.matmul(
            U, jnp.diag(jnp.array([1.0, 1.0, 1.0]).at[2].set(d)),
            precision=_HI), Vt, precision=_HI)
    return R, t_tilde / s


def epnp(pts3d: jnp.ndarray, pts2d: jnp.ndarray, w: jnp.ndarray,
         K: jnp.ndarray, gn_iters: int = 5, fast: bool = True
         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted EPnP: [N,3], [N,2], weights [N] -> (R [3,3], t [3]).

    Runs the three closed-form beta initializations + Gauss-Newton and
    keeps the one with the lowest weighted reprojection error — the same
    candidate family as cv2's SOLVEPNP_EPNP. fast=True computes the
    near-null basis by shifted subspace iteration instead of eigh
    (TPU-batchable; EPnP only needs a basis of the bottom subspace).
    """
    ctrl_w, alphas = _control_points(pts3d, w, fast)
    mtm = _build_mtm(alphas, pts2d, w, K)
    if fast:
        from zebrapose_tpu.ops.fast_linalg import smallest_subspace
        V = smallest_subspace(mtm, k=4)
    else:
        _, evecs = jnp.linalg.eigh(mtm)              # ascending
        V = evecs[:, :4]                             # null-space basis
    L, rho = _l6x10_and_rho(V, ctrl_w)

    def candidate(betas0):
        betas = _gauss_newton_betas(L, rho, betas0, gn_iters)
        R, t = _pose_from_betas(betas, V, alphas, pts3d, w, fast)
        proj = project_points(pts3d, R, t, K)
        err = jnp.sum(jnp.sum((proj - pts2d) ** 2, -1) * w) / \
            jnp.maximum(jnp.sum(w), 1e-8)
        return R, t, err

    # one batched chain over the 3 beta initializations instead of three
    # sequential ones: identical numerics, 3x fewer tiny sequential
    # kernels through the betas-GN + polar iterations (the launch-bound
    # part of the RANSAC hypothesis stage on TPU)
    betas0 = jnp.stack([_betas_case1(L, rho), _betas_case2(L, rho),
                        _betas_case3(L, rho)])
    Rs, ts, errs = jax.vmap(candidate)(betas0)
    errs = jnp.where(jnp.isnan(errs), jnp.inf, errs)
    best = jnp.argmin(errs)
    return Rs[best], ts[best]


# ---------------------------------------------------------------------------
# RANSAC
# ---------------------------------------------------------------------------

def _ransac_prepare(pts3d: jnp.ndarray, pts2d: jnp.ndarray, w: jnp.ndarray,
                    key: jax.Array, cfg: PnPConfig):
    """Subset build + minimal-set sampling. Returns
    (sub3d [Q,3], sub2d [Q,2], sub_w [Q], samp3d [H,S,3], samp2d [H,S,2],
    n_fg — the TRUE count of w>0 correspondences, for the success gate).
    """
    P = pts3d.shape[0]
    n_fg = jnp.sum(w > 0)

    # --- bounded correspondence subset --------------------------------
    # All stages run on a representative subset of at most max_points
    # correspondences. When P exceeds max_points the subset has two
    # parts:
    #   (a) one random foreground representative per contiguous
    #       P/(max_points - E) block (reshape + argmax): near-exact for
    #       sparse masks, spatially spread for dense ones, shape-static —
    #       unlike the previous top_k sort (~15 ms/b128 at P=128^2 on
    #       v5e) or full-P refine/polish (+20 ms/b128);
    #   (b) an EXACT compaction of the first E foreground pixels
    #       (inverse-CDF searchsorted + tiny E-row gather). (a) alone
    #       hard-failed masks whose >=min_points foreground pixels fall
    #       in fewer than min_points row-contiguous strips (all
    #       representatives collide); (b) guarantees min(n_fg, E)
    #       distinct representatives for ANY mask, so every mask the
    #       reference's cv2.solvePnPRansac accepts (>=6 px,
    #       CNN_output_to_pose.py:126-131) reaches the solver here too.
    #       Masks with <= E foreground pixels are compacted exactly.
    if P > cfg.max_points:
        n_exact = min(64, cfg.max_points // 8)
        q_blocks = cfg.max_points - n_exact
        blk = -(-P // q_blocks)
        pts3d_b, pts2d_b, w_b = pts3d, pts2d, w
        if P % q_blocks:
            # pad to a whole number of blocks with zero-weight points —
            # never selected over real foreground, harmless if a block
            # is all padding (its representative has sub_w = 0)
            pad = q_blocks * blk - P
            pts3d_b = jnp.pad(pts3d, ((0, pad), (0, 0)))
            pts2d_b = jnp.pad(pts2d, ((0, pad), (0, 0)))
            w_b = jnp.pad(w, (0, pad))
        prio = w_b + w_b * jax.random.uniform(
            jax.random.fold_in(key, 3), w_b.shape, minval=0.0, maxval=0.5)
        rep = jnp.argmax(prio.reshape(q_blocks, blk), axis=-1)
        # extract the representatives as a one-hot block reduction, not a
        # gather (XLA gathers are the slow op class on TPU)
        oh = jax.nn.one_hot(rep, blk, dtype=pts3d.dtype)  # [Qb, blk]
        # HIGHEST: a bf16 one-hot contraction QUANTIZES the selected
        # coordinates to 8 mantissa bits (~0.4% -> ~1 px / ~0.2 mm)
        sub3d = jnp.einsum("qb,qbc->qc", oh,
                           pts3d_b.reshape(q_blocks, blk, 3),
                           precision=_HI)
        sub2d = jnp.einsum("qb,qbc->qc", oh,
                           pts2d_b.reshape(q_blocks, blk, 2),
                           precision=_HI)
        sub_w = jnp.einsum("qb,qb->q", oh,
                           w_b.reshape(q_blocks, blk),
                           precision=_HI)
        if n_exact:
            # the s-th foreground pixel is the first index whose
            # running fg count reaches s+1; an E-element searchsorted
            # (E*P compares) + E-row gather is noise next to the block
            # reduction
            cdf = jnp.cumsum((w > 0).astype(jnp.float32))
            qv = jnp.arange(n_exact, dtype=jnp.float32) + 0.5
            eidx = jnp.clip(jnp.searchsorted(cdf, qv, side="left",
                                             method="compare_all"),
                            0, P - 1)
            emask = (jnp.arange(n_exact) < n_fg).astype(w.dtype)
            sub3d = jnp.concatenate([sub3d, pts3d[eidx]])
            sub2d = jnp.concatenate([sub2d, pts2d[eidx]])
            sub_w = jnp.concatenate([sub_w, w[eidx] * emask])
    else:
        sub3d, sub2d, sub_w = pts3d, pts2d, w
    Q = sub3d.shape[0]

    samp3d, samp2d = _draw_minimal_samples(sub3d, sub2d, sub_w, key,
                                           cfg, cfg.n_hypotheses)
    return sub3d, sub2d, sub_w, samp3d, samp2d, n_fg


def _draw_minimal_samples(sub3d, sub2d, sub_w, key: jax.Array,
                          cfg: PnPConfig, n_hyp: int):
    """Draw n_hyp minimal sets from the foreground of the (subset)
    correspondences. Returns (samp3d [n_hyp,S,3], samp2d [n_hyp,S,2]).

    Inverse-CDF sampling of foreground indices (uniform over w>0, with
    replacement — the same distribution as categorical over {0, -inf}
    logits, but H*S uniforms + a compare-all search instead of H*S*Q
    gumbels: categorical was ~10 ms/b128 on v5e, this is <1 ms).
    """
    Q = sub3d.shape[0]
    cdf = jnp.cumsum((sub_w > 0).astype(jnp.float32))
    u = jax.random.uniform(key, (n_hyp, cfg.sample_size),
                           maxval=jnp.maximum(cdf[-1], 1.0))
    idx = jnp.searchsorted(cdf, u, side="right", method="compare_all")
    # degenerate empty mask -> arbitrary index; guarded by min_points
    idx = jnp.clip(idx, 0, Q - 1)
    if cfg.sample_size < 6:
        # Pad each minimal set to the Pallas kernel's fixed width 6 by
        # repeating the last draw: EPnP is a least-squares solve, so a
        # duplicated correspondence only double-weights one point —
        # clean-sample odds stay inlier_rate^sample_size (the point of
        # sample_size=5) and kernel/jnp paths see identical inputs.
        idx = jnp.concatenate(
            [idx, jnp.broadcast_to(idx[:, -1:],
                                   (idx.shape[0], 6 - cfg.sample_size))],
            axis=1)

    # Extract the sampled minimal sets as a one-hot matmul rather than a
    # row gather: XLA gathers are the slow op class on TPU (measured
    # 1.8 ms vs 0.5 ms per b128 at Q=2048, H*S=1024). One-hot times
    # value with HIGHEST accumulates a single nonzero term — exact.
    s_eff = max(cfg.sample_size, 6)
    oh_s = jax.nn.one_hot(idx.reshape(-1), Q, dtype=sub3d.dtype)
    samp3d = jnp.dot(oh_s, sub3d, precision=_HI).reshape(
        n_hyp, s_eff, 3)
    samp2d = jnp.dot(oh_s, sub2d, precision=_HI).reshape(
        n_hyp, s_eff, 2)
    return samp3d, samp2d


def _solve_hypotheses(samp3d, samp2d, K, cfg: PnPConfig):
    """Minimal-set solves for one instance's [H, S, .] samples (jnp)."""
    if cfg.hyp_solver == "dlt":
        return jax.vmap(lambda a, b: dlt_p6p(
            a, b, K, cfg.fast_linalg))(samp3d, samp2d)
    ones = jnp.ones(samp3d.shape[:2], samp3d.dtype)
    return jax.vmap(lambda a, b, ww: epnp(
        a, b, ww, K, cfg.gn_iters, cfg.fast_linalg))(samp3d, samp2d, ones)


def _ransac_finish(sub3d, sub2d, sub_w, Rs, ts, K, n_fg,
                   cfg: PnPConfig
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                              jnp.ndarray]:
    """Score hypotheses, refine on inliers, polish, gate success.

    n_fg is the true w>0 correspondence count from BEFORE subsetting:
    the exact-compaction tail can duplicate block representatives, so
    counting sub_w > 0 would overstate the distinct-pixel support that
    the reference's >=6-correspondence gate measures."""
    # score every hypothesis against the (subset) correspondences
    def reproj_err(R, t):
        proj = project_points(sub3d, R, t, K)
        return jnp.linalg.norm(proj - sub2d, axis=-1)

    errs = jax.vmap(reproj_err)(Rs, ts)              # [H, Q]
    errs = jnp.where(jnp.isnan(errs), jnp.inf, errs)
    inliers = (errs < cfg.reproj_threshold) & (sub_w > 0)[None, :]
    counts = jnp.sum(inliers, axis=-1)

    # refinement: weighted EPnP over current inliers, re-estimating the
    # inlier set each round (cv2's final solve over the consensus set)
    def refine(carry, _):
        R, t, inl = carry
        w_in = inl.astype(sub3d.dtype)
        enough = jnp.sum(w_in) >= cfg.min_points
        R2, t2 = epnp(sub3d, sub2d, w_in, K, cfg.gn_iters,
                      cfg.fast_linalg)
        err2 = jnp.linalg.norm(project_points(sub3d, R2, t2, K) - sub2d,
                               axis=-1)
        inl2 = (err2 < cfg.reproj_threshold) & (sub_w > 0)
        better = enough & (jnp.sum(inl2) >= jnp.sum(inl))
        R = jnp.where(better, R2, R)
        t = jnp.where(better, t2, t)
        inl = jnp.where(better, inl2, inl)
        return (R, t, inl), None

    def local_opt(R0, t0, in0):
        """Refit on inliers (refine_iters rounds) + SE(3) GN polish —
        the LO step, applied per candidate."""
        (R_f, t_f, in_f), _ = jax.lax.scan(
            refine, (R0, t0, in0), None, length=cfg.refine_iters)
        if cfg.polish_iters > 0:
            R_p, t_p = gauss_newton_pose_polish(
                sub3d, sub2d, in_f.astype(sub3d.dtype), K, R_f, t_f,
                cfg.polish_iters)
            # keep the polish only if it does not lose inliers
            err_p = jnp.linalg.norm(
                project_points(sub3d, R_p, t_p, K) - sub2d, axis=-1)
            in_p = (err_p < cfg.reproj_threshold) & (sub_w > 0)
            better = jnp.sum(in_p) >= jnp.sum(in_f)
            R_f = jnp.where(better, R_p, R_f)
            t_f = jnp.where(better, t_p, t_f)
            in_f = jnp.where(better, in_p, in_f)
        return R_f, t_f, in_f

    if cfg.lo_top_k <= 1:
        best = jnp.argmax(counts)
        R_fin, t_fin, in_fin = local_opt(Rs[best], ts[best],
                                         inliers[best])
    else:
        k = min(cfg.lo_top_k, int(counts.shape[0]))
        _, top = jax.lax.top_k(counts, k)
        Rk, tk, ik = jax.vmap(local_opt)(Rs[top], ts[top], inliers[top])
        bk = jnp.argmax(jnp.sum(ik, axis=-1))
        R_fin, t_fin, in_fin = Rk[bk], tk[bk], ik[bk]

    n_in = jnp.sum(in_fin)
    success = (n_fg >= cfg.min_points) & (n_in >= cfg.min_points)
    eye = jnp.eye(3, dtype=sub3d.dtype)
    R_out = jnp.where(success, R_fin, eye)
    t_out = jnp.where(success, t_fin, jnp.zeros((3,), sub3d.dtype))
    return R_out, t_out, success, n_in


def ransac_pnp(pts3d: jnp.ndarray, pts2d: jnp.ndarray, w: jnp.ndarray,
               K: jnp.ndarray, key: jax.Array,
               cfg: PnPConfig = PnPConfig()
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                          jnp.ndarray]:
    """RANSAC + weighted-EPnP over fixed-shape correspondences.

    pts3d/pts2d: [P, .] with weight w[P] in {0,1} (0 = padding/background).
    Returns (R, t, success, inlier_count). Replaces
    cv2.solvePnPRansac(..., reprojectionError=2, iterationsCount=150,
    SOLVEPNP_EPNP) with `n_hypotheses` parallel minimal solves. P may be
    the full pixel grid: when P > cfg.max_points every stage runs on a
    bounded per-block representative subset (see _ransac_prepare).

    This is the single-instance jnp composition; the batched TPU path
    (`decode_to_pose_batch`) runs the hypothesis stage as one fused
    Pallas kernel over all instances instead.
    """
    sub3d, sub2d, sub_w, samp3d, samp2d, n_fg = _ransac_prepare(
        pts3d, pts2d, w, key, cfg)
    Rs, ts = _solve_hypotheses(samp3d, samp2d, K, cfg)
    res = _ransac_finish(sub3d, sub2d, sub_w, Rs, ts, K, n_fg, cfg)
    if cfg.escalate_hypotheses <= 0:
        return res
    R1, t1, ok1, n_in1 = res

    def stage2(_):
        samp3d2, samp2d2 = _draw_minimal_samples(
            sub3d, sub2d, sub_w, jax.random.fold_in(key, 7), cfg,
            cfg.escalate_hypotheses)
        Rs2, ts2 = _solve_hypotheses(samp3d2, samp2d2, K, cfg)
        R2, t2, ok2, n_in2 = _ransac_finish(
            sub3d, sub2d, sub_w, Rs2, ts2, K, n_fg, cfg)
        better = n_in2 > n_in1
        return (jnp.where(better, R2, R1), jnp.where(better, t2, t1),
                jnp.where(better, ok2, ok1),
                jnp.where(better, n_in2, n_in1))

    needs = _escalation_needed(ok1, n_in1, n_fg, cfg)
    return jax.lax.cond(needs, stage2, lambda _: res, None)


def _escalation_needed(ok, n_in, n_fg, cfg: PnPConfig):
    """Weak consensus gate for the adaptive second stage: the first
    round either failed despite enough correspondences, or its inlier
    support is below escalate_inlier_frac of the foreground."""
    enough = n_fg >= cfg.min_points
    weak = n_in.astype(jnp.float32) < (cfg.escalate_inlier_frac *
                                       n_fg.astype(jnp.float32))
    return enough & (weak | ~ok)


# ---------------------------------------------------------------------------
# Full decode: mask + code planes -> pose
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("bbox_size", "cfg", "base"))
def decode_to_pose(mask: jnp.ndarray, code: jnp.ndarray,
                   lut_points: jnp.ndarray, lut_valid: jnp.ndarray,
                   bbox: jnp.ndarray, K: jnp.ndarray, key: jax.Array,
                   bbox_size: int = 128, base: int = 2,
                   cfg: PnPConfig = PnPConfig()
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                              jnp.ndarray]:
    """CNN outputs -> object pose (CNN_outputs_to_object_pose, on device).

    mask: [H,W] hard {0,1}; code: [H,W,n] hard digits; lut_points
    [C,3] / lut_valid [C]; bbox = final_bbox int32[4]; K [3,3].

    Pixel bookkeeping matches the reference: correspondence 2D point is
    the (x, y) crop pixel mapped through the final bbox with int
    truncation (mapping_pixel_position_to_original_position).

    ALL H*W pixels go into ransac_pnp with weight = foreground
    (CNN_output_to_pose.py builds correspondences from all masked
    pixels); ransac_pnp bounds its own working set with a per-block
    random-representative subset. The previous top-K compaction here
    cost ~15 ms/b128 of pure sorting on v5e for the same capacity.
    """
    pts3d, orig, fg = _correspondences(mask, code, lut_points, lut_valid,
                                       bbox, bbox_size, base)
    return ransac_pnp(pts3d, orig, fg, K,
                      jax.random.fold_in(key, 2), cfg)


def _correspondences(mask, code, lut_points, lut_valid, bbox,
                     bbox_size: int, base: int):
    """[H,W] mask + code planes -> (pts3d [H*W,3], pts2d [H*W,2], fg)."""
    from zebrapose_tpu.codec.surface_code import code_to_class_id
    from zebrapose_tpu.ops.roi import map_pixels_to_original

    h, w_img = mask.shape
    ids = code_to_class_id(code, base=base)          # [H,W]
    # ONE packed gather for xyz+validity: TPU gathers move full 128-lane
    # rows whatever the minor dim, so two separate [C,3]/[C] lookups
    # cost two H*W-row sweeps; a [C,4] table costs one (validity in
    # {0,1} is exact in f32).
    packed = jnp.concatenate(
        [lut_points, lut_valid.astype(lut_points.dtype)[:, None]], axis=1)
    g = packed[ids.reshape(-1)]                      # [H*W, 4]
    pts3d = g[:, :3]
    fg = mask.reshape(-1) * g[:, 3].astype(mask.dtype)

    pix = jnp.arange(h * w_img, dtype=jnp.int32)
    px = jnp.stack([pix % w_img, pix // w_img], axis=-1)   # (x, y)
    orig = map_pixels_to_original(px, bbox, bbox_size).astype(jnp.float32)
    return pts3d, orig, fg


@partial(jax.jit, static_argnames=("bbox_size", "cfg", "base",
                                   "use_kernel"))
def decode_to_pose_batch(masks: jnp.ndarray, codes: jnp.ndarray,
                         lut_points: jnp.ndarray, lut_valid: jnp.ndarray,
                         bboxes: jnp.ndarray, Ks: jnp.ndarray,
                         keys: jnp.ndarray, bbox_size: int = 128,
                         base: int = 2, cfg: PnPConfig = PnPConfig(),
                         use_kernel: bool = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                    jnp.ndarray]:
    """Batched decode_to_pose: masks [B,H,W], codes [B,H,W,n],
    bboxes [B,4], Ks [B,3,3], keys [B,2] -> (R [B,3,3], t [B,3],
    success [B], n_inliers [B]).

    Identical math to `jax.vmap(decode_to_pose)`, but the hypothesis
    stage — B*n_hypotheses independent minimal-set EPnP solves, the
    dispatch-bound hot spot (PERF.md) — runs as ONE fused Pallas kernel
    over the flattened batch on TPU (ops/pnp_kernel.py). use_kernel:
    None = kernel on TPU / vmapped jnp elsewhere.
    """
    from zebrapose_tpu.ops.pnp_kernel import minimal_epnp_hypotheses

    def prep(mask, code, bbox, key):
        pts3d, orig, fg = _correspondences(
            mask, code, lut_points, lut_valid, bbox, bbox_size, base)
        return _ransac_prepare(pts3d, orig, fg,
                               jax.random.fold_in(key, 2), cfg)

    sub3d, sub2d, sub_w, samp3d, samp2d, n_fg = jax.vmap(prep)(
        masks, codes, bboxes, keys)

    B, H = samp3d.shape[0], samp3d.shape[1]
    if cfg.hyp_solver == "dlt":
        Rs, ts = jax.vmap(lambda a, b, K: jax.vmap(
            lambda x, y: dlt_p6p(x, y, K, cfg.fast_linalg))(a, b))(
            samp3d, samp2d, Ks)
    else:
        Ks_flat = jnp.repeat(Ks, H, axis=0)          # [B*H, 3, 3]
        s_eff = samp3d.shape[2]        # sampler pads sample_size<6 to 6
        Rs, ts = minimal_epnp_hypotheses(
            samp3d.reshape(B * H, s_eff, 3),
            samp2d.reshape(B * H, s_eff, 2),
            Ks_flat, cfg.gn_iters, use_kernel=use_kernel,
            fast=cfg.fast_linalg)
        Rs = Rs.reshape(B, H, 3, 3)
        ts = ts.reshape(B, H, 3)

    res = jax.vmap(lambda a, b, c, d, e, f, g: _ransac_finish(
        a, b, c, d, e, f, g, cfg))(sub3d, sub2d, sub_w, Rs, ts, Ks, n_fg)
    if cfg.escalate_hypotheses <= 0:
        return res
    R1, t1, ok1, n_in1 = res
    needs = jax.vmap(lambda o, ni, nf: _escalation_needed(o, ni, nf,
                                                          cfg))(
        ok1, n_in1, n_fg)

    def stage2(_):
        # one fixed-shape second round for the WHOLE batch (instances
        # that don't need it keep their round-1 result in the merge);
        # the lax.cond skips all of it when no instance is weak
        H2 = cfg.escalate_hypotheses
        samp3d2, samp2d2 = jax.vmap(
            lambda a, b, c, k: _draw_minimal_samples(
                a, b, c, jax.random.fold_in(k, 7), cfg, H2))(
            sub3d, sub2d, sub_w, keys)
        s_eff2 = samp3d2.shape[2]
        if cfg.hyp_solver == "dlt":
            Rs2, ts2 = jax.vmap(lambda a, b, Km: jax.vmap(
                lambda x, y: dlt_p6p(x, y, Km, cfg.fast_linalg))(a, b))(
                samp3d2, samp2d2, Ks)
        else:
            Rs2, ts2 = minimal_epnp_hypotheses(
                samp3d2.reshape(B * H2, s_eff2, 3),
                samp2d2.reshape(B * H2, s_eff2, 2),
                jnp.repeat(Ks, H2, axis=0), cfg.gn_iters,
                use_kernel=use_kernel, fast=cfg.fast_linalg)
            Rs2 = Rs2.reshape(B, H2, 3, 3)
            ts2 = ts2.reshape(B, H2, 3)
        R2, t2, ok2, n_in2 = jax.vmap(
            lambda a, b, c, d, e, f, g: _ransac_finish(
                a, b, c, d, e, f, g, cfg))(
            sub3d, sub2d, sub_w, Rs2, ts2, Ks, n_fg)
        better = needs & (n_in2 > n_in1)
        return (jnp.where(better[:, None, None], R2, R1),
                jnp.where(better[:, None], t2, t1),
                jnp.where(better, ok2, ok1),
                jnp.where(better, n_in2, n_in1))

    return jax.lax.cond(jnp.any(needs), stage2, lambda _: res, None)
