"""Pallas TPU kernel: fused minimal-set EPnP for the RANSAC hypothesis
stage.

Why a kernel. PERF.md: after the round-2 restructurings the hypothesis
stage — batch*n_hypotheses (~16k at b128/H128) independent 6-point EPnP
solves — costs ~16 ms/b128 while moving almost no data: it is a chain of
hundreds of TINY sequential ops (12x12 Cholesky steps, 4x4 solves, 3x3
polar iterations) that XLA executes as separate kernels with HBM
round-trips between them. The arithmetic is trivial (~10k scalar ops per
hypothesis); the cost is dispatch + memory traffic.

Design. Structure-of-arrays with the HYPOTHESIS as the vector lane axis:
every scalar of the EPnP algorithm (a matrix entry, a beta, a residual)
becomes one (8, 128) f32 lane tile holding that scalar for 1024
hypotheses; matrices/vectors are plain Python lists of tiles, and all
linear algebra is unrolled Python loops emitting elementwise VPU ops.
The whole solve — control points, M^T M build, 12x12 Cholesky + inverse
subspace iteration (k=4), L6x10, three beta-case closed forms,
Gauss-Newton on betas, Procrustes via scaled-Newton polar — runs as ONE
pallas_call per 1024-hypothesis tile with every intermediate resident in
VMEM (a few MB). Grid = N/1024.

Numerics follow ops/pnp.py + ops/fast_linalg.py step for step (same
regularization floors, same iteration counts), so the kernel is
interchangeable with `jax.vmap(epnp)`; `tests/test_pnp_kernel.py`
asserts agreement in interpreter mode, and the public wrapper
`minimal_epnp_hypotheses` falls back to the vmapped jnp path off-TPU.

Reference equivalence: these are the `n_hypotheses` minimal-sample
solves replacing cv2.solvePnPRansac's per-iteration EPnP
(CNN_output_to_pose.py:154-159).
"""

from __future__ import annotations

import os
from functools import partial, reduce
from typing import List, Sequence

import jax
import jax.numpy as jnp

# Read once at import: the flag is consulted at TRACE time inside jitted
# callers (decode_to_pose_batch), so flipping the env var mid-process
# would have no effect on already-compiled executables anyway. Snapshot
# it here to make the semantics explicit: set ZEBRAPOSE_NO_PALLAS before
# the process imports zebrapose_tpu, not between calls.
NO_PALLAS = bool(os.environ.get("ZEBRAPOSE_NO_PALLAS"))

SUB, LANE = 8, 128
TILE = SUB * LANE          # hypotheses per kernel instance
S = 6                      # minimal-set size


# ---------------------------------------------------------------------------
# list-of-lane-tiles linear algebra (all elementwise VPU ops)
# ---------------------------------------------------------------------------

def _maxall(xs):
    return reduce(jnp.maximum, xs)


def _chol(A: List[List[jnp.ndarray]], n: int) -> List[List[jnp.ndarray]]:
    """Unrolled Cholesky, fast_linalg.cholesky_small semantics."""
    amax = _maxall([jnp.abs(A[j][j]) for j in range(n)])
    floor = 1e-12 * jnp.maximum(amax, 1e-30)
    L: List[List[jnp.ndarray]] = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, floor))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            r = A[i][j]
            for k in range(j):
                r = r - L[i][k] * L[j][k]
            L[i][j] = r * inv_d
    return L


def _chol_solve(L, b: Sequence[jnp.ndarray], n: int) -> List[jnp.ndarray]:
    """Solve (L L^T) x = b for one column."""
    y: List[jnp.ndarray] = []
    for i in range(n):
        acc = b[i]
        for k in range(i):
            acc = acc - L[i][k] * y[k]
        y.append(acc / L[i][i])
    x: List[jnp.ndarray] = [None] * n
    for i in range(n - 1, -1, -1):
        acc = y[i]
        for k in range(i + 1, n):
            acc = acc - L[k][i] * x[k]
        x[i] = acc / L[i][i]
    return x


def _solve_ls(Arows: List[List[jnp.ndarray]], b: Sequence[jnp.ndarray],
              k: int) -> List[jnp.ndarray]:
    """Least squares via regularized normal equations (pnp._solve_ls):
    Arows is [6][k], b is [6]."""
    ata = [[None] * k for _ in range(k)]
    for i in range(k):
        for j in range(i, k):
            acc = Arows[0][i] * Arows[0][j]
            for r in range(1, S):
                acc = acc + Arows[r][i] * Arows[r][j]
            ata[i][j] = acc
            ata[j][i] = acc
    tr = ata[0][0]
    for i in range(1, k):
        tr = tr + ata[i][i]
    for i in range(k):
        ata[i][i] = ata[i][i] + 1e-9 * tr
    atb = []
    for i in range(k):
        acc = Arows[0][i] * b[0]
        for r in range(1, S):
            acc = acc + Arows[r][i] * b[r]
        atb.append(acc)
    return _chol_solve(_chol(ata, k), atb, k)


def _det3(M):
    return (M[0][0] * (M[1][1] * M[2][2] - M[1][2] * M[2][1])
            - M[0][1] * (M[1][0] * M[2][2] - M[1][2] * M[2][0])
            + M[0][2] * (M[1][0] * M[2][1] - M[1][1] * M[2][0]))


def _cofactor3(M):
    """Cofactor matrix C with C[i][j] = cofactor of M[i][j]
    (inv(M)^T = C / det)."""
    return [
        [M[1][1] * M[2][2] - M[1][2] * M[2][1],
         M[1][2] * M[2][0] - M[1][0] * M[2][2],
         M[1][0] * M[2][1] - M[1][1] * M[2][0]],
        [M[0][2] * M[2][1] - M[0][1] * M[2][2],
         M[0][0] * M[2][2] - M[0][2] * M[2][0],
         M[0][1] * M[2][0] - M[0][0] * M[2][1]],
        [M[0][1] * M[1][2] - M[0][2] * M[1][1],
         M[0][2] * M[1][0] - M[0][0] * M[1][2],
         M[0][0] * M[1][1] - M[0][1] * M[1][0]],
    ]


def _polar_rotation(H, iters: int = 12):
    """fast_linalg.polar_rotation in list form."""
    det = _det3(H)
    flip = jnp.where(det < 0, -1.0, 1.0)
    X = [list(H[0]), list(H[1]), [flip * v for v in H[2]]]
    nsq = X[0][0] * X[0][0]
    for r in range(3):
        for c in range(3):
            if r == 0 and c == 0:
                continue
            nsq = nsq + X[r][c] * X[r][c]
    inv_norm = 1.0 / jnp.maximum(jnp.sqrt(nsq), 1e-20)
    X = [[v * inv_norm for v in row] for row in X]
    for _ in range(iters):
        d = _det3(X)
        inv_d = 1.0 / jnp.where(d == 0, 1e-30, d)
        C = _cofactor3(X)
        gamma = jnp.power(jnp.maximum(jnp.abs(d), 1e-20), -1.0 / 3.0)
        inv_g = 1.0 / gamma
        X = [[0.5 * (gamma * X[r][c] + C[r][c] * inv_d * inv_g)
              for c in range(3)] for r in range(3)]
    return X


# ---------------------------------------------------------------------------
# EPnP in structure-of-arrays form
# ---------------------------------------------------------------------------

def _epnp_soa(X, U, fx, fy, cx, cy, gn_iters: int):
    """X: [S][3] lane tiles, U: [S][2] lane tiles -> (R [3][3], t [3]).

    Mirrors ops/pnp.epnp with fast=True and unit weights.
    """
    inv_s = 1.0 / S

    # ---- control points (pnp._control_points, fast path) -------------
    c0 = [sum(X[j][c] for j in range(S)) * inv_s for c in range(3)]
    d = [[X[j][c] - c0[c] for c in range(3)] for j in range(S)]
    var = [sum(d[j][c] * d[j][c] for j in range(S)) * inv_s
           for c in range(3)]
    vmax = _maxall(var)
    scale = [jnp.sqrt(jnp.maximum(var[c], 1e-6 * vmax + 1e-9))
             for c in range(3)]
    inv_scale = [1.0 / scale[c] for c in range(3)]
    # alphas [S][4]: a0 = 1 - sum(a123)
    alphas = []
    for j in range(S):
        a123 = [d[j][c] * inv_scale[c] for c in range(3)]
        alphas.append([1.0 - a123[0] - a123[1] - a123[2]] + a123)

    # ---- M^T M (pnp._build_mtm) --------------------------------------
    mtm = [[0.0] * 12 for _ in range(12)]
    for j in range(S):
        du = cx - U[j][0]
        dv = cy - U[j][1]
        btb = [[fx * fx, 0.0, fx * du],
               [0.0, fy * fy, fy * dv],
               [fx * du, fy * dv, du * du + dv * dv]]
        a = alphas[j]
        for i1 in range(4):
            for i2 in range(i1, 4):
                aa = a[i1] * a[i2]
                for r in range(3):
                    for c in range(3):
                        e = btb[r][c]
                        if isinstance(e, float) and e == 0.0:
                            continue
                        mtm[3 * i1 + r][3 * i2 + c] = \
                            mtm[3 * i1 + r][3 * i2 + c] + aa * e
    # M^T M is symmetric: mirror the (accumulated) upper triangle
    for row in range(12):
        for col in range(row):
            mtm[row][col] = mtm[col][row]

    # ---- bottom-4 eigen-subspace (fast_linalg.smallest_subspace) -----
    tr = sum(mtm[i][i] for i in range(12))
    inv_s0 = 1.0 / jnp.maximum(tr * (1.0 / 12.0), 1e-30)
    B = [[mtm[i][j] * inv_s0 for j in range(12)] for i in range(12)]
    for i in range(12):
        B[i][i] = B[i][i] + 1e-6
    Lc = _chol(B, 12)
    # Y init: eye(12, 4) + 0.01
    Y = [[(1.01 if i == k else 0.01) * jnp.ones_like(fx) for k in range(4)]
         for i in range(12)]
    for _ in range(4):
        cols = [_chol_solve(Lc, [Y[i][k] for i in range(12)], 12)
                for k in range(4)]
        # Gram-Schmidt over the 4 columns (fast_linalg._gram_schmidt)
        ortho: List[List[jnp.ndarray]] = []
        for k in range(4):
            v = cols[k]
            for u in ortho:
                dot = sum(v[i] * u[i] for i in range(12))
                v = [v[i] - dot * u[i] for i in range(12)]
            nrm = jnp.sqrt(sum(v[i] * v[i] for i in range(12)))
            inv_n = 1.0 / jnp.maximum(nrm, 1e-20)
            ortho.append([v[i] * inv_n for i in range(12)])
        Y = [[ortho[k][i] for k in range(4)] for i in range(12)]
    # order columns by Rayleigh quotient of the ORIGINAL mtm (ascending)
    rq = []
    for k in range(4):
        acc = 0.0
        for i in range(12):
            Ay = sum(mtm[i][j] * Y[j][k] for j in range(12))
            acc = acc + Y[i][k] * Ay
        rq.append(acc)
    # 4-element sorting network on (rq, column) pairs
    cols = [[Y[i][k] for i in range(12)] for k in range(4)]

    def swap(a, b):
        cond = rq[b] < rq[a]
        rq[a], rq[b] = (jnp.where(cond, rq[b], rq[a]),
                        jnp.where(cond, rq[a], rq[b]))
        for i in range(12):
            ai, bi = cols[a][i], cols[b][i]
            cols[a][i] = jnp.where(cond, bi, ai)
            cols[b][i] = jnp.where(cond, ai, bi)

    for a, b in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
        swap(a, b)
    V = [[cols[k][i] for k in range(4)] for i in range(12)]  # [12][4]

    # ---- L [6][10] and rho [6] (pnp._l6x10_and_rho) ------------------
    # cc[p][x][b] = V[3p + x][b]
    pairs = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
    Lm: List[List[jnp.ndarray]] = []
    rho: List[jnp.ndarray] = []
    # control points in world frame: ctrl[0] = c0, ctrl[i] = c0 + scale_i e_i
    for (p, q) in pairs:
        dv = [[V[3 * p + x][b] - V[3 * q + x][b] for b in range(4)]
              for x in range(3)]
        dots = [[sum(dv[x][a] * dv[x][b] for x in range(3))
                 for b in range(4)] for a in range(4)]
        Lm.append([dots[0][0], 2 * dots[0][1], dots[1][1], 2 * dots[0][2],
                   2 * dots[1][2], dots[2][2], 2 * dots[0][3],
                   2 * dots[1][3], 2 * dots[2][3], dots[3][3]])
        # world distance between ctrl p and ctrl q
        dw = [0.0, 0.0, 0.0]
        if p == 0:
            dw[q - 1] = -scale[q - 1]
        else:
            dw[p - 1] = scale[p - 1]
            dw[q - 1] = dw[q - 1] - scale[q - 1]
        rho.append(sum(v * v for v in dw if not isinstance(v, float)))

    # ---- beta initializations (pnp._betas_case{1,2,3}) ---------------
    def case1():
        x = _solve_ls([[Lm[r][0], Lm[r][1], Lm[r][3], Lm[r][6]]
                       for r in range(S)], rho, 4)
        b1 = jnp.sqrt(jnp.abs(x[0]))
        s = jnp.sign(x[0]) + (x[0] == 0)
        inv_b1 = 1.0 / jnp.maximum(b1, 1e-12)
        return [b1, s * x[1] * inv_b1, s * x[2] * inv_b1, s * x[3] * inv_b1]

    def case2():
        x = _solve_ls([[Lm[r][0], Lm[r][1], Lm[r][2]]
                       for r in range(S)], rho, 3)
        b1 = jnp.sqrt(jnp.abs(x[0]))
        b2 = jnp.sqrt(jnp.abs(x[2])) * jnp.sign(x[1]) * jnp.sign(x[0])
        zero = jnp.zeros_like(b1)
        return [b1, b2, zero, zero]

    def case3():
        x = _solve_ls([[Lm[r][0], Lm[r][1], Lm[r][2], Lm[r][3], Lm[r][4]]
                       for r in range(S)], rho, 5)
        b1 = jnp.sqrt(jnp.abs(x[0]))
        b2 = jnp.sqrt(jnp.abs(x[2])) * jnp.sign(x[1]) * jnp.sign(x[0])
        b3 = x[3] / jnp.maximum(b1, 1e-12) * jnp.sign(x[0])
        return [b1, b2, b3, jnp.zeros_like(b1)]

    def gn_refine(bs):
        """pnp._gauss_newton_betas."""
        for _ in range(gn_iters):
            b1, b2, b3, b4 = bs
            J = [[2 * b1 * Lm[r][0] + b2 * Lm[r][1] + b3 * Lm[r][3]
                  + b4 * Lm[r][6],
                  b1 * Lm[r][1] + 2 * b2 * Lm[r][2] + b3 * Lm[r][4]
                  + b4 * Lm[r][7],
                  b1 * Lm[r][3] + b2 * Lm[r][4] + 2 * b3 * Lm[r][5]
                  + b4 * Lm[r][8],
                  b1 * Lm[r][6] + b2 * Lm[r][7] + b3 * Lm[r][8]
                  + 2 * b4 * Lm[r][9]] for r in range(S)]
            prods = [b1 * b1, b1 * b2, b2 * b2, b1 * b3, b2 * b3, b3 * b3,
                     b1 * b4, b2 * b4, b3 * b4, b4 * b4]
            res = [rho[r] - sum(Lm[r][c] * prods[c] for c in range(10))
                   for r in range(S)]
            delta = _solve_ls(J, res, 4)
            bs = [bs[i] + delta[i] for i in range(4)]
        return bs

    def pose_from_betas(bs):
        """pnp._pose_from_betas + _procrustes (fast)."""
        x = [sum(V[i][b] * bs[b] for b in range(4)) for i in range(12)]
        # camera-frame points: pc[j][c] = sum_k alphas[j][k] * cc[k][c]
        pc = [[sum(alphas[j][k] * x[3 * k + c] for k in range(4))
               for c in range(3)] for j in range(S)]
        zmean = sum(pc[j][2] for j in range(S)) * inv_s
        flip = jnp.where(zmean < 0, -1.0, 1.0)
        pc = [[v * flip for v in row] for row in pc]
        # weighted Procrustes, w = 1: cw = c0 (world centroid)
        cc2 = [sum(pc[j][c] for j in range(S)) * inv_s for c in range(3)]
        H = [[sum((pc[j][r] - cc2[r]) * d[j][c] for j in range(S))
              for c in range(3)] for r in range(3)]
        R = _polar_rotation(H)
        t = [cc2[c] - sum(R[c][k] * c0[k] for k in range(3))
             for c in range(3)]
        return R, t

    def reproj_err(R, t):
        acc = 0.0
        for j in range(S):
            pz = sum(R[2][k] * X[j][k] for k in range(3)) + t[2]
            z = jnp.maximum(jnp.abs(pz), 1e-8) * jnp.sign(
                jnp.where(pz == 0, 1.0, pz))
            inv_z = 1.0 / z
            px = sum(R[0][k] * X[j][k] for k in range(3)) + t[0]
            py = sum(R[1][k] * X[j][k] for k in range(3)) + t[1]
            eu = fx * px * inv_z + cx - U[j][0]
            ev = fy * py * inv_z + cy - U[j][1]
            acc = acc + eu * eu + ev * ev
        return acc * inv_s

    best_R, best_t, best_e = None, None, None
    for case in (case1, case2, case3):
        R, t = pose_from_betas(gn_refine(case()))
        e = reproj_err(R, t)
        e = jnp.where(jnp.isnan(e), jnp.inf, e)
        if best_R is None:
            best_R, best_t, best_e = R, t, e
        else:
            take = e < best_e
            best_R = [[jnp.where(take, R[r][c], best_R[r][c])
                       for c in range(3)] for r in range(3)]
            best_t = [jnp.where(take, t[c], best_t[c]) for c in range(3)]
            best_e = jnp.minimum(e, best_e)
    return best_R, best_t


# ---------------------------------------------------------------------------
# pallas_call wrapper
# ---------------------------------------------------------------------------

def _kernel(p3_ref, p2_ref, cam_ref, R_ref, t_ref, *, gn_iters: int):
    X = [[p3_ref[3 * j + c, 0] for c in range(3)] for j in range(S)]
    U = [[p2_ref[2 * j + c, 0] for c in range(2)] for j in range(S)]
    fx, fy = cam_ref[0, 0], cam_ref[1, 0]
    cx, cy = cam_ref[2, 0], cam_ref[3, 0]
    R, t = _epnp_soa(X, U, fx, fy, cx, cy, gn_iters)
    for r in range(3):
        for c in range(3):
            R_ref[3 * r + c, 0] = R[r][c]
        t_ref[r, 0] = t[r]


def minimal_epnp_hypotheses(samp3d: jnp.ndarray, samp2d: jnp.ndarray,
                            Ks: jnp.ndarray, gn_iters: int = 5,
                            use_kernel: bool = None,
                            interpret: bool = False,
                            fast: bool = True):
    """N independent minimal-set EPnP solves.

    samp3d [N, 6, 3], samp2d [N, 6, 2], Ks [N, 3, 3] (f32).
    Returns (Rs [N, 3, 3], ts [N, 3]).

    use_kernel=None -> pallas on TPU, vmapped jnp elsewhere. The two
    paths implement the same algorithm (see module docstring) and agree
    to float32 tolerance. fast=False (exact eigh/svd small linalg)
    exists only in the jnp path, so it forces the fallback.
    ZEBRAPOSE_NO_PALLAS=1 disables the kernel globally (escape hatch
    for platforms where Mosaic misbehaves — the jnp path is always
    available). The variable is snapshotted at import (module constant
    NO_PALLAS): set it before the process first imports zebrapose_tpu;
    toggling it later has no effect on compiled executables.
    """
    from zebrapose_tpu.ops.pnp import epnp

    if not fast or NO_PALLAS:
        use_kernel = False
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    n = samp3d.shape[0]
    if samp3d.shape[1] != S:
        # the Pallas kernel is unrolled at width S=6 (sample_size<6 is
        # padded up by the sampler; >6 falls back to the vmapped solve)
        use_kernel = False
    if not use_kernel:
        ones = jnp.ones((n, samp3d.shape[1]), samp3d.dtype)
        return jax.vmap(lambda a, b, w, K: epnp(a, b, w, K, gn_iters,
                                                fast))(
            samp3d, samp2d, ones, Ks)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad = -(-n // TILE) * TILE
    pad = [(0, n_pad - n)]

    def planes(x, d):       # [N, S, d] -> [S*d, tiles, SUB, LANE]
        x = jnp.pad(x, pad + [(0, 0)] * (x.ndim - 1), mode="edge")
        x = x.reshape(n_pad, -1).T
        return x.reshape(d * S, n_pad // TILE, SUB, LANE)

    p3 = planes(samp3d.astype(jnp.float32), 3)
    p2 = planes(samp2d.astype(jnp.float32), 2)
    cam = jnp.stack([Ks[:, 0, 0], Ks[:, 1, 1], Ks[:, 0, 2], Ks[:, 1, 2]])
    cam = jnp.pad(cam.astype(jnp.float32), [(0, 0)] + pad, mode="edge")
    cam = cam.reshape(4, n_pad // TILE, SUB, LANE)

    tiles = n_pad // TILE
    spec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, 1, SUB, LANE), lambda i: (0, i, 0, 0),
        memory_space=pltpu.VMEM)

    R_pl, t_pl = pl.pallas_call(
        partial(_kernel, gn_iters=gn_iters),
        grid=(tiles,),
        in_specs=[spec(3 * S), spec(2 * S), spec(4)],
        out_specs=[spec(9), spec(3)],
        out_shape=[
            jax.ShapeDtypeStruct((9, tiles, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((3, tiles, SUB, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(p3, p2, cam)

    Rs = R_pl.reshape(9, n_pad).T[:n].reshape(n, 3, 3)
    ts = t_pl.reshape(3, n_pad).T[:n]
    return Rs, ts
