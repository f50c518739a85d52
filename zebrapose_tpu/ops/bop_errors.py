"""BOP-challenge pose errors (MSSD / MSPD / VSD) + BOP19 average recall.

The reference framework exports CSVs and defers challenge scoring to its
vendored bop_toolkit fork, run per-pose in Python on the CPU
(lib/pysixd/pose_error.py:22-180, lib/pysixd/misc.py:206-260,
lib/pysixd/visibility.py:9-77). Here the symmetry-aware errors are
batched device programs: one jitted kernel scores ALL poses of an object
against ALL symmetry transforms (a lax.scan over symmetries of a
[N,P,3] vertex-distance program — continuous symmetries discretize to
hundreds of transforms, so the scan keeps memory flat while the MXU
chews the [N,P] transforms), and VSD's per-pixel visibility/cost math
runs as one jitted program over the whole stack of depth images, with
only the depth rendering itself on the host (the same dependency-free
C++ rasterizer that renders GT labels, native/zebra_native.cpp).

Error definitions follow BOP19 (Hodan et al., ECCV 2020) exactly; the
tests pin every function to the reference's own vendored implementations
executing on fuzzed poses.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


# ------------------------------------------------------------ symmetries


def _axis_angle_rotation(axis: np.ndarray, angle: float) -> np.ndarray:
    """Rotation about a (unit) axis through the origin (the 3x3 block of
    transform.rotation_matrix used by misc.get_symmetry_transformations)."""
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    c, s = np.cos(angle), np.sin(angle)
    x, y, z = a
    K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
    return c * np.eye(3) + s * K + (1 - c) * np.outer(a, a)


def get_symmetry_transformations(model_info: Dict,
                                 max_sym_disc_step: float = 0.01
                                 ) -> Tuple[np.ndarray, np.ndarray]:
    """models_info.json entry -> stacked symmetry transforms
    ([S,3,3] rotations, [S,3] translations), identity included.

    Mirrors misc.get_symmetry_transformations (lib/pysixd/misc.py:206-260):
    discrete symmetries enumerate; continuous axis symmetries discretize
    into ceil(pi / max_sym_disc_step) steps; the two sets compose as
    cont ∘ disc."""
    Rs_d = [np.eye(3)]
    ts_d = [np.zeros(3)]
    for sym in model_info.get("symmetries_discrete", []):
        m = np.reshape(np.asarray(sym, np.float64), (4, 4))
        Rs_d.append(m[:3, :3])
        ts_d.append(m[:3, 3])

    Rs_c, ts_c = [], []
    for sym in model_info.get("symmetries_continuous", []):
        axis = np.asarray(sym["axis"], np.float64)
        offset = np.asarray(sym["offset"], np.float64)
        n = int(np.ceil(np.pi / max_sym_disc_step))
        step = 2.0 * np.pi / n
        for i in range(1, n):
            R = _axis_angle_rotation(axis, i * step)
            Rs_c.append(R)
            ts_c.append(offset - R @ offset)

    Rs, ts = [], []
    for Rd, td in zip(Rs_d, ts_d):
        if Rs_c:
            for Rc, tc in zip(Rs_c, ts_c):
                Rs.append(Rc @ Rd)
                ts.append(Rc @ td + tc)
        else:
            Rs.append(Rd)
            ts.append(td)
    return (np.stack(Rs).astype(np.float32),
            np.stack(ts).astype(np.float32))


# ------------------------------------------------------- MSSD / MSPD


def _gt_sym_pose(R_gt, t_gt, sym_R, sym_t):
    """Compose one symmetry into the GT poses: [N,3,3],[N,3]."""
    R = jnp.einsum("nij,jk->nik", R_gt, sym_R, precision=HIGHEST)
    t = jnp.einsum("nij,j->ni", R_gt, sym_t, precision=HIGHEST) + t_gt
    return R, t


@jax.jit
def mssd_batch(R_est: jnp.ndarray, t_est: jnp.ndarray,
               R_gt: jnp.ndarray, t_gt: jnp.ndarray,
               pts: jnp.ndarray, sym_R: jnp.ndarray,
               sym_t: jnp.ndarray) -> jnp.ndarray:
    """Maximum Symmetry-aware Surface Distance for N poses at once.

    min over symmetries of max over model points of
    ||R_est x + t_est - (R_gt S x + t_gt')|| — pose_error.py:131-154,
    batched: [N,3,3],[N,3] poses, [P,3] points, [S,3,3],[S,3] syms -> [N].
    """
    pts_est = jnp.einsum("nij,pj->npi", R_est, pts,
                         precision=HIGHEST) + t_est[:, None, :]

    def body(best, sym):
        R_s, t_s = sym
        R, t = _gt_sym_pose(R_gt, t_gt, R_s, t_s)
        pts_gt = jnp.einsum("nij,pj->npi", R, pts,
                            precision=HIGHEST) + t[:, None, :]
        d = jnp.linalg.norm(pts_est - pts_gt, axis=-1).max(axis=1)
        return jnp.minimum(best, d), None

    init = jnp.full(R_est.shape[:1], jnp.inf, pts_est.dtype)
    best, _ = jax.lax.scan(body, init, (sym_R, sym_t))
    return best


@jax.jit
def mspd_batch(R_est: jnp.ndarray, t_est: jnp.ndarray,
               R_gt: jnp.ndarray, t_gt: jnp.ndarray,
               K: jnp.ndarray, pts: jnp.ndarray,
               sym_R: jnp.ndarray, sym_t: jnp.ndarray) -> jnp.ndarray:
    """Maximum Symmetry-aware Projection Distance, batched.

    pose_error.py:156-180 with misc.project_pts' K[R|t] projection;
    per-sample intrinsics K [N,3,3] -> [N] pixel errors."""

    def project(R, t):
        cam = jnp.einsum("nij,pj->npi", R, pts,
                         precision=HIGHEST) + t[:, None, :]
        uvw = jnp.einsum("nij,npj->npi", K, cam, precision=HIGHEST)
        return uvw[..., :2] / uvw[..., 2:3]

    uv_est = project(R_est, t_est)

    def body(best, sym):
        R_s, t_s = sym
        R, t = _gt_sym_pose(R_gt, t_gt, R_s, t_s)
        d = jnp.linalg.norm(uv_est - project(R, t), axis=-1).max(axis=1)
        return jnp.minimum(best, d), None

    init = jnp.full(R_est.shape[:1], jnp.inf, uv_est.dtype)
    best, _ = jax.lax.scan(body, init, (sym_R, sym_t))
    return best


# ------------------------------------------------------------------ VSD


@partial(jax.jit, static_argnames=("cost_type",))
def _vsd_costs(depth_test: jnp.ndarray, depth_gt: jnp.ndarray,
               depth_est: jnp.ndarray, K: jnp.ndarray,
               taus: jnp.ndarray, delta: float, norm: jnp.ndarray,
               cost_type: str = "step") -> jnp.ndarray:
    """All-pixel VSD math for a stack of images: [N,H,W] depths ->
    [N,T] errors (one per misalignment tolerance tau).

    Implements depth->distance conversion (misc.py:571-590), the bop19
    visibility masks (visibility.py:9-77: visible where the model is in
    front of the measured surface OR depth is missing; the estimate
    additionally inherits GT-visible model pixels) and the step/tlinear
    pixel costs (pose_error.py:108-128)."""
    h, w = depth_test.shape[-2:]
    ys, xs = jnp.mgrid[:h, :w]
    rays = jnp.stack([(xs + 0.0 - K[:, None, None, 0, 2])
                      / K[:, None, None, 0, 0],
                      (ys + 0.0 - K[:, None, None, 1, 2])
                      / K[:, None, None, 1, 1]], axis=-1)
    ray_norm = jnp.sqrt(1.0 + (rays ** 2).sum(-1))

    d_test = depth_test * ray_norm
    d_gt = depth_gt * ray_norm
    d_est = depth_est * ray_norm

    def visib(d_model):
        return ((d_model - d_test <= delta) | (d_test == 0)) & (d_model > 0)

    visib_gt = visib(d_gt)
    visib_est = visib(d_est) | (visib_gt & (d_est > 0))
    inter = visib_gt & visib_est
    union = visib_gt | visib_est

    union_count = union.sum(axis=(1, 2))
    comp_count = union_count - inter.sum(axis=(1, 2))
    dists = jnp.abs(d_gt - d_est) / norm[:, None, None]

    if cost_type == "step":
        costs = (dists[:, None] >= taus[None, :, None, None])
    elif cost_type == "tlinear":
        costs = jnp.minimum(dists[:, None] / taus[None, :, None, None], 1.0)
    else:
        raise ValueError(f"unknown cost_type: {cost_type}")
    costs = jnp.where(inter[:, None], costs, 0.0).sum(axis=(2, 3))

    e = (costs + comp_count[:, None]) / union_count[:, None]
    return jnp.where(union_count[:, None] == 0, 1.0, e)


def vsd_batch(R_est: np.ndarray, t_est: np.ndarray,
              R_gt: np.ndarray, t_gt: np.ndarray,
              depth_test: np.ndarray, K: np.ndarray,
              vertices: np.ndarray, faces: np.ndarray,
              diameter: float,
              taus: Sequence[float] = tuple(np.arange(0.05, 0.51, 0.05)),
              delta: float = 15.0,
              normalized_by_diameter: bool = True,
              cost_type: str = "step") -> np.ndarray:
    """Visible Surface Discrepancy for N poses: renders est/GT depth with
    the native rasterizer (host), then one jitted program for the
    visibility/cost math over the whole stack. Returns [N, len(taus)].

    Matches pose_error.py:22-130 with the bop19 visibility mode."""
    from zebrapose_tpu.native import render_label

    n, h, w = depth_test.shape
    depth_est = np.zeros((n, h, w), np.float32)
    depth_gt = np.zeros((n, h, w), np.float32)
    labels = np.ones(len(faces), np.int32)
    for i in range(n):
        _, depth_est[i] = render_label(
            vertices, faces, labels, K[i], R_est[i], t_est[i], w, h,
            with_depth=True)
        _, depth_gt[i] = render_label(
            vertices, faces, labels, K[i], R_gt[i], t_gt[i], w, h,
            with_depth=True)

    norm = np.full((n,), diameter if normalized_by_diameter else 1.0,
                   np.float32)
    return np.asarray(_vsd_costs(
        jnp.asarray(depth_test, jnp.float32), jnp.asarray(depth_gt),
        jnp.asarray(depth_est), jnp.asarray(K, jnp.float32),
        jnp.asarray(np.asarray(taus, np.float32)), float(delta),
        jnp.asarray(norm), cost_type=cost_type))


# -------------------------------------------------------- BOP19 scoring


def bop19_average_recalls(errs_vsd: Optional[np.ndarray],
                          errs_mssd: np.ndarray,
                          errs_mspd: np.ndarray,
                          diameter: float,
                          im_width: int = 640) -> Dict[str, float]:
    """BOP19 average recalls from per-pose errors of ONE object.

    Thresholds of correctness (bop_toolkit eval conventions):
      MSSD: theta in {0.05..0.5} * diameter       (10 thresholds)
      MSPD: theta in {5..50} * im_width/640 px    (10 thresholds)
      VSD:  errs_vsd [N, 10] at taus {0.05..0.5}, each judged against
            theta in {0.05..0.5}                  (10x10 combinations)
    Missing poses should be encoded as +inf errors by the caller (they
    count as misses at every threshold). errs_vsd=None (no depth data)
    omits AR_vsd and averages the core over MSSD+MSPD only."""
    thetas = np.arange(0.05, 0.51, 0.05)
    ar_mssd = float(np.mean([
        np.mean(errs_mssd < th * diameter) for th in thetas]))
    r = im_width / 640.0
    ar_mspd = float(np.mean([
        np.mean(errs_mspd < th * r) for th in np.arange(5, 51, 5)]))
    out = {"AR_mssd": ar_mssd, "AR_mspd": ar_mspd}
    if errs_vsd is not None:
        ar_vsd = float(np.mean([
            np.mean(errs_vsd[:, i] < th)
            for i in range(errs_vsd.shape[1]) for th in thetas]))
        out["AR_vsd"] = ar_vsd
        out["AR"] = float((ar_vsd + ar_mssd + ar_mspd) / 3.0)
    else:
        out["AR"] = float((ar_mssd + ar_mspd) / 2.0)
    return out
