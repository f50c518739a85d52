"""Iteration-count quality sweep for the fast_linalg operating points
(VERDICT r2 #9, PERF.md item 3).

The EPnP hypothesis solver runs three iterative replacements for exact
small-matrix decompositions: inverse-subspace iteration (k=4, default 4
iters) for the M^T M null space, scaled-Newton polar iteration (default
12) for the Procrustes rotation, and Gauss-Newton on the betas (default
5). This sweeps each count one-at-a-time around the defaults on the
solver's true workload — noisy 6-point minimal sets — and reports
median/p90 rotation error vs ground truth, with cv2.solvePnP(EPNP) and
the exact eigh/svd path (fast=False) as oracles. The quality cliff and
the chosen operating points are recorded in PERF.md.

Run:  python scripts/fast_linalg_sweep.py   (TPU or CPU; jnp path only —
the Pallas kernel hardcodes the default counts and is gated separately
by scripts/pallas_parity_gate.py)
"""

import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from zebrapose_tpu.ops import fast_linalg  # noqa: E402
from zebrapose_tpu.ops.pnp import epnp  # noqa: E402

K = np.array([[572.4114, 0, 325.2611],
              [0, 573.57043, 242.04899],
              [0, 0, 1]], np.float32)
N = 2048
NOISE = 0.5


def minimal_sets(rng):
    pw = rng.uniform(-40, 40, (N, 6, 3)).astype(np.float32)
    R0 = np.stack([np.linalg.qr(rng.normal(size=(3, 3)))[0]
                   for _ in range(N)])
    R0[np.linalg.det(R0) < 0] *= -1
    t0 = np.concatenate([rng.uniform(-30, 30, (N, 2)),
                         rng.uniform(450, 650, (N, 1))], -1)
    pc = np.einsum("nij,npj->npi", R0, pw) + t0[:, None, :]
    uv = np.stack([K[0, 0] * pc[..., 0] / pc[..., 2] + K[0, 2],
                   K[1, 1] * pc[..., 1] / pc[..., 2] + K[1, 2]],
                  -1).astype(np.float32)
    uv += rng.normal(0, NOISE, uv.shape).astype(np.float32)
    return pw, uv, R0.astype(np.float32)


def rot_err_deg(Ra, Rb):
    """Angle via the Frobenius chord ||Ra-Rb||_F = 2 sqrt(2) sin(th/2).

    NOT the trace formula: an unconverged polar factor is NOT
    orthonormal, and a scaled-up R pushes tr(Ra^T Rb) past 3 where the
    arccos clip silently reports 0 deg for garbage output.
    """
    fro = np.linalg.norm((Ra - Rb).reshape(len(Ra), -1), axis=-1)
    return np.degrees(2 * np.arcsin(np.clip(fro / (2 * np.sqrt(2)), 0, 1)))


def orth_err(Ra):
    return np.abs(np.einsum("nij,nkj->nik", Ra, Ra)
                  - np.eye(3)).max()


def run_config(pw, uv, R0, gn_iters=5, polar_iters=12, sub_iters=4,
               fast=True):
    orig_polar = fast_linalg.polar_rotation
    orig_sub = fast_linalg.smallest_subspace
    fast_linalg.polar_rotation = partial(orig_polar, iters=polar_iters)
    fast_linalg.smallest_subspace = partial(orig_sub, iters=sub_iters)
    try:
        ones = jnp.ones((N, 6), jnp.float32)
        Ks = jnp.asarray(np.tile(K[None], (N, 1, 1)))
        Rs, ts = jax.vmap(lambda a, b, w, Ki: epnp(
            a, b, w, Ki, gn_iters, fast))(
            jnp.asarray(pw), jnp.asarray(uv), ones, Ks)
        Rs = np.asarray(jax.device_get(Rs))
    finally:
        fast_linalg.polar_rotation = orig_polar
        fast_linalg.smallest_subspace = orig_sub
    e = rot_err_deg(Rs, R0)
    e = np.where(np.isnan(e), 180.0, e)
    return np.median(e), np.percentile(e, 90), orth_err(
        np.nan_to_num(Rs, nan=0.0))


def main():
    rng = np.random.default_rng(11)
    pw, uv, R0 = minimal_sets(rng)

    # oracles
    import cv2
    errs = []
    for i in range(N):
        ok, rvec, tvec = cv2.solvePnP(pw[i].astype(np.float64),
                                      uv[i].astype(np.float64),
                                      K.astype(np.float64), None,
                                      flags=cv2.SOLVEPNP_EPNP)
        Rc, _ = cv2.Rodrigues(rvec)
        errs.append(Rc)
    e = rot_err_deg(np.stack(errs), R0)
    print(f"cv2 SOLVEPNP_EPNP oracle: median {np.median(e):.4f} deg, "
          f"p90 {np.percentile(e, 90):.4f}")
    m, p, o = run_config(pw, uv, R0, fast=False)
    print(f"exact eigh/svd (fast=False): median {m:.4f}, p90 {p:.4f}, "
          f"orth {o:.1e}")
    m, p, o = run_config(pw, uv, R0)
    print(f"default fast (polar 12 / subspace 4 / gn 5): "
          f"median {m:.4f}, p90 {p:.4f}, orth {o:.1e}")

    print("\npolar_rotation iters (subspace 4, gn 5):")
    for it in (2, 4, 6, 8, 12, 16):
        m, p, o = run_config(pw, uv, R0, polar_iters=it)
        print(f"  polar {it:2d}: median {m:.4f}, p90 {p:.4f}, "
              f"orth {o:.1e}")
    print("\nsmallest_subspace iters (polar 12, gn 5):")
    for it in (1, 2, 3, 4, 6, 8):
        m, p, o = run_config(pw, uv, R0, sub_iters=it)
        print(f"  subspace {it:2d}: median {m:.4f}, p90 {p:.4f}, "
              f"orth {o:.1e}")
    print("\nbetas Gauss-Newton iters (polar 12, subspace 4):")
    for it in (0, 1, 2, 3, 5, 8):
        m, p, o = run_config(pw, uv, R0, gn_iters=it)
        print(f"  gn {it:2d}: median {m:.4f}, p90 {p:.4f}, "
              f"orth {o:.1e}")


if __name__ == "__main__":
    main()
