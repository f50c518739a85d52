"""Pallas minimal-EPnP kernel parity.

The kernel (ops/pnp_kernel.py) re-implements ops/pnp.epnp in
structure-of-arrays form; these tests pin it to the vmapped jnp
implementation (interpreter mode — no TPU in CI) and pin the batched
decode entry point to the per-instance one.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from zebrapose_tpu.ops.pnp import PnPConfig, decode_to_pose, \
    decode_to_pose_batch
from zebrapose_tpu.ops.pnp_kernel import minimal_epnp_hypotheses

K = np.array([[572.4114, 0, 325.2611],
              [0, 573.57043, 242.04899],
              [0, 0, 1]], np.float32)


def _minimal_sets(n, rng, noise=0.3):
    pw = rng.uniform(-40, 40, (n, 6, 3)).astype(np.float32)
    R0 = np.stack([np.linalg.qr(rng.normal(size=(3, 3)))[0]
                   for _ in range(n)])
    R0[np.linalg.det(R0) < 0] *= -1
    t0 = np.concatenate([rng.uniform(-30, 30, (n, 2)),
                         rng.uniform(450, 650, (n, 1))], -1)
    pc = np.einsum("nij,npj->npi", R0, pw) + t0[:, None, :]
    uv = np.stack([K[0, 0] * pc[..., 0] / pc[..., 2] + K[0, 2],
                   K[1, 1] * pc[..., 1] / pc[..., 2] + K[1, 2]],
                  -1).astype(np.float32)
    uv += rng.normal(0, noise, uv.shape).astype(np.float32)
    return pw, uv, R0.astype(np.float32), t0.astype(np.float32)


def test_kernel_matches_vmapped_epnp():
    """Interpreter-mode pallas kernel vs jax.vmap(epnp): same algorithm,
    float32-level agreement, same ground-truth recovery."""
    rng = np.random.default_rng(0)
    n = 24
    pw, uv, R0, t0 = _minimal_sets(n, rng)
    Ks = jnp.asarray(np.tile(K[None], (n, 1, 1)))
    Rr, tr = minimal_epnp_hypotheses(jnp.asarray(pw), jnp.asarray(uv),
                                     Ks, use_kernel=False)
    Rk, tk = minimal_epnp_hypotheses(jnp.asarray(pw), jnp.asarray(uv),
                                     Ks, use_kernel=True, interpret=True)
    np.testing.assert_allclose(np.asarray(Rk), np.asarray(Rr), atol=5e-4)
    np.testing.assert_allclose(np.asarray(tk), np.asarray(tr), atol=0.05)
    # both recover the generating poses on low-noise minimal sets
    med = np.median(np.abs(np.asarray(Rk) - R0).max((1, 2)))
    assert med < 0.05, med


def test_decode_batch_matches_single():
    """decode_to_pose_batch (jnp path) == vmapped decode_to_pose:
    identical subset draws, hypotheses, refinement."""
    rng = np.random.default_rng(1)
    B, hw, n_bits = 3, 32, 10
    lut_pts = rng.uniform(-40, 40, (2 ** n_bits, 3)).astype(np.float32)
    lut_valid = np.ones((2 ** n_bits,), bool)
    masks = np.zeros((B, hw, hw), np.float32)
    masks[:, 8:24, 8:24] = 1.0
    codes = rng.integers(0, 2, (B, hw, hw, n_bits)).astype(np.float32)
    bboxes = np.tile(np.array([[100, 80, 64, 64]], np.int32), (B, 1))
    Ks = np.tile(K[None], (B, 1, 1))
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    cfg = PnPConfig(n_hypotheses=16, max_points=256)

    single = jax.vmap(lambda m, c, b, Ki, k: decode_to_pose(
        m, c, jnp.asarray(lut_pts), jnp.asarray(lut_valid), b, Ki, k,
        bbox_size=hw, cfg=cfg))(
        jnp.asarray(masks), jnp.asarray(codes), jnp.asarray(bboxes),
        jnp.asarray(Ks), keys)
    batched = decode_to_pose_batch(
        jnp.asarray(masks), jnp.asarray(codes), jnp.asarray(lut_pts),
        jnp.asarray(lut_valid), jnp.asarray(bboxes), jnp.asarray(Ks),
        keys, bbox_size=hw, cfg=cfg)
    for s, b, name in zip(single, batched, ("R", "t", "ok", "n_in")):
        np.testing.assert_allclose(np.asarray(b), np.asarray(s),
                                   atol=1e-4, err_msg=name)
