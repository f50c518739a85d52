"""End-to-end learning validation on synthetic exact geometry.

Builds a scene whose RGB is a color-coding of the surface labels (so the
mapping pixels -> codes is learnable), trains the REAL ZebraPoseNet with
the full loss stack, and evaluates pose recall through the complete
decode -> EPnP pipeline. Success = ADD recall@0.1d reaches 1.0 from 0.

Run on the TPU:  python scripts/validate_training.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from zebrapose_tpu.codec.lut import CorrespondenceLUT
from zebrapose_tpu.models.losses import CodeLossConfig
from zebrapose_tpu.models.zebra_net import ZebraPoseNet
from zebrapose_tpu.ops.binarize import code_from_logits, mask_from_logits
from zebrapose_tpu.ops.metrics import add_error
from zebrapose_tpu.ops.pnp import PnPConfig, decode_to_pose
from zebrapose_tpu.train.state import create_train_state
from zebrapose_tpu.train.train_step import train_step

CROP = 64
GT = 32
N_BITS = 16
K = np.array([[400.0, 0, 32.0], [0, 400.0, 32.0], [0, 0, 1]], np.float32)


def make_scene(n_poses=64, seed=0):
    """Crop-space scenes: pose -> per-pixel code via backprojection; RGB
    encodes the code (bits 0-7 -> G, 8-15 -> R channel patterns)."""
    rng = np.random.default_rng(seed)
    lut_pts = np.zeros((2 ** N_BITS, 3), np.float32)
    lut_valid = np.zeros((2 ** N_BITS,), bool)
    Kinv = np.linalg.inv(K)
    imgs = np.zeros((n_poses, CROP, CROP, 3), np.float32)
    masks = np.zeros((n_poses, GT, GT), np.float32)
    codes = np.zeros((n_poses, GT, GT, N_BITS), np.float32)
    poses = []
    next_id = 1
    for n in range(n_poses):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        R = q.astype(np.float32)
        t = np.array([0, 0, 450.0], np.float32)
        poses.append((R, t))
        for y in range(6, 26):
            for x in range(6, 26):
                depth = 450.0 + 6 * np.sin(x * 0.4) * np.cos(y * 0.3)
                # gt pixel (x,y) maps to crop pixel 2x..2x+1 (GT=CROP/2)
                pc = Kinv @ np.array([2 * x * depth, 2 * y * depth,
                                      depth])
                cid = next_id
                next_id += 1
                lut_pts[cid] = R.T @ (pc - t)
                lut_valid[cid] = True
                masks[n, y, x] = 1.0
                bits = [(cid >> (N_BITS - 1 - b)) & 1
                        for b in range(N_BITS)]
                codes[n, y, x] = bits
                # RGB encodes the id so the mapping is learnable:
                # channel 0 = high byte, channel 1 = low byte, ch2 = fg
                imgs[n, 2 * y:2 * y + 2, 2 * x:2 * x + 2, 0] = \
                    (cid >> 8) / 255.0
                imgs[n, 2 * y:2 * y + 2, 2 * x:2 * x + 2, 1] = \
                    (cid & 255) / 255.0
                imgs[n, 2 * y:2 * y + 2, 2 * x:2 * x + 2, 2] = 1.0
    lut = CorrespondenceLUT(lut_pts, lut_valid, 2, N_BITS)
    return imgs, masks, codes, poses, lut


def main():
    imgs, masks, codes, poses, lut = make_scene()
    n = len(imgs)
    model = ZebraPoseNet(binary_code_length=N_BITS, variant="v2",
                         concat=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, CROP, CROP, 3)), train=False)
    state = create_train_state(model, dict(variables),
                               learning_rate=3e-4, n_bits=N_BITS)
    loss_cfg = CodeLossConfig(n_bits=N_BITS)

    batch_all = {
        "image": jnp.asarray(imgs * 2.0 - 1.0),
        "mask": jnp.asarray(masks),
        "entire_mask": jnp.asarray(masks),
        "code": jnp.asarray(codes),
    }
    rng = np.random.default_rng(1)

    lut_pts = jnp.asarray(lut.points)
    lut_val = jnp.asarray(lut.valid)
    # the crop covers the whole 64x64 image: GT pixels map x2 into it
    bbox = jnp.asarray(np.array([0, 0, CROP, CROP], np.int32))
    pnp_cfg = PnPConfig(n_hypotheses=128, max_points=512)

    @jax.jit
    def eval_recall(params, batch_stats):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          batch_all["image"], train=False)
        m = mask_from_logits(out["mask"][..., 0])
        c = code_from_logits(out["code"])

        def one(mask, code, k):
            return decode_to_pose(mask, code, lut_pts, lut_val, bbox,
                                  jnp.asarray(K), k, bbox_size=GT,
                                  cfg=pnp_cfg)

        keys = jax.random.split(jax.random.PRNGKey(2), n)
        return jax.vmap(one)(m, c, keys)

    verts = lut.points[lut.valid][::13]

    def recall(params, batch_stats):
        Rs, ts, ok, _ = eval_recall(params, batch_stats)
        Rs, ts, ok = map(np.asarray, (Rs, ts, ok))
        good = 0
        for i, (Rg, tg) in enumerate(poses):
            if not ok[i]:
                continue
            e = float(add_error(jnp.asarray(Rs[i]), jnp.asarray(ts[i]),
                                jnp.asarray(Rg), jnp.asarray(tg),
                                jnp.asarray(verts)))
            good += e < 0.1 * 80.0
        return good / len(poses)

    r0 = recall(state.params, state.batch_stats)
    print(f"step 0: recall {r0:.3f}", flush=True)
    t0 = time.time()
    B = 16
    steps = 900
    for it in range(steps):
        idx = rng.integers(0, n, B)
        batch = {k: v[jnp.asarray(idx)] for k, v in batch_all.items()}
        state, metrics = train_step(state, batch, loss_cfg)
        if (it + 1) % 150 == 0:
            r = recall(state.params, state.batch_stats)
            print(f"step {it+1}: loss "
                  f"{float(metrics['loss_total']):.4f} "
                  f"hamming {float(metrics['hamming']):.4f} "
                  f"recall {r:.3f} ({time.time()-t0:.0f}s)", flush=True)
    r_final = recall(state.params, state.batch_stats)
    print(f"FINAL: recall {r_final:.3f} (start {r0:.3f})")
    assert r_final >= 0.9, "training did not converge"
    print("TRAINING VALIDATION PASSED")


if __name__ == "__main__":
    main()
