"""On-chip COST of the adaptive RANSAC escalation stage (round 5).

PERF.md's escalation table shows the QUALITY side (beats cv2 on every
extreme-outlier regime); this measures what the `lax.cond` second stage
costs in the production batched program (`decode_to_pose_batch`, where
the gate is one batch-level `jnp.any`):

  - skip regime: consistent correspondences, low outlier rate -> every
    frame clears `escalate_inlier_frac`, the branch is not taken; the
    escalated program should cost ~the baseline (one jnp.any + cond).
  - trigger regime: heavy bit-flip outliers -> the branch runs
    draw+solve+LO at H=escalate for the whole batch.

Inputs are exact-correspondence synthetic scenes (same construction as
tests/test_decode_chain_oracle.py, vectorized): each foreground pixel's
class id maps to the 3D point whose projection under the GT pose lands
exactly on that pixel's back-mapped original coordinate; outliers are
random single-bit id corruptions.

Run on the TPU:  python scripts/escalation_cost.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

G = 128
N_BITS = 16
N_CLASSES = 2 ** N_BITS
KMAT = np.array([[572.4114, 0, 325.2611],
                 [0, 573.57043, 242.04899], [0, 0, 1]], np.float64)


def build_batch(b, n_px, flip_frac, seed=0):
    """Vectorized exact-correspondence scenes sharing one LUT."""
    rng = np.random.default_rng(seed)
    Kinv = np.linalg.inv(KMAT)
    lut = np.zeros((N_CLASSES, 3), np.float32)
    lut_valid = np.zeros((N_CLASSES,), bool)
    masks = np.zeros((b, G, G), np.float32)
    ids_all = np.zeros((b, G, G), np.int64)
    bboxes = np.tile(np.array([40, 30, 2 * G, 2 * G], np.int32), (b, 1))
    next_id = 1
    for i in range(b):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        t = np.array([rng.uniform(-20, 20), rng.uniform(-20, 20),
                      rng.uniform(550, 650)])
        flat = rng.choice(G * G, size=n_px, replace=False)
        ys, xs = flat // G, flat % G
        ids = np.arange(next_id, next_id + n_px)
        assert ids[-1] < N_CLASSES, "raise G or lower b*n_px"
        next_id += n_px
        # decode maps pixel (y,x) -> original coords (2x+40, 2y+30);
        # back-project those at a per-pixel depth to get the 3D point
        ox, oy = 2.0 * xs + 40, 2.0 * ys + 30
        d = 600.0 + 25 * np.sin(xs * 0.21) * np.cos(ys * 0.17)
        pc = (Kinv @ np.stack([ox * d, oy * d, d])).T
        lut[ids] = ((pc - t) @ q).astype(np.float32)  # q.T @ (pc-t)
        lut_valid[ids] = True
        # corrupt a fraction with a single random bit flip (outliers)
        n_bad = int(flip_frac * n_px)
        bad = rng.choice(n_px, n_bad, replace=False)
        ids = ids.copy()
        ids[bad] ^= 1 << rng.integers(0, N_BITS, size=n_bad)
        ids_all[i, ys, xs] = ids
        masks[i, ys, xs] = 1.0
    # id planes, MSB first (class_id_to_code semantics)
    shifts = np.arange(N_BITS - 1, -1, -1)
    codes = ((ids_all[..., None] >> shifts) & 1).astype(np.float32)
    return masks, codes, bboxes, lut, lut_valid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--n_px", type=int, default=400)
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--escalate", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/zebrapose_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from zebrapose_tpu.ops.pnp import PnPConfig, decode_to_pose_batch

    cfg0 = PnPConfig(n_hypotheses=args.h, max_points=2048)
    cfg1 = PnPConfig(n_hypotheses=args.h, max_points=2048,
                     escalate_hypotheses=args.escalate)
    Ks = jnp.asarray(np.tile(KMAT.astype(np.float32),
                             (args.b, 1, 1)))
    keys = jax.random.split(jax.random.PRNGKey(2), args.b)

    def timeit(cfg, inputs):
        masks, codes, bboxes, lut, lut_valid = inputs
        a = (jnp.asarray(masks), jnp.asarray(codes),
             jnp.asarray(lut), jnp.asarray(lut_valid),
             jnp.asarray(bboxes), Ks, keys)

        def run():
            R, t, ok, n_in = decode_to_pose_batch(
                *a, bbox_size=G, base=2, cfg=cfg)
            return R, ok, n_in
        R, ok, n_in = run()
        float(jnp.sum(R))                      # compile + drain
        t0 = time.perf_counter()
        for _ in range(args.iters):
            R, ok, n_in = run()
        float(jnp.sum(R))
        dt = (time.perf_counter() - t0) / args.iters
        return dt * 1e3, float(jnp.mean(ok.astype(jnp.float32))), \
            float(jnp.mean(n_in))

    report = {"b": args.b, "h": args.h, "escalate": args.escalate,
              "backend": jax.default_backend(),
              "date": time.strftime("%Y-%m-%d")}
    for regime, flip in (("skip", 0.05), ("trigger", 0.75)):
        inputs = build_batch(args.b, args.n_px, flip, seed=3)
        base_ms, ok0, nin0 = timeit(cfg0, inputs)
        esc_ms, ok1, nin1 = timeit(cfg1, inputs)
        report[regime] = {
            "flip_frac": flip,
            "base_ms": round(base_ms, 2), "esc_ms": round(esc_ms, 2),
            "overhead_ms": round(esc_ms - base_ms, 2),
            "solved_base": ok0, "solved_esc": ok1,
            "mean_inliers_base": round(nin0, 1),
            "mean_inliers_esc": round(nin1, 1)}
        print(f"{regime} (flip {flip}): base {base_ms:.2f} ms "
              f"esc {esc_ms:.2f} ms (+{esc_ms - base_ms:.2f}); "
              f"solved {ok0:.3f}->{ok1:.3f}, "
              f"inliers {nin0:.0f}->{nin1:.0f}", flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "reports", "escalation_cost.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
