"""Stage-by-stage device-time breakdown of the inference pipeline.

bench.py reports end-to-end crops/sec; this script times nested prefixes
of the same program (preprocess | +forward | +decode | +RANSAC) so the
incremental cost of each stage is visible, plus the noop RTT floor.
Run on the real TPU:  python scripts/perf_breakdown.py [--batches 32 128]

Each prefix is its own jitted program returning one scalar; fetching the
scalar forces execution (block_until_ready is a no-op on axon). The
incremental numbers are upper bounds per stage: XLA fuses differently in
each prefix, so stage cost = time(prefix_k) - time(prefix_{k-1}) can be
slightly off from the cost inside the full program.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

IMG_H, IMG_W = 480, 640


def timeit(fn, args, iters=10):
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[32, 128])
    ap.add_argument("--hypotheses", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/zebrapose_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from zebrapose_tpu.data.pipeline import preprocess_batch
    from zebrapose_tpu.models.zebra_net import ZebraPoseNet
    from zebrapose_tpu.ops.binarize import code_from_logits
    from zebrapose_tpu.ops.pnp import PnPConfig, decode_to_pose_batch

    n_bits = 16
    rng = np.random.default_rng(0)
    model = ZebraPoseNet(binary_code_length=n_bits, variant="v2",
                         concat=True, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 256, 3), jnp.float32),
                           train=False)
    lut_points = jnp.asarray(
        rng.uniform(-40, 40, size=(2 ** n_bits, 3)).astype(np.float32))
    lut_valid = jnp.ones((2 ** n_bits,), bool)
    K = jnp.asarray(np.array([[572.4114, 0, 325.2611],
                              [0, 573.57043, 242.04899],
                              [0, 0, 1]], np.float32))
    pnp_cfg = PnPConfig(n_hypotheses=args.hypotheses, max_points=2048)

    @jax.jit
    def noop(x):
        return x + 1.0

    @jax.jit
    def p_preprocess(raw, key):
        b = preprocess_batch(raw, key, crop_img=256, crop_gt=128,
                             is_train=False, include_gt=False)
        return jnp.sum(b["image"])

    @jax.jit
    def p_forward(variables, raw, key):
        b = preprocess_batch(raw, key, crop_img=256, crop_gt=128,
                             is_train=False, include_gt=False)
        out = model.apply(variables, b["image"], train=False)
        return (jnp.sum(out["code"].astype(jnp.float32))
                + jnp.sum(out["mask"].astype(jnp.float32)))

    def _lut_corr(out, masks):
        from zebrapose_tpu.codec.surface_code import code_to_class_id
        codes = code_from_logits(out["code"].astype(jnp.float32))
        ids = jax.vmap(lambda c: code_to_class_id(c, base=2))(codes)
        pts3d = lut_points[ids.reshape(ids.shape[0], -1)]
        return jnp.sum(pts3d * masks.reshape(masks.shape[0], -1, 1))

    @jax.jit
    def p_decode(variables, raw, masks, key):
        b = preprocess_batch(raw, key, crop_img=256, crop_gt=128,
                             is_train=False, include_gt=False)
        out = model.apply(variables, b["image"], train=False)
        return _lut_corr(out, masks)

    @jax.jit
    def p_full(variables, raw, masks, bboxes, key):
        b = preprocess_batch(raw, key, crop_img=256, crop_gt=128,
                             is_train=False, include_gt=False)
        out = model.apply(variables, b["image"], train=False)
        codes = code_from_logits(out["code"].astype(jnp.float32))
        keys = jax.random.split(key, masks.shape[0])
        Ks = jnp.broadcast_to(K, (masks.shape[0], 3, 3))
        Rs, ts, ok, _ = decode_to_pose_batch(
            masks, codes, lut_points, lut_valid, bboxes, Ks, keys,
            bbox_size=128, cfg=pnp_cfg)
        return jnp.sum(ts) + jnp.sum(ok)

    rtt = timeit(noop, (jnp.float32(1.0),), iters=20)
    print(f"noop RTT: {rtt * 1e3:.1f} ms")

    report = {"rtt_ms": round(rtt * 1e3, 1), "per_batch": {}}
    for b in args.batches:
        raw = {
            "rgb": jnp.asarray(rng.integers(
                0, 255, size=(b, IMG_H, IMG_W, 3)).astype(np.uint8)),
            "roi_param": jnp.asarray(np.tile(np.array(
                [[180, 120, 436, 376, 256]], np.int32), (b, 1))),
            "valid": jnp.ones((b,), jnp.float32),
        }
        yy, xx = np.mgrid[0:128, 0:128]
        m = (((yy - 64) / 40.) ** 2 + ((xx - 64) / 40.) ** 2 <= 1)
        masks = jnp.asarray(np.tile(m[None].astype(np.float32), (b, 1, 1)))
        bboxes = jnp.asarray(np.tile(
            np.array([[200, 150, 128, 128]], np.int32), (b, 1)))
        key = jax.random.PRNGKey(1)

        t_pre = timeit(p_preprocess, (raw, key))
        t_fwd = timeit(p_forward, (variables, raw, key))
        t_dec = timeit(p_decode, (variables, raw, masks, key))
        t_full = timeit(p_full, (variables, raw, masks, bboxes, key))
        stages = {
            "preprocess_ms": t_pre * 1e3,
            "+forward_ms": (t_fwd - t_pre) * 1e3,
            "+lut_decode_ms": (t_dec - t_fwd) * 1e3,
            "+ransac_ms": (t_full - t_dec) * 1e3,
            "total_ms": t_full * 1e3,
            "crops_per_sec": b / t_full,
        }
        report["per_batch"][b] = {k: round(v, 1) for k, v in stages.items()}
        print(f"b{b}: " + "  ".join(
            f"{k}={v:.1f}" for k, v in stages.items()))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
