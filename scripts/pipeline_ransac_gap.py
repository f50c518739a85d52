"""Attribute the in-pipeline decode+RANSAC cost stage by stage.

perf_breakdown.py reports the RANSAC increment (t_full - t_decode) at
~27 ms/b128 while ransac_breakdown.py measures the same production
solver at 11.5 ms/b128 standalone. The standalone starts from dense
correspondence arrays, so the gap must live in what the pipeline does
on top: the full _correspondences build (a SECOND 2^16-entry gather
for lut_valid that perf_breakdown's decode proxy does not time, the
pixel->original mapping), vmapped prepare, or scheduling differences.

This script times nested prefixes of the EXACT full-pipeline program
(preprocess -> forward -> binarize -> correspondences -> prepare ->
pallas hypotheses -> finish), all sharing one compiled shell per
prefix, so each increment is same-day, same-conditions attributable.

Run on the real TPU:  python scripts/pipeline_ransac_gap.py
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
    ap.add_argument("--batch", type=int, default=128)
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
    from zebrapose_tpu.ops import pnp
    from zebrapose_tpu.ops.pnp_kernel import minimal_epnp_hypotheses

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
    Kn = np.array([[572.4114, 0, 325.2611],
                   [0, 573.57043, 242.04899], [0, 0, 1]], np.float32)
    cfg = pnp.PnPConfig(n_hypotheses=args.hypotheses, max_points=2048)

    b = args.batch
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
    Ks = jnp.asarray(np.tile(Kn[None], (b, 1, 1)))
    key = jax.random.PRNGKey(1)
    keys = jax.random.split(key, b)

    def head(raw, key):
        batch = preprocess_batch(raw, key, crop_img=256, crop_gt=128,
                                 is_train=False, include_gt=False)
        out = model.apply(variables, batch["image"], train=False)
        return code_from_logits(out["code"].astype(jnp.float32))

    @jax.jit
    def p_fwd(raw, key):
        return jnp.sum(head(raw, key))

    @jax.jit
    def p_points_gather(raw, key):
        """forward + class ids + lut_points gather only (what
        perf_breakdown's decode proxy measures)."""
        codes = head(raw, key)
        from zebrapose_tpu.codec.surface_code import code_to_class_id
        ids = jax.vmap(lambda c: code_to_class_id(c, base=2))(codes)
        pts3d = lut_points[ids.reshape(b, -1)]
        return jnp.sum(pts3d * masks.reshape(b, -1, 1))

    @jax.jit
    def p_corr(raw, key):
        """forward + the FULL correspondence build (lut_points AND
        lut_valid gathers + pixel mapping)."""
        codes = head(raw, key)
        p3, p2, fg = jax.vmap(lambda m_, c_, bb: pnp._correspondences(
            m_, c_, lut_points, lut_valid, bb, 128, 2))(
            masks, codes, bboxes)
        return jnp.sum(p3 * fg[..., None]) + jnp.sum(p2)

    def corr_prep(raw, key):
        codes = head(raw, key)

        def one(m_, c_, bb, k):
            p3, p2, fg = pnp._correspondences(
                m_, c_, lut_points, lut_valid, bb, 128, 2)
            return pnp._ransac_prepare(p3, p2, fg,
                                       jax.random.fold_in(k, 2), cfg)
        return jax.vmap(one)(masks, codes, bboxes, keys)

    @jax.jit
    def p_prepare(raw, key):
        parts = corr_prep(raw, key)
        return sum(jnp.sum(x) for x in parts)

    def with_hyp(raw, key):
        sub3d, sub2d, sub_w, samp3d, samp2d, n_fg = corr_prep(raw, key)
        H, S = cfg.n_hypotheses, cfg.sample_size
        Rs, ts = minimal_epnp_hypotheses(
            samp3d.reshape(b * H, S, 3), samp2d.reshape(b * H, S, 2),
            jnp.repeat(Ks, H, axis=0), cfg.gn_iters)
        return sub3d, sub2d, sub_w, Rs.reshape(b, H, 3, 3), \
            ts.reshape(b, H, 3), n_fg

    @jax.jit
    def p_hyp(raw, key):
        _, _, _, Rs, ts, _ = with_hyp(raw, key)
        return jnp.sum(Rs) + jnp.sum(ts)

    @jax.jit
    def p_full(raw, key):
        sub3d, sub2d, sub_w, Rs, ts, n_fg = with_hyp(raw, key)
        R, t, ok, n = jax.vmap(lambda a, b2, c, d, e, f, g:
                               pnp._ransac_finish(a, b2, c, d, e, f,
                                                  g, cfg))(
            sub3d, sub2d, sub_w, Rs, ts, Ks, n_fg)
        return jnp.sum(t) + jnp.sum(ok)

    progs = [("fwd", p_fwd), ("+points_gather", p_points_gather),
             ("+full_corr", p_corr), ("+prepare", p_prepare),
             ("+hyp_pallas", p_hyp), ("+finish", p_full)]
    times, prev = {}, 0.0
    for name, fn in progs:
        dt = timeit(fn, (raw, key)) * 1e3
        times[name] = {"total_ms": round(dt, 2),
                       "incr_ms": round(dt - prev, 2)}
        prev = dt
        print(f"{name}: total {dt:.2f} ms  (+{times[name]['incr_ms']:.2f})",
              flush=True)
    print(json.dumps({"batch": b, "stages": times}))


if __name__ == "__main__":
    main()
