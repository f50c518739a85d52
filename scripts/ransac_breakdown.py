"""Sub-stage device-time breakdown of the batched RANSAC+EPnP solver.

perf_breakdown.py showed +ransac is ~56 ms/b128 (vs 80 ms for the whole
ResNet34+ASPP forward at 92% of MXU peak) — this script times nested
prefixes of ransac_pnp itself to find which stage to attack:

  sample   — categorical foreground draws [H, S]
  hyp      — + vmapped minimal-set EPnP (H per instance)
  score    — + reprojection of all P points against every hypothesis
  refine   — + inlier re-solves (refine_iters full-P EPnPs)
  full     — + SE(3) Gauss-Newton polish (= production program)

Run on the real TPU:  python scripts/ransac_breakdown.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


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
    ap.add_argument("--points", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/zebrapose_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from zebrapose_tpu.ops import pnp

    cfg = pnp.PnPConfig(n_hypotheses=args.hypotheses,
                        max_points=args.points)
    K = jnp.asarray(np.array([[572.4114, 0, 325.2611],
                              [0, 573.57043, 242.04899],
                              [0, 0, 1]], np.float32))
    rng = np.random.default_rng(0)

    def make_inputs(b):
        # realistic geometry: true poses, 70% inliers
        pts3d = rng.uniform(-40, 40, size=(b, args.points, 3)) \
            .astype(np.float32)
        R = np.stack([np.linalg.qr(rng.normal(size=(3, 3)))[0]
                      for _ in range(b)])
        R[np.linalg.det(R) < 0] *= -1
        t = np.concatenate([rng.uniform(-30, 30, (b, 2)),
                            rng.uniform(450, 650, (b, 1))], -1)
        pc = np.einsum("bij,bpj->bpi", R, pts3d) + t[:, None, :]
        uv = np.stack([572.4114 * pc[..., 0] / pc[..., 2] + 325.2611,
                       573.57043 * pc[..., 1] / pc[..., 2] + 242.04899],
                      -1).astype(np.float32)
        out = rng.random((b, args.points)) < 0.3
        uv = np.where(out[..., None],
                      rng.uniform(0, 640, uv.shape).astype(np.float32), uv)
        w = (rng.random((b, args.points)) < 0.8).astype(np.float32)
        keys = jax.random.split(jax.random.PRNGKey(1), b)
        return (jnp.asarray(pts3d), jnp.asarray(uv), jnp.asarray(w), keys)

    def sample_stage(pts3d, pts2d, w, key):
        P = pts3d.shape[0]
        logits = jnp.where(w > 0, 0.0, -jnp.inf)
        idx = jax.random.categorical(
            key, logits[None, :], shape=(cfg.n_hypotheses, cfg.sample_size))
        idx = jnp.clip(idx, 0, P - 1)
        return idx, pts3d[idx], pts2d[idx]

    def hyp_stage(pts3d, pts2d, w, key):
        _, s3, s2 = sample_stage(pts3d, pts2d, w, key)
        ones = jnp.ones((cfg.n_hypotheses, cfg.sample_size), jnp.float32)
        Rs, ts = jax.vmap(lambda a, b2, ww: pnp.epnp(
            a, b2, ww, K, cfg.gn_iters, cfg.fast_linalg))(s3, s2, ones)
        return Rs, ts

    def score_stage(pts3d, pts2d, w, key):
        Rs, ts = hyp_stage(pts3d, pts2d, w, key)
        errs = jax.vmap(lambda R, t: jnp.linalg.norm(
            pnp.project_points(pts3d, R, t, K) - pts2d, axis=-1))(Rs, ts)
        errs = jnp.where(jnp.isnan(errs), jnp.inf, errs)
        inl = (errs < cfg.reproj_threshold) & (w > 0)[None, :]
        counts = jnp.sum(inl, axis=-1)
        best = jnp.argmax(counts)
        return Rs[best], ts[best], inl[best]

    progs = {}

    @jax.jit
    def p_sample(p3, p2, w, keys):
        idx, s3, s2 = jax.vmap(sample_stage)(p3, p2, w, keys)
        return jnp.sum(s3) + jnp.sum(s2)

    @jax.jit
    def p_hyp(p3, p2, w, keys):
        Rs, ts = jax.vmap(hyp_stage)(p3, p2, w, keys)
        return jnp.sum(Rs) + jnp.sum(ts)

    @jax.jit
    def p_score(p3, p2, w, keys):
        R, t, inl = jax.vmap(score_stage)(p3, p2, w, keys)
        return jnp.sum(R) + jnp.sum(inl)

    @jax.jit
    def p_full(p3, p2, w, keys):
        R, t, ok, n = jax.vmap(
            lambda a, b2, ww, k: pnp.ransac_pnp(a, b2, ww, K, k, cfg))(
            p3, p2, w, keys)
        return jnp.sum(R) + jnp.sum(n)

    cfg_nopolish = pnp.PnPConfig(
        n_hypotheses=args.hypotheses, max_points=args.points,
        polish_iters=0)

    @jax.jit
    def p_refine(p3, p2, w, keys):
        R, t, ok, n = jax.vmap(
            lambda a, b2, ww, k: pnp.ransac_pnp(a, b2, ww, K, k,
                                                cfg_nopolish))(
            p3, p2, w, keys)
        return jnp.sum(R) + jnp.sum(n)

    progs = [("sample", p_sample), ("+hyp_epnp", p_hyp),
             ("+score", p_score), ("+refine", p_refine),
             ("full(+polish)", p_full)]

    report = {}
    for b in args.batches:
        inputs = make_inputs(b)
        times = {}
        prev = 0.0
        for name, fn in progs:
            dt = timeit(fn, inputs)
            times[name] = {"total_ms": round(dt * 1e3, 2),
                           "delta_ms": round((dt - prev) * 1e3, 2)}
            prev = dt
        report[b] = times
        print(f"b{b}: " + "  ".join(
            f"{k}={v['total_ms']}({v['delta_ms']})"
            for k, v in times.items()), flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
