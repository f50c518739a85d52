"""Sub-stage device-time breakdown of the batched RANSAC+EPnP solver.

perf_breakdown.py shows the pipeline-level split; this script times
nested prefixes of the PRODUCTION ransac program (the same
_ransac_prepare / hypothesis-solve / _ransac_finish phases
decode_to_pose_batch composes) so the cost of each stage is visible:

  prepare      — block-representative subset + inverse-CDF minimal-set
                 sampling
  +hyp (jnp)   — + vmapped minimal-set EPnP (the pre-kernel path)
  +hyp (pallas)— + the fused SoA kernel (ops/pnp_kernel.py) instead
  full         — + scoring, inlier refine, SE(3) polish
  full nokernel— same with the vmapped jnp hypothesis stage

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
    ap.add_argument("--points", type=int, default=16384)
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
    from zebrapose_tpu.ops.pnp_kernel import minimal_epnp_hypotheses

    cfg = pnp.PnPConfig(n_hypotheses=args.hypotheses, max_points=2048)
    Kn = np.array([[572.4114, 0, 325.2611],
                   [0, 573.57043, 242.04899], [0, 0, 1]], np.float32)
    K = jnp.asarray(Kn)
    rng = np.random.default_rng(0)

    def make_inputs(b):
        P = args.points
        pts3d = rng.uniform(-40, 40, size=(b, P, 3)).astype(np.float32)
        R = np.stack([np.linalg.qr(rng.normal(size=(3, 3)))[0]
                      for _ in range(b)])
        R[np.linalg.det(R) < 0] *= -1
        t = np.concatenate([rng.uniform(-30, 30, (b, 2)),
                            rng.uniform(450, 650, (b, 1))], -1)
        pc = np.einsum("bij,bpj->bpi", R, pts3d) + t[:, None, :]
        uv = np.stack([Kn[0, 0] * pc[..., 0] / pc[..., 2] + Kn[0, 2],
                       Kn[1, 1] * pc[..., 1] / pc[..., 2] + Kn[1, 2]],
                      -1).astype(np.float32)
        out = rng.random((b, P)) < 0.3
        uv = np.where(out[..., None],
                      rng.uniform(0, 640, uv.shape).astype(np.float32), uv)
        w = (rng.random((b, P)) < 0.2).astype(np.float32)
        keys = jax.random.split(jax.random.PRNGKey(1), b)
        return (jnp.asarray(pts3d), jnp.asarray(uv), jnp.asarray(w), keys)

    def prepare(p3, p2, w, keys):
        return jax.vmap(lambda a, b2, c, k: pnp._ransac_prepare(
            a, b2, c, k, cfg))(p3, p2, w, keys)

    @jax.jit
    def p_prepare(p3, p2, w, keys):
        parts = prepare(p3, p2, w, keys)
        return sum(jnp.sum(x) for x in parts)

    def hyp(samp3d, samp2d, b, use_kernel):
        H, Ssz = cfg.n_hypotheses, cfg.sample_size
        Ks = jnp.broadcast_to(K, (b * H, 3, 3))
        return minimal_epnp_hypotheses(
            samp3d.reshape(b * H, Ssz, 3), samp2d.reshape(b * H, Ssz, 2),
            Ks, cfg.gn_iters, use_kernel=use_kernel)

    def make_hyp(use_kernel):
        @jax.jit
        def p_hyp(p3, p2, w, keys):
            _, _, _, samp3d, samp2d, _ = prepare(p3, p2, w, keys)
            Rs, ts = hyp(samp3d, samp2d, p3.shape[0], use_kernel)
            return jnp.sum(Rs) + jnp.sum(ts)
        return p_hyp

    def make_full(use_kernel):
        @jax.jit
        def p_full(p3, p2, w, keys):
            (sub3d, sub2d, sub_w, samp3d, samp2d,
             n_fg) = prepare(p3, p2, w, keys)
            b = p3.shape[0]
            Rs, ts = hyp(samp3d, samp2d, b, use_kernel)
            H = cfg.n_hypotheses
            Rs = Rs.reshape(b, H, 3, 3)
            ts = ts.reshape(b, H, 3)
            R, t, ok, n = jax.vmap(
                lambda a, b2, c, d, e, g: pnp._ransac_finish(
                    a, b2, c, d, e, K, g, cfg))(sub3d, sub2d, sub_w,
                                                Rs, ts, n_fg)
            return jnp.sum(R) + jnp.sum(n)
        return p_full

    on_tpu = jax.default_backend() == "tpu"
    progs = [("prepare", p_prepare),
             ("+hyp_jnp", make_hyp(False)),
             ("full_jnp", make_full(False))]
    if on_tpu:
        progs += [("+hyp_pallas", make_hyp(True)),
                  ("full_pallas", make_full(True))]

    report = {}
    for b in args.batches:
        inputs = make_inputs(b)
        times = {}
        for name, fn in progs:
            dt = timeit(fn, inputs)
            times[name] = round(dt * 1e3, 2)
        report[b] = times
        print(f"b{b}: " + "  ".join(f"{k}={v}" for k, v in times.items()),
              flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
