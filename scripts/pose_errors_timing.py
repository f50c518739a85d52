"""Measure pose_errors batching win on the real chip (VERDICT r2 #4).

Old path: one device program + one float() fetch PER SAMPLE (tunnel RTT
2-35 ms each). New path: chunked batch programs, one fetch per chunk.
Prints both wall times for N samples at V vertices, ADD and ADI.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from zebrapose_tpu.eval.evaluate import pose_errors
from zebrapose_tpu.ops.metrics import add_error, adi_error

N, V = 512, 2000
rng = np.random.default_rng(0)


def rot():
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)


verts = rng.uniform(-40, 40, (V, 3)).astype(np.float32)
Rs = np.stack([rot() for _ in range(N)])
ts = rng.uniform(-10, 10, (N, 3)).astype(np.float32)
ok = np.ones((N,), bool)
gts = [{"cam_R_m2c": rot(), "cam_t_m2c": rng.uniform(-10, 10, 3)}
       for _ in range(N)]


class DS:
    def __init__(self):
        self.gts = gts

    def __len__(self):
        return N


ds = DS()


def old_pose_errors(symmetric):
    errs = np.full((N,), 10000.0, np.float64)
    v = jnp.asarray(verts)
    err_fn = adi_error if symmetric else jax.jit(add_error)
    for i in range(N):
        e = float(err_fn(
            jnp.asarray(Rs[i]), jnp.asarray(ts[i]),
            jnp.asarray(np.asarray(gts[i]["cam_R_m2c"], np.float32)),
            jnp.asarray(np.asarray(gts[i]["cam_t_m2c"],
                                   np.float32).reshape(3)), v))
        errs[i] = e
    return errs


for name, symmetric in (("ADD", False), ("ADI", True)):
    a = old_pose_errors(symmetric)          # warm compile
    b = pose_errors(ds, Rs, ts, ok, verts, symmetric)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)
    t0 = time.perf_counter()
    old_pose_errors(symmetric)
    t_old = time.perf_counter() - t0
    t0 = time.perf_counter()
    pose_errors(ds, Rs, ts, ok, verts, symmetric)
    t_new = time.perf_counter() - t0
    print(f"{name}: N={N} V={V} old per-sample {t_old*1e3:.0f} ms, "
          f"batched {t_new*1e3:.0f} ms ({t_old/t_new:.1f}x)")
