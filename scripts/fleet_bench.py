"""Fleet-serving throughput on the real chip: K=2 objects, one program.

Compares, at equal total work (K objects x batch B crops each):
  (a) sequential single-object eval programs — K dispatches/round, the
      reference's deployment shape (one process per object);
  (b) the fleet program (eval/fleet_serve.py) — ONE dispatch/round.

Uses the same synthetic full-pipeline workload as bench.py (480x640 raw
-> preprocess -> bf16 v2 forward -> decode -> 128-hyp RANSAC), random
weights, per-object LUTs. The interesting regime is small-B serving,
where the ~30 ms tunnel dispatch RTT is a visible fraction of step
time; at saturated batch the chip is compute-bound either way.

Run: python scripts/fleet_bench.py  (real TPU; ~minutes of compiles)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import IMG_H, IMG_W, _compact_mask

from zebrapose_tpu.data.pipeline import preprocess_batch
from zebrapose_tpu.eval.fleet_serve import make_fleet_eval_step
from zebrapose_tpu.models.zebra_net import ZebraPoseNet
from zebrapose_tpu.ops.binarize import code_from_logits
from zebrapose_tpu.ops.pnp import PnPConfig, decode_to_pose_batch

N_BITS = 16
K_MAT = np.array([[572.4114, 0, 325.2611],
                  [0, 573.57043, 242.04899],
                  [0, 0, 1]], np.float32)


def main(k=2, batches=(8, 32, 128), iters=10):
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/zebrapose_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    rng = np.random.default_rng(0)
    model = ZebraPoseNet(binary_code_length=N_BITS, variant="v2",
                         concat=True, dtype=jnp.bfloat16)
    variables = [model.init(jax.random.PRNGKey(s),
                            jnp.zeros((1, 256, 256, 3), jnp.float32),
                            train=False) for s in range(k)]
    luts_p = rng.uniform(-40, 40, (k, 2 ** N_BITS, 3)).astype(np.float32)
    luts_v = np.ones((k, 2 ** N_BITS), bool)
    pnp_cfg = PnPConfig(n_hypotheses=128, max_points=2048)

    # (a) single-object program (bench.py's full_pipeline shape)
    lut0_p, lut0_v = jnp.asarray(luts_p[0]), jnp.asarray(luts_v[0])

    @jax.jit
    def single(variables, raw, masks, bboxes, key):
        batch = preprocess_batch(raw, key, crop_img=256, crop_gt=128,
                                 is_train=False, include_gt=False)
        out = model.apply(variables, batch["image"], train=False)
        codes = code_from_logits(out["code"].astype(jnp.float32))
        keys = jax.random.split(key, masks.shape[0])
        Ks = jnp.broadcast_to(jnp.asarray(K_MAT), (masks.shape[0], 3, 3))
        Rs, ts, ok, _ = decode_to_pose_batch(
            masks, codes, lut0_p, lut0_v, bboxes, Ks, keys,
            bbox_size=128, cfg=pnp_cfg)
        return Rs, ts, ok, jnp.sum(ts) + jnp.sum(ok)

    # (b) fleet program; forward_fn ignores the (random) mask head and
    # uses the same compact synthetic masks via closure per batch size
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *variables)

    results = {}
    for b in batches:
        masks_np = _compact_mask(b)
        masks1 = jnp.asarray(masks_np)
        bboxes1 = jnp.asarray(np.tile(
            np.array([[200, 150, 128, 128]], np.int32), (b, 1)))
        raw1 = {
            "rgb": jnp.asarray(rng.integers(
                0, 255, size=(b, IMG_H, IMG_W, 3)).astype(np.uint8)),
            "roi_param": jnp.asarray(np.tile(np.array(
                [[180, 120, 436, 376, 256]], np.int32), (b, 1))),
            "valid": jnp.ones((b,), jnp.float32),
        }
        key = jax.random.PRNGKey(1)

        # fleet step: mask head replaced by the synthetic compact masks
        # (matches the single program's workload composition)
        masks_logits = jnp.asarray(masks_np * 20.0 - 10.0)[..., None]

        def forward(batch, v, _m=masks_logits):
            out = model.apply(v, batch["image"], train=False)
            return {"mask": _m, "code": out["code"]}

        fleet_step = make_fleet_eval_step(
            forward, luts_p, luts_v, crop_img=256, crop_gt=128, base=2,
            n_bits=N_BITS, resize_method="crop_square_resize",
            loss_type="BCE", pnp_cfg=pnp_cfg)
        rawk = {kk: jnp.concatenate([v] * k) for kk, v in raw1.items()}
        bbk = jnp.concatenate([bboxes1] * k)
        Ksk = jnp.asarray(np.tile(K_MAT, (k * b, 1, 1)))

        # --- time (a): K sequential dispatches per round --------------
        float(single(variables[0], raw1, masks1, bboxes1, key)[-1])
        dt_seq = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = None
                for i in range(k):
                    out = single(variables[i], raw1, masks1, bboxes1,
                                 key)
            float(out[-1])
            dt_seq = min(dt_seq, (time.perf_counter() - t0) / iters)

        # --- time (b): one fleet dispatch per round --------------------
        out = fleet_step(rawk, bbk, Ksk, key, stacked, n_models=k)
        float(jnp.sum(out[1]) + jnp.sum(out[2]))
        dt_fleet = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fleet_step(rawk, bbk, Ksk, key, stacked,
                                 n_models=k)
            float(jnp.sum(out[1]) + jnp.sum(out[2]))
            dt_fleet = min(dt_fleet, (time.perf_counter() - t0) / iters)

        results[b] = {
            "seq_crops_per_sec": round(k * b / dt_seq, 1),
            "fleet_crops_per_sec": round(k * b / dt_fleet, 1),
            "fleet_speedup": round(dt_seq / dt_fleet, 3),
        }
        print(json.dumps({"batch_per_obj": b, **results[b]}), flush=True)
    return results


if __name__ == "__main__":
    main()
