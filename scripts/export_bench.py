"""Exported-blob parity + throughput vs the live eval program.

The serving artifact (eval/export_serving.py) is the SAME traced graph
as the live jitted program, so on one chip it must produce bit-equal
poses at (ideally) equal throughput — any gap is jax.export calling
convention overhead. This script measures both and asserts pose
equality; run it on the real chip after changes to the export path or
before shipping a blob.

  python scripts/export_bench.py          # bench shapes (b64, 480x640)
  python scripts/export_bench.py --tiny   # CPU smoke (b2, 96x128)

Prints one JSON line: {"live_crops_s", "blob_crops_s", "bit_equal",
"overhead_pct"}.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke: tiny shapes, forces the cpu "
                         "platform")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from zebrapose_tpu.codec.lut import CorrespondenceLUT
    from zebrapose_tpu.eval.export_serving import (build_serving_fn,
                                                   export_serving,
                                                   load_serving)
    from zebrapose_tpu.models.zebra_net import ZebraPoseNet
    from zebrapose_tpu.ops.pnp import PnPConfig

    if args.tiny:
        batch, hw, crop, gt = args.batch or 2, (96, 128), 128, 64
        pnp = PnPConfig(n_hypotheses=16, max_points=512)
    else:
        batch, hw, crop, gt = args.batch or 64, (480, 640), 256, 128
        pnp = PnPConfig(n_hypotheses=128, max_points=2048)

    rng = np.random.default_rng(0)
    model = ZebraPoseNet(binary_code_length=16, variant="v2",
                         concat=True, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, crop, crop, 3), jnp.float32),
                           train=False)
    lut = CorrespondenceLUT(
        rng.uniform(-40, 40, (2 ** 16, 3)).astype(np.float32),
        np.ones((2 ** 16,), bool), base=2, n_digits=16)

    serve = build_serving_fn(
        model, variables, lut, crop_img=crop, crop_gt=gt, base=2,
        n_bits=16, resize_method="crop_square_resize", loss_type="BCE",
        pnp_cfg=pnp)
    live = jax.jit(serve)

    blob = export_serving(serve, batch=batch, image_hw=hw)
    prog = load_serving(blob)

    h, w = hw
    feed = (
        jnp.asarray(rng.integers(0, 255, (batch, h, w, 3), np.uint8)
                    .astype(np.uint8)),
        jnp.asarray(np.tile(np.array(
            [[w // 4, h // 4, 3 * w // 4, 3 * h // 4, crop]], np.int32),
            (batch, 1))),
        jnp.ones((batch,), jnp.float32),
        jnp.asarray(np.tile(np.array([[w // 4, h // 4, gt, gt]],
                                     np.int32), (batch, 1))),
        jnp.asarray(np.tile(np.array(
            [[[572.4, 0, w / 2], [0, 573.6, h / 2], [0, 0, 1]]],
            np.float32), (batch, 1, 1))),
        jax.random.PRNGKey(7),
    )

    def timed(fn):
        out = fn(*feed)
        float(jnp.sum(out[1]))          # warm + drain (axon no-op sync)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*feed)
        float(jnp.sum(out[1]))
        return (time.perf_counter() - t0) / args.iters, out

    dt_live, out_live = timed(live)
    dt_blob, out_blob = timed(prog)

    bit_equal = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(out_live, out_blob))
    live_cps = batch / dt_live
    blob_cps = batch / dt_blob
    print(json.dumps({
        "live_crops_s": round(live_cps, 1),
        "blob_crops_s": round(blob_cps, 1),
        "bit_equal": bit_equal,
        "overhead_pct": round(100 * (live_cps / blob_cps - 1), 2),
        "batch": batch, "image_hw": list(hw),
        "blob_bytes": len(blob)}))
    return 0 if bit_equal else 1


if __name__ == "__main__":
    raise SystemExit(main())
