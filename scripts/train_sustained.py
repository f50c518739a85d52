"""Sustained on-chip training throughput + MFU (round-3 VERDICT next #7).

The rehearsal log reports ms/step INCLUDING host input and the val
cadence; this measures the sustained optimizer rate the deployment
recipe actually achieves: 500 steps, no validation, `device_cache`
(training pixels resident in HBM, indices-only input — the recommended
mode on tunnel- or bandwidth-limited hosts) or `prefetch` (streaming
host collate with a device-side double buffer).

MFU = achieved FLOP/s / peak. Forward cost is measured by
`models.zebra_net` cost accounting at 113.6 GFLOP/crop at 256^2
(PERF.md); train step ~= 3x forward (fwd + 2x bwd), over a v5e peak of
394 TFLOP/s bf16.

Run on the TPU:  python scripts/train_sustained.py \
    [--root /tmp/zebra_rehearsal3] [--steps 500] [--batch 32 64]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

GFLOP_PER_CROP_FWD = 113.6       # PERF.md forward anatomy at 256^2
V5E_PEAK_TFLOPS_BF16 = 394.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/zebra_rehearsal3")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch", type=int, nargs="+", default=[32, 64])
    ap.add_argument("--input_mode", default="device_cache",
                    choices=["device_cache", "prefetch", "stream"])
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/zebrapose_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from zebrapose_tpu.config import ZebraConfig
    from zebrapose_tpu.train.trainer import build_train_setup, fit

    rows = []
    for b in args.batch:
        cfg = ZebraConfig.from_dict({
            "bop_path": args.root, "dataset_name": "lmo",
            "training_data_folder": "train_real",
            "training_data_folder_2": "none",
            "val_folder": "test", "test_folder": "test",
            "BoundingBox_CropSize_image": 256,
            "BoundingBox_CropSize_GT": 128,
            "divide_number_each_itration": 2, "number_of_itration": 16,
            "batch_size": b, "total_iteration": 10 ** 9,
            "learning_rate": 2e-4, "num_workers": 8,
            "train_obj_visible_theshold": 0.2,
            "use_histgramm_weighted_binary_loss": True,
        })
        out = f"/tmp/train_sustained_b{b}"
        res = build_train_setup(
            cfg, "ape", out, pretrained_backbone=None, bf16=True,
            cache_images=False,
            device_cache=args.input_mode == "device_cache",
            device_prefetch=args.input_mode == "prefetch")

        # warm: compile + first steps out of the measurement
        fit(res, log_freq=10 ** 9, validate=False, max_steps=20)
        t0 = time.time()
        fit(res, log_freq=10 ** 9, validate=False, max_steps=args.steps)
        dt = time.time() - t0

        ms = dt / args.steps * 1e3
        crops_s = b * args.steps / dt
        tflops = 3 * GFLOP_PER_CROP_FWD * crops_s / 1e3
        mfu = tflops / V5E_PEAK_TFLOPS_BF16
        rows.append((b, ms, crops_s, tflops, mfu))
        print(f"b{b} {args.input_mode}: {ms:.1f} ms/step sustained "
              f"({crops_s:.0f} crops/s, ~{tflops:.1f} TFLOP/s, "
              f"train MFU ~{mfu * 100:.0f}%)", flush=True)

    print(f"\n| batch | mode | ms/step | crops/s | est TFLOP/s | "
          f"train MFU |")
    print("|---|---|---|---|---|---|")
    for b, ms, cs, tf, mfu in rows:
        print(f"| {b} | {args.input_mode} | {ms:.1f} | {cs:.0f} | "
              f"{tf:.1f} | {mfu * 100:.0f}% |")


if __name__ == "__main__":
    main()
