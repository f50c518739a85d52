"""Sustained on-chip training throughput + MFU (round-3 VERDICT next #7).

The rehearsal log reports ms/step INCLUDING host input and the val
cadence; this measures the sustained optimizer rate the deployment
recipe actually achieves: `trainer.timed_steps` — warm (compile +
pipeline fill) outside the clock, then N steps timed between explicit
scalar-fetch drains (block_until_ready is a no-op on axon, CLAUDE.md),
with the production loop's sync_freq=50 queue bounding inside the
window. Input modes: `device_cache` (training pixels resident in HBM,
indices-only input — the recommended mode on tunnel- or
bandwidth-limited hosts), `prefetch` (streaming host collate with a
device-side double buffer), `stream` (plain synchronous host feed).

MFU = achieved FLOP/s / peak. Forward cost is measured by
`models.zebra_net` cost accounting at 113.6 GFLOP/crop at 256^2
(PERF.md); train step ~= 3x forward (fwd + 2x bwd), over a v5e peak of
~197 TFLOP/s bf16 (394 is the INT8 peak — PERF.md forward anatomy
measures the same 197 bf16 roofline).

Run on the TPU:  python scripts/train_sustained.py \
    [--root artifacts/rehearsal3/lmo/..] [--steps 500] [--batch 32 64] \
    [--input_mode device_cache prefetch]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

GFLOP_PER_CROP_FWD = 113.6       # PERF.md forward anatomy at 256^2
V5E_PEAK_TFLOPS_BF16 = 197.0

_DEFAULT_ROOTS = (
    "/tmp/zebra_rehearsal3",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "rehearsal3"),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=None,
                    help="BOP tree root containing lmo/ (defaults to "
                         "the rehearsal artifacts)")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--warm", type=int, default=20)
    ap.add_argument("--batch", type=int, nargs="+", default=[32, 64])
    ap.add_argument("--input_mode", nargs="+", default=["device_cache"],
                    choices=["device_cache", "prefetch", "stream"])
    ap.add_argument("--cost_analysis", action="store_true",
                    help="also AOT-compile the train step and report "
                         "MFU from XLA's own flop count next to the "
                         "3x-forward model arithmetic (VERDICT r4 "
                         "weak #5: corroborate, don't just estimate)")
    args = ap.parse_args()

    root = args.root or next(
        (r for r in _DEFAULT_ROOTS if os.path.isdir(r)), None)
    if root is None:
        sys.exit("no rehearsal BOP tree found; pass --root or run "
                 "scripts/rehearsal_full_shape.py first")

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/zebrapose_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from zebrapose_tpu.config import ZebraConfig
    from zebrapose_tpu.train.trainer import build_train_setup, timed_steps

    rows = []
    for b in args.batch:
        for mode in args.input_mode:
            cfg = ZebraConfig.from_dict({
                "bop_path": root, "dataset_name": "lmo",
                "training_data_folder": "train_real",
                "training_data_folder_2": "none",
                "val_folder": "test", "test_folder": "test",
                "BoundingBox_CropSize_image": 256,
                "BoundingBox_CropSize_GT": 128,
                "divide_number_each_itration": 2,
                "number_of_itration": 16,
                "batch_size": b, "total_iteration": 10 ** 9,
                "learning_rate": 2e-4, "num_workers": 8,
                "train_obj_visible_theshold": 0.2,
                "use_histgramm_weighted_binary_loss": True,
            })
            res = build_train_setup(
                cfg, "ape", f"/tmp/train_sustained_b{b}_{mode}",
                pretrained_backbone=None, bf16=True,
                cache_images=False,
                device_cache=mode == "device_cache",
                device_prefetch=mode == "prefetch")
            xla_gflops = None
            try:
                if args.cost_analysis:
                    from zebrapose_tpu.train.trainer import \
                        train_step_cost
                    ca = train_step_cost(res)
                    if ca.get("flops"):
                        xla_gflops = float(ca["flops"]) / 1e9
                        print(f"b{b} XLA cost_analysis: "
                              f"{xla_gflops:.1f} GFLOP/step vs model "
                              f"arithmetic 3x{GFLOP_PER_CROP_FWD}x{b} "
                              f"= {3 * GFLOP_PER_CROP_FWD * b:.1f} "
                              f"(ratio {xla_gflops / (3 * GFLOP_PER_CROP_FWD * b):.3f})",
                              flush=True)
                    else:
                        print(f"b{b} XLA cost_analysis: no flops key "
                              f"(got {sorted(ca)[:8]})", flush=True)
                ms = timed_steps(res, n_steps=args.steps,
                                 warm=args.warm)
            finally:
                res.train_iter.close()

            crops_s = b / ms * 1e3
            tflops = 3 * GFLOP_PER_CROP_FWD * crops_s / 1e3
            mfu = tflops / V5E_PEAK_TFLOPS_BF16
            mfu_xla = (xla_gflops / ms / V5E_PEAK_TFLOPS_BF16
                       if xla_gflops else None)
            rows.append((b, mode, ms, crops_s, tflops, mfu, mfu_xla))
            print(f"b{b} {mode}: {ms:.1f} ms/step sustained "
                  f"({crops_s:.0f} crops/s, ~{tflops:.1f} TFLOP/s, "
                  f"train MFU ~{mfu * 100:.0f}%"
                  + (f", XLA-counted MFU {mfu_xla * 100:.0f}%"
                     if mfu_xla else "") + ")", flush=True)

    print("\n| batch | mode | ms/step | crops/s | est TFLOP/s | "
          "train MFU | XLA MFU |")
    print("|---|---|---|---|---|---|---|")
    for b, mode, ms, cs, tf, mfu, mfu_x in rows:
        print(f"| {b} | {mode} | {ms:.1f} | {cs:.0f} | "
              f"{tf:.1f} | {mfu * 100:.0f}% | "
              + (f"{mfu_x * 100:.0f}% |" if mfu_x else "n/a |"))


if __name__ == "__main__":
    main()
