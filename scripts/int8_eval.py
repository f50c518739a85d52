"""int8 serving-mode gate: accuracy + throughput vs bf16/f32 on the
trained rehearsal checkpoint.

Runs the SAME checkpoint through the production eval program twice —
quant=False (bf16 convs) and quant=True (int8 MXU path, per-channel
weight / dynamic per-tensor activation quantization) — over the
rehearsal's 120-frame real rendered val split, and reports ADD recall +
full-program throughput for both. This is the evidence that the --int8
CLI mode trades (or doesn't trade) accuracy for speed.

Needs the rehearsal artifacts (scripts/rehearsal_full_shape.py) at
--root.  Run on the real TPU:  python scripts/int8_eval.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    default_root = next(
        (r for r in ("/tmp/zebra_rehearsal3",
                     os.path.join(os.path.dirname(os.path.dirname(
                         os.path.abspath(__file__))),
                         "artifacts", "rehearsal3"))
         if os.path.isdir(r)), "/tmp/zebra_rehearsal3")
    ap.add_argument("--root", default=default_root)
    ap.add_argument("--run", default=None,
                    help="run dir holding checkpoints/best (default "
                         "<root>/run). Point at a --qat fine-tune's out "
                         "dir to gate a quantization-aware checkpoint.")
    ap.add_argument("--ckpt", default="best", choices=("best", "last"),
                    help="which checkpoint of --run to gate: the best-"
                         "recall one or the latest rolling step (a QAT "
                         "fine-tune resumed from a copied run keeps the "
                         "parent's best/ unless it beats it — gate its "
                         "LAST step)")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/zebrapose_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    import orbax.checkpoint as ocp

    from zebrapose_tpu.codec.lut import load_correspondence_lut
    from zebrapose_tpu.config import ZebraConfig
    from zebrapose_tpu.data import bop_io
    from zebrapose_tpu.data.pipeline import CropDatasetHost
    from zebrapose_tpu.eval.evaluate import (
        make_eval_step, pose_errors, run_inference, summarize)
    from zebrapose_tpu.models.zebra_net import ZebraPoseNet
    from zebrapose_tpu.ops.pnp import PnPConfig

    root = args.root
    cfg = ZebraConfig.from_dict({
        "bop_path": root, "dataset_name": "lmo", "test_folder": "test",
        "BoundingBox_CropSize_image": 256,
        "BoundingBox_CropSize_GT": 128,
        "divide_number_each_itration": 2, "number_of_itration": 16})
    val = bop_io.get_dataset(root, "lmo", train=False, data_folder="test")
    ds = CropDatasetHost(
        val.dataset_dir, "test", *val.for_obj(1), is_train=False,
        crop_size_img=256, crop_size_gt=128,
        padding_ratio=cfg.padding_ratio, resize_method=cfg.resize_method)
    lut = load_correspondence_lut(os.path.join(
        root, "lmo", "models_GT_color", "Class_CorresPoint000001.txt"))
    mesh = bop_io.load_ply(val.model_plys[1])
    vertices = mesh["pts"].astype(np.float32)
    diameter = float(val.model_info["1"]["diameter"])

    ckpt_root = os.path.join(args.run or os.path.join(root, "run"),
                             "checkpoints")
    if args.ckpt == "best":
        best_dir = os.path.join(ckpt_root, "best")
        step_dir = [d for d in os.listdir(best_dir)
                    if d.startswith("step_")][0]
        ckpt_path = os.path.join(best_dir, step_dir)
    else:
        steps_dir = os.path.join(ckpt_root, "steps")
        latest = max(int(d) for d in os.listdir(steps_dir) if d.isdigit())
        ckpt_path = os.path.join(steps_dir, str(latest), "default")
        if not os.path.isdir(ckpt_path):   # orbax layout w/o item name
            ckpt_path = os.path.join(steps_dir, str(latest))
        print(f"gating LAST checkpoint: step {latest}", flush=True)
    payload = ocp.StandardCheckpointer().restore(ckpt_path)
    variables = jax.tree.map(jnp.asarray, {
        "params": payload["params"],
        "batch_stats": payload["batch_stats"]})

    pnp_cfg = PnPConfig(n_hypotheses=128, max_points=2048)
    report = {}
    for mode in ("bf16", "int8"):
        model = ZebraPoseNet(
            binary_code_length=16, base=2, variant="v2",
            resnet_layers=cfg.resnet_layer,
            concat=cfg.concat_encoder_decoder,
            output_kernel_size=cfg.output_kernel_size,
            dtype=jnp.bfloat16, quant=(mode == "int8"))
        eval_step = make_eval_step(
            lambda b, v, m=model: m.apply(v, b["image"], train=False),
            lut, crop_img=256, crop_gt=128, base=2, n_bits=16,
            resize_method=cfg.resize_method,
            loss_type=cfg.BinaryCode_Loss_Type, pnp_cfg=pnp_cfg,
            preprocess_gt=False)

        # accuracy over the full val split
        Rs, ts, ok = run_inference(ds, eval_step, args.batch_size,
                                   variables=variables)
        errs = pose_errors(ds, Rs, ts, ok, vertices, symmetric=False)
        metrics = summarize(errs, diameter)

        # throughput: one resident batch, best of 3 rounds
        n = len(ds)
        raw = ds.collate([i % n for i in range(args.batch_size)])
        feed = {k: jnp.asarray(raw[k]) for k in
                ("rgb", "label", "mask", "entire_mask", "roi_param",
                 "valid")}
        fb = jnp.asarray(raw["final_bbox"].astype(np.int32))
        K = jnp.asarray(raw["K"])
        key = jax.random.PRNGKey(7)
        out = eval_step(feed, fb, K, key, variables)
        float(jnp.sum(out[1]))
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = eval_step(feed, fb, K, key, variables)
            float(jnp.sum(out[1]))
            dt = min(dt, (time.perf_counter() - t0) / args.iters)
        report[mode] = {
            "recall_0.1d": round(metrics["ADD_recall_0.1d"], 4),
            "recall_0.05d": round(metrics["ADD_recall_0.05d"], 4),
            "mean_err": round(metrics["ADD_mean_err"], 3),
            "auc_posecnn": round(metrics["ADD_auc_posecnn"], 4),
            "solved_frac": round(float(np.mean(ok)), 4),
            "crops_per_sec": round(args.batch_size / dt, 1),
            "ms_per_batch": round(dt * 1e3, 2),
        }
        print(f"{mode}: {json.dumps(report[mode])}", flush=True)

    r = report["int8"]["crops_per_sec"] / report["bf16"]["crops_per_sec"]
    report["speedup"] = round(r, 3)
    report["recall_delta"] = round(
        report["int8"]["recall_0.1d"] - report["bf16"]["recall_0.1d"], 4)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
