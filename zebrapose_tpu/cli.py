"""Command-line interface mirroring the reference's script entrypoints.

  python -m zebrapose_tpu train --cfg cfg.txt --obj_name ape
  python -m zebrapose_tpu test  --cfg cfg.txt --obj_name ape \
      --ckpt_file <ckpt dir or .pth> [--ignore_bit N] [--debug]
  python -m zebrapose_tpu vivo  --cfg cfg.txt --obj_name obj01 \
      --ckpt_file ...
  python -m zebrapose_tpu generate-mesh-code --mesh m.obj -d 2 -n 16 ...
  python -m zebrapose_tpu generate-labels --cfg cfg.txt --obj_name ape

The config file is the reference's flat `key = value` format
(config/config_BOP/...), reused verbatim.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _add_common(p):
    p.add_argument("--cfg", required=True, help="reference-format config")
    p.add_argument("--obj_name", required=True)


def _add_pnp_flags(p):
    p.add_argument("--escalate_h", type=int, default=0,
                   help="adaptive RANSAC second stage: redraw with THIS "
                        "many hypotheses when a frame's inlier fraction "
                        "is weak (cv2's adaptive iteration count, fixed-"
                        "shape; 0 = off, 256 recommended for high-"
                        "outlier regimes — PERF.md ProgX-gap study)")
    p.add_argument("--escalate_frac", type=float, default=0.4,
                   help="inlier fraction below which the second RANSAC "
                        "stage triggers (with --escalate_h > 0)")


def _pnp_cfg_from_args(args, **kw):
    from zebrapose_tpu.ops.pnp import PnPConfig
    if getattr(args, "escalate_h", 0):
        kw["escalate_hypotheses"] = args.escalate_h
        kw["escalate_inlier_frac"] = args.escalate_frac
    return PnPConfig(**kw)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="zebrapose_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="train one object (train_v2)")
    _add_common(p_train)
    p_train.add_argument("--output_dir", default="runs")
    p_train.add_argument("--variant", default="v2",
                         choices=["v1", "v2", "v3"])
    p_train.add_argument("--pretrained_backbone", default="auto",
                         help="torchvision resnet34 .pth; 'auto' searches "
                              "known locations and fails loudly if absent "
                              "(the reference always trains from ImageNet "
                              "weights, model/resnet.py:186-189)")
    p_train.add_argument("--from_scratch", action="store_true",
                         help="explicitly train from random init")
    p_train.add_argument("--gamma", type=float, default=1.0,
                         help="StepLR decay per 10 validation cadences "
                              "(1.0 = train_v2/v5, 0.7 = train_v3)")
    p_train.add_argument("--val_mode", default="pose",
                         choices=["pose", "loss"],
                         help="pose = decode->PnP->recall w/ best ckpt "
                              "(train_v2); loss = loss-only val logging "
                              "(train_v6)")
    p_train.add_argument("--max_steps", type=int, default=None)
    p_train.add_argument("--log_freq", type=int, default=1000)
    p_train.add_argument("--profile", default=None,
                         help="write a JAX profiler trace to this dir")
    p_train.add_argument("--bf16", action="store_true",
                         help="bf16 compute in the model (params stay "
                              "f32; losses computed in f32)")
    p_train.add_argument("--qat", action="store_true",
                         help="quantization-aware training: convs run "
                              "the differentiable int8 simulation (STE) "
                              "so the checkpoint can be served with "
                              "--int8 at full accuracy; typically a "
                              "short fine-tune from an existing "
                              "checkpoint (load_checkpoint in the cfg)")
    p_train.add_argument("--multihost", action="store_true",
                         help="jax.distributed.initialize() for DCN "
                              "multi-host training")
    p_train.add_argument("--input_mode", default="stream",
                         choices=["stream", "prefetch", "device_cache"],
                         help="stream = host MixedBatchIterator (default); "
                              "prefetch = shard each raw batch one step "
                              "ahead so H2D overlaps compute; device_cache "
                              "= upload the whole split to HBM once and "
                              "feed indices only (~2.4 MB/sample — for "
                              "per-object real splits, not 50k pbr trees)")
    p_train.add_argument("--cache_images", action="store_true",
                         help="hold decoded full-res frames in host RAM "
                              "(skips per-draw imread/PNG decode)")
    p_train.add_argument("--accum_steps", type=int, default=1,
                         help="gradient accumulation: split each "
                              "optimizer step's EFFECTIVE batch "
                              "(cfg.batch_size) into this many "
                              "sequential micro-batches — train at "
                              "batch sizes HBM can't hold at once "
                              "(the reference's only lever is more "
                              "GPUs via DDP)")
    p_train.add_argument("--gt_labels", default="v2", choices=["v1", "v2"],
                         help="GT label directory flavor: v2 = "
                              "symmetry-canonical <split>_GT_v2 "
                              "(train_v2/v3/v5 recipe, the default); "
                              "v1 = plain <split>_GT labels (train_v4 "
                              "semantics, bop_dataset_pytorch.py:240)")

    p_fleet = sub.add_parser(
        "train-fleet",
        help="train K objects simultaneously, one model per object, "
             "sharded over the chip mesh (replaces the reference's "
             "one-process-per-GPU CUDA_VISIBLE_DEVICES launches, "
             "train_v2.py:2-5)")
    p_fleet.add_argument("--cfg", required=True,
                         help="reference-format config (shared)")
    p_fleet.add_argument("--obj_names", required=True, nargs="+",
                         help="K object names; the device count must "
                              "divide K (each device trains whole "
                              "objects)")
    p_fleet.add_argument("--output_dir", default="runs")
    p_fleet.add_argument("--variant", default="v2",
                         choices=["v1", "v2", "v3"])
    p_fleet.add_argument("--pretrained_backbone", default="auto")
    p_fleet.add_argument("--from_scratch", action="store_true")
    p_fleet.add_argument("--gamma", type=float, default=1.0)
    p_fleet.add_argument("--max_steps", type=int, default=None)
    p_fleet.add_argument("--log_freq", type=int, default=1000)
    p_fleet.add_argument("--bf16", action="store_true")
    p_fleet.add_argument("--cache_images", action="store_true")

    p_test = sub.add_parser("test", help="evaluate one object (test.py)")
    _add_common(p_test)
    p_test.add_argument("--ckpt_file", required=True)
    p_test.add_argument("--output_dir", default="eval_out")
    p_test.add_argument("--ignore_bit", type=int, default=0)
    p_test.add_argument("--variant", default="v2",
                        choices=["v1", "v2", "v3"])
    p_test.add_argument("--debug", action="store_true")
    p_test.add_argument("--batch_size", type=int, default=16)
    p_test.add_argument("--max_samples", type=int, default=None)
    p_test.add_argument("--mask_rcnn", action="store_true",
                        help="use the detector's RLE segmentation instead "
                             "of the mask head (test_for_mask_rcnn.py)")
    p_test.add_argument("--int8", action="store_true",
                        help="conv compute on the TPU int8 MXU path "
                             "(serving mode; same checkpoint)")
    p_test.add_argument("--roi_slice", action="store_true",
                        help="ship only each frame's clamped square-bbox "
                             "bytes to the device (bit-exact crops, 2-3x "
                             "less host->device traffic)")
    p_test.add_argument("--profile", default=None,
                        help="write a JAX profiler trace to this dir")
    _add_pnp_flags(p_test)

    p_vis = sub.add_parser(
        "visualize",
        help="full debug-artifact dump for ONE frame: mask panels, "
             "per-bit code-error grids, pose overlay (the reference's "
             "test_for_one_image.py / test_vis_mask.py entrypoints, "
             "wrapped around the run_test --debug artifact set)")
    _add_common(p_vis)
    p_vis.add_argument("--ckpt_file", required=True)
    p_vis.add_argument("--scene", type=int, required=True,
                       help="BOP scene id (e.g. 2 for lmo test/000002)")
    p_vis.add_argument("--im", type=int, required=True,
                       help="image id within the scene")
    p_vis.add_argument("--output_dir", default="eval_out")
    p_vis.add_argument("--variant", default="v2",
                       choices=["v1", "v2", "v3"])
    p_vis.add_argument("--ignore_bit", type=int, default=0)
    p_vis.add_argument("--mask_rcnn", action="store_true")

    p_tf = sub.add_parser(
        "test-fleet",
        help="evaluate K objects with one fleet program (per-object "
             "CSV + metrics, one merged submission CSV)")
    p_tf.add_argument("--cfg", required=True)
    p_tf.add_argument("--obj_names", required=True, nargs="+")
    p_tf.add_argument("--ckpt_files", required=True, nargs="+",
                      help="one checkpoint (orbax dir or .pth) per object")
    p_tf.add_argument("--output_dir", default="eval_out")
    p_tf.add_argument("--variant", default="v2",
                      choices=["v1", "v2", "v3"])
    p_tf.add_argument("--batch_size", type=int, default=16)
    p_tf.add_argument("--max_samples", type=int, default=None)
    p_tf.add_argument("--int8", action="store_true",
                      help="conv compute on the TPU int8 MXU path")
    p_tf.add_argument("--mask_rcnn", action="store_true",
                      help="use each object's detector RLE segmentation "
                           "instead of its mask head "
                           "(test_for_mask_rcnn.py)")
    p_tf.add_argument("--roi_slice", action="store_true",
                      help="ship only each frame's clamped square-bbox "
                           "bytes (fleet-wide shared buffer; bit-exact "
                           "crops, less host->device traffic)")
    p_tf.add_argument("--debug", action="store_true",
                      help="write the full per-sample debug artifact "
                           "set under debug/<obj_name>/ (reference "
                           "test.py:315-441), as `test --debug` does")
    _add_pnp_flags(p_tf)

    p_vf = sub.add_parser(
        "vivo-fleet",
        help="multi-instance eval of K objects with one fleet program "
             "(the reference runs test_vivo.py once per object)")
    p_vf.add_argument("--cfg", required=True)
    p_vf.add_argument("--obj_names", required=True, nargs="+")
    p_vf.add_argument("--ckpt_files", required=True, nargs="+",
                      help="one checkpoint (orbax dir or .pth) per object")
    p_vf.add_argument("--output_dir", default="eval_out")
    p_vf.add_argument("--variant", default="v2",
                      choices=["v1", "v2", "v3"])
    p_vf.add_argument("--score_threshold", type=float, default=0.2)
    p_vf.add_argument("--batch_size", type=int, default=16)
    p_vf.add_argument("--int8", action="store_true",
                      help="conv compute on the TPU int8 MXU path")
    p_vf.add_argument("--mask_rcnn", action="store_true",
                      help="use detector RLE segmentations "
                           "(test_vivo_for_mask_rcnn.py)")
    p_vf.add_argument("--roi_slice", action="store_true",
                      help="ship only each frame's clamped square-bbox "
                           "bytes (fleet-wide shared buffer; bit-exact "
                           "crops, less host->device traffic)")
    _add_pnp_flags(p_vf)

    p_vivo = sub.add_parser("vivo",
                            help="multi-instance eval (test_vivo)")
    _add_common(p_vivo)
    p_vivo.add_argument("--ckpt_file", required=True)
    p_vivo.add_argument("--output_dir", default="eval_out")
    p_vivo.add_argument("--variant", default="v2")
    p_vivo.add_argument("--score_threshold", type=float, default=0.2)
    p_vivo.add_argument("--batch_size", type=int, default=16)
    p_vivo.add_argument("--int8", action="store_true",
                        help="conv compute on the TPU int8 MXU path")
    p_vivo.add_argument("--mask_rcnn", action="store_true",
                        help="use detector RLE segmentations "
                             "(test_vivo_for_mask_rcnn.py)")
    p_vivo.add_argument("--roi_slice", action="store_true",
                        help="ship only each frame's clamped square-bbox "
                             "bytes to the device (bit-exact crops, 2-3x "
                             "less host->device traffic)")
    _add_pnp_flags(p_vivo)

    p_mesh = sub.add_parser("generate-mesh-code",
                            help="hierarchical surface encoding of a mesh")
    p_mesh.add_argument("--mesh", required=True)
    p_mesh.add_argument("-d", "--divide_number", type=int, default=2)
    p_mesh.add_argument("-n", "--levels", type=int, default=16)
    p_mesh.add_argument("--corres_txt", required=True)
    p_mesh.add_argument("--colored_ply", default=None)

    p_lab = sub.add_parser("generate-labels",
                           help="render GT_v2 label images for a split")
    _add_common(p_lab)
    p_lab.add_argument("--data_folder", default=None,
                       help="defaults to cfg.training_data_folder")
    p_lab.add_argument("--force", action="store_true")

    p_merge = sub.add_parser("merge-csv", help="merge per-object CSVs")
    p_merge.add_argument("csvs", nargs="+")
    p_merge.add_argument("--out", required=True)

    p_exp = sub.add_parser(
        "export-ckpt",
        help="export a checkpoint (orbax dir or .pth) to the reference's "
             "torch .pth format (utils_v2.save_checkpoint dict) so models "
             "trained here load in the reference's tooling")
    p_exp.add_argument("--ckpt_file", required=True,
                       help="orbax checkpoint dir (best is preferred) or "
                            "an existing .pth")
    p_exp.add_argument("--out", required=True, help="output .pth path")
    p_exp.add_argument("--variant", default="v2",
                       choices=["v1", "v2", "v3"])
    p_exp.add_argument("--resnet_layers", type=int, default=34,
                       choices=[34, 50])
    p_exp.add_argument("--code_length", type=int, default=16)
    p_exp.add_argument("--crop", type=int, default=256)
    p_exp.add_argument("--step", type=int, default=0)
    p_exp.add_argument("--best_score", type=float, default=0.0)
    p_exp.add_argument("--base", type=int, default=2,
                       help="divide_number_each_itration; != 2 selects "
                            "the non-binary head layout")

    p_srv = sub.add_parser(
        "export-serving",
        help="AOT-export the full eval program (preprocess + forward + "
             "decode + EPnP-RANSAC) as one serialized jax.export artifact "
             "with weights and LUT baked in — a self-contained serving "
             "blob (the reference has no deployment artifact)")
    _add_common(p_srv)
    p_srv.add_argument("--ckpt_file", required=True,
                       help="orbax checkpoint dir or reference .pth")
    p_srv.add_argument("--out", required=True, help="output blob path")
    p_srv.add_argument("--batch", type=int, default=64,
                       help="0 = symbolic batch dimension (one blob "
                            "serves any batch size; one compile per "
                            "distinct size on the serving host)")
    p_srv.add_argument("--image_h", type=int, default=480)
    p_srv.add_argument("--image_w", type=int, default=640)
    p_srv.add_argument("--variant", default="v2",
                       choices=["v1", "v2", "v3"])
    p_srv.add_argument("--ignore_bit", type=int, default=0)
    p_srv.add_argument("--int8", action="store_true",
                       help="bake the int8 serving-mode convs into the "
                            "artifact")
    p_srv.add_argument("--platforms", nargs="+", default=None,
                       help="jax.export lowering platforms (default: the "
                            "current backend), e.g. --platforms tpu cpu")
    p_srv.add_argument("--n_hypotheses", type=int, default=128,
                       help="RANSAC hypothesis count baked into the blob")
    p_srv.add_argument("--max_points", type=int, default=4096,
                       help="correspondence subset capacity baked in")
    p_srv.add_argument("--f32", action="store_true",
                       help="bake f32 model compute (default bf16 is the "
                            "production serving dtype; the `test` "
                            "command evaluates in f32 — export --f32 to "
                            "reproduce its CSV bit-for-bit)")
    p_srv.add_argument("--pallas", default="auto",
                       choices=["auto", "on", "off"],
                       help="RANSAC hypothesis-stage backend: auto = "
                            "trace-time dispatch (picks the jnp path "
                            "when exporting from a cpu-default process), "
                            "on = force the Pallas TPU kernel into the "
                            "blob, off = force the jnp path")
    p_srv.add_argument("--roi_slice", action="store_true",
                       help="export for ROI-sliced input buffers: frame "
                            "dims are computed from the configured test "
                            "walk's max padded bbox (overrides "
                            "--image_h/--image_w) and serve-exported "
                            "ships only the bbox bytes per frame")

    p_srvf = sub.add_parser(
        "export-serving-fleet",
        help="AOT-export K per-object models as ONE serving blob (the "
             "fleet_serve program: stacked weights + LUTs, one vmapped "
             "forward, per-object decode)")
    p_srvf.add_argument("--cfg", required=True)
    p_srvf.add_argument("--obj_names", required=True, nargs="+")
    p_srvf.add_argument("--ckpt_files", required=True, nargs="+")
    p_srvf.add_argument("--out", required=True)
    p_srvf.add_argument("--batch", type=int, default=16,
                        help="per-object batch; 0 = symbolic (any size)")
    p_srvf.add_argument("--image_h", type=int, default=480)
    p_srvf.add_argument("--image_w", type=int, default=640)
    p_srvf.add_argument("--variant", default="v2",
                        choices=["v1", "v2", "v3"])
    p_srvf.add_argument("--int8", action="store_true")
    p_srvf.add_argument("--platforms", nargs="+", default=None)
    p_srvf.add_argument("--n_hypotheses", type=int, default=128)
    p_srvf.add_argument("--max_points", type=int, default=4096)
    p_srvf.add_argument("--f32", action="store_true",
                        help="bake f32 model compute (default bf16)")
    p_srvf.add_argument("--pallas", default="auto",
                        choices=["auto", "on", "off"])
    p_srvf.add_argument("--roi_slice", action="store_true",
                        help="export for ROI-sliced input buffers (the "
                             "fleet-wide max over the K walks overrides "
                             "--image_h/--image_w)")

    p_sedf = sub.add_parser(
        "serve-exported-fleet",
        help="answer K objects' test splits from one fleet serving blob; "
             "per-object BOP CSVs + one merged submission CSV")
    p_sedf.add_argument("--cfg", required=True)
    p_sedf.add_argument("--obj_names", required=True, nargs="+")
    p_sedf.add_argument("--blob", required=True)
    p_sedf.add_argument("--output_dir", default="eval_out")
    p_sedf.add_argument("--seed", type=int, default=0)
    p_sedf.add_argument("--max_samples", type=int, default=None)
    p_sedf.add_argument("--batch_size", type=int, default=16,
                        help="batch for poly_batch blobs (fixed-batch "
                             "blobs dictate their own)")
    p_sedf.add_argument("--vivo", action="store_true",
                        help="multi-instance walk (test_vivo semantics: "
                             "GT-less image walk, all detected "
                             "instances, score-carrying CSVs)")
    p_sedf.add_argument("--score_threshold", type=float, default=0.2,
                        help="--vivo detection score threshold")

    p_sed = sub.add_parser(
        "serve-exported",
        help="answer a test split from an export-serving blob alone "
             "(no checkpoint, no model build) and write the BOP CSV")
    _add_common(p_sed)
    p_sed.add_argument("--blob", required=True,
                       help="export-serving artifact path")
    p_sed.add_argument("--output_dir", default="eval_out")
    p_sed.add_argument("--seed", type=int, default=0)
    p_sed.add_argument("--max_samples", type=int, default=None)
    p_sed.add_argument("--batch_size", type=int, default=16,
                       help="batch for poly_batch blobs (fixed-batch "
                            "blobs dictate their own)")
    p_sed.add_argument("--vivo", action="store_true",
                       help="multi-instance walk (test_vivo semantics: "
                            "GT-less image walk, all detected "
                            "instances, score-carrying CSV)")
    p_sed.add_argument("--score_threshold", type=float, default=0.2,
                       help="--vivo detection score threshold")

    p_score = sub.add_parser(
        "score-bop",
        help="BOP19 challenge scoring (AR_vsd/mssd/mspd) of a submission "
             "CSV against a BOP dataset tree — natively, no bop_toolkit")
    p_score.add_argument("--csv", required=True,
                         help="submission CSV (merge-csv output)")
    p_score.add_argument("--bop_path", required=True)
    p_score.add_argument("--dataset", required=True)
    p_score.add_argument("--split", default="test")
    p_score.add_argument("--no_vsd", action="store_true",
                         help="skip VSD even if depth images exist")

    p_cost = sub.add_parser(
        "model-cost",
        help="FLOPs/params via XLA cost analysis (the reference's thop "
             "harness, model/BinaryCodeNet.py:199-205)")
    p_cost.add_argument("--variant", default="v2",
                        choices=["v1", "v2", "v3"])
    p_cost.add_argument("--resnet_layers", type=int, default=34,
                        choices=[34, 50])
    p_cost.add_argument("--code_length", type=int, default=16)
    p_cost.add_argument("--crop", type=int, default=256)
    p_cost.add_argument("--no_concat", action="store_true")

    args = parser.parse_args(argv)

    if args.command == "merge-csv":
        from zebrapose_tpu.data.bop_writer import merge_csv
        merge_csv(args.csvs, args.out)
        print(f"merged {len(args.csvs)} files -> {args.out}")
        return 0

    if args.command == "model-cost":
        import jax.numpy as jnp
        from zebrapose_tpu.models.zebra_net import ZebraPoseNet
        from zebrapose_tpu.utils.profiling import model_cost
        model = ZebraPoseNet(binary_code_length=args.code_length,
                             variant=args.variant,
                             resnet_layers=args.resnet_layers,
                             concat=not args.no_concat)
        cost = model_cost(
            model, jnp.zeros((1, args.crop, args.crop, 3), jnp.float32))
        print(json.dumps({"params_M": round(cost["params"] / 1e6, 3),
                          "flops_G": round(cost["flops"] / 1e9, 3)}))
        return 0

    if args.command == "score-bop":
        from zebrapose_tpu.eval.bop_score import score_csv
        res = score_csv(args.csv, args.bop_path, args.dataset,
                        split=args.split,
                        with_vsd=False if args.no_vsd else None)
        print(json.dumps(res, indent=2))
        return 0

    if args.command == "export-ckpt":
        from zebrapose_tpu.eval.runner import load_model_variables
        from zebrapose_tpu.models.convert_torch import (
            save_reference_checkpoint)
        from zebrapose_tpu.models.zebra_net import ZebraPoseNet
        nonbinary = args.base != 2
        model = ZebraPoseNet(binary_code_length=args.code_length,
                             base=args.base, variant=args.variant,
                             resnet_layers=args.resnet_layers,
                             concat=True)
        variables = load_model_variables(
            args.ckpt_file, model, args.variant, args.crop,
            resnet_layers=args.resnet_layers, nonbinary=nonbinary)
        save_reference_checkpoint(
            args.out, variables, iteration_step=args.step,
            best_score=args.best_score, variant=args.variant,
            nonbinary=nonbinary, resnet_layers=args.resnet_layers)
        print(f"exported {args.ckpt_file} -> {args.out}")
        return 0

    if args.command == "generate-mesh-code":
        from zebrapose_tpu.tools.generate_gt import (
            generate_mesh_surface_code)
        lut, _ = generate_mesh_surface_code(
            args.mesh, args.divide_number, args.levels, args.corres_txt,
            args.colored_ply)
        print(f"{lut.num_classes} classes, "
              f"{int(lut.valid.sum())} non-empty -> {args.corres_txt}")
        return 0

    from zebrapose_tpu.config import ZebraConfig
    cfg = ZebraConfig.from_file(args.cfg)

    if args.command == "train":
        if args.multihost:
            from zebrapose_tpu.parallel.mesh import initialize_multihost
            initialize_multihost()
        from zebrapose_tpu.train.trainer import build_train_setup, fit
        out = os.path.join(args.output_dir,
                           f"{cfg.dataset_name}_{args.obj_name}")
        from zebrapose_tpu.utils.profiling import profile_trace
        res = build_train_setup(
            cfg, args.obj_name, out, variant=args.variant,
            pretrained_backbone=(None if args.from_scratch
                                 else args.pretrained_backbone),
            bf16=args.bf16, gamma=args.gamma, log_freq=args.log_freq,
            cache_images=args.cache_images,
            device_cache=(args.input_mode == "device_cache"),
            device_prefetch=(args.input_mode == "prefetch"),
            qat=args.qat, accum_steps=args.accum_steps,
            gt_dir_suffix="_GT" if args.gt_labels == "v1" else "_GT_v2")
        with profile_trace(args.profile):
            best = fit(res, log_freq=args.log_freq,
                       max_steps=args.max_steps, val_mode=args.val_mode)
        print(f"best val recall: {best}")
        return 0

    if args.command == "export-serving":
        import jax.numpy as jnp
        from zebrapose_tpu.codec.lut import load_correspondence_lut
        from zebrapose_tpu.data.dataset_info import lookup_obj_id
        from zebrapose_tpu.eval.export_serving import (build_serving_fn,
                                                       export_serving)
        from zebrapose_tpu.eval.runner import load_model_variables
        from zebrapose_tpu.models.zebra_net import ZebraPoseNet
        from zebrapose_tpu.ops.pnp import PnPConfig
        obj_id = lookup_obj_id(cfg.dataset_name, args.obj_name)
        lut = load_correspondence_lut(os.path.join(
            cfg.bop_path, cfg.dataset_name, "models_GT_color",
            f"Class_CorresPoint{obj_id:06d}.txt"))
        model = ZebraPoseNet(
            binary_code_length=cfg.number_of_itration,
            base=cfg.divide_number_each_itration, variant=args.variant,
            resnet_layers=cfg.resnet_layer,
            concat=cfg.concat_encoder_decoder,
            output_kernel_size=cfg.output_kernel_size,
            dtype=jnp.float32 if args.f32 else jnp.bfloat16,
            quant=args.int8)
        variables = load_model_variables(
            args.ckpt_file, model, args.variant,
            cfg.BoundingBox_CropSize_image,
            resnet_layers=cfg.resnet_layer,
            nonbinary=cfg.divide_number_each_itration != 2)
        serve = build_serving_fn(
            model, variables, lut,
            crop_img=cfg.BoundingBox_CropSize_image,
            crop_gt=cfg.BoundingBox_CropSize_GT,
            base=cfg.divide_number_each_itration,
            n_bits=cfg.number_of_itration,
            resize_method=cfg.resize_method,
            loss_type=cfg.BinaryCode_Loss_Type,
            pnp_cfg=PnPConfig(n_hypotheses=args.n_hypotheses,
                              max_points=args.max_points),
            ignore_bits=args.ignore_bit,
            use_kernel={"auto": None, "on": True,
                        "off": False}[args.pallas])
        image_hw = (args.image_h, args.image_w)
        if args.roi_slice:
            from zebrapose_tpu.eval.runner import prepare_object_eval
            oe = prepare_object_eval(cfg, args.obj_name, roi_slice=True)
            image_hw = oe.dataset.natural_slice_hw()
            print(f"roi_slice buffer from the walk: {image_hw}")
        blob = export_serving(serve, args.batch or None, image_hw,
                              platforms=args.platforms,
                              meta={"obj_name": args.obj_name,
                                    "dataset": cfg.dataset_name,
                                    "int8": args.int8,
                                    "roi_slice": args.roi_slice})
        with open(args.out, "wb") as f:
            f.write(blob)
        print(json.dumps({
            "out": args.out, "bytes": len(blob),
            "batch": args.batch or "symbolic",
            "image_hw": list(image_hw),
            "roi_slice": args.roi_slice,
            "platforms": args.platforms or ["<current backend>"]}))
        return 0

    if args.command == "serve-exported":
        if args.vivo:
            from zebrapose_tpu.eval.export_serving import (
                run_serve_exported_vivo)
            res = run_serve_exported_vivo(
                cfg, args.obj_name, args.blob, args.output_dir,
                seed=args.seed, score_threshold=args.score_threshold,
                batch_size=args.batch_size)
        else:
            from zebrapose_tpu.eval.export_serving import (
                run_serve_exported)
            res = run_serve_exported(cfg, args.obj_name, args.blob,
                                     args.output_dir, seed=args.seed,
                                     max_samples=args.max_samples,
                                     batch_size=args.batch_size)
        print(json.dumps(res))
        return 0

    if args.command == "serve-exported-fleet":
        if args.vivo:
            from zebrapose_tpu.eval.export_serving import (
                run_serve_exported_vivo_fleet)
            res = run_serve_exported_vivo_fleet(
                cfg, args.obj_names, args.blob, args.output_dir,
                seed=args.seed, score_threshold=args.score_threshold,
                batch_size=args.batch_size)
        else:
            from zebrapose_tpu.eval.export_serving import (
                run_serve_exported_fleet)
            res = run_serve_exported_fleet(
                cfg, args.obj_names, args.blob, args.output_dir,
                seed=args.seed, max_samples=args.max_samples,
                batch_size=args.batch_size)
        print(json.dumps(res))
        return 0

    if args.command == "export-serving-fleet":
        import jax.numpy as jnp
        from zebrapose_tpu.codec.lut import load_correspondence_lut
        from zebrapose_tpu.data.dataset_info import lookup_obj_id
        from zebrapose_tpu.eval.export_serving import (
            build_fleet_serving_fn, export_serving)
        from zebrapose_tpu.eval.runner import load_model_variables
        from zebrapose_tpu.models.zebra_net import ZebraPoseNet
        from zebrapose_tpu.ops.pnp import PnPConfig
        if len(args.ckpt_files) != len(args.obj_names):
            raise SystemExit("need one checkpoint per object")
        luts = []
        for name in args.obj_names:
            oid = lookup_obj_id(cfg.dataset_name, name)
            luts.append(load_correspondence_lut(os.path.join(
                cfg.bop_path, cfg.dataset_name, "models_GT_color",
                f"Class_CorresPoint{oid:06d}.txt")))
        model = ZebraPoseNet(
            binary_code_length=cfg.number_of_itration,
            base=cfg.divide_number_each_itration, variant=args.variant,
            resnet_layers=cfg.resnet_layer,
            concat=cfg.concat_encoder_decoder,
            output_kernel_size=cfg.output_kernel_size,
            dtype=jnp.float32 if args.f32 else jnp.bfloat16,
            quant=args.int8)
        variables_list = [
            load_model_variables(
                ck, model, args.variant, cfg.BoundingBox_CropSize_image,
                resnet_layers=cfg.resnet_layer,
                nonbinary=cfg.divide_number_each_itration != 2)
            for ck in args.ckpt_files]
        serve = build_fleet_serving_fn(
            model, variables_list, luts,
            crop_img=cfg.BoundingBox_CropSize_image,
            crop_gt=cfg.BoundingBox_CropSize_GT,
            base=cfg.divide_number_each_itration,
            n_bits=cfg.number_of_itration,
            resize_method=cfg.resize_method,
            loss_type=cfg.BinaryCode_Loss_Type,
            pnp_cfg=PnPConfig(n_hypotheses=args.n_hypotheses,
                              max_points=args.max_points),
            use_kernel={"auto": None, "on": True,
                        "off": False}[args.pallas])
        image_hw = (args.image_h, args.image_w)
        if args.roi_slice:
            from zebrapose_tpu.eval.runner import prepare_object_eval
            naturals = [prepare_object_eval(cfg, n, roi_slice=True)
                        .dataset.natural_slice_hw()
                        for n in args.obj_names]
            image_hw = (max(h for h, _ in naturals),
                        max(w for _, w in naturals))
            print(f"roi_slice buffer from the K walks: {image_hw}")
        blob = export_serving(
            serve, args.batch or None, image_hw,
            platforms=args.platforms, n_models=len(args.obj_names),
            meta={"obj_names": args.obj_names,
                  "dataset": cfg.dataset_name,
                  "roi_slice": args.roi_slice})
        with open(args.out, "wb") as f:
            f.write(blob)
        print(json.dumps({
            "out": args.out, "bytes": len(blob),
            "n_models": len(args.obj_names),
            "batch": args.batch or "symbolic",
            "roi_slice": args.roi_slice,
            "image_hw": list(image_hw)}))
        return 0

    if args.command == "train-fleet":
        from zebrapose_tpu.train.fleet import build_fleet_setup, fit_fleet
        out = os.path.join(args.output_dir, cfg.dataset_name)
        fleet = build_fleet_setup(
            cfg, args.obj_names, out, variant=args.variant,
            pretrained_backbone=(None if args.from_scratch
                                 else args.pretrained_backbone),
            bf16=args.bf16, gamma=args.gamma, log_freq=args.log_freq,
            cache_images=args.cache_images)
        best = fit_fleet(fleet, log_freq=args.log_freq,
                         max_steps=args.max_steps)
        for name, b in zip(args.obj_names, best):
            print(f"{name}: best val recall {b}")
        return 0

    if args.command == "vivo-fleet":
        from zebrapose_tpu.eval.fleet_serve import run_vivo_fleet
        from zebrapose_tpu.utils.logging import TeeOutput, prepare_eval_dir
        items = dict(cfg.to_dict())
        items.update({"obj_names": " ".join(args.obj_names),
                      "checkpoint_files": " ".join(args.ckpt_files),
                      "command": "vivo-fleet"})
        run_dir = prepare_eval_dir(args.output_dir, items)
        with TeeOutput(os.path.join(run_dir, "log.txt")):
            print(f"eval run dir: {run_dir}")
            res = run_vivo_fleet(
                cfg, args.obj_names, args.ckpt_files, run_dir,
                variant=args.variant,
                score_threshold=args.score_threshold,
                batch_size=args.batch_size, int8=args.int8,
                mask_rcnn=args.mask_rcnn, roi_slice=args.roi_slice,
                pnp_cfg=_pnp_cfg_from_args(args))
            print(json.dumps(res, indent=2))
        return 0

    if args.command == "test-fleet":
        from zebrapose_tpu.eval.fleet_serve import run_test_fleet
        from zebrapose_tpu.utils.logging import TeeOutput, prepare_eval_dir
        items = dict(cfg.to_dict())
        items.update({"obj_names": " ".join(args.obj_names),
                      "checkpoint_files": " ".join(args.ckpt_files),
                      "command": "test-fleet"})
        run_dir = prepare_eval_dir(args.output_dir, items)
        with TeeOutput(os.path.join(run_dir, "log.txt")):
            print(f"eval run dir: {run_dir}")
            res = run_test_fleet(
                cfg, args.obj_names, args.ckpt_files, run_dir,
                variant=args.variant, batch_size=args.batch_size,
                int8=args.int8, max_samples=args.max_samples,
                mask_rcnn=args.mask_rcnn, roi_slice=args.roi_slice,
                debug=args.debug,
                pnp_cfg=_pnp_cfg_from_args(args))
            print(json.dumps(res, indent=2))
        return 0

    if args.command == "visualize":
        from zebrapose_tpu.eval.runner import run_test
        from zebrapose_tpu.utils.logging import TeeOutput, prepare_eval_dir
        items = dict(cfg.to_dict())
        items.update({"obj_name": args.obj_name,
                      "checkpoint_file": args.ckpt_file,
                      "command": "visualize",
                      "frame": f"{args.scene}/{args.im}"})
        run_dir = prepare_eval_dir(args.output_dir, items)
        with TeeOutput(os.path.join(run_dir, "log.txt")):
            print(f"eval run dir: {run_dir}")
            metrics = run_test(
                cfg, args.obj_name, args.ckpt_file, run_dir,
                ignore_bit=args.ignore_bit, variant=args.variant,
                debug=True, batch_size=1, mask_rcnn=args.mask_rcnn,
                frame=(args.scene, args.im))
            print(json.dumps(metrics, indent=2))
            print(f"debug artifacts: {os.path.join(run_dir, 'debug')}")
        return 0

    if args.command in ("test", "vivo"):
        # Reference test.py:589-602: each eval run gets a timestamped
        # dir under eval_output_path with the full effective config in
        # config.txt and stdout/stderr captured into log.txt.
        from zebrapose_tpu.utils.logging import TeeOutput, prepare_eval_dir
        items = dict(cfg.to_dict())
        items.update({"obj_name": args.obj_name,
                      "checkpoint_file": args.ckpt_file,
                      "command": args.command})
        if args.command == "test":
            items["ignore_bit"] = args.ignore_bit
        run_dir = prepare_eval_dir(args.output_dir, items)
        with TeeOutput(os.path.join(run_dir, "log.txt")):
            print(f"eval run dir: {run_dir}")
            if args.command == "test":
                from zebrapose_tpu.eval.runner import run_test
                from zebrapose_tpu.utils.profiling import profile_trace
                with profile_trace(args.profile):
                    metrics = run_test(
                        cfg, args.obj_name, args.ckpt_file, run_dir,
                        ignore_bit=args.ignore_bit, variant=args.variant,
                        debug=args.debug, batch_size=args.batch_size,
                        max_samples=args.max_samples,
                        mask_rcnn=args.mask_rcnn,
                        int8=args.int8, roi_slice=args.roi_slice,
                        pnp_cfg=_pnp_cfg_from_args(args))
            else:
                from zebrapose_tpu.eval.runner_vivo import run_vivo
                metrics = run_vivo(
                    cfg, args.obj_name, args.ckpt_file, run_dir,
                    variant=args.variant,
                    score_threshold=args.score_threshold,
                    batch_size=args.batch_size,
                    mask_rcnn=args.mask_rcnn, int8=args.int8,
                    roi_slice=args.roi_slice,
                    pnp_cfg=_pnp_cfg_from_args(args))
            print(json.dumps(metrics, indent=2))
        return 0

    if args.command == "generate-labels":
        from zebrapose_tpu.tools.label_driver import generate_labels_cli
        n = generate_labels_cli(
            cfg, args.obj_name,
            data_folder=args.data_folder or cfg.training_data_folder,
            force=args.force)
        print(f"wrote {n} label images")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
