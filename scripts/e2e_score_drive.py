"""End-to-end BOP19 scoring drive: run_test -> CSV -> score_csv -> AR.

Round-4 VERDICT missing #3: the native scorer (`eval/bop_score.py`,
golden-tested per error function against the reference's vendored
lib/pysixd/pose_error.py) had never consumed a CSV the pipeline itself
produced. This drives the COMPLETE loop the reference delegates to the
external bop_toolkit (its eval story stops at
tools_for_BOP/write_to_cvs.py:6-62):

  1. deterministic rebuild of the rehearsal BOP tree (seed 0 — same
     mesh partition as the committed checkpoint; test split now ships
     rendered depth so VSD scores too),
  2. `run_test` with the committed compact checkpoint
     (trained/rehearsal3_best.npz) -> submission CSV,
  3. `score_csv` on that very file -> AR_{VSD,MSSD,MSPD} + pooled AR.

Writes reports/e2e_score_r5.json. Run (TPU or --cpu):
  python scripts/e2e_score_drive.py [--root /tmp/zebra_rehearsal3]
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/zebra_rehearsal3")
    ap.add_argument("--ckpt", default=os.path.join(
        REPO, "trained", "rehearsal3_best.npz"))
    ap.add_argument("--out", default="/tmp/e2e_score_run")
    ap.add_argument("--cpu", action="store_true",
                    help="run the eval program on the CPU backend")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--report", default=os.path.join(
        REPO, "reports", "e2e_score_r5.json"))
    ap.add_argument("--escalate", type=int, default=0,
                    help="PnPConfig.escalate_hypotheses (256 lifts ADD "
                         "recall 0.683->0.817 on this eval — PERF.md)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/zebrapose_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    # ---- 1. tree (deterministic; depth rendered for the test split) ----
    if not os.path.exists(os.path.join(args.root, "lmo", "test")):
        from rehearsal_full_shape import build_tree
        print("[tree] rebuilding rehearsal tree (seed 0)...", flush=True)
        t0 = time.time()
        build_tree(args.root, n_train=160, n_val=120)
        print(f"[tree] built in {time.time() - t0:.0f}s", flush=True)
    depth_dir = os.path.join(args.root, "lmo", "test", "000001", "depth")
    if not os.path.isdir(depth_dir) or not os.listdir(depth_dir):
        # tree predates the depth-writing builder: render depth in place
        print("[tree] rendering missing test-split depth...", flush=True)
        _render_depth(args.root)

    # ---- 2. run_test -> submission CSV --------------------------------
    from zebrapose_tpu.config import ZebraConfig
    from zebrapose_tpu.eval.runner import run_test
    from zebrapose_tpu.ops.pnp import PnPConfig

    cfg = ZebraConfig.from_dict({
        "bop_path": args.root, "dataset_name": "lmo",
        "test_folder": "test", "Detection_reaults": "none",
        "BoundingBox_CropSize_image": 256,
        "BoundingBox_CropSize_GT": 128,
        "divide_number_each_itration": 2, "number_of_itration": 16,
    })
    print("[eval] run_test (full test split, 120 frames)...", flush=True)
    t0 = time.time()
    metrics = run_test(cfg, "ape", args.ckpt, args.out,
                       batch_size=args.batch_size,
                       pnp_cfg=PnPConfig(
                           n_hypotheses=128, max_points=2048,
                           escalate_hypotheses=args.escalate))
    t_eval = time.time() - t0
    print(json.dumps(metrics, indent=2), flush=True)

    csvs = glob.glob(os.path.join(args.out, "**", "*.csv"),
                     recursive=True)
    if len(csvs) != 1:
        sys.exit(f"expected exactly one CSV under {args.out}, "
                 f"found: {csvs}")
    csv_path = csvs[0]
    print(f"[eval] submission CSV: {csv_path}", flush=True)

    # ---- 3. native BOP19 scorer on the produced CSV -------------------
    from zebrapose_tpu.eval.bop_score import score_csv

    print("[score] score_csv (VSD auto-on: depth present)...", flush=True)
    t0 = time.time()
    scores = score_csv(csv_path, args.root, "lmo")
    t_score = time.time() - t0
    print(json.dumps(scores, indent=2), flush=True)

    report = {
        "date": time.strftime("%Y-%m-%d"),
        "ckpt": os.path.relpath(args.ckpt, REPO),
        "csv": csv_path,
        "n_frames": 120,
        "run_test_metrics": {k: float(v) for k, v in metrics.items()},
        "bop19": {k: v for k, v in scores.items() if k != "per_object"},
        "per_object": scores.get("per_object"),
        "wall_s": {"eval": round(t_eval, 1), "score": round(t_score, 1)},
        "backend": "cpu" if args.cpu else jax.default_backend(),
        "escalate_hypotheses": args.escalate,
    }
    os.makedirs(os.path.dirname(args.report), exist_ok=True)
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
    print(f"\n[done] AR={scores['AR']:.4f} "
          f"(mssd={scores['AR_mssd']:.4f} mspd={scores['AR_mspd']:.4f}"
          + (f" vsd={scores['AR_vsd']:.4f}" if "AR_vsd" in scores else "")
          + f") -> {args.report}")
    return 0


def _render_depth(root):
    """Render test-split depth for a pre-existing tree (same poses:
    scene_gt.json is the source of truth, not the rng stream)."""
    import cv2
    import numpy as np

    from rehearsal_full_shape import IMG_H, IMG_W, K, uv_sphere
    from zebrapose_tpu import native

    pts, faces = uv_sphere()
    scene = os.path.join(root, "lmo", "test", "000001")
    with open(os.path.join(scene, "scene_gt.json")) as f:
        sgt = json.load(f)
    os.makedirs(os.path.join(scene, "depth"), exist_ok=True)
    for im, gts in sgt.items():
        R = np.asarray(gts[0]["cam_R_m2c"], np.float64).reshape(3, 3)
        t = np.asarray(gts[0]["cam_t_m2c"], np.float64)
        _, depth = native.render_label(
            pts, faces.astype(np.int32),
            np.arange(1, len(faces) + 1, dtype=np.int32),
            K, R, t, IMG_W, IMG_H, with_depth=True)
        cv2.imwrite(os.path.join(scene, "depth", f"{int(im):06d}.png"),
                    np.round(depth).astype(np.uint16))


if __name__ == "__main__":
    raise SystemExit(main())
