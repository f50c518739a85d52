"""Trained-model CROSS-STACK parity: one checkpoint through BOTH stacks.

Every stage of this repo is individually golden-tested against the
reference (torch forward parity, decode-chain oracle, codec, geometry),
but composition bugs — normalization order, BGR, bbox bookkeeping
interacting with a real trained net — are exactly what per-stage goldens
miss. This script closes that gap inside this environment:

  1. take the rehearsal-trained checkpoint
     (scripts/rehearsal_full_shape.py artifacts on disk),
  2. `export-ckpt` it to the reference's .pth format
     (models/convert_torch.save_reference_checkpoint),
  3. strict-load it into the REFERENCE'S OWN
     `BinaryCodeNet_Deeplab_v2` (model/BinaryCodeNet_v2.py:125-166)
     and run the reference's own eval pipeline — its dataset class
     (bop_dataset_pytorch_v2), its binarization (common_ops), its
     decode + cv2 EPnP-RANSAC (CNN_output_to_pose.py:100-160) — over
     the rehearsal val frames,
  4. run OUR `run_test` over the same frames with the same checkpoint,
  5. compare ADD recall@0.1d and per-frame ADD errors.

Only unavailable third-party deps are functionally stubbed
(torchvision's documented ToTensor/Normalize semantics, imgaug — unused
on the eval path); every line of reference logic executes for real.

Run:  python scripts/cross_stack_parity.py [--root /tmp/zebra_rehearsal3]
      [--n 40]
"""

import argparse
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference/zebrapose"


# ------------------------------------------------------------------ stubs
# Functional equivalents of unavailable deps (torchvision is not in this
# image). ToTensor/Normalize implement torchvision's documented
# semantics exactly: HWC uint8 [0,255] -> CHW float [0,1], then
# per-channel (x - mean) / std.

def _install_stubs(torch):
    import torch.nn as nn

    class _Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class _ToTensor:
        def __init__(self, *a, **k):
            pass

        def __call__(self, pic):
            arr = np.asarray(pic, dtype=np.float32) / 255.0
            return torch.from_numpy(
                np.ascontiguousarray(arr.transpose(2, 0, 1)))

    class _Normalize:
        def __init__(self, mean, std):
            self.m = torch.tensor(mean).view(-1, 1, 1)
            self.s = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.m) / self.s

    def _tv_resnet34():
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests"))
        import torch_oracle

        class TV(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
                self.bn1 = nn.BatchNorm2d(64)
                self.relu = nn.ReLU(inplace=True)
                self.maxpool = nn.MaxPool2d(3, 2, 1)
                self.layer1 = torch_oracle._stage(64, 64, 3)
                self.layer2 = torch_oracle._stage(64, 128, 4, stride=2)
                self.layer3 = torch_oracle._stage(128, 256, 6, stride=2)
                self.layer4 = torch_oracle._stage(256, 512, 3, stride=2)
                self.avgpool = nn.AdaptiveAvgPool2d(1)
                self.fc = nn.Linear(512, 1000)

        return TV()

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm.resnet34 = _tv_resnet34
        tvt = types.ModuleType("torchvision.transforms")
        tvt.Compose = _Compose
        tvt.ToTensor = _ToTensor
        tvt.Normalize = _Normalize
        tv.models, tv.transforms = tvm, tvt
        sys.modules.update({"torchvision": tv, "torchvision.models": tvm,
                            "torchvision.transforms": tvt})

    if "imgaug" not in sys.modules:
        class _Inert:
            def __call__(self, *a, **k):
                return self

            def __getattr__(self, name):
                return self

        ia = types.ModuleType("imgaug")
        iaa = types.ModuleType("imgaug.augmenters")
        iaa.__getattr__ = lambda name: _Inert()
        ia.augmenters = iaa
        sys.modules.update({"imgaug": ia, "imgaug.augmenters": iaa})

    # the reference resnet constructor loads an ImageNet .pth that does
    # not exist here; its weights are irrelevant (the exported
    # checkpoint strict-overwrites them)
    if not getattr(torch.load, "_zebra_fake_pth", False):
        orig = torch.load

        def load_or_fake(path, *a, **k):
            if isinstance(path, (str, os.PathLike)) and \
                    "pretrained_backbone" in str(path):
                return _tv_resnet34().state_dict()
            return orig(path, *a, **k)

        load_or_fake._zebra_fake_pth = True
        torch.load = load_or_fake


def adi_errors_np(Re, te, Rg, tg, verts):
    """ADD-S/ADI (bop pose_error.adi): mean nearest-neighbor distance —
    the metric for symmetric objects; both stacks return the CANONICAL
    pose representative, which plain ADD would mis-score."""
    from scipy.spatial import cKDTree

    pe = verts @ np.asarray(Re).T + np.asarray(te).reshape(1, 3)
    pg = verts @ np.asarray(Rg).T + np.asarray(tg).reshape(1, 3)
    d, _ = cKDTree(pg).query(pe, k=1)
    return float(np.mean(d))


def _walk_val(ds_root, split="test", scene="000001"):
    """File lists + GT dicts for the rehearsal val scene, in the shapes
    the reference dataset class expects."""
    scene_dir = os.path.join(ds_root, split, scene)
    with open(os.path.join(scene_dir, "scene_camera.json")) as f:
        cam = json.load(f)
    with open(os.path.join(scene_dir, "scene_gt.json")) as f:
        gt = json.load(f)
    with open(os.path.join(scene_dir, "scene_gt_info.json")) as f:
        gti = json.load(f)
    rgb_files, mask_files, mask_visib_files = [], [], []
    gts, gt_infos, cams = [], [], []
    for im in sorted(gt.keys(), key=int):
        rgb_files.append(os.path.join(scene_dir, "rgb", f"{int(im):06d}.png"))
        mask_files.append([os.path.join(scene_dir, "mask",
                                        f"{int(im):06d}_000000.png")])
        mask_visib_files.append([os.path.join(
            scene_dir, "mask_visib", f"{int(im):06d}_000000.png")])
        gts.append(gt[im][0])
        gt_infos.append(gti[im][0])
        cams.append({"cam_K": np.array(cam[im]["cam_K"],
                                       np.float64).reshape(3, 3)})
    return rgb_files, mask_files, mask_visib_files, gts, gt_infos, cams


def add_errors_np(Re, te, Rg, tg, verts):
    """Plain ADD (metric.py -> bop pose_error.add): mean vertex distance."""
    pe = verts @ np.asarray(Re).T + np.asarray(te).reshape(1, 3)
    pg = verts @ np.asarray(Rg).T + np.asarray(tg).reshape(1, 3)
    return float(np.mean(np.linalg.norm(pe - pg, axis=1)))


def reference_stack(root, pth_path, n, crop_img=256, crop_gt=128,
                    n_bits=16, obj_id=1):
    """The reference's test.py hot loop (test.py:242-273), executing the
    reference's own modules end to end on the rehearsal val frames."""
    import torch

    _install_stubs(torch)
    if REF not in sys.path:
        sys.path.append(REF)   # append: never shadow our modules

    from bop_dataset_pytorch import bop_dataset_single_obj_pytorch_v2
    from binary_code_helper.CNN_output_to_pose import (
        CNN_outputs_to_object_pose, load_dict_class_id_3D_points)
    from common_ops import (from_output_to_class_binary_code,
                            from_output_to_class_mask)
    from model.BinaryCodeNet_v2 import BinaryCodeNet_Deeplab_v2

    ds_root = os.path.join(root, "lmo")
    lists = _walk_val(ds_root)
    rgb_files, mask_files, mask_visib_files, gts, gt_infos, cams = lists
    n = min(n, len(rgb_files))

    torch.manual_seed(0)
    np.random.seed(0)
    net = BinaryCodeNet_Deeplab_v2(
        num_resnet_layers=34, binary_code_length=n_bits,
        divided_number_each_iteration=2, concat=True,
        output_kernel_size=1)
    payload = torch.load(pth_path, map_location="cpu")
    net.load_state_dict(payload["model_state_dict"], strict=True)
    net.eval()

    ds = bop_dataset_single_obj_pytorch_v2(
        ds_root, "test", rgb_files[:n], mask_files[:n],
        mask_visib_files[:n], gts[:n], gt_infos[:n], cams[:n],
        is_train=False, crop_size_img=crop_img, crop_size_gt=crop_gt,
        GT_code_infos=[2, n_bits, 2 ** n_bits], padding_ratio=1.5,
        resize_method="crop_square_resize")

    # reference test.py:139 unpacks (total, divide, n_iter, dict)
    _, _, _, dict_pts = load_dict_class_id_3D_points(os.path.join(
        ds_root, "models_GT_color",
        f"Class_CorresPoint{obj_id:06d}.txt"))

    results = []
    nn_outputs = []   # (pred_mask, pred_code, Bbox, cam_K) per frame —
    #                   lets the caller run OUR decoder on the
    #                   reference's own forward outputs (attribution)
    t0 = time.time()
    with torch.no_grad():
        for i in range(n):
            (x, entire_mask, mask, R, t, Bbox, code_img, cam_K) = ds[i]
            mask_prob, entire_prob, code_prob = net(x[None])
            pred_mask = from_output_to_class_mask(mask_prob)
            pred_code = from_output_to_class_binary_code(
                code_prob, "BCE", divided_num_each_interation=2,
                binary_code_length=n_bits)
            pred_code = pred_code.transpose(0, 2, 3, 1)[0]
            pred_mask = pred_mask.transpose(0, 2, 3, 1)[0]
            pred_mask = pred_mask.squeeze(axis=-1).astype("uint8")
            Rp, tp, ok = CNN_outputs_to_object_pose(
                pred_mask, pred_code, np.asarray(Bbox), crop_gt, 2,
                dict_pts, intrinsic_matrix=np.asarray(cam_K))
            results.append((np.asarray(R, np.float64),
                            np.asarray(t, np.float64),
                            np.asarray(Rp, np.float64) if ok else None,
                            np.asarray(tp, np.float64).reshape(3)
                            if ok else None, bool(ok)))
            nn_outputs.append((pred_mask.copy(),
                               np.asarray(pred_code, np.float32),
                               np.asarray(Bbox, np.int64),
                               np.asarray(cam_K, np.float64)))
            if (i + 1) % 10 == 0:
                print(f"  [ref] {i + 1}/{n} frames "
                      f"({(time.time() - t0) / (i + 1):.1f} s/frame)",
                      flush=True)
    return results, nn_outputs


def our_stack(root, ckpt, out_dir, n, pnp, obj_name="ape"):
    """Our production eval: run_test over the same frames."""
    from zebrapose_tpu.config import ZebraConfig
    from zebrapose_tpu.eval.runner import run_test
    from zebrapose_tpu.ops.pnp import PnPConfig

    cfg = ZebraConfig.from_dict({
        "bop_path": root, "dataset_name": "lmo", "test_folder": "test",
        "Detection_reaults": "none",
        "BoundingBox_CropSize_image": 256,
        "BoundingBox_CropSize_GT": 128,
        "divide_number_each_itration": 2, "number_of_itration": 16,
    })
    metrics = run_test(cfg, obj_name, ckpt, out_dir, batch_size=8,
                       max_samples=n,
                       pnp_cfg=PnPConfig(n_hypotheses=pnp,
                                         max_points=2048))
    errs = []
    with open(os.path.join(out_dir, "add_err.txt")) as f:
        next(f)                              # diameter header
        for line in f:
            errs.append(float(line.split(":", 1)[1].split(" ", 1)[0]))
    return metrics, np.array(errs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.environ.get(
        "ZEBRAPOSE_TRAINED_ROOT", "/tmp/zebra_rehearsal3"))
    ap.add_argument("--ckpt", default=None,
                    help="orbax checkpoint (default: <root>/run/"
                         "checkpoints/best/<step_*>)")
    ap.add_argument("--n", type=int, default=40,
                    help="val frames (reference torch forward is "
                         "~10-20 s/frame on this 1-core host)")
    ap.add_argument("--pnp", type=int, default=128)
    ap.add_argument("--out", default="/tmp/cross_stack")
    ap.add_argument("--cpu", action="store_true",
                    help="run OUR stack on the CPU backend (parity is "
                         "about numbers, not speed; the axon tunnel can "
                         "be wedged)")
    ap.add_argument("--obj", default="ape",
                    help="object name; a SYMMETRIC one (e.g. bowl from "
                         "scripts/rehearsal_symmetric.py) switches both "
                         "stacks' error metric to ADD-S/ADI")
    args = ap.parse_args()

    from zebrapose_tpu.data.dataset_info import is_symmetric, \
        lookup_obj_id

    obj_id = lookup_obj_id("lmo", args.obj)
    symmetric = is_symmetric("lmo", args.obj)
    err_fn = adi_errors_np if symmetric else add_errors_np
    metric_name = "ADD-S" if symmetric else "ADD"

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/zebrapose_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    ckpt = args.ckpt
    if ckpt is None:
        best = os.path.join(args.root, "run", "checkpoints", "best")
        steps = [d for d in os.listdir(best) if d.startswith("step_")]
        ckpt = os.path.join(best, steps[0])
    print(f"checkpoint: {ckpt}", flush=True)

    os.makedirs(args.out, exist_ok=True)
    ds_root = os.path.join(args.root, "lmo")

    # geometry for the metric (models_eval, like the reference's setup)
    from zebrapose_tpu.data.bop_io import load_ply
    mesh = load_ply(os.path.join(ds_root, "models_eval",
                                 f"obj_{obj_id:06d}.ply"))
    verts = mesh["pts"].astype(np.float64)
    with open(os.path.join(ds_root, "models_eval",
                           "models_info.json")) as f:
        diameter = float(json.load(f)[str(obj_id)]["diameter"])

    # ---- stack A: ours (TPU program) --------------------------------
    print(f"== our stack (run_test, {args.obj}, {metric_name}) ==",
          flush=True)
    t0 = time.time()
    ours_metrics, ours_err = our_stack(args.root, ckpt,
                                       os.path.join(args.out, "ours"),
                                       args.n, args.pnp, args.obj)
    t_ours = time.time() - t0
    print(json.dumps(ours_metrics, indent=2), flush=True)

    # ---- export to reference format ---------------------------------
    pth_path = os.path.join(args.out, "exported.pth")
    from zebrapose_tpu.cli import main as cli_main
    rc = cli_main(["export-ckpt", "--ckpt_file", ckpt, "--out", pth_path,
                   "--variant", "v2"])
    assert rc == 0

    # ---- stack B: the reference's own modules -----------------------
    print("== reference stack (torch modules from /root/reference) ==",
          flush=True)
    t0 = time.time()
    ref, nn_outputs = reference_stack(args.root, pth_path, args.n,
                                      obj_id=obj_id)
    t_ref = time.time() - t0

    ref_err = np.full(len(ref), 10000.0)
    for i, (Rg, tg, Rp, tp, ok) in enumerate(ref):
        if ok:
            ref_err[i] = err_fn(Rp, tp, Rg, tg, verts)

    # ---- attribution: OUR decoder on the REFERENCE's forward outputs.
    # Same pred_mask/pred_code/bbox/K as the cv2 path above, so any
    # recall difference against `ref_err` isolates PnP solver strength
    # (our RANSAC+refit+polish vs cv2 EPnP-RANSAC), with preprocessing
    # and forward held fixed.
    import jax
    import jax.numpy as jnp

    from zebrapose_tpu.codec.lut import load_correspondence_lut
    from zebrapose_tpu.ops.pnp import PnPConfig, decode_to_pose_batch

    lut = load_correspondence_lut(os.path.join(
        ds_root, "models_GT_color",
        f"Class_CorresPoint{obj_id:06d}.txt"))
    masks = np.stack([o[0] for o in nn_outputs]).astype(np.float32)
    codes = np.stack([o[1] for o in nn_outputs])
    bboxes = np.stack([o[2] for o in nn_outputs]).astype(np.int32)
    Ks = np.stack([o[3] for o in nn_outputs]).astype(np.float32)
    keys = jax.random.split(jax.random.PRNGKey(11), masks.shape[0])
    Rb, tb, okb, _ = jax.tree.map(np.asarray, decode_to_pose_batch(
        jnp.asarray(masks), jnp.asarray(codes),
        jnp.asarray(lut.points), jnp.asarray(lut.valid),
        jnp.asarray(bboxes), jnp.asarray(Ks), keys,
        bbox_size=codes.shape[1], base=2,
        cfg=PnPConfig(n_hypotheses=args.pnp, max_points=2048)))
    xdec_err = np.full(len(ref), 10000.0)
    for i, (Rg, tg, _, _, _) in enumerate(ref):
        if okb[i]:
            xdec_err[i] = err_fn(Rb[i], tb[i], Rg, tg, verts)

    n = len(ref_err)
    ours_err = ours_err[:n]
    thr = 0.1 * diameter
    rec_ours = float(np.mean(ours_err < thr))
    rec_ref = float(np.mean(ref_err < thr))
    rec_xdec = float(np.mean(xdec_err < thr))
    agree = float(np.mean((ours_err < thr) == (ref_err < thr)))
    both = (ours_err < 9999) & (ref_err < 9999)
    derr = np.abs(ours_err[both] - ref_err[both])

    report = {
        "frames": n,
        "obj": args.obj,
        "metric": metric_name,
        "diameter": diameter,
        "ours": {"recall_0.1d": rec_ours,
                 "solved": int(np.sum(ours_err < 9999)),
                 "wall_s": round(t_ours, 1)},
        "reference": {"recall_0.1d": rec_ref,
                      "solved": int(np.sum(ref_err < 9999)),
                      "wall_s": round(t_ref, 1)},
        "our_decoder_on_reference_forward": {
            "recall_0.1d": rec_xdec,
            "solved": int(np.sum(xdec_err < 9999)),
            "note": ("same pred mask/code/bbox/K as the cv2 path — any "
                     "delta vs `reference` isolates PnP strength; any "
                     "delta vs `ours` isolates preprocess+forward")},
        "recall_delta": abs(rec_ours - rec_ref),
        "recall_resolution": 1.0 / n,
        "decision_agreement": agree,
        "per_frame_abs_derr_mm": {
            "median": float(np.median(derr)) if derr.size else None,
            "p90": float(np.percentile(derr, 90)) if derr.size else None,
            "max": float(np.max(derr)) if derr.size else None,
        },
        "per_frame": [
            {"i": i, "ours": round(float(a), 3),
             "ref": round(float(b), 3), "xdec": round(float(c), 3)}
            for i, (a, b, c) in enumerate(zip(ours_err, ref_err,
                                              xdec_err))],
    }
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items()
                      if k != "per_frame"}, indent=2))

    # Verdict. The two stacks deliberately differ in solver strength
    # (ours: RANSAC + inlier refit + SE(3) polish; reference fallback:
    # plain cv2 EPnP-RANSAC), so blanket recall equality is the wrong
    # gate. Instead:
    #   pnp_gap   = our decoder vs cv2 on IDENTICAL forward outputs
    #   stack_gap = full our-stack vs our decoder on reference outputs
    #               (isolates preprocess+forward composition)
    # The run passes if we never LOSE to the reference beyond the
    # val-set resolution on either axis; being better is the goal.
    band = max(0.005, 1.0 / n + 1e-9)   # +/-0.5% or one-frame resolution
    pnp_gap = rec_xdec - rec_ref
    stack_gap = rec_ours - rec_xdec
    ok = (rec_xdec + band >= rec_ref) and (rec_ours + band >= rec_ref)
    print(f"\nrecall: ours={rec_ours:.4f}  ref={rec_ref:.4f}  "
          f"our-decode-on-ref-forward={rec_xdec:.4f}")
    print(f"pnp_gap (same forward) = {pnp_gap:+.4f}, "
          f"stack_gap (preprocess+forward) = {stack_gap:+.4f}, "
          f"band = {band:.4f}")
    print(f"CROSS-STACK {'OK' if ok else 'FAIL'}: "
          f"{'never worse than' if ok else 'LOSES to'} the reference "
          f"stack beyond resolution")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
