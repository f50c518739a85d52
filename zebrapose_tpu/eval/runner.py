"""Test-run orchestration — the reference test.py / test_vivo.py mains.

Assembles dataset + detections + LUT + model + eval program from a
ZebraConfig and runs the full evaluation, with the optional contour
refinement pass (reference `refine` config + edge_refine import,
test.py:276-313) and debug visualization dumps.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import cv2
import numpy as np

from zebrapose_tpu.codec.lut import load_correspondence_lut
from zebrapose_tpu.config import ZebraConfig
from zebrapose_tpu.data import bop_io, detections as det_mod
from zebrapose_tpu.data.dataset_info import is_symmetric, lookup_obj_id
from zebrapose_tpu.data.pipeline import CropDatasetHost
from zebrapose_tpu.eval.evaluate import (
    evaluate_object,
    make_eval_step,
    pose_errors,
    run_inference,
    summarize,
)
from zebrapose_tpu.models.zebra_net import ZebraPoseNet
from zebrapose_tpu.ops.pnp import PnPConfig


def load_model_variables(ckpt_file: str, model: ZebraPoseNet,
                         variant: str, crop_size: int,
                         resnet_layers: int = 34,
                         nonbinary: bool = False) -> Dict:
    """Load model variables from either a reference torch .pth checkpoint
    (converted on the fly) or an orbax checkpoint directory."""
    import jax
    import jax.numpy as jnp

    if ckpt_file.endswith(".npz"):
        # committed compact checkpoint (utils/compact_ckpt.py): bf16-
        # stored params+batch_stats, forward-bit-exact for bf16 models
        from zebrapose_tpu.utils.compact_ckpt import load_compact
        variables, _ = load_compact(ckpt_file)
        return variables
    if ckpt_file.endswith((".pth", ".pt")):
        import torch
        from zebrapose_tpu.models.convert_torch import (
            convert_reference_state_dict)
        ckpt = torch.load(ckpt_file, map_location="cpu")
        sd = ckpt.get("model_state_dict", ckpt)
        return convert_reference_state_dict(
            sd, variant=variant, nonbinary=nonbinary,
            resnet_layers=resnet_layers)

    from zebrapose_tpu.train.checkpoints import (
        CheckpointManager, is_step_dir, restore_step_dir)
    from zebrapose_tpu.train.state import create_train_state
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, crop_size, crop_size, 3)),
                           train=False)
    state = create_train_state(model, dict(variables), 1e-4)
    if is_step_dir(ckpt_file):
        # a direct orbax step payload (.../best/step_N) passed verbatim
        state = restore_step_dir(ckpt_file, state)
    else:
        mgr = CheckpointManager(ckpt_file)
        best = mgr.restore_best(state)
        if best is not None:
            state = best
        elif mgr.latest_step() is not None:
            state = mgr.restore(state)
        else:
            raise FileNotFoundError(
                f"no checkpoint under {ckpt_file!r}: expected a "
                "CheckpointManager root (steps/ or best/ inside) or a "
                "direct orbax step dir (.../best/step_N). Refusing to "
                "evaluate random-init weights.")
    return {"params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats)}


def extract_visible_contour(entire_mask: np.ndarray,
                            visible_mask: np.ndarray) -> np.ndarray:
    """Contour pixels of the entire mask whose 3x3 neighborhood contains
    visible-mask foreground (test.py:300-307). Returns [N,2] (x, y)."""
    em = (entire_mask > 0.5).astype(np.uint8)
    contours, _ = cv2.findContours(em, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_NONE)
    vis = (visible_mask > 0.5).astype(np.uint8)
    h, w = vis.shape
    pts = []
    for cont in contours:
        if len(cont) < 20:  # drop tiny contours (edge_refine.cpp:83-90)
            continue
        for p in cont[:, 0, :]:
            x, y = int(p[0]), int(p[1])
            y0, y1 = max(y - 1, 0), min(y + 2, h)
            x0, x1 = max(x - 1, 0), min(x + 2, w)
            if vis[y0:y1, x0:x1].any():
                pts.append((x, y))
    return np.array(pts, np.int32).reshape(-1, 2)


def refine_poses(dataset: CropDatasetHost, Rs, ts, ok, vis_masks,
                 ent_masks, mesh_pts, mesh_faces, image_hw: Tuple[int, int],
                 crop_gt: int, iterations: int = 10,
                 debug_dir: Optional[str] = None) -> None:
    """In-place contour refinement of successful poses (reference refine
    path): map the crop-space visible contour to full-image pixels via
    the final bbox, run the native Gauss-Newton refiner.

    debug_dir: per-sample subdirs of per-iteration introspection images
    (the reference's --debug edge_refine_debug variant, test.py:604-612)."""
    from zebrapose_tpu import native
    from zebrapose_tpu.ops.roi import map_pixels_to_original
    import jax.numpy as jnp

    h_img, w_img = image_hw
    for i in range(len(dataset)):
        if not ok[i]:
            continue
        contour = extract_visible_contour(ent_masks[i], vis_masks[i])
        if len(contour) < 20:
            continue
        raw = dataset.get_raw(i)
        orig = np.asarray(map_pixels_to_original(
            jnp.asarray(contour), jnp.asarray(raw["final_bbox"]), crop_gt))
        keep = (orig[:, 0] >= 0) & (orig[:, 0] < w_img) & \
               (orig[:, 1] >= 0) & (orig[:, 1] < h_img)
        orig = orig[keep]
        if len(orig) < 20:
            continue
        try:
            R2, t2 = native.edge_refine(
                mesh_pts, mesh_faces, raw["K"].astype(np.float64),
                w_img, h_img, orig, Rs[i].astype(np.float64),
                ts[i].astype(np.float64), iterations=iterations,
                debug_dir=(os.path.join(debug_dir, f"{i:06d}")
                           if debug_dir else None))
            Rs[i] = R2.astype(np.float32)
            ts[i] = t2.astype(np.float32)
        except RuntimeError:
            continue


def dataset_image_hw(samples, dataset: CropDatasetHost) -> Tuple[int, int]:
    """(h, w) of the split's full images, for the refiner's clip bounds.
    Prefers the global camera file's im_size; otherwise reads the true
    size off the first image rather than guessing (tless primesense is
    720x540; a 640x480 guess silently drops right/bottom contour
    pixels)."""
    im_size = (samples.cam_param_global or {}).get("im_size")
    if im_size is None:
        img0 = cv2.imread(dataset.rgb_files[0])
        return img0.shape[0], img0.shape[1]
    return int(im_size[1]), int(im_size[0])


class ObjectEval:
    """Everything run_test / run_test_fleet need per object."""

    def __init__(self, obj_id, dataset, scores, lut, mesh, vertices,
                 diameter, symmetric, samples):
        self.obj_id, self.dataset, self.scores = obj_id, dataset, scores
        self.lut, self.mesh = lut, mesh
        self.vertices, self.diameter = vertices, diameter
        self.symmetric, self.samples = symmetric, samples


def prepare_object_eval(cfg: ZebraConfig, obj_name: str,
                        gt_dir_suffix: str = "_GT_v2",
                        max_samples: Optional[int] = None,
                        mask_rcnn: bool = False,
                        samples=None,
                        roi_slice: bool = False,
                        frame: Optional[tuple] = None) -> ObjectEval:
    """Assemble one object's eval inputs: BOP walk (+BOP-challenge
    targets), detection ingestion (+ycbv keyframes), dataset, LUT, mesh
    geometry (test.py:85-240 setup).

    samples: a pre-walked BopSamples to reuse across objects (the walk
    is object-independent in the non-challenge path; run_test_fleet
    walks once for K objects). Ignored-and-rebuilt in BOP-challenge
    mode, whose walk is per-object.
    frame: (scene_id, im_id) — restrict the eval to that single frame
    (the reference's test_for_one_image.py entrypoint)."""
    obj_id = lookup_obj_id(cfg.dataset_name, obj_name)

    if cfg.bop_challange:
        samples = bop_io.get_bop_challenge_test_data(
            cfg.bop_path, cfg.dataset_name, obj_id,
            data_folder=cfg.test_folder)
    elif samples is None:
        samples = bop_io.get_dataset(cfg.bop_path, cfg.dataset_name,
                                     train=False, eval_model=True,
                                     data_folder=cfg.test_folder)
    lists = list(samples.for_obj(obj_id))

    det_bboxes = None
    det_segs = None
    scores = None
    if cfg.Detection_reaults not in ("none", "", None):
        dets = det_mod.load_detections(cfg.Detection_reaults)
        if cfg.dataset_name == "ycbv":
            keep = det_mod.keyframe_indices(dets, lists[0])
            lists = [np.asarray(l, dtype=object)[keep].tolist()
                     for l in lists]
        det_bboxes = det_mod.best_bboxes(dets, lists[0], obj_id)
        scores = det_mod.best_scores(dets, lists[0], obj_id)
        if mask_rcnn:
            det_segs = det_mod.best_segmentations(dets, lists[0], obj_id)
    elif mask_rcnn:
        raise ValueError("mask_rcnn requires Detection_reaults with "
                         "RLE segmentations")
    if frame is not None:
        from zebrapose_tpu.data.bop_writer import parse_sample_ids
        ids = parse_sample_ids(lists[0])
        keep = [i for i, (s, im) in enumerate(ids)
                if (s, im) == (int(frame[0]), int(frame[1]))]
        if not keep:
            raise ValueError(
                f"frame scene={frame[0]} im={frame[1]} not found in "
                f"{cfg.test_folder} (object {obj_name}); "
                f"{len(ids)} frames walked")
        lists = [[l[i] for i in keep] for l in lists]
        if det_bboxes is not None:
            det_bboxes = [det_bboxes[i] for i in keep]
            scores = [scores[i] for i in keep]
        if det_segs is not None:
            det_segs = [det_segs[i] for i in keep]
    if max_samples is not None:
        lists = [l[:max_samples] for l in lists]
        if det_bboxes is not None:
            det_bboxes = det_bboxes[:max_samples]
            scores = scores[:max_samples]
        if det_segs is not None:
            det_segs = det_segs[:max_samples]

    dataset = CropDatasetHost(
        samples.dataset_dir, cfg.test_folder, *lists, is_train=False,
        crop_size_img=cfg.BoundingBox_CropSize_image,
        crop_size_gt=cfg.BoundingBox_CropSize_GT,
        padding_ratio=cfg.padding_ratio, resize_method=cfg.resize_method,
        gt_dir_suffix=gt_dir_suffix, detect_bboxes=det_bboxes,
        detect_segmentations=det_segs, roi_slice=roi_slice)

    lut = load_correspondence_lut(os.path.join(
        cfg.bop_path, cfg.dataset_name, "models_GT_color",
        f"Class_CorresPoint{obj_id:06d}.txt"))
    mesh = bop_io.load_ply(samples.model_plys[obj_id])
    return ObjectEval(
        obj_id, dataset, scores, lut, mesh,
        mesh["pts"].astype(np.float32),
        float(samples.model_info[str(obj_id)]["diameter"]),
        is_symmetric(cfg.dataset_name, obj_name), samples)


def dump_debug_set(dbg_dir: str, cfg, dataset, mesh, vertices,
                   vis_masks, pred_codes, Rs, ts, ok,
                   max_samples: int = 16) -> None:
    """Full debug artifact set per sample (reference test.py:315-441):
    pred/GT mask panel, per-bit code-error grid, predicted + GT pose
    silhouette overlays on the crop. Shared by run_test --debug and
    run_test_fleet --debug (per-object subdirs)."""
    from zebrapose_tpu.codec.surface_code import (class_id_to_code,
                                                  rgb_to_class_id)
    from zebrapose_tpu.utils.visualize import dump_debug_sample, host_crop
    os.makedirs(dbg_dir, exist_ok=True)
    faces = mesh.get("faces")
    n_code_bits = pred_codes.shape[-1]
    for i in range(min(len(dataset), max_samples)):
        raw = dataset.get_raw(i)
        fb = raw["final_bbox"]
        sz = cfg.BoundingBox_CropSize_GT
        crop_bgr = host_crop(raw["rgb"], fb, sz)
        gt_mask = host_crop(raw["mask"], fb, sz,
                            nearest=True).astype(np.float32) / 255.0
        label_crop = host_crop(raw["label"], fb, sz, nearest=True)
        gt_code = np.asarray(class_id_to_code(
            rgb_to_class_id(label_crop.astype(np.int32)),
            base=cfg.divide_number_each_itration,
            n_digits=cfg.number_of_itration))[..., :n_code_bits]
        has_gt = dataset.gts[i] is not None
        dump_debug_sample(
            dbg_dir, i, crop_bgr, vis_masks[i], gt_mask,
            pred_codes[i], gt_code,
            vertices,
            faces.astype(np.int32) if faces is not None else None,
            raw["K"].astype(np.float64), Rs[i], ts[i], fb,
            R_gt=raw["R"] if has_gt else None,
            t_gt=raw["t"] if has_gt else None,
            render_pred=bool(ok[i]))


def run_test(cfg: ZebraConfig, obj_name: str, ckpt_file: str,
             output_dir: str, ignore_bit: int = 0, variant: str = "v2",
             debug: bool = False, batch_size: int = 16,
             pnp_cfg: Optional[PnPConfig] = None,
             gt_dir_suffix: str = "_GT_v2",
             max_samples: Optional[int] = None,
             mask_rcnn: bool = False,
             int8: bool = False,
             roi_slice: bool = False,
             frame: Optional[tuple] = None) -> Dict[str, float]:
    """Single-instance evaluation of one object (test.py main).

    mask_rcnn: use the detector's RLE segmentation in place of the
    network's mask head (reference test_for_mask_rcnn.py).
    int8: run conv compute on the TPU int8 MXU path (serving mode; same
    checkpoint, per-channel weight / dynamic activation quantization —
    models/layers._Int8Conv).
    roi_slice: host ships only the clamped square-bbox bytes per frame
    (bit-exact crops, 2-3x less H2D — CropDatasetHost.roi_slice)."""
    oe = prepare_object_eval(cfg, obj_name, gt_dir_suffix=gt_dir_suffix,
                             max_samples=max_samples, mask_rcnn=mask_rcnn,
                             roi_slice=roi_slice, frame=frame)
    obj_id, dataset, scores = oe.obj_id, oe.dataset, oe.scores
    lut, mesh, samples = oe.lut, oe.mesh, oe.samples
    vertices, diameter = oe.vertices, oe.diameter

    model = ZebraPoseNet(
        binary_code_length=cfg.number_of_itration,
        base=cfg.divide_number_each_itration, variant=variant,
        resnet_layers=cfg.resnet_layer,
        concat=cfg.concat_encoder_decoder,
        output_kernel_size=cfg.output_kernel_size, quant=int8)
    variables = load_model_variables(
        ckpt_file, model, variant, cfg.BoundingBox_CropSize_image,
        resnet_layers=cfg.resnet_layer,
        nonbinary=cfg.divide_number_each_itration != 2)

    if pnp_cfg is None:
        pnp_cfg = PnPConfig()
    eval_step = make_eval_step(
        lambda b, v: model.apply(v, b["image"], train=False), lut,
        crop_img=cfg.BoundingBox_CropSize_image,
        crop_gt=cfg.BoundingBox_CropSize_GT,
        base=cfg.divide_number_each_itration,
        n_bits=cfg.number_of_itration, resize_method=cfg.resize_method,
        loss_type=cfg.BinaryCode_Loss_Type, pnp_cfg=pnp_cfg,
        ignore_bits=ignore_bit, return_masks=cfg.refine or debug,
        return_codes=debug, mask_from_dataset=mask_rcnn,
        preprocess_gt=False)

    symmetric = oe.symmetric

    if cfg.refine or debug:
        out = run_inference(dataset, eval_step, batch_size,
                            variables=variables, collect_masks=True,
                            collect_codes=debug)
        if debug:
            Rs, ts, ok, vis_masks, ent_masks, pred_codes = out
        else:
            Rs, ts, ok, vis_masks, ent_masks = out
        if cfg.refine and "faces" in mesh and len(dataset) > 0:
            refine_poses(dataset, Rs, ts, ok, vis_masks, ent_masks,
                         vertices, mesh["faces"].astype(np.int32),
                         dataset_image_hw(samples, dataset),
                         cfg.BoundingBox_CropSize_GT,
                         debug_dir=(os.path.join(output_dir, "debug",
                                                 "refine")
                                    if debug else None))
        for i in range(len(dataset)):
            if not ok[i]:
                Rs[i] = np.eye(3)
                ts[i] = 0
        errors = pose_errors(dataset, Rs, ts, ok, vertices, symmetric)
        metrics = summarize(errors, diameter,
                            "ADD-S" if symmetric else "ADD")
        from zebrapose_tpu.data.bop_writer import (parse_sample_ids,
                                                   write_csv)
        os.makedirs(output_dir, exist_ok=True)
        ids = parse_sample_ids(dataset.rgb_files)
        write_csv(os.path.join(output_dir, "pose_result_bop"),
                  f"{cfg.dataset_name}_{obj_name}", obj_id,
                  [s for s, _ in ids], [i for _, i in ids], list(Rs),
                  [t.reshape(3, 1) for t in ts],
                  scores if scores is not None else [1.0] * len(dataset))
        if debug:
            dump_debug_set(os.path.join(output_dir, "debug"), cfg,
                           dataset, mesh, vertices, vis_masks,
                           pred_codes, Rs, ts, ok)
        result_metrics = metrics
    else:
        res = evaluate_object(
            dataset, eval_step, vertices, diameter, symmetric, obj_id,
            cfg.dataset_name, obj_name, output_dir=output_dir,
            scores=scores, batch_size=batch_size, variables=variables)
        result_metrics = res.metrics

    with open(os.path.join(output_dir, "log.txt"), "a") as f:
        for k, v in result_metrics.items():
            f.write(f"{k} {v}\n")
    return result_metrics
