"""Fleet serving: K per-object models answer in ONE eval program.

ZebraPose deploys one network per object, so serving a whole dataset
(e.g. lmo's 8 objects) with the reference means 8 processes x (forward
-> CPU Progressive-X) per image (test.py runs one object per
invocation). The TPU-native equivalent mirrors train/fleet.py: stack
the K models' variables and LUTs on a leading model axis, shard it over
the mesh, and run one jitted program per batch that

  1. preprocesses ALL K*B crops in one shot (eval-time preprocess is
     deterministic — no augmentation key dependence),
  2. runs the K forwards as one vmapped apply (one big MXU batch),
  3. decodes poses with a lax.scan over objects, each step the standard
     fused decode->EPnP-RANSAC program with that object's LUT (a scan,
     not a vmap, so the Pallas hypothesis kernel is called unbatched —
     exactly as compiled for the single-object path).

Per-object results are BIT-IDENTICAL to the single-object
make_eval_step program called with key = fold_in(key, k)
(tests/test_fleet_serve.py); multi-device meshes use shard_map over the
model axis (collective-free; see fleet.py on why not GSPMD-vmap).
"""

from __future__ import annotations

import os
from functools import partial
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from zebrapose_tpu.codec.lut import CorrespondenceLUT
from zebrapose_tpu.data.pipeline import preprocess_batch
from zebrapose_tpu.ops.binarize import code_from_logits, mask_from_logits
from zebrapose_tpu.ops.pnp import PnPConfig, decode_to_pose_batch
from zebrapose_tpu.train.fleet import MODEL_AXIS


def stack_luts(luts: List[CorrespondenceLUT]
               ) -> Tuple[np.ndarray, np.ndarray]:
    """K per-object LUTs -> ([K,C,3] points, [K,C] valid). All objects
    must share the code space (same base/depth => same C)."""
    shapes = {l.points.shape for l in luts}
    if len(shapes) > 1:
        raise ValueError(f"fleet LUTs disagree on code space: {shapes}")
    return (np.stack([l.points for l in luts]),
            np.stack([l.valid for l in luts]))


def stack_variables(variables: List[dict]) -> dict:
    """K per-object {"params","batch_stats"} trees -> stacked leaves."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *variables)


def make_fleet_eval_step(forward_fn, lut_points: np.ndarray,
                         lut_valid: np.ndarray,
                         crop_img: int, crop_gt: int, base: int,
                         n_bits: int, resize_method: str, loss_type: str,
                         pnp_cfg: PnPConfig,
                         preprocess_gt: bool = False,
                         mask_from_dataset: bool = False,
                         mesh: Optional[Mesh] = None,
                         use_kernel: Optional[bool] = None,
                         return_masks: bool = False,
                         return_codes: bool = False):
    """Build the jitted fleet batch program.

    step(raw, final_bbox, Ks, key, variables, n_models) -> (R [K,B,3,3],
    t [K,B,3], success [K,B], n_inliers [K,B]). `raw` leaves are FLAT
    [K*B, ...] in object-major order; `variables` is the stacked tree
    (stack_variables); object k's results reproduce the single-object
    make_eval_step called with fold_in(key, k).

    mask_from_dataset: Mask-RCNN variant — the detector's RLE mask
    (threaded through the dataset as batch["mask"]) replaces each
    network's mask head for decode, exactly as the single-object step
    does (reference test_for_mask_rcnn.py:248-251).
    return_masks: also return (visible [K,B,H,W], entire [K,B,H,W])
    masks for the host-side contour refinement pass, mirroring
    make_eval_step's return_masks (reference refine path,
    test.py:276-313).
    return_codes: also return the hard code planes [K,B,H,W,n] for the
    per-sample debug artifact dumps (reference --debug,
    test.py:315-441).
    """
    lp = jnp.asarray(lut_points)
    lv = jnp.asarray(lut_valid)

    def local(raw, final_bbox, Ks, obj_keys, variables, lp_l, lv_l):
        k_l = obj_keys.shape[0]
        batch = preprocess_batch(
            raw, obj_keys[0], crop_img=crop_img, crop_gt=crop_gt,
            base=base, n_bits=n_bits, is_train=False,
            resize_method=resize_method,
            include_gt=preprocess_gt or mask_from_dataset)
        batch = jax.tree.map(
            lambda x: x.reshape((k_l, -1) + x.shape[1:]), batch)
        out = jax.vmap(forward_fn)(batch, variables)

        if mask_from_dataset:
            masks = (batch["mask"] > 0.5).astype(jnp.float32)
        else:
            masks = mask_from_logits(out["mask"][..., 0])
        codes = code_from_logits(out["code"], loss_type, base=base)
        valid = raw["valid"].reshape(k_l, -1)
        bboxes = final_bbox.reshape((k_l, -1) + final_bbox.shape[1:])
        Kk = Ks.reshape((k_l, -1) + Ks.shape[1:])

        def body(_, xs):
            m, c, vld, bb, kk, lpk, lvk, key_k = xs
            dkeys = jax.random.split(key_k, m.shape[0])
            return None, decode_to_pose_batch(
                m * vld[:, None, None], c, lpk, lvk, bb, kk, dkeys,
                bbox_size=crop_gt, base=base, cfg=pnp_cfg,
                use_kernel=use_kernel)

        _, poses = jax.lax.scan(
            body, None, (masks, codes, valid, bboxes, Kk, lp_l, lv_l,
                         obj_keys))
        result = poses
        if return_masks:
            if mask_from_dataset:
                entire = (batch["entire_mask"] > 0.5).astype(jnp.float32)
            else:
                entire = mask_from_logits(
                    out.get("entire_mask", out["mask"])[..., 0])
            result = result + (masks, entire)
        if return_codes:
            result = result + (codes,)
        return result

    @partial(jax.jit, static_argnames=("n_models",))
    def step(raw, final_bbox, Ks, key, variables, n_models: int):
        obj_keys = jax.vmap(partial(jax.random.fold_in, key))(
            jnp.arange(n_models))
        if mesh is None or mesh.devices.size == 1:
            return local(raw, final_bbox, Ks, obj_keys, variables, lp, lv)
        if n_models % mesh.devices.size:
            raise ValueError(
                f"fleet size {n_models} not divisible by mesh size "
                f"{mesh.devices.size}; serve K%D==0 objects or pass a "
                "sub-mesh")
        spec = P(MODEL_AXIS)
        n_out = 4 + (2 if return_masks else 0) + (1 if return_codes
                                                  else 0)
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(spec,) * 7,
            out_specs=(spec,) * n_out)(
                raw, final_bbox, Ks, obj_keys, variables, lp, lv)

    return step


FEED_KEYS = ("rgb", "label", "mask", "entire_mask", "roi_param", "valid")


def fleet_infer(datasets, fleet_step, variables, batch_size: int,
                key, collect_masks: bool = False,
                collect_codes: bool = False
                ) -> Tuple[List[np.ndarray], ...]:
    """Drive K per-object datasets through the fleet program in
    lockstep: every batch is ONE dispatch; short datasets pad with
    valid=0 rows (whole zero batches once exhausted). Returns per-object
    (Rs, ts, ok) numpy arrays of each dataset's true length; with
    collect_masks (fleet step built with return_masks=True) also
    per-object (vis_masks, ent_masks) [n, H, W] arrays for the host
    refinement pass; with collect_codes (step built with
    return_codes=True) also per-object code planes [n, H, W, bits] for
    the debug artifact dumps. collect_codes requires collect_masks
    (debug always needs the mask panel too)."""
    if collect_codes and not collect_masks:
        raise ValueError("collect_codes requires collect_masks")
    from zebrapose_tpu.eval.evaluate import _pad_to

    k = len(datasets)
    lens = [len(d) for d in datasets]
    if any(n == 0 for n in lens):
        # an empty dataset never primes zero_raw (no collate to copy
        # shapes from) — callers must filter/refuse empties up front
        raise ValueError(
            f"empty dataset(s) in fleet walk (lengths {lens})")
    n_max = max(lens)
    Rs = [np.zeros((n, 3, 3), np.float32) for n in lens]
    ts = [np.zeros((n, 3), np.float32) for n in lens]
    ok = [np.zeros((n,), bool) for n in lens]
    vis = ent = codes = None
    zero_raw = None
    for start in range(0, n_max, batch_size):
        feeds = []
        for ds, n in zip(datasets, lens):
            idx = list(range(start, min(start + batch_size, n)))
            if idx:
                raw = _pad_to(ds.collate(idx), batch_size)
                if zero_raw is None:
                    zero_raw = {kk: np.zeros_like(v)
                                for kk, v in raw.items()}
            else:
                raw = zero_raw  # valid == 0 everywhere: pure padding
            feeds.append(raw)
        cat = {kk: np.concatenate([f[kk] for f in feeds])
               for kk in FEED_KEYS + ("final_bbox", "K")}
        out = fleet_step({kk: cat[kk] for kk in FEED_KEYS},
                         jnp.asarray(cat["final_bbox"].astype(np.int32)),
                         jnp.asarray(cat["K"]),
                         jax.random.fold_in(key, start), variables,
                         n_models=k)
        R_b, t_b, ok_b = (np.asarray(o) for o in out[:3])
        if collect_masks:
            need = 7 if collect_codes else 6
            if len(out) < need:
                raise ValueError(
                    "collect_masks/collect_codes require a fleet step "
                    "built with return_masks=True (and return_codes="
                    "True for codes)")
            vis_b, ent_b = np.asarray(out[4]), np.asarray(out[5])
            if collect_codes:
                code_b = np.asarray(out[6])
            if vis is None:
                vis = [np.zeros((n,) + vis_b.shape[2:], np.float32)
                       for n in lens]
                ent = [np.zeros((n,) + ent_b.shape[2:], np.float32)
                       for n in lens]
                if collect_codes:
                    codes = [np.zeros((n,) + code_b.shape[2:],
                                      np.float32) for n in lens]
        for i, n in enumerate(lens):
            m = max(0, min(batch_size, n - start))
            if m:
                Rs[i][start:start + m] = R_b[i, :m]
                ts[i][start:start + m] = t_b[i, :m]
                ok[i][start:start + m] = ok_b[i, :m]
                if collect_masks:
                    vis[i][start:start + m] = vis_b[i, :m]
                    ent[i][start:start + m] = ent_b[i, :m]
                    if collect_codes:
                        codes[i][start:start + m] = code_b[i, :m]
    if collect_codes:
        return Rs, ts, ok, vis, ent, codes
    if collect_masks:
        return Rs, ts, ok, vis, ent
    return Rs, ts, ok


def run_test_fleet(cfg, obj_names: List[str], ckpt_files: List[str],
                   output_dir: str, variant: str = "v2",
                   batch_size: int = 16,
                   pnp_cfg: Optional[PnPConfig] = None,
                   int8: bool = False,
                   max_samples: Optional[int] = None,
                   mask_rcnn: bool = False,
                   mesh: Optional[Mesh] = None,
                   roi_slice: bool = False,
                   debug: bool = False) -> dict:
    """Evaluate K objects with ONE program (the fleet analog of
    runner.run_test without the per-sample debug dumps — use `test`
    for those): per-object BOP datasets advance in lockstep (short
    datasets pad with valid=0 batches), every step is one
    fleet_eval_step dispatch, and each object gets the standard
    artifact set (BOP CSV + ADD metrics) plus one merged submission
    CSV. mask_rcnn uses each object's detector RLE segmentation
    instead of its mask head (test_for_mask_rcnn.py). cfg.refine runs
    the host contour-refinement pass per object on the fleet program's
    own mask heads, exactly as run_test (reference test.py:276-313);
    when combined with mask_rcnn the refine masks come from the
    detector RLE / dataset entire mask instead, matching the
    reference's test_for_mask_rcnn.py behavior. debug writes the full
    per-sample artifact set (mask panel, code-error grids, pose
    overlays — reference test.py:315-441) under debug/<obj_name>/,
    exactly as run_test --debug does for one object."""
    from zebrapose_tpu.data.bop_writer import (merge_csv,
                                               parse_sample_ids,
                                               write_csv)
    from zebrapose_tpu.eval.evaluate import pose_errors, summarize
    from zebrapose_tpu.eval.runner import (dataset_image_hw,
                                           load_model_variables,
                                           prepare_object_eval,
                                           refine_poses)
    from zebrapose_tpu.models.zebra_net import ZebraPoseNet

    if len(ckpt_files) != len(obj_names):
        raise ValueError("need one checkpoint per object")
    # walk the split once and share it across objects (the non-challenge
    # walk is object-independent; prepare_object_eval rebuilds its own
    # in bop_challange mode)
    shared = None
    if not cfg.bop_challange:
        from zebrapose_tpu.data import bop_io
        shared = bop_io.get_dataset(cfg.bop_path, cfg.dataset_name,
                                    train=False, eval_model=True,
                                    data_folder=cfg.test_folder)
    oes = [prepare_object_eval(cfg, n, max_samples=max_samples,
                               mask_rcnn=mask_rcnn, samples=shared,
                               roi_slice=roi_slice)
           for n in obj_names]
    for n, oe in zip(obj_names, oes):
        if len(oe.dataset) == 0:
            raise ValueError(f"object {n}: empty eval split")
    if roi_slice:
        # lockstep batches stack across objects, so every dataset must
        # emit one shape: impose the fleet-wide max buffer
        naturals = [oe.dataset.natural_slice_hw() for oe in oes]
        hw = (max(h for h, _ in naturals), max(w for _, w in naturals))
        for oe in oes:
            oe.dataset.set_slice_hw(hw)

    model = ZebraPoseNet(
        binary_code_length=cfg.number_of_itration,
        base=cfg.divide_number_each_itration, variant=variant,
        resnet_layers=cfg.resnet_layer,
        concat=cfg.concat_encoder_decoder,
        output_kernel_size=cfg.output_kernel_size, quant=int8)
    variables = stack_variables([
        load_model_variables(ck, model, variant,
                             cfg.BoundingBox_CropSize_image,
                             resnet_layers=cfg.resnet_layer,
                             nonbinary=cfg.divide_number_each_itration
                             != 2)
        for ck in ckpt_files])
    lp, lv = stack_luts([oe.lut for oe in oes])
    step = make_fleet_eval_step(
        lambda b, v: model.apply(v, b["image"], train=False), lp, lv,
        crop_img=cfg.BoundingBox_CropSize_image,
        crop_gt=cfg.BoundingBox_CropSize_GT,
        base=cfg.divide_number_each_itration,
        n_bits=cfg.number_of_itration,
        resize_method=cfg.resize_method,
        loss_type=cfg.BinaryCode_Loss_Type,
        pnp_cfg=pnp_cfg or PnPConfig(), mask_from_dataset=mask_rcnn,
        mesh=mesh, return_masks=cfg.refine or debug,
        return_codes=debug)

    lens = [len(oe.dataset) for oe in oes]
    out = fleet_infer([oe.dataset for oe in oes], step, variables,
                      batch_size, jax.random.PRNGKey(0),
                      collect_masks=cfg.refine or debug,
                      collect_codes=debug)
    Rs, ts, ok = out[:3]

    os.makedirs(output_dir, exist_ok=True)
    per_object = {}
    csvs = []
    for i, (name, oe) in enumerate(zip(obj_names, oes)):
        if cfg.refine and "faces" in oe.mesh and lens[i] > 0:
            vis, ent = out[3], out[4]
            refine_poses(oe.dataset, Rs[i], ts[i], ok[i], vis[i], ent[i],
                         oe.vertices, oe.mesh["faces"].astype(np.int32),
                         dataset_image_hw(oe.samples, oe.dataset),
                         cfg.BoundingBox_CropSize_GT,
                         debug_dir=(os.path.join(output_dir, "debug",
                                                 name, "refine")
                                    if debug else None))
        if debug:
            from zebrapose_tpu.eval.runner import dump_debug_set
            dump_debug_set(os.path.join(output_dir, "debug", name),
                           cfg, oe.dataset, oe.mesh, oe.vertices,
                           out[3][i], out[5][i], Rs[i], ts[i], ok[i])
        for j in range(lens[i]):
            if not ok[i][j]:  # reference: identity R / zero t in CSV
                Rs[i][j] = np.eye(3)
                ts[i][j] = 0
        errors = pose_errors(oe.dataset, Rs[i], ts[i], ok[i],
                             oe.vertices, oe.symmetric)
        metrics = summarize(errors, oe.diameter,
                            "ADD-S" if oe.symmetric else "ADD")
        ids = parse_sample_ids(oe.dataset.rgb_files)
        csvs.append(write_csv(
            os.path.join(output_dir, "pose_result_bop"),
            f"{cfg.dataset_name}_{name}", oe.obj_id,
            [s for s, _ in ids], [im for _, im in ids], list(Rs[i]),
            [t.reshape(3, 1) for t in ts[i]],
            oe.scores if oe.scores is not None else [1.0] * lens[i]))
        per_object[name] = metrics
    merged = merge_csv(csvs, os.path.join(
        output_dir, f"{cfg.dataset_name}_fleet.csv"))
    return {"per_object": per_object, "merged_csv": merged}


def run_vivo_fleet(cfg, obj_names: List[str], ckpt_files: List[str],
                   output_dir: str, variant: str = "v2",
                   score_threshold: float = 0.2, batch_size: int = 16,
                   pnp_cfg: Optional[PnPConfig] = None,
                   int8: bool = False, mask_rcnn: bool = False,
                   mesh: Optional[Mesh] = None,
                   roi_slice: bool = False) -> dict:
    """Vivo (multi-instance) fleet serving: K objects' detected
    instances answered by ONE fleet program per batch. The reference
    serves a multi-object scene (e.g. tless, 30 objects) by running
    test_vivo.py once per object — K processes, K forwards per image,
    CPU PnP. Here each object's (image, instance) pairs flatten into a
    per-object host dataset (eval/vivo.py) and all K advance in
    lockstep through make_fleet_eval_step; per-object CSVs carry
    detector scores (failed instances score -1, as evaluate_vivo), plus
    one merged submission CSV. Objects with no detection above the
    threshold are skipped with a warning (reported instances=0)."""
    from zebrapose_tpu.codec.lut import load_correspondence_lut
    from zebrapose_tpu.data import bop_io
    from zebrapose_tpu.data import detections as det_mod
    from zebrapose_tpu.data.bop_writer import (merge_csv,
                                               parse_sample_ids,
                                               write_csv)
    from zebrapose_tpu.data.dataset_info import lookup_obj_id
    from zebrapose_tpu.eval.runner import load_model_variables
    from zebrapose_tpu.eval.vivo import build_vivo_dataset
    from zebrapose_tpu.models.zebra_net import ZebraPoseNet

    if len(ckpt_files) != len(obj_names):
        raise ValueError("need one checkpoint per object")
    rgb_files, cam_by_file = bop_io.list_images_with_cameras(
        cfg.bop_path, cfg.dataset_name, data_folder=cfg.test_folder)
    dataset_dir = os.path.join(cfg.bop_path, cfg.dataset_name)
    dets = det_mod.load_detections(cfg.Detection_reaults)

    per_object = {}
    live = []  # (name, ckpt_file, obj_id, dataset, scores)
    for name, ck in zip(obj_names, ckpt_files):
        obj_id = lookup_obj_id(cfg.dataset_name, name)
        dataset, scores = build_vivo_dataset(
            dataset_dir, cfg.test_folder, rgb_files, cam_by_file, dets,
            obj_id, score_threshold,
            crop_size_img=cfg.BoundingBox_CropSize_image,
            crop_size_gt=cfg.BoundingBox_CropSize_GT,
            padding_ratio=cfg.padding_ratio,
            resize_method=cfg.resize_method,
            use_segmentation=mask_rcnn, roi_slice=roi_slice)
        if len(dataset) == 0:
            print(f"WARNING: {name}: no detection above score "
                  f"{score_threshold} in the split; skipped from the "
                  "fleet")
            per_object[name] = {"instances": 0, "solved": 0,
                                "solve_rate": 0.0}
            continue
        live.append((name, ck, obj_id, dataset, scores))
    if not live:
        raise ValueError("no object has any detected instance")
    if roi_slice:
        naturals = [ds.natural_slice_hw() for _, _, _, ds, _ in live]
        hw = (max(h for h, _ in naturals), max(w for _, w in naturals))
        for _, _, _, ds, _ in live:
            ds.set_slice_hw(hw)

    model = ZebraPoseNet(
        binary_code_length=cfg.number_of_itration,
        base=cfg.divide_number_each_itration, variant=variant,
        resnet_layers=cfg.resnet_layer,
        concat=cfg.concat_encoder_decoder,
        output_kernel_size=cfg.output_kernel_size, quant=int8)
    variables = stack_variables([
        load_model_variables(ck, model, variant,
                             cfg.BoundingBox_CropSize_image,
                             resnet_layers=cfg.resnet_layer,
                             nonbinary=cfg.divide_number_each_itration
                             != 2)
        for _, ck, _, _, _ in live])
    lp, lv = stack_luts([load_correspondence_lut(os.path.join(
        dataset_dir, "models_GT_color", f"Class_CorresPoint{oid:06d}.txt"))
        for _, _, oid, _, _ in live])
    step = make_fleet_eval_step(
        lambda b, v: model.apply(v, b["image"], train=False), lp, lv,
        crop_img=cfg.BoundingBox_CropSize_image,
        crop_gt=cfg.BoundingBox_CropSize_GT,
        base=cfg.divide_number_each_itration,
        n_bits=cfg.number_of_itration,
        resize_method=cfg.resize_method,
        loss_type=cfg.BinaryCode_Loss_Type,
        pnp_cfg=pnp_cfg or PnPConfig(), mask_from_dataset=mask_rcnn,
        mesh=mesh)

    Rs, ts, ok = fleet_infer([ds for _, _, _, ds, _ in live], step,
                             variables, batch_size, jax.random.PRNGKey(0))

    os.makedirs(output_dir, exist_ok=True)
    csvs = []
    for i, (name, _, obj_id, dataset, scores) in enumerate(live):
        out_scores = [s if k else -1 for s, k in zip(scores, ok[i])]
        ids = parse_sample_ids(dataset.rgb_files)
        csvs.append(write_csv(
            os.path.join(output_dir, "pose_result_bop"),
            f"{cfg.dataset_name}_{name}", obj_id,
            [s for s, _ in ids], [im for _, im in ids],
            list(Rs[i]), [t.reshape(3, 1) for t in ts[i]], out_scores))
        per_object[name] = {"instances": len(dataset),
                            "solved": int(np.sum(ok[i])),
                            "solve_rate": float(np.mean(ok[i]))}
    merged = merge_csv(csvs, os.path.join(
        output_dir, f"{cfg.dataset_name}_vivo_fleet.csv"))
    return {"per_object": per_object, "merged_csv": merged}
