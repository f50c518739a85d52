"""Vivo (multi-instance) test-run orchestration — test_vivo.py main."""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from zebrapose_tpu.codec.lut import load_correspondence_lut
from zebrapose_tpu.config import ZebraConfig
from zebrapose_tpu.data import bop_io, detections as det_mod
from zebrapose_tpu.data.dataset_info import lookup_obj_id
from zebrapose_tpu.eval.evaluate import make_eval_step
from zebrapose_tpu.eval.runner import load_model_variables
from zebrapose_tpu.eval.vivo import build_vivo_dataset, evaluate_vivo
from zebrapose_tpu.models.zebra_net import ZebraPoseNet
from zebrapose_tpu.ops.pnp import PnPConfig


def run_vivo(cfg: ZebraConfig, obj_name: str, ckpt_file: str,
             output_dir: str, variant: str = "v2",
             score_threshold: float = 0.2, batch_size: int = 16,
             pnp_cfg: Optional[PnPConfig] = None,
             mask_rcnn: bool = False,
             int8: bool = False,
             roi_slice: bool = False) -> Dict[str, float]:
    obj_id = lookup_obj_id(cfg.dataset_name, obj_name)

    # Vivo iterates IMAGES (not GT instances): build the image list from
    # scene_camera.json + detections alone so GT-less challenge splits
    # work (reference test_vivo.py:127-131 reads cameras per scene
    # directly and drives the loop off the detection dict).
    rgb_files, cam_by_file = bop_io.list_images_with_cameras(
        cfg.bop_path, cfg.dataset_name, data_folder=cfg.test_folder)
    dataset_dir = os.path.join(cfg.bop_path, cfg.dataset_name)

    dets = det_mod.load_detections(cfg.Detection_reaults)
    dataset, scores = build_vivo_dataset(
        dataset_dir, cfg.test_folder, rgb_files, cam_by_file,
        dets, obj_id, score_threshold,
        crop_size_img=cfg.BoundingBox_CropSize_image,
        crop_size_gt=cfg.BoundingBox_CropSize_GT,
        padding_ratio=cfg.padding_ratio,
        resize_method=cfg.resize_method,
        use_segmentation=mask_rcnn, roi_slice=roi_slice)

    lut = load_correspondence_lut(os.path.join(
        cfg.bop_path, cfg.dataset_name, "models_GT_color",
        f"Class_CorresPoint{obj_id:06d}.txt"))
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

    eval_step = make_eval_step(
        lambda b, v: model.apply(v, b["image"], train=False), lut,
        crop_img=cfg.BoundingBox_CropSize_image,
        crop_gt=cfg.BoundingBox_CropSize_GT,
        base=cfg.divide_number_each_itration,
        n_bits=cfg.number_of_itration, resize_method=cfg.resize_method,
        loss_type=cfg.BinaryCode_Loss_Type,
        pnp_cfg=pnp_cfg or PnPConfig(),
        mask_from_dataset=mask_rcnn, preprocess_gt=False)

    Rs, ts, ok = evaluate_vivo(dataset, scores, eval_step, obj_id,
                               cfg.dataset_name, obj_name,
                               output_dir=output_dir,
                               batch_size=batch_size,
                               variables=variables)
    return {"instances": int(len(dataset)),
            "solved": int(np.sum(ok)),
            "solve_rate": float(np.mean(ok)) if len(dataset) else 0.0}
