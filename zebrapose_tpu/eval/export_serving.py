"""AOT serving export: the full eval program as a versioned artifact.

The reference's only deployment story is a Python process per object
running `test.py`'s batch-1 loop (zebrapose/test.py:242-273) with the
torch checkpoint, the model code, and the correspondence dict all loaded
at startup. This module packages OUR production eval program —
preprocess -> forward -> binarize -> surface-code decode -> EPnP-RANSAC,
the exact `make_eval_step` graph — as one serialized `jax.export`
artifact with the checkpoint weights AND the correspondence LUT baked in
as constants. A serving host needs jax and the blob; no flax model
code, no checkpoint restore, no LUT files, and the artifact is
version-pinned by jax.export's serialization calling convention.

Interface of the exported program (shapes fixed at export time, or a
symbolic batch via batch=None — shape polymorphism):

    (rgb[B,H,W,3] u8, roi_param[B,5] i32, valid[B] f32,
     final_bbox[B,4] i32, K[B,3,3] f32, key[2] u32)
        -> (R[B,3,3] f32, t[B,3] f32, success[B] bool, n_inliers[B] i32)

`roi_param`/`final_bbox` are the host-side integer bbox products of
`CropDatasetHost.collate` (the only host math in the pipeline); `key`
is raw PRNGKey data for the RANSAC sampling, threaded to the program
exactly as the runners thread it — the drivers below reuse
run_inference / fleet_infer, so a fixed-batch blob's key stream (and
therefore its poses) is bit-identical to the live eval path's at the
same batch size.

Platform note: the hypothesis-stage Pallas kernel dispatches at trace
time on `jax.default_backend()` (ops/pnp_kernel.py), so a blob exported
FOR tpu FROM a cpu-default process falls back to the (identical-output,
slower) jnp hypothesis path unless use_kernel/--pallas forces it.
"""

from __future__ import annotations

import json
from typing import List, Optional, Sequence, Tuple

import numpy as np

from zebrapose_tpu.codec.lut import CorrespondenceLUT
from zebrapose_tpu.eval.evaluate import make_eval_step
from zebrapose_tpu.ops.pnp import PnPConfig

MAGIC = b"ZEBRAPOSE_SERVING_V1\n"
# blob layout: MAGIC, one JSON metadata line ({"n_models": K, ...}),
# then the jax.export payload.


def build_serving_fn(model, variables, lut: CorrespondenceLUT,
                     crop_img: int, crop_gt: int, base: int, n_bits: int,
                     resize_method: str, loss_type: str,
                     pnp_cfg: PnPConfig, ignore_bits: int = 0,
                     mask_from_dataset: bool = False,
                     use_kernel: Optional[bool] = None):
    """Close the production eval step over (variables, LUT).

    Wraps `make_eval_step` itself, so the serving graph is the
    production graph by construction — any fix or optimization to the
    eval program is exported verbatim. `mask_from_dataset` threads the
    mask-rcnn variant (detector RLE masks arrive pre-rasterized in the
    dataset's `mask` channel; that channel is not part of the serving
    signature, so the flag is rejected here — export the plain variant
    and gate decode host-side instead). use_kernel=True forces the
    Pallas hypothesis kernel into the trace (export FOR tpu FROM a
    cpu-default process otherwise bakes the slower jnp path).
    """
    import jax
    import jax.numpy as jnp

    if mask_from_dataset:
        raise ValueError(
            "mask_from_dataset consumes the dataset's rasterized GT/RLE "
            "mask channel, which is not part of the serving signature; "
            "export the network-mask variant instead")

    step = make_eval_step(
        lambda b, v: model.apply(v, b["image"], train=False), lut,
        crop_img=crop_img, crop_gt=crop_gt, base=base, n_bits=n_bits,
        resize_method=resize_method, loss_type=loss_type,
        pnp_cfg=pnp_cfg, ignore_bits=ignore_bits, preprocess_gt=False,
        use_kernel=use_kernel)
    const_vars = jax.tree.map(jnp.asarray, variables)

    def serve(rgb, roi_param, valid, final_bbox, K, key):
        raw = {"rgb": rgb, "roi_param": roi_param, "valid": valid}
        return step(raw, final_bbox, K, key, const_vars)

    return serve


def export_serving(serve_fn, batch: Optional[int],
                   image_hw: Tuple[int, int],
                   platforms: Optional[Sequence[str]] = None,
                   n_models: int = 1,
                   meta: Optional[dict] = None) -> bytes:
    """Serialize the serving program for `platforms` (default: the
    current backend) at a fixed frame shape. Returns the blob (MAGIC
    header + JSON metadata line + jax.export payload; weights make it
    checkpoint-sized). `batch` is per model; fleet programs
    (n_models > 1) take flat [n_models*batch] rows, object-major.
    batch=None exports with a SYMBOLIC batch dimension (jax.export
    shape polymorphism): one blob serves any per-model batch size, at
    the cost of one XLA compile per distinct size on the serving host."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    h, w = image_hw
    if batch is None:
        b, = jexport.symbolic_shape("b")
        rows = n_models * b
    else:
        rows = n_models * batch
    specs = (
        jax.ShapeDtypeStruct((rows, h, w, 3), jnp.uint8),
        jax.ShapeDtypeStruct((rows, 5), jnp.int32),
        jax.ShapeDtypeStruct((rows,), jnp.float32),
        jax.ShapeDtypeStruct((rows, 4), jnp.int32),
        jax.ShapeDtypeStruct((rows, 3, 3), jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),   # raw PRNGKey data
    )
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jexport.export(jax.jit(serve_fn), **kwargs)(*specs)
    header = dict(meta or {})
    header["n_models"] = n_models
    header["poly_batch"] = batch is None
    return (MAGIC + json.dumps(header).encode() + b"\n"
            + exported.serialize())


class ServingProgram:
    """A loaded serving artifact: callable with the serving signature,
    plus the shape/platform metadata recovered from the export.
    `batch` is per model (== the flat row count / n_models)."""

    def __init__(self, exported, meta: dict):
        import jax

        self._fn = jax.jit(exported.call)
        self.meta = meta
        self.n_models = int(meta.get("n_models", 1))
        self.platforms = tuple(exported.platforms)
        rows = exported.in_avals[0].shape[0]
        if isinstance(rows, int):            # fixed-batch artifact
            self.rows = rows
            self.batch = rows // self.n_models
        else:                                # symbolic (poly_batch)
            self.rows = None
            self.batch = None
        self.image_hw = tuple(int(d)
                              for d in exported.in_avals[0].shape[1:3])

    def __call__(self, *args):
        return self._fn(*args)


def load_serving(blob_or_path) -> ServingProgram:
    """Deserialize an export_serving blob (raw bytes or a filesystem
    path). Shapes must match the export exactly; pad the tail batch
    like the runners do (`serve_dataset` does)."""
    from jax import export as jexport

    if isinstance(blob_or_path, bytes):
        blob = blob_or_path
    else:
        with open(blob_or_path, "rb") as f:
            blob = f.read()
    if blob[:len(MAGIC)] != MAGIC:
        raise ValueError("not a zebrapose serving artifact (bad header)")
    rest = blob[len(MAGIC):]
    nl = rest.index(b"\n")
    meta = json.loads(rest[:nl])
    return ServingProgram(jexport.deserialize(bytearray(rest[nl + 1:])),
                          meta)


def _check_frame_size(prog: "ServingProgram", *datasets) -> None:
    """Fail with an actionable message (not a deep jax.export shape
    error) when the split's frames don't match the artifact's. For a
    roi_slice artifact (exported at the walk's buffer dims), first flip
    every dataset into roi_slice mode with the blob's baked buffer —
    set_slice_hw's guard turns an undersized buffer into a loud error
    instead of silently dropped pixels."""
    if prog.meta.get("roi_slice"):
        for ds in datasets:
            ds.enable_roi_slice(prog.image_hw)
    for ds in datasets:
        if len(ds) == 0:
            continue
        hw = tuple(ds.get_raw(0)["rgb"].shape[:2])
        if hw != prog.image_hw:
            raise ValueError(
                f"artifact was exported for frames {prog.image_hw}, "
                f"split ships {hw} — re-export with "
                f"--image_h/--image_w")


def build_fleet_serving_fn(model, variables_list: List[dict],
                           luts: List[CorrespondenceLUT],
                           crop_img: int, crop_gt: int, base: int,
                           n_bits: int, resize_method: str,
                           loss_type: str, pnp_cfg: PnPConfig,
                           use_kernel: Optional[bool] = None):
    """K per-object models in ONE artifact (the fleet_serve program:
    stacked variables + LUTs, one vmapped forward, per-object decode
    scan). Inputs are flat [K*B, ...] rows in object-major order;
    outputs are [K, B, ...]. Single-device program only — the shard_map
    multi-chip fleet path binds to a concrete mesh at trace time and is
    not a portable artifact; export one blob per slice instead."""
    import jax
    import jax.numpy as jnp

    from zebrapose_tpu.eval.fleet_serve import (make_fleet_eval_step,
                                                stack_luts,
                                                stack_variables)

    lp, lv = stack_luts(luts)
    stacked = jax.tree.map(jnp.asarray, stack_variables(variables_list))
    step = make_fleet_eval_step(
        lambda b, v: model.apply(v, b["image"], train=False), lp, lv,
        crop_img=crop_img, crop_gt=crop_gt, base=base, n_bits=n_bits,
        resize_method=resize_method, loss_type=loss_type,
        pnp_cfg=pnp_cfg, mesh=None, use_kernel=use_kernel)
    k = len(luts)

    def serve(rgb, roi_param, valid, final_bbox, K, key):
        raw = {"rgb": rgb, "roi_param": roi_param, "valid": valid}
        return step(raw, final_bbox, K, key, stacked, n_models=k)

    return serve


def _adapter_args(feed, final_bbox, K, key):
    """Marshal a runner feed into the serving signature."""
    import jax.numpy as jnp

    return (jnp.asarray(feed["rgb"]),
            jnp.asarray(np.asarray(feed["roi_param"]).astype(np.int32)),
            jnp.asarray(np.asarray(feed["valid"]).astype(np.float32)),
            jnp.asarray(final_bbox), jnp.asarray(K), jnp.asarray(key))


def serve_fleet_datasets(fn: "ServingProgram", datasets, seed: int = 0,
                         batch_size: int = 16
                         ) -> Tuple[List[np.ndarray], List[np.ndarray],
                                    List[np.ndarray]]:
    """Drive K per-object dataset walks through a loaded FLEET artifact
    — literally `fleet_infer` (lockstep, valid=0 padding, the live
    path's fold_in key stream) with the blob standing in for the jitted
    fleet step. Returns per-object (Rs, ts, ok). batch_size applies to
    poly_batch artifacts only."""
    import jax

    from zebrapose_tpu.eval.fleet_serve import fleet_infer

    if fn.n_models != len(datasets):
        raise ValueError(f"artifact serves {fn.n_models} models, got "
                         f"{len(datasets)} datasets")

    def step(feed, final_bbox, K, key, variables, n_models):
        return fn(*_adapter_args(feed, final_bbox, K, key))

    return fleet_infer(datasets, step, None, fn.batch or batch_size,
                       jax.random.PRNGKey(seed))


def run_serve_exported_fleet(cfg, obj_names: List[str], blob_path: str,
                             output_dir: str, seed: int = 0,
                             max_samples: Optional[int] = None,
                             batch_size: int = 16) -> dict:
    """Deployment-shaped fleet run: answer K objects' test splits from
    one fleet artifact; per-object BOP CSVs + one merged submission CSV
    (run_test_fleet's artifact set, minus metrics — serving is
    GT-less)."""
    import os

    from zebrapose_tpu.data.bop_writer import (merge_csv,
                                               parse_sample_ids,
                                               write_csv)
    from zebrapose_tpu.eval.runner import prepare_object_eval

    prog = load_serving(blob_path)
    if prog.n_models != len(obj_names):
        raise ValueError(f"artifact serves {prog.n_models} models, got "
                         f"{len(obj_names)} object names")
    shared = None
    if not cfg.bop_challange:
        from zebrapose_tpu.data import bop_io
        shared = bop_io.get_dataset(cfg.bop_path, cfg.dataset_name,
                                    train=False, eval_model=True,
                                    data_folder=cfg.test_folder)
    oes = [prepare_object_eval(cfg, n, max_samples=max_samples,
                               samples=shared) for n in obj_names]
    for name, oe in zip(obj_names, oes):
        if len(oe.dataset) == 0:
            raise ValueError(f"object {name}: empty eval split")
    _check_frame_size(prog, *[oe.dataset for oe in oes])
    Rs, ts, ok = serve_fleet_datasets(prog, [oe.dataset for oe in oes],
                                      seed=seed, batch_size=batch_size)

    os.makedirs(output_dir, exist_ok=True)
    csvs = []
    solved = {}
    for i, (name, oe) in enumerate(zip(obj_names, oes)):
        for j in range(len(oe.dataset)):
            if not ok[i][j]:  # reference: identity R / zero t in CSV
                Rs[i][j] = np.eye(3)
                ts[i][j] = 0
        ids = parse_sample_ids(oe.dataset.rgb_files)
        csvs.append(write_csv(
            os.path.join(output_dir, "pose_result_bop"),
            f"{cfg.dataset_name}_{name}", oe.obj_id,
            [s for s, _ in ids], [im for _, im in ids], list(Rs[i]),
            [t.reshape(3, 1) for t in ts[i]],
            oe.scores if oe.scores is not None
            else [1.0] * len(oe.dataset)))
        solved[name] = int(ok[i].sum())
    merged = merge_csv(csvs, os.path.join(
        output_dir, f"{cfg.dataset_name}_fleet.csv"))
    return {"solved": solved,
            "instances": {n: int(len(oe.dataset))
                          for n, oe in zip(obj_names, oes)},
            "batch": prog.batch, "merged_csv": merged}


def run_serve_exported(cfg, obj_name: str, blob_path: str,
                       output_dir: str, seed: int = 0,
                       max_samples: Optional[int] = None,
                       batch_size: int = 16) -> dict:
    """Deployment-shaped run: walk the configured test split with the
    detections the config names, answer every instance from the serving
    blob alone (no checkpoint, no model build), write the BOP CSV.

    The dataset walk, key stream, tail padding and failed-pose rows
    (identity R / zero t) all match `run_test`'s, so a fixed-batch blob
    exported from the same checkpoint at run_test's batch size and
    model dtype reproduces its CSV byte-for-byte."""
    import os

    from zebrapose_tpu.data.bop_writer import parse_sample_ids, write_csv
    from zebrapose_tpu.eval.runner import prepare_object_eval

    prog = load_serving(blob_path)
    oe = prepare_object_eval(cfg, obj_name, max_samples=max_samples)
    _check_frame_size(prog, oe.dataset)
    Rs, ts, ok = serve_dataset(prog, oe.dataset, seed=seed,
                               batch_size=batch_size)

    os.makedirs(output_dir, exist_ok=True)
    for j in range(len(oe.dataset)):
        if not ok[j]:  # reference: identity R / zero t in the CSV
            Rs[j] = np.eye(3)
            ts[j] = 0
    ids = parse_sample_ids(oe.dataset.rgb_files)
    scores = (oe.scores if oe.scores is not None
              else [1.0] * len(oe.dataset))
    write_csv(os.path.join(output_dir, "pose_result_bop"),
              f"{cfg.dataset_name}_{obj_name}", oe.obj_id,
              [s for s, _ in ids], [i for _, i in ids], list(Rs),
              [t.reshape(3, 1) for t in ts], scores)
    return {"instances": int(len(oe.dataset)), "solved": int(ok.sum()),
            "batch": prog.batch, "platforms": list(prog.platforms)}


def _vivo_dataset_for(cfg, obj_name: str, score_threshold: float):
    """Shared vivo walk for the blob drivers: images from
    scene_camera.json + the config's detections, flattened to one
    object's (image, instance) dataset (eval/vivo.py)."""
    import os

    from zebrapose_tpu.data import bop_io
    from zebrapose_tpu.data import detections as det_mod
    from zebrapose_tpu.data.dataset_info import lookup_obj_id
    from zebrapose_tpu.eval.vivo import build_vivo_dataset

    rgb_files, cam_by_file = bop_io.list_images_with_cameras(
        cfg.bop_path, cfg.dataset_name, data_folder=cfg.test_folder)
    dets = det_mod.load_detections(cfg.Detection_reaults)
    obj_id = lookup_obj_id(cfg.dataset_name, obj_name)
    dataset, scores = build_vivo_dataset(
        os.path.join(cfg.bop_path, cfg.dataset_name), cfg.test_folder,
        rgb_files, cam_by_file, dets, obj_id, score_threshold,
        crop_size_img=cfg.BoundingBox_CropSize_image,
        crop_size_gt=cfg.BoundingBox_CropSize_GT,
        padding_ratio=cfg.padding_ratio,
        resize_method=cfg.resize_method)
    return obj_id, dataset, scores


def run_serve_exported_vivo(cfg, obj_name: str, blob_path: str,
                            output_dir: str, seed: int = 0,
                            score_threshold: float = 0.2,
                            batch_size: int = 16) -> dict:
    """Deployment-shaped multi-instance run: walk the split's images
    from scene_camera.json + detections alone (GT-less, reference
    test_vivo.py:127-131 semantics) and answer every detected instance
    of the object from the serving blob. The CSV carries detector
    scores with failed instances dropped (evaluate_vivo semantics).
    The blob's baked-in mask head gates the decode — its signature has
    no dataset-mask input, so the --mask_rcnn variant needs the live
    `vivo` command."""
    import os

    from zebrapose_tpu.data.bop_writer import parse_sample_ids, write_csv

    prog = load_serving(blob_path)
    if getattr(prog, "n_models", 1) != 1:
        raise ValueError("fleet artifact: use run_serve_exported_vivo_"
                         "fleet / serve-exported-fleet --vivo")
    obj_id, dataset, scores = _vivo_dataset_for(cfg, obj_name,
                                                score_threshold)
    _check_frame_size(prog, dataset)
    Rs, ts, ok = serve_dataset(prog, dataset, seed=seed,
                               batch_size=batch_size)

    os.makedirs(output_dir, exist_ok=True)
    out_scores = [s if k else -1 for s, k in zip(scores, ok)]
    ids = parse_sample_ids(dataset.rgb_files)
    write_csv(os.path.join(output_dir, "pose_result_bop"),
              f"{cfg.dataset_name}_{obj_name}", obj_id,
              [s for s, _ in ids], [i for _, i in ids], list(Rs),
              [t.reshape(3, 1) for t in ts], out_scores)
    return {"instances": int(len(dataset)), "solved": int(ok.sum()),
            "batch": prog.batch, "platforms": list(prog.platforms)}


def run_serve_exported_vivo_fleet(cfg, obj_names: List[str],
                                  blob_path: str, output_dir: str,
                                  seed: int = 0,
                                  score_threshold: float = 0.2,
                                  batch_size: int = 16) -> dict:
    """Multi-instance fleet run from one fleet artifact. The blob bakes
    exactly n_models models on its model axis, so every object must
    have at least one detected instance — an empty object cannot be
    skipped without breaking the axis correspondence (lower the
    threshold, or use the live `vivo-fleet` which skips empties)."""
    import os

    from zebrapose_tpu.data.bop_writer import (merge_csv,
                                               parse_sample_ids,
                                               write_csv)

    prog = load_serving(blob_path)
    if prog.n_models != len(obj_names):
        raise ValueError(f"artifact serves {prog.n_models} models, got "
                         f"{len(obj_names)} object names")
    walks = [_vivo_dataset_for(cfg, n, score_threshold)
             for n in obj_names]
    for name, (_, ds, _) in zip(obj_names, walks):
        if len(ds) == 0:
            raise ValueError(
                f"object {name}: no detection above score "
                f"{score_threshold}; a fleet blob cannot skip an object "
                "(fixed model axis) — lower the threshold or use the "
                "live vivo-fleet command")
    _check_frame_size(prog, *[ds for _, ds, _ in walks])
    Rs, ts, ok = serve_fleet_datasets(prog, [ds for _, ds, _ in walks],
                                      seed=seed, batch_size=batch_size)

    os.makedirs(output_dir, exist_ok=True)
    csvs = []
    per_object = {}
    for i, (name, (obj_id, dataset, scores)) in enumerate(
            zip(obj_names, walks)):
        out_scores = [s if k else -1 for s, k in zip(scores, ok[i])]
        ids = parse_sample_ids(dataset.rgb_files)
        csvs.append(write_csv(
            os.path.join(output_dir, "pose_result_bop"),
            f"{cfg.dataset_name}_{name}", obj_id,
            [s for s, _ in ids], [im for _, im in ids], list(Rs[i]),
            [t.reshape(3, 1) for t in ts[i]], out_scores))
        per_object[name] = {"instances": int(len(dataset)),
                            "solved": int(ok[i].sum())}
    merged = merge_csv(csvs, os.path.join(
        output_dir, f"{cfg.dataset_name}_vivo_fleet.csv"))
    return {"per_object": per_object, "batch": prog.batch,
            "merged_csv": merged}


def serve_dataset(fn, dataset, seed: int = 0,
                  batch_size: int = 16) -> Tuple[
        np.ndarray, np.ndarray, np.ndarray]:
    """Run a CropDatasetHost walk through a loaded serving program —
    literally `run_inference` (producer-thread collate pipelining,
    valid=0 tail padding, the live path's fold_in(PRNGKey(seed), start)
    key stream) with the blob standing in for the jitted eval step, so
    a fixed-batch blob reproduces run_test's poses bit-for-bit at the
    same batch size. Returns (R [N,3,3], t [N,3], success [N]).
    batch_size applies to poly_batch artifacts only (fixed-batch blobs
    dictate their own)."""
    from zebrapose_tpu.eval.evaluate import run_inference

    if getattr(fn, "n_models", 1) != 1:
        raise ValueError("fleet artifact: use serve_fleet_datasets")

    def step(feed, final_bbox, K, key, variables):
        return fn(*_adapter_args(feed, final_bbox, K, key))

    return run_inference(dataset, step,
                         batch_size=fn.batch or batch_size, seed=seed)
