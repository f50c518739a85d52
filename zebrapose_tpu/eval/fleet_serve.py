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
                         mesh: Optional[Mesh] = None):
    """Build the jitted fleet batch program.

    step(raw, final_bbox, Ks, key, variables, n_models) -> (R [K,B,3,3],
    t [K,B,3], success [K,B], n_inliers [K,B]). `raw` leaves are FLAT
    [K*B, ...] in object-major order; `variables` is the stacked tree
    (stack_variables); object k's results reproduce the single-object
    make_eval_step called with fold_in(key, k).
    """
    lp = jnp.asarray(lut_points)
    lv = jnp.asarray(lut_valid)

    def local(raw, final_bbox, Ks, obj_keys, variables, lp_l, lv_l):
        k_l = obj_keys.shape[0]
        batch = preprocess_batch(
            raw, obj_keys[0], crop_img=crop_img, crop_gt=crop_gt,
            base=base, n_bits=n_bits, is_train=False,
            resize_method=resize_method, include_gt=preprocess_gt)
        batch = jax.tree.map(
            lambda x: x.reshape((k_l, -1) + x.shape[1:]), batch)
        out = jax.vmap(forward_fn)(batch, variables)

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
                bbox_size=crop_gt, base=base, cfg=pnp_cfg)

        _, poses = jax.lax.scan(
            body, None, (masks, codes, valid, bboxes, Kk, lp_l, lv_l,
                         obj_keys))
        return poses

    @partial(jax.jit, static_argnames=("n_models",))
    def step(raw, final_bbox, Ks, key, variables, n_models: int):
        obj_keys = jax.vmap(partial(jax.random.fold_in, key))(
            jnp.arange(n_models))
        if mesh is None or mesh.devices.size == 1:
            return local(raw, final_bbox, Ks, obj_keys, variables, lp, lv)
        spec = P(MODEL_AXIS)
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(spec,) * 7,
            out_specs=(spec, spec, spec, spec))(
                raw, final_bbox, Ks, obj_keys, variables, lp, lv)

    return step
