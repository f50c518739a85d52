"""Vivo (multi-instance) walks answered from serving blobs:
run_serve_exported_vivo / run_serve_exported_vivo_fleet drive the
GT-less image walk + detection flattening against an AOT artifact —
score-carrying CSVs, fleet model-axis guards."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_fleet_runner import fleet_tree  # noqa: F401 (fixture)
from zebrapose_tpu.codec.lut import CorrespondenceLUT
from zebrapose_tpu.config import ZebraConfig
from zebrapose_tpu.eval.export_serving import (
    build_fleet_serving_fn,
    build_serving_fn,
    export_serving,
    run_serve_exported_vivo,
    run_serve_exported_vivo_fleet,
)
from zebrapose_tpu.models.zebra_net import ZebraPoseNet
from zebrapose_tpu.ops.pnp import PnPConfig

H, W = 96, 128
N_BITS = 16
PNP = PnPConfig(n_hypotheses=16, max_points=256)


def _model_and_vars(seed=0):
    model = ZebraPoseNet(binary_code_length=N_BITS, variant="v2",
                         concat=True)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           train=False)
    return model, variables


def _lut(seed):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-30, 30, (2 ** N_BITS, 3)).astype(np.float32)
    return CorrespondenceLUT(pts, np.ones((2 ** N_BITS,), bool),
                             base=2, n_digits=N_BITS)


def _cfg(fleet_tree, det_fn):  # noqa: F811
    return ZebraConfig.from_dict({
        "bop_path": fleet_tree, "dataset_name": "lmo",
        "test_folder": "test", "Detection_reaults": det_fn,
        "BoundingBox_CropSize_image": 64,
        "BoundingBox_CropSize_GT": 32,
        "divide_number_each_itration": 2, "number_of_itration": 16,
    })


def _dets(tmp_path, with_cat=True):
    dets = {"2/0": [
        {"obj_id": 1, "bbox_est": [40, 30, 50, 40], "score": 0.95},
        {"obj_id": 1, "bbox_est": [45, 35, 40, 30], "score": 0.70},
    ], "2/1": [
        {"obj_id": 1, "bbox_est": [40, 30, 50, 40], "score": 0.60},
    ]}
    if with_cat:
        dets["2/0"].append(
            {"obj_id": 6, "bbox_est": [40, 30, 50, 40], "score": 0.90})
    fn = str(tmp_path / ("dets.json" if with_cat else "dets_nocat.json"))
    with open(fn, "w") as f:
        json.dump(dets, f)
    return fn


def test_serve_exported_vivo(fleet_tree, tmp_path):  # noqa: F811
    model, variables = _model_and_vars()
    serve = build_serving_fn(
        model, variables, _lut(1), crop_img=64, crop_gt=32, base=2,
        n_bits=N_BITS, resize_method="crop_square_resize",
        loss_type="BCE", pnp_cfg=PNP)
    blob_fn = str(tmp_path / "ape.serving")
    with open(blob_fn, "wb") as f:
        f.write(export_serving(serve, batch=2, image_hw=(H, W)))

    cfg = _cfg(fleet_tree, _dets(tmp_path))
    out = str(tmp_path / "out")
    res = run_serve_exported_vivo(cfg, "ape", blob_fn, out, seed=3)
    assert res["instances"] == 3
    csv = os.path.join(out, "pose_result_bop", "lmo_ape.csv")
    rows = open(csv).read().splitlines()
    # vivo semantics: failed instances dropped, solved carry det scores
    assert len(rows) == 1 + res["solved"]
    for r in rows[1:]:
        assert float(r.split(",")[3]) in (0.95, 0.70, 0.60)


def test_serve_exported_vivo_fleet_and_guards(fleet_tree, tmp_path):  # noqa: F811
    model, v1 = _model_and_vars(0)
    _, v2 = _model_and_vars(1)
    luts = [_lut(1), _lut(2)]
    serve = build_fleet_serving_fn(
        model, [v1, v2], luts, crop_img=64, crop_gt=32, base=2,
        n_bits=N_BITS, resize_method="crop_square_resize",
        loss_type="BCE", pnp_cfg=PNP)
    blob_fn = str(tmp_path / "fleet.serving")
    with open(blob_fn, "wb") as f:
        f.write(export_serving(serve, batch=2, image_hw=(H, W),
                               n_models=2))

    cfg = _cfg(fleet_tree, _dets(tmp_path))
    out = str(tmp_path / "out_fleet")
    res = run_serve_exported_vivo_fleet(cfg, ["ape", "cat"], blob_fn,
                                        out, seed=3)
    assert res["per_object"]["ape"]["instances"] == 3
    assert res["per_object"]["cat"]["instances"] == 1
    merged = open(res["merged_csv"]).read().splitlines()
    n_solved = sum(res["per_object"][n]["solved"] for n in ("ape", "cat"))
    assert len(merged) == 1 + n_solved

    # a fleet blob is rejected by the single-object vivo driver
    with pytest.raises(ValueError, match="fleet artifact"):
        run_serve_exported_vivo(cfg, "ape", blob_fn, out)

    # object-count mismatch vs the blob's model axis is loud
    with pytest.raises(ValueError, match="serves 2 models"):
        run_serve_exported_vivo_fleet(cfg, ["ape"], blob_fn, out)

    # an object with no instances cannot be skipped from a fleet blob
    cfg_nocat = _cfg(fleet_tree, _dets(tmp_path, with_cat=False))
    with pytest.raises(ValueError, match="cannot skip"):
        run_serve_exported_vivo_fleet(cfg_nocat, ["ape", "cat"],
                                      blob_fn, out)
