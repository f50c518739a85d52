"""run_vivo_fleet integration: K objects' detected instances answered
by one fleet program over a synthetic BOP tree — exercises the shared
image walk, per-object instance flattening with unequal counts
(lockstep padding), the skipped-empty-object path, and the per-object +
merged CSV artifacts with detector scores."""

import json
import os

import pytest

torch = pytest.importorskip("torch")

from test_fleet_runner import fleet_tree  # noqa: F401 (fixture)
from torch_oracle import ReferenceNet
from zebrapose_tpu.config import ZebraConfig
from zebrapose_tpu.eval.fleet_serve import run_vivo_fleet
from zebrapose_tpu.ops.pnp import PnPConfig


def test_run_vivo_fleet(fleet_tree, tmp_path):  # noqa: F811
    # ape (obj 1): two instances in image 0 + one in image 1 = 3;
    # cat (obj 6): one instance in image 0 = 1 (shorter -> padding);
    # duck (obj 9): nothing above threshold -> skipped with a warning
    dets = {"2/0": [
        {"obj_id": 1, "bbox_est": [40, 30, 50, 40], "score": 0.95},
        {"obj_id": 1, "bbox_est": [45, 35, 40, 30], "score": 0.70},
        {"obj_id": 6, "bbox_est": [40, 30, 50, 40], "score": 0.90},
        {"obj_id": 9, "bbox_est": [10, 10, 20, 20], "score": 0.05},
    ], "2/1": [
        {"obj_id": 1, "bbox_est": [40, 30, 50, 40], "score": 0.60},
    ]}
    det_fn = str(tmp_path / "dets.json")
    with open(det_fn, "w") as f:
        json.dump(dets, f)

    ckpts = []
    for seed in range(2):
        torch.manual_seed(seed)
        net = ReferenceNet(variant="v2", code_len=16)
        p = str(tmp_path / f"ckpt{seed}.pth")
        torch.save({"model_state_dict": net.state_dict()}, p)
        ckpts.append(p)
    ckpts.append(ckpts[0])  # duck's ckpt is never loaded (skipped)

    cfg = ZebraConfig.from_dict({
        "bop_path": fleet_tree, "dataset_name": "lmo",
        "test_folder": "test", "Detection_reaults": det_fn,
        "BoundingBox_CropSize_image": 64,
        "BoundingBox_CropSize_GT": 32,
        "divide_number_each_itration": 2, "number_of_itration": 16,
    })
    out_dir = str(tmp_path / "out")
    res = run_vivo_fleet(
        cfg, ["ape", "cat", "duck"], ckpts, out_dir, batch_size=2,
        pnp_cfg=PnPConfig(n_hypotheses=16, max_points=256))

    assert set(res["per_object"]) == {"ape", "cat", "duck"}
    assert res["per_object"]["ape"]["instances"] == 3
    assert res["per_object"]["cat"]["instances"] == 1
    assert res["per_object"]["duck"] == {"instances": 0, "solved": 0,
                                         "solve_rate": 0.0}
    for name in ("ape", "cat"):
        assert os.path.exists(os.path.join(
            out_dir, "pose_result_bop", f"lmo_{name}.csv"))
    assert not os.path.exists(os.path.join(
        out_dir, "pose_result_bop", "lmo_duck.csv"))

    # vivo CSV semantics (evaluate_vivo / reference test_vivo.py:187-190):
    # failed instances are dropped (score -1 rows filtered by write_csv),
    # solved rows carry the detector score
    merged = open(res["merged_csv"]).read().splitlines()
    n_solved = sum(res["per_object"][n]["solved"] for n in ("ape", "cat"))
    assert len(merged) == 1 + n_solved
    for row in merged[1:]:
        assert int(row.split(",")[2]) in (1, 6)
        assert float(row.split(",")[3]) in (0.95, 0.70, 0.90, 0.60)

    with pytest.raises(ValueError, match="one checkpoint per object"):
        run_vivo_fleet(cfg, ["ape", "cat"], ckpts[:1], out_dir)
