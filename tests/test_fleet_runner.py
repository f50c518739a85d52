"""run_test_fleet integration: K=2 objects over a synthetic BOP tree
with converted reference-format checkpoints — exercises the per-object
dataset assembly, lockstep batching with unequal split lengths (pure
valid=0 padding batches for the shorter object), the single fleet
program, and per-object + merged artifacts."""

import json
import os

import cv2
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracle import ReferenceNet
from zebrapose_tpu.config import ZebraConfig
from zebrapose_tpu.eval.fleet_serve import run_test_fleet
from zebrapose_tpu.ops.pnp import PnPConfig

H, W = 96, 128
K_LIST = [400.0, 0.0, 64.0, 0.0, 400.0, 48.0, 0.0, 0.0, 1.0]
OBJS = (1, 6)  # lmo: ape, cat


@pytest.fixture()
def fleet_tree(tmp_path):
    ds = tmp_path / "bop" / "lmo"
    from zebrapose_tpu.data.bop_io import save_ply
    rng = np.random.default_rng(141)
    pts = rng.uniform(-30, 30, (60, 3)).astype(np.float32)
    faces = np.array([[i, (i + 1) % 60, (i + 7) % 60] for i in range(40)])
    info = {str(o): {"diameter": 75.0} for o in OBJS}
    for d in ("models", "models_eval"):
        (ds / d).mkdir(parents=True)
        for o in OBJS:
            save_ply(str(ds / d / f"obj_{o:06d}.ply"), pts, faces=faces)
        (ds / d / "models_info.json").write_text(json.dumps(info))
    (ds / "camera.json").write_text(json.dumps(
        {"cx": 64.0, "cy": 48.0, "fx": 400.0, "fy": 400.0,
         "width": W, "height": H, "depth_scale": 1.0}))
    (ds / "models_GT_color").mkdir()
    n_cls = 2 ** 16
    for o in OBJS:
        with open(ds / "models_GT_color" /
                  f"Class_CorresPoint{o:06d}.txt", "w") as f:
            f.write(f"{n_cls} 2 16\n")
            for i in range(0, n_cls, 997):
                p = rng.uniform(-30, 30, 3)
                f.write(f"{i} {p[0]} {p[1]} {p[2]}\n")

    scene = ds / "test" / "000002"
    (scene / "rgb").mkdir(parents=True)
    (scene / "mask").mkdir()
    (scene / "mask_visib").mkdir()
    gt_dir = ds / "test_GT_v2" / "000002"
    gt_dir.mkdir(parents=True)
    cam, gt, gti = {}, {}, {}
    for im in range(3):
        cv2.imwrite(str(scene / "rgb" / f"{im:06d}.png"),
                    rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
        gt[str(im)], gti[str(im)] = [], []
        # object 6 appears only in the first 2 images -> its dataset is
        # SHORTER than object 1's (lockstep padding path)
        present = OBJS if im < 2 else OBJS[:1]
        for gi, o in enumerate(present):
            m = np.zeros((H, W), np.uint8)
            m[30:70, 40:90] = 255
            cv2.imwrite(str(scene / "mask" / f"{im:06d}_{gi:06d}.png"), m)
            cv2.imwrite(str(scene / "mask_visib" /
                            f"{im:06d}_{gi:06d}.png"), m)
            cv2.imwrite(str(gt_dir / f"{im:06d}_{gi:06d}.png"),
                        rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
            gt[str(im)].append({"cam_R_m2c": list(np.eye(3).reshape(-1)),
                                "cam_t_m2c": [0, 0, 500.0], "obj_id": o})
            gti[str(im)].append({"bbox_visib": [40, 30, 50, 40],
                                 "visib_fract": 0.9})
        cam[str(im)] = {"cam_K": K_LIST, "depth_scale": 1.0}
    (scene / "scene_camera.json").write_text(json.dumps(cam))
    (scene / "scene_gt.json").write_text(json.dumps(gt))
    (scene / "scene_gt_info.json").write_text(json.dumps(gti))
    return str(tmp_path / "bop")


def test_run_test_fleet(fleet_tree, tmp_path):
    ckpts = []
    for seed, _o in enumerate(OBJS):
        torch.manual_seed(seed)
        net = ReferenceNet(variant="v2", code_len=16)
        p = str(tmp_path / f"ckpt{seed}.pth")
        torch.save({"model_state_dict": net.state_dict()}, p)
        ckpts.append(p)

    cfg = ZebraConfig.from_dict({
        "bop_path": fleet_tree, "dataset_name": "lmo",
        "test_folder": "test", "Detection_reaults": "none",
        "BoundingBox_CropSize_image": 64,
        "BoundingBox_CropSize_GT": 32,
        "divide_number_each_itration": 2, "number_of_itration": 16,
        "refine": False,
    })
    out_dir = str(tmp_path / "out")
    res = run_test_fleet(
        cfg, ["ape", "cat"], ckpts, out_dir, batch_size=2,
        pnp_cfg=PnPConfig(n_hypotheses=16, max_points=256))

    assert set(res["per_object"]) == {"ape", "cat"}
    for name in ("ape", "cat"):
        m = res["per_object"][name]
        assert 0.0 <= m["ADD_recall_0.1d"] <= 1.0
        assert os.path.exists(os.path.join(
            out_dir, "pose_result_bop", f"lmo_{name}.csv"))
    # merged submission: header + 3 (ape) + 2 (cat) rows
    merged = open(res["merged_csv"]).read().splitlines()
    assert len(merged) == 1 + 3 + 2
    assert {int(r.split(",")[2]) for r in merged[1:]} == set(OBJS)

    # checkpoint count mismatch is loud
    with pytest.raises(ValueError, match="one checkpoint per object"):
        run_test_fleet(cfg, ["ape", "cat"], ckpts[:1], out_dir)

    # roi_slice (fleet-wide shared buffer) must reproduce the poses
    # bit-for-bit: same CSV bytes
    out2 = str(tmp_path / "out_rslice")
    res2 = run_test_fleet(
        cfg, ["ape", "cat"], ckpts, out2, batch_size=2,
        pnp_cfg=PnPConfig(n_hypotheses=16, max_points=256),
        roi_slice=True)
    assert open(res2["merged_csv"]).read() == \
        open(res["merged_csv"]).read()


def test_run_test_fleet_refine_path(fleet_tree, tmp_path, monkeypatch):
    """cfg.refine on the fleet runner: the fleet program returns each
    object's own mask heads and refine_poses runs once per object with
    per-object-length mask stacks (reference refine path test.py:276-313,
    previously a single-object-only capability)."""
    import zebrapose_tpu.eval.runner as runner_mod

    ckpts = []
    for seed, _o in enumerate(OBJS):
        torch.manual_seed(10 + seed)
        net = ReferenceNet(variant="v2", code_len=16)
        p = str(tmp_path / f"ckpt_r{seed}.pth")
        torch.save({"model_state_dict": net.state_dict()}, p)
        ckpts.append(p)

    calls = []
    real = runner_mod.refine_poses

    def recording(dataset, Rs, ts, ok, vis, ent, *a, **kw):
        calls.append((len(dataset), vis.shape, ent.shape))
        return real(dataset, Rs, ts, ok, vis, ent, *a, **kw)

    monkeypatch.setattr(runner_mod, "refine_poses", recording)

    cfg = ZebraConfig.from_dict({
        "bop_path": fleet_tree, "dataset_name": "lmo",
        "test_folder": "test", "Detection_reaults": "none",
        "BoundingBox_CropSize_image": 64,
        "BoundingBox_CropSize_GT": 32,
        "divide_number_each_itration": 2, "number_of_itration": 16,
        "refine": True,
    })
    out_dir = str(tmp_path / "out_refine")
    res = run_test_fleet(
        cfg, ["ape", "cat"], ckpts, out_dir, batch_size=2,
        pnp_cfg=PnPConfig(n_hypotheses=16, max_points=256))

    # one refine pass per object, masks trimmed to each true length
    assert [(c[0],) + c[1] for c in calls] == \
        [(3, 3, 32, 32), (2, 2, 32, 32)]
    assert set(res["per_object"]) == {"ape", "cat"}
    merged = open(res["merged_csv"]).read().splitlines()
    assert len(merged) == 1 + 3 + 2


def test_run_test_fleet_debug_dumps(fleet_tree, tmp_path):
    """debug=True on the fleet runner writes the single-object debug
    artifact set per object under debug/<obj_name>/ (reference
    test.py:315-441; run_test --debug parity via the shared
    dump_debug_set helper)."""
    ckpts = []
    for seed, _o in enumerate(OBJS):
        torch.manual_seed(seed)
        net = ReferenceNet(variant="v2", code_len=16)
        p = str(tmp_path / f"ckpt{seed}.pth")
        torch.save({"model_state_dict": net.state_dict()}, p)
        ckpts.append(p)
    cfg = ZebraConfig.from_dict({
        "bop_path": fleet_tree, "dataset_name": "lmo",
        "test_folder": "test", "Detection_reaults": "none",
        "BoundingBox_CropSize_image": 64,
        "BoundingBox_CropSize_GT": 32,
        "divide_number_each_itration": 2, "number_of_itration": 16,
        "refine": False,
    })
    out_dir = str(tmp_path / "out_debug")
    res = run_test_fleet(
        cfg, ["ape", "cat"], ckpts, out_dir, batch_size=2,
        pnp_cfg=PnPConfig(n_hypotheses=16, max_points=256),
        debug=True)
    assert set(res["per_object"]) == {"ape", "cat"}
    for name, n in (("ape", 3), ("cat", 2)):
        dbg = os.path.join(out_dir, "debug", name)
        assert os.path.isdir(dbg), f"missing debug dir for {name}"
        for i in range(n):
            assert os.path.exists(
                os.path.join(dbg, f"{i:06d}_mask.png"))
            assert os.path.exists(
                os.path.join(dbg, f"{i:06d}_code_err.png"))
        # GT poses exist in the fixture -> gt overlays render
        assert os.path.exists(
            os.path.join(dbg, "000000_pose_gt.png"))
