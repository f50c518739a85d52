"""Data-layer tests over a synthetic on-disk BOP dataset."""

import json
import os

import cv2
import numpy as np
import pytest

from zebrapose_tpu.data.bop_io import (
    get_bop_challenge_test_data,
    get_dataset,
    load_ply,
    load_scene_camera,
    save_ply,
)
from zebrapose_tpu.data.bop_writer import (
    merge_csv,
    parse_sample_ids,
    write_csv,
)
from zebrapose_tpu.data.dataset_info import (
    get_obj_info,
    get_sym_obj_ids,
    is_symmetric,
)
from zebrapose_tpu.data.detections import (
    all_instances,
    best_bboxes,
    best_scores,
    keyframe_indices,
)

K_LIST = [572.4114, 0.0, 325.2611, 0.0, 573.57043, 242.04899, 0, 0, 1.0]


@pytest.fixture()
def bop_root(tmp_path):
    """Minimal lmo-layout dataset: 2 objects, 1 scene, 2 images."""
    root = tmp_path / "bop"
    ds = root / "lmo"
    for models in ("models", "models_eval"):
        mdir = ds / models
        mdir.mkdir(parents=True)
        info = {}
        for oid in (1, 2):
            pts = np.random.default_rng(oid).uniform(
                -30, 30, (20, 3)).astype(np.float32)
            save_ply(str(mdir / f"obj_{oid:06d}.ply"), pts)
            info[str(oid)] = {"diameter": 100.0 + oid}
        (mdir / "models_info.json").write_text(json.dumps(info))
    (ds / "camera.json").write_text(json.dumps(
        {"cx": 325.26, "cy": 242.04, "fx": 572.41, "fy": 573.57,
         "width": 640, "height": 480, "depth_scale": 1.0}))

    scene = ds / "test" / "000002"
    (scene / "rgb").mkdir(parents=True)
    (scene / "mask").mkdir()
    (scene / "mask_visib").mkdir()
    cam, gt, gti = {}, {}, {}
    for im in (0, 1):
        img = np.full((480, 640, 3), 100 + im, np.uint8)
        cv2.imwrite(str(scene / "rgb" / f"{im:06d}.png"), img)
        cam[str(im)] = {"cam_K": K_LIST, "depth_scale": 1.0}
        insts, infos = [], []
        for counter, oid in enumerate((1, 2)):
            m = np.zeros((480, 640), np.uint8)
            m[100:200, 150:260] = 255
            cv2.imwrite(str(scene / "mask" /
                            f"{im:06d}_{counter:06d}.png"), m)
            cv2.imwrite(str(scene / "mask_visib" /
                            f"{im:06d}_{counter:06d}.png"), m)
            insts.append({"cam_R_m2c": list(np.eye(3).reshape(-1)),
                          "cam_t_m2c": [0.0, 0.0, 600.0], "obj_id": oid})
            # obj 2 in image 1 falls below the visib threshold
            vis = 0.05 if (oid == 2 and im == 1) else 0.9
            infos.append({"bbox_visib": [150, 100, 110, 100],
                          "visib_fract": vis})
        gt[str(im)] = insts
        gti[str(im)] = infos
    (scene / "scene_camera.json").write_text(json.dumps(cam))
    (scene / "scene_gt.json").write_text(json.dumps(gt))
    (scene / "scene_gt_info.json").write_text(json.dumps(gti))

    (ds / "test_targets_bop19.json").write_text(json.dumps([
        {"scene_id": 2, "im_id": 0, "obj_id": 1, "inst_count": 1},
        {"scene_id": 2, "im_id": 1, "obj_id": 1, "inst_count": 1},
    ]))
    return str(root)


def test_registry_facts():
    names, syms = get_obj_info("lmo")
    assert names["ape"] == 1 and names["phone"] == 15
    assert is_symmetric("lmo", "eggbox") and not is_symmetric("lmo", "ape")
    assert get_sym_obj_ids("ycbv") == [13, 16, 19, 20, 21]
    assert len(get_obj_info("tless")[1]) == 30
    assert get_sym_obj_ids("tudl") == []
    assert 1 not in get_sym_obj_ids("itodd") and 2 in get_sym_obj_ids(
        "itodd")
    with pytest.raises(ValueError):
        get_obj_info("nope")


def test_get_dataset_per_obj_and_visib_filter(bop_root):
    s = get_dataset(bop_root, "lmo", train=False, data_folder="test")
    assert len(s.rgb_files) == 15  # lmo pads to 15 object slots
    assert len(s.rgb_files[0]) == 2          # obj 1 in both images
    assert len(s.rgb_files[1]) == 1          # obj 2 filtered in image 1
    rgb, mask, maskv, gts, gtis, cams = s.for_obj(1)
    assert gts[0]["obj_id"] == 1
    np.testing.assert_allclose(cams[0]["cam_K"][0, 0], 572.4114)
    assert s.model_info["1"]["diameter"] == 101.0
    assert os.path.exists(s.model_plys[1])


def test_train_visib_threshold_applies(bop_root):
    s = get_dataset(bop_root, "lmo", train=True, data_folder="test",
                    train_obj_visible_theshold=0.95)
    assert len(s.rgb_files[0]) == 0  # 0.9 <= 0.95 -> everything filtered


def test_challenge_targets(bop_root):
    s = get_bop_challenge_test_data(bop_root, "lmo", target_obj_id=1)
    assert len(s.rgb_files[0]) == 2
    assert s.gts[0][0]["obj_id"] == 1
    assert len(s.rgb_files[1]) == 0  # only obj 1 targeted


def test_ply_roundtrip(tmp_path):
    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    colors = np.arange(30, dtype=np.uint8).reshape(10, 3)
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    p = str(tmp_path / "m.ply")
    save_ply(p, pts, colors, faces)
    m = load_ply(p)
    np.testing.assert_allclose(m["pts"], pts)
    np.testing.assert_array_equal(m["colors"], colors)
    np.testing.assert_array_equal(m["faces"], faces)


def test_detections_roundtrip(bop_root):
    rgb_fns = [f"{bop_root}/lmo/test/000002/rgb/000000.png",
               f"{bop_root}/lmo/test/000002/rgb/000001.png"]
    det = {"2/0": [{"obj_id": 1, "bbox_est": [10, 20, 30, 40],
                    "score": 0.9},
                   {"obj_id": 1, "bbox_est": [11, 21, 31, 41],
                    "score": 0.7},
                   {"obj_id": 2, "bbox_est": [1, 2, 3, 4], "score": 0.95}],
           "2/1": [{"obj_id": 1, "bbox_est": [5, 6, 7, 8],
                    "score": 0.15}]}
    bb = best_bboxes(det, rgb_fns, obj_id=1, score_thr=0.2)
    assert bb[0].tolist() == [10, 20, 30, 40]
    assert bb[1] is None
    sc = best_scores(det, rgb_fns, obj_id=1, score_thr=0.2)
    assert sc == [0.9, -1.0]
    vivo = all_instances(det, rgb_fns, obj_id=1, score_thr=0.2)
    assert len(vivo[rgb_fns[0]]) == 2 and rgb_fns[1] not in vivo
    assert keyframe_indices({"2/1": []}, rgb_fns) == [1]


def test_csv_write_and_merge(tmp_path):
    R = np.eye(3)
    t = np.array([1.0, 2.0, 3.0])
    p1 = write_csv(str(tmp_path), "lmo_ape", 1, [2, 2], [0, 1],
                   [R, R], [t, t], [1.0, -1])
    p2 = write_csv(str(tmp_path), "lmo_can", 5, [2], [0], [R], [t], [0.8])
    lines = open(p1).read().splitlines()
    assert len(lines) == 2  # header + 1 (score -1 dropped)
    assert lines[1].startswith("2,0,1,1.0,")
    assert "1.0 0.0 0.0 0.0 1.0 0.0 0.0 0.0 1.0" in lines[1]
    merged = merge_csv([p1, p2], str(tmp_path / "sub" / "all.csv"))
    lines = open(merged).read().splitlines()
    assert len(lines) == 3
    assert parse_sample_ids(["/x/lmo/test/000002/rgb/000031.png"]) == \
        [(2, 31)]
