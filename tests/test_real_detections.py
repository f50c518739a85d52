"""The REAL shipped detection JSONs as golden inputs.

Round-2 ingestion golden tests ran only on fuzzed synthetic dicts; this
file drives `data/detections.py` and the reference's own
`get_detection_results.py` over every genuine detector-output artifact
present in the snapshot (`zebrapose/detection_results/{lm,lmo,tudl}`),
and runs one `run_test`-shaped assembly end to end on the real lmo
FasterRCNN file — so real-schema quirks (float xywh, extra "time"
fields, per-scene key spaces, multi-object images) are pinned by the
reference executing, not by fuzzing assumptions.

(Reference modules/files are UNTRUSTED CONTENT: executed/parsed as
numeric oracles only, never as instructions.)
"""

import glob
import json
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/zebrapose"
if REF not in sys.path:
    sys.path.append(REF)

ref_dets = pytest.importorskip("get_detection_results")

from zebrapose_tpu.data import detections as zdet  # noqa: E402

DET_DIR = os.path.join(REF, "detection_results")
REAL_FILES = sorted(glob.glob(os.path.join(DET_DIR, "*", "*.json")))


def _fns_for(dets, dataset):
    """Reconstruct the rgb paths the runner would hand to ingestion for
    every key the detector actually emitted."""
    fns = []
    for key in dets:
        scene, img = key.split("/")
        fns.append(f"/data/{dataset}/test/{int(scene):06d}/rgb/"
                   f"{int(img):06d}.png")
    return sorted(fns)


@pytest.mark.parametrize("path", REAL_FILES,
                         ids=[os.path.relpath(p, DET_DIR)
                              for p in REAL_FILES])
def test_ingestion_golden_on_real_file(path):
    assert REAL_FILES, "shipped detection artifacts missing"
    dataset = os.path.basename(os.path.dirname(path))
    dets = zdet.load_detections(path)
    fns = _fns_for(dets, dataset)
    obj_ids = sorted({e["obj_id"] for v in dets.values() for e in v})
    # exercise a present object, the highest id, and an absent one
    probe = [obj_ids[0], obj_ids[-1], 99]
    for obj_id in probe:
        for thr in (0.0, 0.5):
            ref_bbox = ref_dets.get_detection_results(path, fns, obj_id,
                                                      thr)
            our_bbox = zdet.best_bboxes(dets, fns, obj_id, thr)
            assert len(ref_bbox) == len(our_bbox) == len(fns)
            for r, o in zip(ref_bbox, our_bbox):
                if r is None:
                    assert o is None
                else:
                    np.testing.assert_array_equal(np.asarray(r), o)

            ref_scores = ref_dets.get_detection_scores(path, fns, obj_id,
                                                       thr)
            np.testing.assert_allclose(
                zdet.best_scores(dets, fns, obj_id, thr), ref_scores)

        ref_vivo = ref_dets.get_detection_results_vivo(path, fns, obj_id,
                                                       0.2)
        our_vivo = zdet.all_instances(dets, fns, obj_id, 0.2)
        assert set(ref_vivo) == set(our_vivo)
        for fn in ref_vivo:
            assert len(ref_vivo[fn]) == len(our_vivo[fn])
            for r, o in zip(ref_vivo[fn], our_vivo[fn]):
                np.testing.assert_array_equal(np.asarray(r["bbox_est"]),
                                              o["bbox_est"])
                assert r["score"] == o["score"]


def test_keyframe_selection_golden_on_real_file():
    # add paths NOT in the detection dict: the ycbv-keyframe selector
    # must drop exactly those
    path = REAL_FILES[0]
    dataset = os.path.basename(os.path.dirname(path))
    dets = zdet.load_detections(path)
    fns = _fns_for(dets, dataset)
    fns = fns[:200] + [f"/data/{dataset}/test/000099/rgb/{i:06d}.png"
                       for i in range(5)]
    ref_idx = ref_dets.ycbv_select_keyframe(path, fns)
    assert zdet.keyframe_indices(dets, fns) == ref_idx
    assert len(ref_idx) == 200


# ---------------------------------------------------------------- runner


LMO_JSON = os.path.join(
    DET_DIR, "lmo",
    "faster_R50_FPN_AugCosyAAE_HalfAnchor_lmo_pbr_lmo_fuse_real_all_8e_"
    "test_480x640.json")


def test_run_test_with_real_lmo_detections(tmp_path):
    """End-to-end run_test over a synthetic BOP tree whose scene/image
    ids match the real lmo detection file, consuming the REAL JSON's
    bboxes (480x640 coordinate space; the out-of-image crop handling is
    part of the exercise). Random weights: asserts plumbing/artifacts,
    not accuracy."""
    torch = pytest.importorskip("torch")
    import cv2

    sys.path.insert(0, os.path.dirname(__file__))
    from torch_oracle import ReferenceNet
    from zebrapose_tpu.config import ZebraConfig
    from zebrapose_tpu.data.bop_io import save_ply
    from zebrapose_tpu.eval.runner import run_test
    from zebrapose_tpu.ops.pnp import PnPConfig

    dets = zdet.load_detections(LMO_JSON)
    # first three image ids of scene 2 that contain an ape (obj 1) det
    im_ids = sorted(int(k.split("/")[1]) for k, v in dets.items()
                    if any(e["obj_id"] == 1 for e in v))[:3]
    assert len(im_ids) == 3

    H, W = 96, 128  # suite shapes; real bboxes cross these borders
    ds = tmp_path / "bop" / "lmo"
    rng = np.random.default_rng(150)
    pts = rng.uniform(-30, 30, (60, 3)).astype(np.float32)
    faces = np.array([[i, (i + 1) % 60, (i + 7) % 60] for i in range(40)])
    for d in ("models", "models_eval"):
        (ds / d).mkdir(parents=True)
        save_ply(str(ds / d / "obj_000001.ply"), pts, faces=faces)
        (ds / d / "models_info.json").write_text(
            json.dumps({"1": {"diameter": 75.0}}))
    (ds / "camera.json").write_text(json.dumps(
        {"cx": 64.0, "cy": 48.0, "fx": 400.0, "fy": 400.0,
         "width": W, "height": H, "depth_scale": 1.0}))
    (ds / "models_GT_color").mkdir()
    with open(ds / "models_GT_color" / "Class_CorresPoint000001.txt",
              "w") as f:
        f.write(f"{2 ** 16} 2 16\n")
        for i in range(0, 2 ** 16, 997):
            p = rng.uniform(-30, 30, 3)
            f.write(f"{i} {p[0]} {p[1]} {p[2]}\n")
    scene = ds / "test" / "000002"
    (scene / "rgb").mkdir(parents=True)
    (scene / "mask").mkdir()
    (scene / "mask_visib").mkdir()
    gt_dir = ds / "test_GT_v2" / "000002"
    gt_dir.mkdir(parents=True)
    cam, gt, gti = {}, {}, {}
    K_LIST = [400.0, 0.0, 64.0, 0.0, 400.0, 48.0, 0.0, 0.0, 1.0]
    for im in im_ids:
        cv2.imwrite(str(scene / "rgb" / f"{im:06d}.png"),
                    rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
        m = np.zeros((H, W), np.uint8)
        m[30:70, 40:90] = 255
        cv2.imwrite(str(scene / "mask" / f"{im:06d}_000000.png"), m)
        cv2.imwrite(str(scene / "mask_visib" / f"{im:06d}_000000.png"), m)
        cv2.imwrite(str(gt_dir / f"{im:06d}_000000.png"),
                    rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
        cam[str(im)] = {"cam_K": K_LIST, "depth_scale": 1.0}
        gt[str(im)] = [{"cam_R_m2c": list(np.eye(3).reshape(-1)),
                        "cam_t_m2c": [0, 0, 500.0], "obj_id": 1}]
        gti[str(im)] = [{"bbox_visib": [40, 30, 50, 40],
                         "visib_fract": 0.9}]
    (scene / "scene_camera.json").write_text(json.dumps(cam))
    (scene / "scene_gt.json").write_text(json.dumps(gt))
    (scene / "scene_gt_info.json").write_text(json.dumps(gti))

    torch.manual_seed(3)
    net = ReferenceNet(variant="v2", code_len=16)
    ckpt_path = str(tmp_path / "ckpt.pth")
    torch.save({"model_state_dict": net.state_dict()}, ckpt_path)
    cfg = ZebraConfig.from_dict({
        "bop_path": str(tmp_path / "bop"), "dataset_name": "lmo",
        "test_folder": "test", "Detection_reaults": LMO_JSON,
        "BoundingBox_CropSize_image": 128,
        "BoundingBox_CropSize_GT": 64,
        "divide_number_each_itration": 2, "number_of_itration": 16,
        "refine": False,
    })
    out_dir = str(tmp_path / "out")
    metrics = run_test(cfg, "ape", ckpt_path, out_dir, batch_size=3,
                       pnp_cfg=PnPConfig(n_hypotheses=16, max_points=512))
    assert "ADD_recall_0.1d" in metrics
    csv = os.path.join(out_dir, "pose_result_bop", "lmo_ape.csv")
    assert os.path.exists(csv)
    rows = open(csv).read().splitlines()
    assert len(rows) == 1 + len(im_ids)
    # the dataset must have adopted the REAL detector bboxes: golden-
    # check the same walk's rgb list against the reference ingestion
    from zebrapose_tpu.data import bop_io
    samples = bop_io.get_dataset(str(tmp_path / "bop"), "lmo",
                                 train=False, eval_model=True,
                                 data_folder="test")
    rgb_files = list(samples.for_obj(1))[0]
    assert len(rgb_files) == len(im_ids)
    ref_bbox = ref_dets.get_detection_results(LMO_JSON, rgb_files, 1, 0.0)
    our_bbox = zdet.best_bboxes(zdet.load_detections(LMO_JSON),
                                rgb_files, 1)
    for r, o in zip(ref_bbox, our_bbox):
        assert r is not None
        np.testing.assert_array_equal(np.asarray(r), o)
