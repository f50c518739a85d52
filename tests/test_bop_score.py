"""End-to-end BOP19 scoring (eval/bop_score.py): synthetic BOP tree +
submission CSV -> pooled and per-object average recalls, including VSD
from real depth images (rendered by the native rasterizer). The error
functions themselves are golden-tested in test_bop_errors; here the
walk, pairing, greedy matching and recall accounting are pinned on
hand-computable scenes."""

import json
import os

import numpy as np
import pytest

from zebrapose_tpu.data.bop_io import save_ply
from zebrapose_tpu.eval.bop_score import match_poses, score_csv
from zebrapose_tpu.native import render_label
from zebrapose_tpu.tools.generate_gt import load_obj

K = np.array([[140.0, 0, 64.0], [0, 140.0, 48.0], [0, 0, 1.0]])
W, H = 128, 96


def test_match_poses_greedy_score_order():
    # est0 (score .2) fits gt0 best; est1 (score .9) fits BOTH but is
    # processed first and takes gt0 -> est0 falls back to gt1 (err 10,
    # only matched at theta > 10)
    errs = np.array([[1.0, 10.0],
                     [2.0, 8.0]])
    assert match_poses(errs, [0.2, 0.9], theta=5.0) == 1
    assert match_poses(errs, [0.2, 0.9], theta=20.0) == 2
    # one gt, two ests: second match attempt finds no free gt
    assert match_poses(np.array([[1.0], [0.5]]), [0.9, 0.1], 5.0) == 1
    # no ests
    assert match_poses(np.zeros((0, 2)), [], 5.0) == 0


@pytest.fixture(scope="module")
def bop_tree(tmp_path_factory):
    """1 scene x 3 images x 2 objects, with GT-rendered depth images.

    obj 1: a 180-deg z discrete symmetry (exercises sym-aware errors).
    obj 2: no symmetry."""
    root = tmp_path_factory.mktemp("bop")
    ds = root / "lmo"
    from test_generate_gt import _sphere_obj
    mesh = load_obj(str(_sphere_obj(root, n_theta=12, n_phi=18)))
    pts, faces = mesh["pts"].astype(np.float32), mesh["faces"]
    (ds / "models").mkdir(parents=True)
    info = {}
    for oid in (1, 2):
        save_ply(str(ds / "models" / f"obj_{oid:06d}.ply"), pts,
                 faces=faces)
        info[str(oid)] = {"diameter": 80.0}
    info["1"]["symmetries_discrete"] = [
        list(np.diag([-1.0, -1.0, 1.0, 1.0]).reshape(-1))]
    (ds / "models" / "models_info.json").write_text(json.dumps(info))
    (ds / "camera.json").write_text(json.dumps(
        {"cx": 64.0, "cy": 48.0, "fx": 140.0, "fy": 140.0,
         "width": W, "height": H, "depth_scale": 0.1}))

    scene = ds / "test" / "000001"
    (scene / "rgb").mkdir(parents=True)
    (scene / "depth").mkdir()
    import cv2
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(9)
    cam, gt, gti = {}, {}, {}
    poses = {}
    labels = np.ones(len(faces), np.int32)
    for im in range(3):
        gt[str(im)], gti[str(im)] = [], []
        depth = np.zeros((H, W), np.float32)
        for oid, tx in ((1, -40.0), (2, 40.0)):
            R = Rotation.from_rotvec(rng.normal(size=3)).as_matrix()
            t = np.array([tx, 0.0, 500.0]) + rng.normal(0, 5, 3)
            poses[(im, oid)] = (R, t)
            _, d = render_label(pts, faces, labels, K, R, t, W, H,
                                with_depth=True)
            depth = np.where((depth == 0) | ((d > 0) & (d < depth)),
                             d, depth)
            gt[str(im)].append({
                "cam_R_m2c": list(R.reshape(-1)),
                "cam_t_m2c": list(t), "obj_id": oid})
            gti[str(im)].append({"visib_fract": 0.9,
                                 "bbox_visib": [0, 0, 10, 10]})
        # depth png in 0.1mm units (depth_scale 0.1)
        cv2.imwrite(str(scene / "depth" / f"{im:06d}.png"),
                    (depth / 0.1).astype(np.uint16))
        cam[str(im)] = {"cam_K": list(K.reshape(-1)), "depth_scale": 0.1}
    (scene / "scene_camera.json").write_text(json.dumps(cam))
    (scene / "scene_gt.json").write_text(json.dumps(gt))
    (scene / "scene_gt_info.json").write_text(json.dumps(gti))
    return root, poses


def _write_csv(path, rows):
    with open(path, "w") as f:
        f.write("scene_id,im_id,obj_id,score,R,t,time\n")
        for s, im, o, sc, R, t in rows:
            f.write(f"{s},{im},{o},{sc},"
                    f"{' '.join(str(v) for v in np.reshape(R, -1))},"
                    f"{' '.join(str(v) for v in np.reshape(t, -1))},-1\n")


def test_score_csv_end_to_end(tmp_path, bop_tree):
    root, poses = bop_tree
    rows = []
    # obj 1: exact on all 3 images, via the SYMMETRY transform on im 0
    # (R' = R @ S must still score as exact)
    S = np.diag([-1.0, -1.0, 1.0])
    for im in range(3):
        R, t = poses[(im, 1)]
        rows.append((1, im, 1, 0.9, R @ S if im == 0 else R, t))
    # obj 2: exact on im 0 (+ a garbage duplicate with lower score),
    # 100 mm off on im 1 (misses even theta=0.5*diam=40mm / 50px),
    # missing on im 2
    R, t = poses[(0, 2)]
    rows.append((1, 0, 2, 0.9, R, t))
    rows.append((1, 0, 2, 0.1, R, t + np.array([500.0, 0, 0])))
    R, t = poses[(1, 2)]
    rows.append((1, 1, 2, 0.8, R, t + np.array([100.0, 0, 0])))
    csv = str(tmp_path / "sub.csv")
    _write_csv(csv, rows)

    res = score_csv(csv, str(root), "lmo")
    assert res["n_targets"] == 6
    o1, o2 = res["per_object"][1], res["per_object"][2]
    assert o1["AR_mssd"] == 1.0 and o1["AR_mspd"] == 1.0
    assert o1["AR_vsd"] == pytest.approx(1.0)
    assert o1["AR"] == pytest.approx(1.0)
    assert o2["AR_mssd"] == pytest.approx(1 / 3)
    assert o2["AR_mspd"] == pytest.approx(1 / 3)
    assert o2["AR_vsd"] == pytest.approx(1 / 3, abs=0.05)
    # pooled: per threshold 4 of 6 matched
    assert res["AR_mssd"] == pytest.approx(4 / 6)
    assert res["AR"] == pytest.approx(res["per_object"][1]["AR"] / 2
                                      + res["per_object"][2]["AR"] / 2,
                                      abs=0.2)

    # --no_vsd path drops the depth-based component
    res2 = score_csv(csv, str(root), "lmo", with_vsd=False)
    assert "AR_vsd" not in res2
    assert res2["AR"] == pytest.approx((res2["AR_mssd"]
                                        + res2["AR_mspd"]) / 2)


def test_score_csv_partial_depth_disables_vsd_loudly(tmp_path, bop_tree):
    """Auto VSD (with_vsd=None) must not silently drop to MSSD+MSPD when
    only SOME scored images have depth — it warns and reports the
    2-component AR for every object."""
    root, poses = bop_tree
    rows = []
    for im in range(3):
        R, t = poses[(im, 1)]
        rows.append((1, im, 1, 0.9, R, t))
    csv = str(tmp_path / "sub.csv")
    _write_csv(csv, rows)

    gone = root / "lmo" / "test" / "000001" / "depth" / "000001.png"
    hidden = gone.with_suffix(".hidden")
    gone.rename(hidden)
    try:
        with pytest.warns(UserWarning, match="VSD disabled"):
            res = score_csv(csv, str(root), "lmo")
    finally:
        hidden.rename(gone)
    assert "AR_vsd" not in res
    assert "AR_vsd" not in res["per_object"][1]
    assert res["AR"] == pytest.approx((res["AR_mssd"]
                                       + res["AR_mspd"]) / 2)


def test_score_csv_respects_targets_file(tmp_path, bop_tree):
    """test_targets_bop19.json restricts the target set: only listed
    (scene, im, obj) triples count, both as denominators and as GT."""
    root, poses = bop_tree
    targets = [{"scene_id": 1, "im_id": 0, "obj_id": 1, "inst_count": 1},
               {"scene_id": 1, "im_id": 1, "obj_id": 2, "inst_count": 1}]
    tf = root / "lmo" / "test_targets_bop19.json"
    tf.write_text(json.dumps(targets))
    try:
        rows = []
        R, t = poses[(0, 1)]
        rows.append((1, 0, 1, 0.9, R, t))  # in targets, exact
        R, t = poses[(2, 2)]
        rows.append((1, 2, 2, 0.9, R, t))  # NOT in targets -> ignored
        csv = str(tmp_path / "t.csv")
        _write_csv(csv, rows)
        res = score_csv(csv, str(root), "lmo", with_vsd=False)
        assert res["n_targets"] == 2
        assert res["per_object"][1]["AR"] == pytest.approx(1.0)
        assert res["per_object"][2]["AR"] == 0.0
        assert res["AR_mssd"] == pytest.approx(0.5)
    finally:
        os.remove(tf)


def test_score_csv_inst_count_truncates_estimates(tmp_path, bop_tree):
    """Official BOP19: only the top-inst_count estimates by score are
    evaluated per target — a low-score exact pose behind a high-score
    garbage one must NOT count when inst_count == 1."""
    root, poses = bop_tree
    targets = [{"scene_id": 1, "im_id": 0, "obj_id": 2, "inst_count": 1}]
    tf = root / "lmo" / "test_targets_bop19.json"
    tf.write_text(json.dumps(targets))
    try:
        R, t = poses[(0, 2)]
        rows = [(1, 0, 2, 0.9, R, t + np.array([500.0, 0, 0])),  # junk
                (1, 0, 2, 0.1, R, t)]                            # exact
        csv = str(tmp_path / "i.csv")
        _write_csv(csv, rows)
        res = score_csv(csv, str(root), "lmo", with_vsd=False)
        assert res["AR"] == 0.0  # exact est truncated away
    finally:
        os.remove(tf)


def test_score_csv_no_targets_is_loud(tmp_path, bop_tree):
    root, poses = bop_tree
    tf = root / "lmo" / "test_targets_bop19.json"
    tf.write_text(json.dumps([]))
    try:
        csv = str(tmp_path / "e.csv")
        _write_csv(csv, [])
        with pytest.raises(ValueError, match="no GT targets"):
            score_csv(csv, str(root), "lmo", with_vsd=False)
    finally:
        os.remove(tf)


def test_score_csv_cli(tmp_path, bop_tree, capsys):
    from zebrapose_tpu.cli import main
    root, poses = bop_tree
    rows = []
    for im in range(3):
        for oid in (1, 2):
            R, t = poses[(im, oid)]
            rows.append((1, im, oid, 0.9, R, t))
    csv = str(tmp_path / "all.csv")
    _write_csv(csv, rows)
    rc = main(["score-bop", "--csv", csv, "--bop_path", str(root),
               "--dataset", "lmo"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["AR"] == pytest.approx(1.0)
    assert out["n_targets"] == 6
