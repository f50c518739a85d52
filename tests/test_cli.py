"""CLI subcommand tests (the cheap offline commands; train/test mains are
covered via their library functions in test_trainer/test_eval_e2e)."""

import json
import os

import cv2
import numpy as np
import pytest

from test_generate_gt import _sphere_obj
from zebrapose_tpu.cli import main


def test_merge_csv_cli(tmp_path):
    a = tmp_path / "a.csv"
    b = tmp_path / "b.csv"
    a.write_text("scene_id,im_id,obj_id,score,R,t,time\n1,2,3,1.0,r,t,-1\n")
    b.write_text("scene_id,im_id,obj_id,score,R,t,time\n4,5,6,0.5,r,t,-1\n")
    out = tmp_path / "m.csv"
    assert main(["merge-csv", str(a), str(b), "--out", str(out)]) == 0
    assert len(out.read_text().splitlines()) == 3


def test_generate_mesh_code_cli(tmp_path, capsys):
    mesh = _sphere_obj(tmp_path, n_theta=20, n_phi=40)
    txt = str(tmp_path / "corres.txt")
    rc = main(["generate-mesh-code", "--mesh", mesh, "-d", "2", "-n", "8",
               "--corres_txt", txt])
    assert rc == 0
    assert os.path.exists(txt)
    header = open(txt).readline().split()
    assert header[0] == "256" and header[1] == "2" and header[2] == "8"


def test_generate_labels_cli(tmp_path):
    # minimal BOP tree with mesh + one scene/one image/one GT instance
    ds = tmp_path / "bop" / "lmo"
    (ds / "models").mkdir(parents=True)
    (ds / "models_eval").mkdir()
    mesh_obj = _sphere_obj(tmp_path, n_theta=25, n_phi=50)
    os.rename(mesh_obj, str(ds / "models" / "obj_000001.obj"))
    # a ply must exist for bop_io model listing
    from zebrapose_tpu.tools.generate_gt import load_obj
    from zebrapose_tpu.data.bop_io import save_ply
    m = load_obj(str(ds / "models" / "obj_000001.obj"))
    for d in ("models", "models_eval"):
        save_ply(str(ds / d / "obj_000001.ply"), m["pts"],
                 faces=m["faces"])
        (ds / d / "models_info.json").write_text(
            json.dumps({"1": {"diameter": 80.0}}))
    (ds / "camera.json").write_text(json.dumps(
        {"cx": 64.0, "cy": 64.0, "fx": 400.0, "fy": 400.0,
         "width": 128, "height": 128, "depth_scale": 1.0}))
    scene = ds / "train_real" / "000001"
    (scene / "rgb").mkdir(parents=True)
    (scene / "mask").mkdir()
    (scene / "mask_visib").mkdir()
    cv2.imwrite(str(scene / "rgb" / "000000.png"),
                np.zeros((128, 128, 3), np.uint8))
    K = [400.0, 0.0, 64.0, 0.0, 400.0, 64.0, 0.0, 0.0, 1.0]
    (scene / "scene_camera.json").write_text(json.dumps(
        {"0": {"cam_K": K, "depth_scale": 1.0}}))
    (scene / "scene_gt.json").write_text(json.dumps(
        {"0": [{"cam_R_m2c": list(np.eye(3).reshape(-1)),
                "cam_t_m2c": [0, 0, 450.0], "obj_id": 1}]}))
    (scene / "scene_gt_info.json").write_text(json.dumps(
        {"0": [{"bbox_visib": [30, 30, 68, 68], "visib_fract": 1.0}]}))

    cfg = tmp_path / "cfg.txt"
    cfg.write_text(f"""\
bop_path = {tmp_path / 'bop'}
dataset_name = lmo
training_data_folder = train_real
divide_number_each_itration = 2
number_of_itration = 8
train_obj_visible_theshold = 0.2
""")
    rc = main(["generate-labels", "--cfg", str(cfg), "--obj_name", "ape"])
    assert rc == 0
    label_fn = ds / "train_real_GT_v2" / "000001" / "000000_000000.png"
    assert label_fn.exists()
    lab = cv2.imread(str(label_fn))
    ids = (lab[..., 0].astype(int) << 16) + (lab[..., 1].astype(int) << 8) \
        + lab[..., 2]
    assert (ids > 0).sum() > 500        # sphere visible
    assert ids.max() < 256              # 8-bit code space
    # corres table was generated alongside
    assert (ds / "models_GT_color" / "Class_CorresPoint000001.txt").exists()


def test_cli_help_lists_subcommands(capsys):
    with pytest.raises(SystemExit):
        main(["--help"])
    out = capsys.readouterr().out
    for cmd in ("train", "train-fleet", "test", "test-fleet", "vivo",
                "generate-mesh-code", "generate-labels", "merge-csv",
                "model-cost", "export-ckpt", "score-bop"):
        assert cmd in out


def test_model_cost_cli(capsys):
    # crop 64 reuses the shape test_model_parity already compiles
    rc = main(["model-cost", "--crop", "64"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # v2/34/concat has ~31M params (ref thop: ~31.4M); FLOPs scale with
    # crop so only sanity-check positivity (NaN when cost analysis is
    # unavailable on a backend)
    assert 25 < res["params_M"] < 40
    assert res["flops_G"] > 0.1 or res["flops_G"] != res["flops_G"]


def test_cli_test_creates_timestamped_eval_dir(tmp_path, monkeypatch):
    """Reference test.py:589-602 artifact parity: the CLI `test` command
    must create a timestamped run dir under --output_dir containing
    config.txt (full effective config, start/end markers) and log.txt
    capturing the run's stdout (tee)."""
    import zebrapose_tpu.eval.runner as runner_mod

    def fake_run_test(cfg, obj_name, ckpt_file, output_dir, **kw):
        print("fake-run-output-marker")
        with open(os.path.join(output_dir, "log.txt"), "a") as f:
            f.write("ADD_recall_0.1d 0.5\n")
        return {"ADD_recall_0.1d": 0.5}

    monkeypatch.setattr(runner_mod, "run_test", fake_run_test)
    cfg_path = tmp_path / "cfg.txt"
    cfg_path.write_text("\n".join([
        "bop_path = /data/bop",
        "dataset_name = lmo",
        "test_folder = test",
        "Detection_reaults = none",
        "BoundingBox_CropSize_image = 128",
        "BoundingBox_CropSize_GT = 64",
        "divide_number_each_itration = 2",
        "number_of_itration = 16",
    ]) + "\n")
    out_root = str(tmp_path / "eval_out")
    rc = main(["test", "--cfg", str(cfg_path), "--obj_name", "ape",
               "--ckpt_file", "/nonexistent.pth", "--output_dir",
               out_root])
    assert rc == 0
    runs = os.listdir(out_root)
    assert len(runs) == 1  # one timestamped dir per run
    run_dir = os.path.join(out_root, runs[0])
    conf = open(os.path.join(run_dir, "config.txt")).read()
    assert conf.startswith("------------------ start ------------------")
    assert conf.endswith("------------------- end -------------------")
    assert "obj_name : ape" in conf
    assert "dataset_name : lmo" in conf
    assert "checkpoint_file : /nonexistent.pth" in conf
    assert "ignore_bit : 0" in conf
    log = open(os.path.join(run_dir, "log.txt")).read()
    assert "fake-run-output-marker" in log       # teed stdout
    assert "ADD_recall_0.1d 0.5" in log          # runner's own append
    assert f"eval run dir: {run_dir}" in log


def test_cli_visualize_single_frame(tmp_path, monkeypatch):
    """`visualize` = the one-frame debug entrypoint (reference
    test_for_one_image.py): it must call run_test with debug=True,
    batch_size=1 and the (scene, im) frame filter, inside a timestamped
    run dir."""
    import zebrapose_tpu.eval.runner as runner_mod

    seen = {}

    def fake_run_test(cfg, obj_name, ckpt_file, output_dir, **kw):
        seen.update(kw)
        return {"ADD_recall_0.1d": 1.0}

    monkeypatch.setattr(runner_mod, "run_test", fake_run_test)
    cfg_path = tmp_path / "cfg.txt"
    cfg_path.write_text("\n".join([
        "bop_path = /data/bop", "dataset_name = lmo",
        "test_folder = test", "Detection_reaults = none",
    ]) + "\n")
    out_root = str(tmp_path / "vis_out")
    rc = main(["visualize", "--cfg", str(cfg_path), "--obj_name", "ape",
               "--ckpt_file", "x.pth", "--scene", "2", "--im", "7",
               "--output_dir", out_root])
    assert rc == 0
    assert seen["frame"] == (2, 7)
    assert seen["debug"] is True
    assert seen["batch_size"] == 1
    runs = os.listdir(out_root)
    assert len(runs) == 1
    conf = open(os.path.join(out_root, runs[0], "config.txt")).read()
    assert "command : visualize" in conf
    assert "frame : 2/7" in conf


def test_cli_train_gt_labels_flag(tmp_path, monkeypatch):
    """--gt_labels v1 selects the plain <split>_GT label directory
    (reference train_v4 semantics); default is the symmetry-canonical
    _GT_v2 (train_v2/v3/v5)."""
    import zebrapose_tpu.train.trainer as trainer_mod

    seen = {}

    def fake_build(cfg, obj_name, out, **kw):
        seen.update(kw)
        return "RES"

    monkeypatch.setattr(trainer_mod, "build_train_setup", fake_build)
    monkeypatch.setattr(trainer_mod, "fit",
                        lambda res, **kw: 0.0)
    cfg_path = tmp_path / "cfg.txt"
    cfg_path.write_text("dataset_name = lmo\n")
    rc = main(["train", "--cfg", str(cfg_path), "--obj_name", "ape",
               "--output_dir", str(tmp_path / "runs"),
               "--gt_labels", "v1"])
    assert rc == 0
    assert seen["gt_dir_suffix"] == "_GT"
    rc = main(["train", "--cfg", str(cfg_path), "--obj_name", "ape",
               "--output_dir", str(tmp_path / "runs")])
    assert rc == 0
    assert seen["gt_dir_suffix"] == "_GT_v2"


def test_cli_vivo_creates_timestamped_eval_dir(tmp_path, monkeypatch):
    import zebrapose_tpu.eval.runner_vivo as vivo_mod

    def fake_run_vivo(cfg, obj_name, ckpt_file, output_dir, **kw):
        print("vivo-marker")
        return {"instances": 0}

    monkeypatch.setattr(vivo_mod, "run_vivo", fake_run_vivo)
    cfg_path = tmp_path / "cfg.txt"
    cfg_path.write_text("dataset_name = tless\n")
    out_root = str(tmp_path / "vivo_out")
    rc = main(["vivo", "--cfg", str(cfg_path), "--obj_name", "obj01",
               "--ckpt_file", "x.pth", "--output_dir", out_root])
    assert rc == 0
    runs = os.listdir(out_root)
    assert len(runs) == 1
    run_dir = os.path.join(out_root, runs[0])
    assert "command : vivo" in open(
        os.path.join(run_dir, "config.txt")).read()
    assert "vivo-marker" in open(
        os.path.join(run_dir, "log.txt")).read()
