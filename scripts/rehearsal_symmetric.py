"""Symmetric-object closed loop: canonicalized _GT_v2 labels -> ADD-S.

Round-4 VERDICT missing #4: symmetry canonicalization was golden-pinned
per function (tools/symmetry.py vs the reference's
modified_gt_for_symmetry, generate_training_labels_for_BOP_v2.py:90-208)
but the fork's HEADLINE capability — training on canonicalized labels so
a continuously-symmetric object becomes learnable — had never been
driven train->decode->metric. This script closes that loop:

  1. builds a BOP tree around a continuous-z-symmetric object
     ("bowl", obj_id 3 — symmetric in data/dataset_info.py, like the
     real LM bowl): a pear-shaped surface of revolution whose RGB
     texture depends ONLY on (radius, z), so the image determines the
     pose only up to a z-rotation — exactly the ambiguity class the v2
     label recipe exists for. models_info.json declares
     symmetries_continuous [{axis: [0,0,1], offset: [0,0,0]}].
  2. renders _GT_v2 labels through the PRODUCTION path — the CLI's
     `generate_labels_cli` (surface code build + pose canonicalization
     via tools/symmetry.canonicalize_pose + native rasterizer) — and,
     for the A/B control, non-canonicalized labels into `_GT` dirs
     (same images, same code, only the label poses differ).
  3. trains both: v2 (canonical) for --steps, control (raw poses) for
     --control_steps. With raw labels the SAME augmented crop
     appearance maps to z-rotated (inconsistent) code targets, so the
     code bits cannot converge; with canonical labels they can.
  4. final eval via run_test: ADD-S recall (the metric for symmetric
     objects, auto-selected by the symmetric registry flag) plus the
     plain-ADD contrast computed from the SAME submission CSV — high
     ADD-S with near-zero plain ADD is the signature that the decoder
     returns the canonical representative, as designed.

Run on the TPU:  python scripts/rehearsal_symmetric.py [--steps 2500]
Writes reports/symmetric_loop_r5.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import cv2
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
IMG_W, IMG_H = 640, 480
K = np.array([[572.4114, 0, 325.2611],
              [0, 573.57043, 242.04899],
              [0, 0, 1]], np.float64)
N_BITS = 16
OBJ_ID = 3          # "bowl" — symmetric in the lm/lmo registry
OBJ_NAME = "bowl"
R_MAX, HEIGHT = 35.0, 70.0
Y_SQUASH = 0.6      # discrete spec: elliptic cross-section (2-fold)


def pear_mesh(n_u=260, n_phi=270):
    """Closed surface of revolution (z symmetry axis), ~70k vertices
    (> 2^16, the partition requirement). The profile is z-asymmetric
    (pear) so the only pose ambiguity is the z-rotation."""
    u = np.linspace(0, 1, n_u)
    z = (u - 0.5) * HEIGHT
    r = R_MAX * np.sin(np.pi * u) ** 0.75 * (0.55 + 0.45 * u)
    phis = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    Rr, Pp = np.meshgrid(r, phis, indexing="ij")
    Zz = np.broadcast_to(z[:, None], Rr.shape)
    pts = np.stack([Rr * np.cos(Pp), Rr * np.sin(Pp), Zz],
                   axis=-1).reshape(-1, 3)
    idx = np.arange(n_u * n_phi).reshape(n_u, n_phi)
    faces = []
    for i in range(n_u - 1):
        for j in range(n_phi):
            j2 = (j + 1) % n_phi
            a, b, c, d = idx[i, j], idx[i, j2], idx[i + 1, j], idx[i + 1, j2]
            faces.append([a, b, c])
            faces.append([b, d, c])
    # diameter: farthest pair lies on profile extremes (azimuth pi apart)
    rr, zz = np.meshgrid(r, r), np.meshgrid(z, z)
    diam = float(np.max(np.hypot(rr[0] + rr[1], zz[0] - zz[1])))
    return (pts.astype(np.float32), np.asarray(faces, np.int64), diam)


def sym_color(face_centroid):
    """RGB as a function of (radius_xy, z) ONLY — invariant under
    z-rotation, so appearance cannot reveal the azimuth."""
    rn = np.hypot(face_centroid[:, 0], face_centroid[:, 1]) / R_MAX
    zn = face_centroid[:, 2] / HEIGHT + 0.5
    bands = 0.5 + 0.5 * np.sin(6 * np.pi * zn) * np.cos(3 * np.pi * rn)
    return np.clip(np.stack([zn, rn, bands], axis=-1), 0, 1)


def ellipse_mesh(n_u=260, n_phi=270):
    """Pear of revolution squashed along y: elliptic cross-sections,
    invariant ONLY under the 2-fold Rz(pi) flip (eggbox-class
    symmetry). Diameter is unchanged (farthest pair lies in the x-z
    major plane)."""
    pts, faces, diam = pear_mesh(n_u, n_phi)
    pts = pts.copy()
    pts[:, 1] *= Y_SQUASH
    return pts, faces, diam


def disc_color(face_centroid):
    """RGB as a function of (x^2, y^2, z) — invariant under
    (x, y) -> (-x, -y) (the Rz(pi) flip) but NOT under other
    z-rotations, so pose is observable up to exactly the 2-fold
    ambiguity the discrete canonicalization removes."""
    x2 = (face_centroid[:, 0] / R_MAX) ** 2
    y2 = (face_centroid[:, 1] / (Y_SQUASH * R_MAX)) ** 2
    zn = face_centroid[:, 2] / HEIGHT + 0.5
    bands = 0.5 + 0.5 * np.sin(6 * np.pi * zn) * np.cos(3 * np.pi * y2)
    return np.clip(np.stack([zn, x2, bands], axis=-1), 0, 1)


def _rz_pi_4x4():
    m = np.eye(4)
    m[0, 0] = m[1, 1] = -1.0
    return m.reshape(-1).tolist()


SPECS = {
    "cont": dict(obj_id=3, obj_name="bowl", mesh=pear_mesh,
                 color=sym_color,
                 sym_info={"symmetries_continuous": [
                     {"axis": [0, 0, 1], "offset": [0, 0, 0]}]}),
    "disc": dict(obj_id=10, obj_name="eggbox", mesh=ellipse_mesh,
                 color=disc_color,
                 sym_info={"symmetries_discrete": [_rz_pi_4x4()]}),
}
_SPEC = SPECS["cont"]


def set_spec(kind: str):
    """Select the symmetry class; module-level OBJ_* follow (script
    scope: every path below keys off these)."""
    global _SPEC, OBJ_ID, OBJ_NAME
    _SPEC = SPECS[kind]
    OBJ_ID = _SPEC["obj_id"]
    OBJ_NAME = _SPEC["obj_name"]


def random_pose(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = np.array([rng.uniform(-40, 40), rng.uniform(-30, 30),
                  rng.uniform(480, 650)])
    return q, t


def build_sym_tree(root, n_train=160, n_val=120, seed=7):
    """BOP tree for the symmetric object. True poses everywhere
    (scene_gt keeps the raw pose, as in real BOP data); labels are NOT
    written here — the production generate-labels path renders them."""
    from zebrapose_tpu import native
    from zebrapose_tpu.data.bop_io import save_ply

    rng = np.random.default_rng(seed)
    ds = os.path.join(root, "lmo")
    pts, faces, diam = _SPEC["mesh"]()
    info = {str(OBJ_ID): dict(diameter=diam, **_SPEC["sym_info"])}
    for d in ("models", "models_eval"):
        os.makedirs(os.path.join(ds, d), exist_ok=True)
        save_ply(os.path.join(ds, d, f"obj_{OBJ_ID:06d}.ply"), pts,
                 faces=faces)
        with open(os.path.join(ds, d, "models_info.json"), "w") as f:
            json.dump(info, f)
    with open(os.path.join(ds, "camera.json"), "w") as f:
        json.dump({"cx": K[0, 2], "cy": K[1, 2], "fx": K[0, 0],
                   "fy": K[1, 1], "width": IMG_W, "height": IMG_H,
                   "depth_scale": 1.0}, f)

    face_centroid = pts[faces].mean(axis=1)
    pos_color = np.concatenate([np.zeros((1, 3)),
                                _SPEC["color"](face_centroid)])

    for split, n_imgs in (("train_real", n_train), ("test", n_val)):
        scene = os.path.join(ds, split, "000001")
        write_depth = split == "test"
        subdirs = ("rgb", "mask", "mask_visib") + (
            ("depth",) if write_depth else ())
        for sub in subdirs:
            os.makedirs(os.path.join(scene, sub), exist_ok=True)
        cam, gt, gti = {}, {}, {}
        t0 = time.time()
        for im in range(n_imgs):
            R, t = random_pose(rng)
            fidx, depth = native.render_label(
                pts, faces.astype(np.int32),
                np.arange(1, len(faces) + 1, dtype=np.int32),
                K, R, t, IMG_W, IMG_H, with_depth=write_depth)
            mask = (fidx > 0).astype(np.uint8) * 255
            if write_depth:
                cv2.imwrite(os.path.join(scene, "depth",
                                         f"{im:06d}.png"),
                            np.round(depth).astype(np.uint16))

            rgb = (pos_color[fidx] * 255).astype(np.float32)
            bg = rng.integers(0, 255, (IMG_H, IMG_W, 3)).astype(np.float32)
            rgb = np.where(mask[..., None] > 0, rgb, bg)
            rgb += rng.normal(0, 6, rgb.shape)
            rgb = np.clip(rgb, 0, 255).astype(np.uint8)

            cv2.imwrite(os.path.join(scene, "rgb", f"{im:06d}.png"), rgb)
            cv2.imwrite(os.path.join(scene, "mask",
                                     f"{im:06d}_000000.png"), mask)
            cv2.imwrite(os.path.join(scene, "mask_visib",
                                     f"{im:06d}_000000.png"), mask)
            ys, xs = np.nonzero(mask)
            bbox = [int(xs.min()), int(ys.min()),
                    int(xs.max() - xs.min() + 1),
                    int(ys.max() - ys.min() + 1)]
            cam[str(im)] = {"cam_K": K.reshape(-1).tolist(),
                            "depth_scale": 1.0}
            gt[str(im)] = [{"cam_R_m2c": R.reshape(-1).tolist(),
                            "cam_t_m2c": t.tolist(), "obj_id": OBJ_ID}]
            gti[str(im)] = [{"bbox_visib": bbox, "visib_fract": 1.0}]
        for name, obj in (("scene_camera", cam), ("scene_gt", gt),
                          ("scene_gt_info", gti)):
            with open(os.path.join(scene, f"{name}.json"), "w") as f:
                json.dump(obj, f)
        print(f"[L0] rendered {n_imgs} {split} frames "
              f"({time.time() - t0:.1f}s)", flush=True)
    return ds


def generate_labels(root, cfg):
    """Production path for the v2 labels; direct render with an empty
    model_info (no canonicalization) for the _GT control dirs."""
    from zebrapose_tpu.data import bop_io
    from zebrapose_tpu.tools.generate_gt import generate_labels_for_split
    from zebrapose_tpu.tools.label_driver import generate_labels_cli
    from zebrapose_tpu.tools.generate_gt import load_mesh
    from zebrapose_tpu import native

    for folder in ("train_real", "test"):
        t0 = time.time()
        n = generate_labels_cli(cfg, OBJ_NAME, folder)
        print(f"[labels] {folder}_GT_v2: {n} canonicalized labels "
              f"({time.time() - t0:.0f}s)", flush=True)

    ds_dir = os.path.join(root, "lmo")
    mesh = load_mesh(os.path.join(ds_dir, "models",
                                  f"obj_{OBJ_ID:06d}.ply"))
    pts = mesh["pts"].astype(np.float32)
    faces = mesh["faces"].astype(np.int32)
    vc = native.partition_mesh(pts, 2, N_BITS, seed=0)
    face_class = native.face_classes(vc, faces)
    for folder in ("train_real", "test"):
        samples = bop_io.get_dataset(root, "lmo", train=True,
                                     data_folder=folder,
                                     train_obj_visible_theshold=0.2)
        t0 = time.time()
        n = generate_labels_for_split(
            samples, OBJ_ID, pts, faces, face_class, IMG_W, IMG_H,
            model_info={},          # <- no symmetries: raw-pose labels
            gt_dir_suffix="_GT", data_folder=folder)
        print(f"[labels] {folder}_GT (control, raw poses): {n} labels "
              f"({time.time() - t0:.0f}s)", flush=True)


def make_cfg(root):
    from zebrapose_tpu.config import ZebraConfig

    return ZebraConfig.from_dict({
        "bop_path": root, "dataset_name": "lmo",
        "training_data_folder": "train_real",
        "training_data_folder_2": "none",
        "val_folder": "test", "test_folder": "test",
        "Detection_reaults": "none",
        "BoundingBox_CropSize_image": 256,
        "BoundingBox_CropSize_GT": 128,
        "divide_number_each_itration": 2, "number_of_itration": N_BITS,
        "batch_size": 32, "total_iteration": 380000,
        "learning_rate": 2e-4, "num_workers": 8,
        "train_obj_visible_theshold": 0.2,
        "use_histgramm_weighted_binary_loss": True,
    })


def train_one(root, out, steps, gt_dir_suffix, log_freq):
    import dataclasses

    from zebrapose_tpu.ops.pnp import PnPConfig
    from zebrapose_tpu.train.trainer import build_train_setup, fit

    res = build_train_setup(make_cfg(root), OBJ_NAME, out,
                            pretrained_backbone=None, bf16=True,
                            cache_images=True, device_cache=True,
                            gt_dir_suffix=gt_dir_suffix)
    assert res.symmetric, "bowl must be symmetric in the registry"
    res = dataclasses.replace(
        res, pnp_cfg=PnPConfig(n_hypotheses=64, max_points=2048))
    t0 = time.time()
    best = fit(res, log_freq=log_freq, max_steps=steps)
    return best, time.time() - t0


def add_contrast_from_csv(out_dir, root):
    """Plain (asymmetric) ADD recall from the submission CSV — the
    decoder returns the CANONICAL representative, so plain ADD should
    be near zero while ADD-S is high."""
    import glob

    from zebrapose_tpu.data.bop_io import load_ply, load_scene_gt

    csvs = glob.glob(os.path.join(out_dir, "**", "*.csv"), recursive=True)
    assert len(csvs) == 1, csvs
    mesh = load_ply(os.path.join(root, "lmo", "models_eval",
                                 f"obj_{OBJ_ID:06d}.ply"))
    verts = mesh["pts"].astype(np.float64)
    with open(os.path.join(root, "lmo", "models_eval",
                           "models_info.json")) as f:
        diam = float(json.load(f)[str(OBJ_ID)]["diameter"])
    sgt = load_scene_gt(os.path.join(root, "lmo", "test", "000001",
                                     "scene_gt.json"))
    from zebrapose_tpu.eval.bop_score import read_csv
    errs = []
    for row in read_csv(csvs[0]):
        g = sgt[row["im_id"]][0]
        Rg = np.asarray(g["cam_R_m2c"], np.float64).reshape(3, 3)
        tg = np.asarray(g["cam_t_m2c"], np.float64).reshape(3)
        pe = verts @ np.asarray(row["R"]).T + np.asarray(
            row["t"]).reshape(1, 3)
        pg = verts @ Rg.T + tg.reshape(1, 3)
        errs.append(float(np.mean(np.linalg.norm(pe - pg, axis=1))))
    errs = np.asarray(errs)
    return float(np.mean(errs < 0.1 * diam)), csvs[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sym", choices=sorted(SPECS), default="cont",
                    help="cont: continuous z (bowl-class); disc: 2-fold"
                         " Rz(pi) discrete (eggbox-class — the lmo "
                         "benchmark's symmetric objects)")
    ap.add_argument("--root", default=None,
                    help="default /tmp/zebra_sym (cont) / "
                         "/tmp/zebra_sym_disc (disc)")
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--control_steps", type=int, default=1000,
                    help="raw-label control run length (its loss floor "
                         "shows within a few hundred steps)")
    ap.add_argument("--log_freq", type=int, default=500)
    ap.add_argument("--skip_control", action="store_true")
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse checkpoints already in <root>/run*")
    ap.add_argument("--report", default=None,
                    help="default reports/symmetric_loop_r5.json "
                         "(cont) / symmetric_loop_disc_r5.json (disc)")
    args = ap.parse_args()
    set_spec(args.sym)
    if args.root is None:
        args.root = ("/tmp/zebra_sym" if args.sym == "cont"
                     else "/tmp/zebra_sym_disc")
    if args.report is None:
        args.report = os.path.join(
            REPO, "reports",
            "symmetric_loop_r5.json" if args.sym == "cont"
            else "symmetric_loop_disc_r5.json")

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/zebrapose_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    if not os.path.exists(os.path.join(args.root, "lmo", "test")):
        build_sym_tree(args.root)
    else:
        print("[L0] reusing existing tree", flush=True)
    cfg = make_cfg(args.root)
    if not os.path.exists(os.path.join(
            args.root, "lmo", "test_GT_v2", "000001")):
        generate_labels(args.root, cfg)
    else:
        print("[labels] reusing existing labels", flush=True)

    report = {"date": time.strftime("%Y-%m-%d"), "obj": OBJ_NAME,
              "steps": args.steps}

    run_v2 = os.path.join(args.root, "run_v2")
    if not args.skip_train:
        print(f"== training on CANONICALIZED _GT_v2 labels "
              f"({args.steps} steps) ==", flush=True)
        best, dt = train_one(args.root, run_v2, args.steps, "_GT_v2",
                             args.log_freq)
        print(f"best val ADD-S recall@0.1d: {best:.3f} "
              f"({dt / 60:.1f} min)", flush=True)
        report["v2_best_val_adds"] = best
        report["v2_train_min"] = round(dt / 60, 1)

        if not args.skip_control:
            print(f"== CONTROL: raw-pose _GT labels "
                  f"({args.control_steps} steps) ==", flush=True)
            bc, dtc = train_one(args.root, os.path.join(
                args.root, "run_ctl"), args.control_steps, "_GT",
                args.log_freq)
            print(f"control best val ADD-S recall@0.1d: {bc:.3f} "
                  f"({dtc / 60:.1f} min)", flush=True)
            report["control_best_val_adds"] = bc
            report["control_steps"] = args.control_steps

    # ---- final eval: run_test on the best v2 checkpoint --------------
    from zebrapose_tpu.eval.runner import run_test
    from zebrapose_tpu.ops.pnp import PnPConfig

    best_dir = os.path.join(run_v2, "checkpoints", "best")
    steps_d = [d for d in os.listdir(best_dir) if d.startswith("step_")]
    ckpt = os.path.join(best_dir, steps_d[0])
    out_dir = os.path.join(args.root, "eval_v2")
    print(f"== run_test on {ckpt} ==", flush=True)
    metrics = run_test(cfg, OBJ_NAME, ckpt, out_dir, batch_size=16,
                       pnp_cfg=PnPConfig(n_hypotheses=128,
                                         max_points=2048))
    print(json.dumps(metrics, indent=2), flush=True)
    add_plain, csv_path = add_contrast_from_csv(out_dir, args.root)

    report["eval"] = {k: float(v) for k, v in metrics.items()}
    report["plain_add_recall_0.1d"] = add_plain
    report["csv"] = csv_path
    report["note"] = (
        "plain ADD near zero + high ADD-S is the designed signature: "
        "the net learns the canonical label so decode returns the "
        "canonical z-rotation representative")

    # ---- BOP19 score of the symmetric CSV (sym-aware MSSD/MSPD) ------
    from zebrapose_tpu.eval.bop_score import score_csv
    scores = score_csv(csv_path, args.root, "lmo")
    report["bop19"] = {k: v for k, v in scores.items()
                      if k != "per_object"}
    print(json.dumps(report["bop19"], indent=2), flush=True)

    os.makedirs(os.path.dirname(args.report), exist_ok=True)
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
    print(f"[done] -> {args.report}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
