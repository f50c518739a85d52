"""Full-shape training dress rehearsal (round-2, VERDICT item 4).

Exercises the COMPLETE production stack at the reference's real shapes —
not the 64^2 miniature of scripts/validate_training.py:

  L0  native partitioner + rasterizer build a 2^16-class surface code
      over a ~70k-vertex mesh and render 480x640 GT labels,
  L1  a real BOP-layout tree on disk, walked by bop_io/CropDatasetHost,
      host collate through MixedBatchIterator worker threads,
  L2/3 preprocess_batch (crop 256 / GT 128, GDR-Net augmentation) ->
      ZebraPoseNet v2 (ResNet34-OS8, bf16) -> full loss stack,
  L4  build_train_setup + fit with validation-in-training (full decode
      -> EPnP-RANSAC -> ADD recall) and best-checkpoint selection.

The RGB is a smooth position-coded rendering of the object (plus noise
and a random background), so rgb -> surface code is learnable but NOT
trivially invertible after color augmentation — low code bits keep a
realistic error floor.

No ImageNet .pth exists in this environment, so the backbone trains from
scratch (explicit opt-out); with pretrained weights the same script is
the real-data recipe.

Run on the TPU:  python scripts/rehearsal_full_shape.py [--steps N]
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

IMG_W, IMG_H = 640, 480
K = np.array([[572.4114, 0, 325.2611],
              [0, 573.57043, 242.04899],
              [0, 0, 1]], np.float64)
RADIUS = 40.0  # mm -> diameter 80
N_BITS = 16


def uv_sphere(n_theta=260, n_phi=270, radius=RADIUS):
    """~70k-vertex UV sphere (needs > 2^16 vertices for a 16-level
    binary partition, reference requirement)."""
    thetas = np.linspace(0, np.pi, n_theta)
    phis = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    T, P = np.meshgrid(thetas, phis, indexing="ij")
    pts = np.stack([radius * np.sin(T) * np.cos(P),
                    radius * np.sin(T) * np.sin(P),
                    radius * np.cos(T)], axis=-1).reshape(-1, 3)
    idx = np.arange(n_theta * n_phi).reshape(n_theta, n_phi)
    faces = []
    for i in range(n_theta - 1):
        for j in range(n_phi):
            j2 = (j + 1) % n_phi
            a, b, c, d = idx[i, j], idx[i, j2], idx[i + 1, j], idx[i + 1, j2]
            faces.append([a, b, c])
            faces.append([b, d, c])
    return pts.astype(np.float32), np.asarray(faces, np.int64)


def random_pose(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = np.array([rng.uniform(-40, 40), rng.uniform(-30, 30),
                  rng.uniform(480, 650)])
    return q, t


def build_tree(root, n_train=160, n_val=40, seed=0):
    from zebrapose_tpu import native
    from zebrapose_tpu.data.bop_io import save_ply
    from zebrapose_tpu.tools.generate_gt import generate_mesh_surface_code

    rng = np.random.default_rng(seed)
    ds = os.path.join(root, "lmo")
    pts, faces = uv_sphere()
    for d in ("models", "models_eval"):
        os.makedirs(os.path.join(ds, d), exist_ok=True)
        save_ply(os.path.join(ds, d, "obj_000001.ply"), pts, faces=faces)
        with open(os.path.join(ds, d, "models_info.json"), "w") as f:
            json.dump({"1": {"diameter": 2 * RADIUS}}, f)
    with open(os.path.join(ds, "camera.json"), "w") as f:
        json.dump({"cx": K[0, 2], "cy": K[1, 2], "fx": K[0, 0],
                   "fy": K[1, 1], "width": IMG_W, "height": IMG_H,
                   "depth_scale": 1.0}, f)

    os.makedirs(os.path.join(ds, "models_GT_color"), exist_ok=True)
    t0 = time.time()
    lut, face_class = generate_mesh_surface_code(
        os.path.join(ds, "models", "obj_000001.ply"), 2, N_BITS,
        os.path.join(ds, "models_GT_color", "Class_CorresPoint000001.txt"))
    print(f"[L0] partitioned {len(pts)} vertices into 2^{N_BITS} classes "
          f"({time.time() - t0:.1f}s)", flush=True)

    # face index render -> both the GT label (via face_class) and a
    # smooth position-coded RGB (via face centroid)
    face_centroid = pts[faces].mean(axis=1)
    pos_color = ((face_centroid / RADIUS) * 0.5 + 0.5)  # [0,1]^3
    pos_color = np.concatenate([np.zeros((1, 3)), pos_color])  # bg row
    face_label = np.concatenate([[0], face_class])

    from zebrapose_tpu.codec.surface_code import class_id_to_rgb
    import jax.numpy as jnp

    for split, n_imgs in (("train_real", n_train), ("test", n_val)):
        scene = os.path.join(ds, split, "000001")
        write_depth = split == "test"  # VSD needs test-split depth
        subdirs = ("rgb", "mask", "mask_visib") + (
            ("depth",) if write_depth else ())
        for sub in subdirs:
            os.makedirs(os.path.join(scene, sub), exist_ok=True)
        gt_dir = os.path.join(ds, split + "_GT_v2", "000001")
        os.makedirs(gt_dir, exist_ok=True)
        cam, gt, gti = {}, {}, {}
        t0 = time.time()
        for im in range(n_imgs):
            R, t = random_pose(rng)
            fidx, depth = native.render_label(
                pts, faces.astype(np.int32),
                np.arange(1, len(faces) + 1, dtype=np.int32),
                K, R, t, IMG_W, IMG_H, with_depth=write_depth)
            if write_depth:
                cv2.imwrite(os.path.join(scene, "depth", f"{im:06d}.png"),
                            np.round(depth).astype(np.uint16))
            label_ids = face_label[fidx]
            label = np.asarray(class_id_to_rgb(jnp.asarray(label_ids)))
            mask = (fidx > 0).astype(np.uint8) * 255

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
            cv2.imwrite(os.path.join(gt_dir, f"{im:06d}_000000.png"),
                        label)
            ys, xs = np.nonzero(mask)
            bbox = [int(xs.min()), int(ys.min()),
                    int(xs.max() - xs.min() + 1),
                    int(ys.max() - ys.min() + 1)]
            cam[str(im)] = {"cam_K": K.reshape(-1).tolist(),
                            "depth_scale": 1.0}
            gt[str(im)] = [{"cam_R_m2c": R.reshape(-1).tolist(),
                            "cam_t_m2c": t.tolist(), "obj_id": 1}]
            gti[str(im)] = [{"bbox_visib": bbox, "visib_fract": 1.0}]
        for name, obj in (("scene_camera", cam), ("scene_gt", gt),
                          ("scene_gt_info", gti)):
            with open(os.path.join(scene, f"{name}.json"), "w") as f:
                json.dump(obj, f)
        print(f"[L0] rendered {n_imgs} {split} images "
              f"({time.time() - t0:.1f}s)", flush=True)
    return ds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--log_freq", type=int, default=500)
    ap.add_argument("--root", default="/tmp/zebra_rehearsal")
    ap.add_argument("--n_train", type=int, default=160)
    ap.add_argument("--n_val", type=int, default=40,
                    help="val frames; round-2 used 40 which makes the "
                         "recall curve noisy (VERDICT r2 weak #6) — "
                         "120 stabilizes best-ckpt selection")
    ap.add_argument("--out", default="/tmp/zebra_rehearsal/run")
    ap.add_argument("--resume", action="store_true",
                    help="restore the latest checkpoint in --out and "
                         "continue for --steps more steps")
    ap.add_argument("--qat", action="store_true",
                    help="quantization-aware fine-tune: convs run the "
                         "differentiable int8 simulation (CLI --qat "
                         "equivalent). Typical use: copy a trained run "
                         "dir, then --resume --qat for a few hundred "
                         "steps; serve the result with --int8 "
                         "(scripts/int8_eval.py --run <out>)")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/zebrapose_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    if not os.path.exists(os.path.join(args.root, "lmo", "test")):
        build_tree(args.root, n_train=args.n_train, n_val=args.n_val)
    else:
        print("[L0] reusing existing tree", flush=True)

    from zebrapose_tpu.config import ZebraConfig
    from zebrapose_tpu.ops.pnp import PnPConfig
    from zebrapose_tpu.train.trainer import build_train_setup, fit

    cfg = ZebraConfig.from_dict({
        "bop_path": args.root, "dataset_name": "lmo",
        "training_data_folder": "train_real",
        "training_data_folder_2": "none",
        "val_folder": "test", "test_folder": "test",
        "BoundingBox_CropSize_image": 256,
        "BoundingBox_CropSize_GT": 128,
        "divide_number_each_itration": 2, "number_of_itration": N_BITS,
        "batch_size": 32, "total_iteration": 380000,
        "learning_rate": 2e-4, "num_workers": 8,
        "train_obj_visible_theshold": 0.2,
        "use_histgramm_weighted_binary_loss": True,
        "load_checkpoint": args.resume,
    })
    res = build_train_setup(cfg, "ape", args.out,
                            pretrained_backbone=None,  # no .pth in env
                            bf16=True,
                            qat=args.qat,
                            cache_images=True,   # val collate from RAM
                            device_cache=True)   # train pixels in HBM:
    # indices-only input removes the 75 MB/step H2D stream — the axon
    # tunnel moves ~40 MB/s and leaks every device_put staging buffer,
    # so streaming full frames is both 10x slower than the chip and an
    # OOM within ~1.5k steps.
    import dataclasses
    res = dataclasses.replace(
        res, pnp_cfg=PnPConfig(n_hypotheses=64, max_points=2048))
    t0 = time.time()
    best = fit(res, log_freq=args.log_freq, max_steps=args.steps)
    dt = time.time() - t0
    print(f"\nbest ADD recall@0.1d: {best:.3f}  "
          f"({args.steps} steps in {dt / 60:.1f} min, "
          f"{dt / args.steps * 1e3:.0f} ms/step incl. host+val)",
          flush=True)


if __name__ == "__main__":
    main()
