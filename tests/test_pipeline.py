"""Host dataset + device preprocessing pipeline tests.

The cv2 oracle reproduces the reference's preprocessing contract on the
host (square crop + zero pad + cv2.resize, RGB->id->bit planes) and must
match the fused device program bit-for-bit on masks/codes and to float
tolerance on the image.
"""

import json
import os

import cv2
import numpy as np
import jax
import pytest

from zebrapose_tpu.data.pipeline import (
    CropDatasetHost,
    MixedBatchIterator,
    preprocess_batch,
)

H, W = 96, 128
K_LIST = [500.0, 0.0, 64.0, 0.0, 500.0, 48.0, 0, 0, 1.0]


def _write_scene(tmp_path, n_imgs=3, gt_suffix="_GT_v2"):
    ds = tmp_path / "bop" / "lmo"
    scene = ds / "test" / "000002"
    (scene / "rgb").mkdir(parents=True)
    (scene / "mask").mkdir()
    (scene / "mask_visib").mkdir()
    gt_dir = ds / ("test" + gt_suffix) / "000002"
    gt_dir.mkdir(parents=True)
    rng = np.random.default_rng(50)
    rgb_files, mask_files, maskv_files, gts, gtis, cams = [], [], [], [], \
        [], []
    for im in range(n_imgs):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(str(scene / "rgb" / f"{im:06d}.png"), img)
        m = np.zeros((H, W), np.uint8)
        m[30:70, 40:90] = 255
        cv2.imwrite(str(scene / "mask" / f"{im:06d}_000000.png"), m)
        cv2.imwrite(str(scene / "mask_visib" / f"{im:06d}_000000.png"), m)
        label = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        label[m == 0] = 0
        cv2.imwrite(str(gt_dir / f"{im:06d}_000000.png"), label)
        rgb_files.append(str(scene / "rgb" / f"{im:06d}.png"))
        mask_files.append([str(scene / "mask" / f"{im:06d}_000000.png")])
        maskv_files.append(
            [str(scene / "mask_visib" / f"{im:06d}_000000.png")])
        gts.append({"cam_R_m2c": np.eye(3), "cam_t_m2c": np.zeros(3),
                    "obj_id": 1})
        gtis.append({"bbox_visib": [40, 30, 50, 40], "visib_fract": 0.9})
        cams.append({"cam_K": np.array(K_LIST).reshape(3, 3)})
    return str(ds), rgb_files, mask_files, maskv_files, gts, gtis, cams


def _mk_ds(tmp_path, is_train, **kw):
    ds_dir, rgb, mask, maskv, gts, gtis, cams = _write_scene(tmp_path)
    return CropDatasetHost(ds_dir, "test", rgb, mask, maskv, gts, gtis,
                           cams, is_train=is_train, crop_size_img=64,
                           crop_size_gt=32, **kw)


def test_eval_preprocess_matches_cv2_oracle(tmp_path):
    ds = _mk_ds(tmp_path, is_train=False)
    raw = ds.collate([0, 1])
    out = preprocess_batch(
        {k: raw[k] for k in ("rgb", "label", "mask", "entire_mask",
                             "roi_param", "valid")},
        jax.random.PRNGKey(0), crop_img=64, crop_gt=32, n_bits=16,
        is_train=False)

    # oracle for sample 0: padding_Bbox(1.5) -> square crop
    from zebrapose_tpu.ops.roi import padding_bbox, square_bbox
    bbox = padding_bbox([40, 30, 50, 40], 1.5)
    x1, y1, x2, y2, side = square_bbox(bbox)
    assert raw["roi_param"][0].tolist() == [x1, y1, x2, y2, side]

    img = cv2.imread(ds.rgb_files[0])
    roi = np.zeros((side, side, 3), img.dtype)
    sy, sx = max(-y1, 0), max(-x1, 0)
    roi[sy:sy + min(y2, H) - max(y1, 0), sx:sx + min(x2, W) - max(x1, 0)] \
        = img[max(y1, 0):min(y2, H), max(x1, 0):min(x2, W)]
    expect_rgb = cv2.resize(roi, (64, 64), interpolation=cv2.INTER_LINEAR)
    mean = np.array([0.485, 0.456, 0.406])
    std = np.array([0.229, 0.224, 0.225])
    expect_img = (expect_rgb / 255.0 - mean) / std
    got = np.asarray(out["image"][0])
    assert np.abs(got - expect_img).max() < 2.5e-2  # cv2 u8 rounding (1 LSB / std)

    # mask: exact
    m = cv2.imread(ds.mask_visib_files[0][0], 0)
    roi_m = np.zeros((side, side), m.dtype)
    roi_m[sy:sy + min(y2, H) - max(y1, 0),
          sx:sx + min(x2, W) - max(x1, 0)] = \
        m[max(y1, 0):min(y2, H), max(x1, 0):min(x2, W)]
    expect_m = cv2.resize(roi_m, (32, 32),
                          interpolation=cv2.INTER_NEAREST) / 255.0
    np.testing.assert_array_equal(np.asarray(out["mask"][0]), expect_m)

    # code: nearest label crop -> id -> bits, exact
    lab = cv2.imread(ds._gt_label_path(0))
    roi_l = np.zeros((side, side, 3), lab.dtype)
    roi_l[sy:sy + min(y2, H) - max(y1, 0),
          sx:sx + min(x2, W) - max(x1, 0)] = \
        lab[max(y1, 0):min(y2, H), max(x1, 0):min(x2, W)]
    lab32 = cv2.resize(roi_l, (32, 32), interpolation=cv2.INTER_NEAREST)
    ids = (lab32[..., 0].astype(np.int64) << 16) + \
        (lab32[..., 1].astype(np.int64) << 8) + lab32[..., 2]
    bits = np.stack([(ids >> (15 - i)) & 1 for i in range(16)], -1)
    np.testing.assert_array_equal(np.asarray(out["code"][0]), bits)


def test_train_preprocess_augments_and_shapes(tmp_path):
    ds = _mk_ds(tmp_path, is_train=True)
    raw = ds.collate([0, 1, 2])
    out = preprocess_batch(
        {k: raw[k] for k in ("rgb", "label", "mask", "entire_mask",
                             "roi_param", "valid")},
        jax.random.PRNGKey(1), crop_img=64, crop_gt=32, n_bits=16,
        is_train=True)
    assert out["image"].shape == (3, 64, 64, 3)
    assert out["code"].shape == (3, 32, 32, 16)
    assert np.isfinite(np.asarray(out["image"])).all()
    # bbox jitter: raw params differ across repeated draws
    raw2 = ds.collate([0])
    assert not np.array_equal(raw["roi_param"][0], raw2["roi_param"][0])


def test_dummy_detection_zeroes_sample(tmp_path):
    ds = _mk_ds(tmp_path, is_train=False,
                detect_bboxes=[None, np.array([-1, -1, -1, -1]),
                               np.array([40, 30, 50, 40])])
    raw = ds.collate([0, 1, 2])
    assert raw["valid"].tolist() == [0.0, 0.0, 1.0]
    out = preprocess_batch(
        {k: raw[k] for k in ("rgb", "label", "mask", "entire_mask",
                             "roi_param", "valid")},
        jax.random.PRNGKey(0), crop_img=64, crop_gt=32, n_bits=16,
        is_train=False)
    np.testing.assert_array_equal(np.asarray(out["image"][0]), 0.0)
    np.testing.assert_array_equal(np.asarray(out["mask"][1]), 0.0)
    assert np.any(np.asarray(out["mask"][2]) > 0)


def test_mixed_iterator_ratio(tmp_path):
    ds1 = _mk_ds(tmp_path, is_train=True)
    ds2 = CropDatasetHost(ds1.dataset_dir, "test", ds1.rgb_files,
                          ds1.mask_files, ds1.mask_visib_files, ds1.gts,
                          ds1.gt_infos, ds1.cam_params, is_train=True,
                          crop_size_img=64, crop_size_gt=32)
    it = MixedBatchIterator(ds1, ds2, batch_size=8,
                            second_dataset_ratio=0.75)
    batch = next(it)
    assert batch["rgb"].shape[0] == 8  # 2 from ds1 + 6 from ds2
    it.close()
    # without a second dataset the full batch comes from ds1
    it1 = MixedBatchIterator(ds1, None, batch_size=4)
    assert next(it1)["rgb"].shape[0] == 4
    it1.close()


def test_cache_images_identical_and_survives_file_removal(tmp_path):
    """cache_images=True: collate output identical to uncached; after the
    first read the files can disappear (proves decode is served from RAM,
    the 1-core-host input-pipeline fix)."""
    import os

    ds_plain = _mk_ds(tmp_path, is_train=False)
    raw_plain = ds_plain.collate([0, 1, 2])

    ds_cached = CropDatasetHost(
        ds_plain.dataset_dir, "test", ds_plain.rgb_files,
        ds_plain.mask_files, ds_plain.mask_visib_files, ds_plain.gts,
        ds_plain.gt_infos, ds_plain.cam_params, is_train=False,
        crop_size_img=64, crop_size_gt=32, cache_images=True)
    raw_c1 = ds_cached.collate([0, 1, 2])
    for k in raw_plain:
        np.testing.assert_array_equal(raw_plain[k], raw_c1[k])

    for fn in ds_cached.rgb_files:
        os.remove(fn)
    raw_c2 = ds_cached.collate([0, 1, 2])
    np.testing.assert_array_equal(raw_c1["rgb"], raw_c2["rgb"])


def test_device_cache_matches_streaming(tmp_path):
    """gather_preprocess_batch over a DeviceDatasetCache must produce
    exactly the batch preprocess_batch produces from host collate, given
    the same draws/params."""
    from zebrapose_tpu.data.pipeline import (CachedBatchIterator,
                                             DeviceDatasetCache,
                                             gather_preprocess_batch)

    ds = _mk_ds(tmp_path, is_train=True)
    cache = DeviceDatasetCache([ds])
    assert len(cache) == len(ds)
    it = CachedBatchIterator(cache, batch_size=4, seed=3)
    raw = next(it)
    assert raw["idx"].shape == (4,) and raw["roi_param"].shape[0] == 4

    key = jax.random.PRNGKey(7)
    cached = gather_preprocess_batch(
        cache.arrays, raw["idx"], raw["roi_param"], raw["valid"], key,
        crop_img=64, crop_gt=32)

    # streaming reference with the SAME pixels and params
    px = [ds.get_pixels(int(i)) for i in raw["idx"]]
    feed = {k: np.stack([p[k] for p in px])
            for k in ("rgb", "label", "mask", "entire_mask")}
    feed["roi_param"] = raw["roi_param"]
    feed["valid"] = raw["valid"]
    streamed = preprocess_batch(feed, key, crop_img=64, crop_gt=32,
                                is_train=True)
    for k in ("image", "mask", "entire_mask", "code"):
        np.testing.assert_array_equal(np.asarray(cached[k]),
                                      np.asarray(streamed[k]), err_msg=k)


def test_device_prefetch_matches_inner(tmp_path):
    """DevicePrefetchIterator must yield the same feed the wrapped
    iterator would produce, already placed as committed jax.Arrays with
    the batch sharding (so fit can skip shard_batch)."""
    from zebrapose_tpu.data.pipeline import DevicePrefetchIterator
    from zebrapose_tpu.parallel.mesh import batch_sharding, make_mesh

    ds = _mk_ds(tmp_path, is_train=False)
    # same seed + no worker pool -> identical draw sequences
    inner = MixedBatchIterator(ds, None, batch_size=8, seed=5,
                               num_workers=0)
    oracle = MixedBatchIterator(ds, None, batch_size=8, seed=5,
                                num_workers=0)
    mesh = make_mesh()
    pref = DevicePrefetchIterator(inner, mesh)
    assert pref.device_resident
    try:
        sh = batch_sharding(mesh)
        for _ in range(3):
            feed = next(pref)
            raw = next(oracle)
            assert set(feed) == set(DevicePrefetchIterator.FEED_KEYS)
            for k in feed:
                assert isinstance(feed[k], jax.Array), k
                assert feed[k].sharding.is_equivalent_to(sh, feed[k].ndim)
                np.testing.assert_array_equal(np.asarray(feed[k]), raw[k],
                                              err_msg=k)
    finally:
        pref.close()
        oracle.close()
    # close() must also stop the wrapped iterator's prefetch thread
    assert not inner._thread.is_alive()


def test_device_prefetch_propagates_worker_errors(tmp_path):
    """A failing wrapped iterator must surface in __next__, not hang the
    consumer forever (the worker used to die silently)."""
    from zebrapose_tpu.data.pipeline import DevicePrefetchIterator
    from zebrapose_tpu.parallel.mesh import make_mesh

    class Boom:
        def __next__(self):
            raise RuntimeError("corrupt sample")

    pref = DevicePrefetchIterator(Boom(), make_mesh())
    try:
        with pytest.raises(RuntimeError, match="corrupt sample"):
            next(pref)
    finally:
        pref.close()


def test_run_inference_consumer_failure_stops_producer(tmp_path):
    """If the eval step raises, run_inference must re-raise AND stop its
    producer thread (no leaked daemon blocked on the bounded queue)."""
    import threading

    from zebrapose_tpu.eval.evaluate import run_inference

    ds = _mk_ds(tmp_path, is_train=False)
    before = set(threading.enumerate())

    def bad_step(feed, bbox, K, key, variables):
        raise RuntimeError("device exploded")

    with pytest.raises(RuntimeError, match="device exploded"):
        run_inference(ds, bad_step, batch_size=2)
    leaked = [t for t in threading.enumerate()
              if t not in before and t.is_alive()]
    assert not leaked, leaked


def test_cached_iterator_mixed_ratio(tmp_path):
    from zebrapose_tpu.data.pipeline import (CachedBatchIterator,
                                             DeviceDatasetCache)

    ds1 = _mk_ds(tmp_path, is_train=True)
    ds2 = CropDatasetHost(ds1.dataset_dir, "test", ds1.rgb_files,
                          ds1.mask_files, ds1.mask_visib_files, ds1.gts,
                          ds1.gt_infos, ds1.cam_params, is_train=True,
                          crop_size_img=64, crop_size_gt=32)
    cache = DeviceDatasetCache([ds1, ds2])
    it = CachedBatchIterator(cache, batch_size=8,
                             second_dataset_ratio=0.75, seed=0)
    raw = next(it)
    n1 = len(ds1)
    assert (raw["idx"][:2] < n1).all()      # 8 - 6 from ds1
    assert (raw["idx"][2:] >= n1).all()     # 6 from ds2
