"""AOT serving export: the production eval program serialized via
jax.export with weights + LUT baked in. The blob must (a) round-trip
bit-exactly against the live make_eval_step program it wraps, (b) carry
its shape/platform metadata, (c) drive a dataset walk with tail-batch
padding identical to run_inference's."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zebrapose_tpu.codec.lut import CorrespondenceLUT
from zebrapose_tpu.eval.evaluate import make_eval_step
from zebrapose_tpu.eval.export_serving import (
    MAGIC,
    build_serving_fn,
    export_serving,
    load_serving,
    serve_dataset,
)
from zebrapose_tpu.models.zebra_net import ZebraPoseNet
from zebrapose_tpu.ops.pnp import PnPConfig

H, W = 96, 128
N_BITS = 16
PNP = PnPConfig(n_hypotheses=16, max_points=512)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    model = ZebraPoseNet(binary_code_length=N_BITS, variant="v2",
                         concat=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3), jnp.float32),
                           train=False)
    pts = rng.uniform(-30, 30, (2 ** N_BITS, 3)).astype(np.float32)
    lut = CorrespondenceLUT(pts, np.ones((2 ** N_BITS,), bool),
                            base=2, n_digits=N_BITS)
    serve = build_serving_fn(
        model, variables, lut, crop_img=128, crop_gt=64, base=2,
        n_bits=N_BITS, resize_method="crop_square_resize",
        loss_type="BCE", pnp_cfg=PNP)
    return model, variables, lut, serve


def _feed(batch, rng):
    rgb = rng.integers(0, 255, (batch, H, W, 3)).astype(np.uint8)
    roi = np.tile(np.array([[40, 28, 92, 72, 128]], np.int32), (batch, 1))
    valid = np.ones((batch,), np.float32)
    fb = np.tile(np.array([[38, 26, 64, 64]], np.int32), (batch, 1))
    K = np.tile(np.array([[[400.0, 0, 64], [0, 400.0, 48], [0, 0, 1]]],
                         np.float32), (batch, 1, 1))
    return rgb, roi, valid, fb, K


def test_export_roundtrip_bit_exact(setup, tmp_path):
    model, variables, lut, serve = setup
    blob = export_serving(serve, batch=2, image_hw=(H, W))
    assert blob[:len(MAGIC)] == MAGIC

    path = tmp_path / "ape.serving"
    path.write_bytes(blob)
    prog = load_serving(str(path))
    assert prog.batch == 2
    assert prog.image_hw == (H, W)
    assert len(prog.platforms) >= 1

    rng = np.random.default_rng(11)
    key = jax.random.PRNGKey(5)
    rgb, roi, valid, fb, K = _feed(2, rng)
    args = (jnp.asarray(rgb), jnp.asarray(roi), jnp.asarray(valid),
            jnp.asarray(fb), jnp.asarray(K), key)
    got = prog(*args)

    # the live production program with the same key
    step = make_eval_step(
        lambda b, v: model.apply(v, b["image"], train=False), lut,
        crop_img=128, crop_gt=64, base=2, n_bits=N_BITS,
        resize_method="crop_square_resize", loss_type="BCE",
        pnp_cfg=PNP, preprocess_gt=False)
    raw = {"rgb": args[0], "roi_param": args[1], "valid": args[2]}
    want = step(raw, args[3], args[4], key, variables)

    assert len(got) == len(want) == 4
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_load_rejects_bad_header(tmp_path):
    p = tmp_path / "bad.serving"
    p.write_bytes(b"not a serving artifact")
    with pytest.raises(ValueError, match="bad header"):
        load_serving(str(p))


def test_mask_from_dataset_rejected(setup):
    model, variables, lut, _ = setup
    with pytest.raises(ValueError, match="serving signature"):
        build_serving_fn(model, variables, lut, crop_img=128, crop_gt=64,
                         base=2, n_bits=N_BITS,
                         resize_method="crop_square_resize",
                         loss_type="BCE", pnp_cfg=PNP,
                         mask_from_dataset=True)


def test_poly_batch_export_serves_any_batch(setup, tmp_path):
    """batch=None exports a symbolic batch dimension: one blob answers
    any batch size, numerically matching the live program."""
    model, variables, lut, serve = setup
    blob = export_serving(serve, batch=None, image_hw=(H, W))
    prog = load_serving(blob)
    assert prog.batch is None and prog.meta["poly_batch"]

    step = make_eval_step(
        lambda b, v: model.apply(v, b["image"], train=False), lut,
        crop_img=128, crop_gt=64, base=2, n_bits=N_BITS,
        resize_method="crop_square_resize", loss_type="BCE",
        pnp_cfg=PNP, preprocess_gt=False)
    rng = np.random.default_rng(13)
    for batch in (2, 3):
        key = jax.random.PRNGKey(batch)
        rgb, roi, valid, fb, K = _feed(batch, rng)
        args = (jnp.asarray(rgb), jnp.asarray(roi), jnp.asarray(valid),
                jnp.asarray(fb), jnp.asarray(K), key)
        got = prog(*args)
        raw = {"rgb": args[0], "roi_param": args[1], "valid": args[2]}
        want = step(raw, args[3], args[4], key, variables)
        np.testing.assert_array_equal(np.asarray(got[2]),
                                      np.asarray(want[2]))  # success
        for g, w in zip(got[:2], want[:2]):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=1e-5)

    # the dataset driver picks its own batch for poly blobs
    ds = _StubDataset()
    Rs, ts, ok = serve_dataset(prog, ds, seed=4, batch_size=2)
    assert Rs.shape == (3, 3, 3) and ok.shape == (3,)


def test_cross_lower_tpu_blob_with_forced_pallas(setup):
    """Production TPU artifacts are buildable from a cpu-default host:
    platforms=['tpu'] + use_kernel=True lowers the Pallas hypothesis
    kernel via Mosaic AOT and the blob round-trips with its platform
    metadata (execution obviously needs a TPU)."""
    from zebrapose_tpu.eval.export_serving import build_serving_fn

    model, variables, lut, _ = setup
    serve = build_serving_fn(
        model, variables, lut, crop_img=128, crop_gt=64, base=2,
        n_bits=N_BITS, resize_method="crop_square_resize",
        loss_type="BCE", pnp_cfg=PNP, use_kernel=True)
    blob = export_serving(serve, batch=2, image_hw=(H, W),
                          platforms=["tpu"])
    prog = load_serving(blob)
    assert prog.platforms == ("tpu",)
    assert prog.batch == 2


def test_fleet_export_roundtrip_bit_exact(setup):
    """A K=2 fleet artifact must reproduce the live fleet program
    (itself pinned bit-exact per object to make_eval_step in
    test_fleet_serve.py)."""
    from zebrapose_tpu.eval.export_serving import build_fleet_serving_fn
    from zebrapose_tpu.eval.fleet_serve import (make_fleet_eval_step,
                                                stack_luts,
                                                stack_variables)

    model, variables, lut, _ = setup
    variables2 = model.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 128, 128, 3), jnp.float32),
                            train=False)
    lut2 = CorrespondenceLUT(np.roll(lut.points, 5, axis=0), lut.valid,
                             base=2, n_digits=N_BITS)
    kw = dict(crop_img=128, crop_gt=64, base=2, n_bits=N_BITS,
              resize_method="crop_square_resize", loss_type="BCE",
              pnp_cfg=PNP)
    serve = build_fleet_serving_fn(model, [variables, variables2],
                                   [lut, lut2], **kw)
    blob = export_serving(serve, batch=2, image_hw=(H, W), n_models=2,
                          meta={"obj_names": ["ape", "cat"]})
    prog = load_serving(blob)
    assert prog.n_models == 2 and prog.batch == 2 and prog.rows == 4
    assert prog.meta["obj_names"] == ["ape", "cat"]

    rng = np.random.default_rng(21)
    key = jax.random.PRNGKey(3)
    rgb, roi, valid, fb, K = _feed(4, rng)
    args = (jnp.asarray(rgb), jnp.asarray(roi), jnp.asarray(valid),
            jnp.asarray(fb), jnp.asarray(K), key)
    got = prog(*args)
    assert np.asarray(got[0]).shape == (2, 2, 3, 3)

    lp, lv = stack_luts([lut, lut2])
    step = make_fleet_eval_step(
        lambda b, v: model.apply(v, b["image"], train=False), lp, lv,
        **kw)
    raw = {"rgb": args[0], "roi_param": args[1], "valid": args[2]}
    want = step(raw, args[3], args[4], key,
                stack_variables([variables, variables2]), n_models=2)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_fleet_guards(setup):
    from zebrapose_tpu.eval.export_serving import (build_fleet_serving_fn,
                                                   serve_fleet_datasets)

    model, variables, lut, serve = setup
    fleet = build_fleet_serving_fn(
        model, [variables, variables], [lut, lut], crop_img=128,
        crop_gt=64, base=2, n_bits=N_BITS,
        resize_method="crop_square_resize", loss_type="BCE", pnp_cfg=PNP)
    blob = export_serving(fleet, batch=1, image_hw=(H, W), n_models=2)
    prog = load_serving(blob)
    with pytest.raises(ValueError, match="serve_fleet_datasets"):
        serve_dataset(prog, _StubDataset())
    with pytest.raises(ValueError, match="2 models"):
        serve_fleet_datasets(prog, [_StubDataset()])


class _StubDataset:
    """collate-compatible stand-in: 3 samples, so batch=2 forces one
    zero-padded tail batch (valid=0 marks padding). Includes the GT
    channels the production drivers' feed extraction expects."""

    def __init__(self):
        rng = np.random.default_rng(3)
        self.raws = [_feed(1, rng) for _ in range(3)]

    def __len__(self):
        return 3

    def collate(self, indices):
        parts = [self.raws[i] for i in indices]
        names = ("rgb", "roi_param", "valid", "final_bbox", "K")
        out = {n: np.concatenate([p[j] for p in parts])
               for j, n in enumerate(names)}
        m = len(indices)
        out["label"] = np.zeros((m, H, W, 3), np.uint8)
        out["mask"] = np.zeros((m, H, W), np.uint8)
        out["entire_mask"] = np.zeros((m, H, W), np.uint8)
        return out


def test_roi_slice_blob_matches_live_full_frame(setup, tmp_path):
    """A blob exported with roi_slice metadata at the walk's buffer
    dims, served through _check_frame_size (which flips the dataset
    into slice mode), must reproduce the live full-frame program's
    poses bit-for-bit — the slice is exact and the blob adds nothing."""
    from test_roi_slice import BBOXES, _write_scene
    from zebrapose_tpu.data.pipeline import CropDatasetHost
    from zebrapose_tpu.eval.evaluate import run_inference
    from zebrapose_tpu.eval.export_serving import _check_frame_size

    model, variables, lut, serve = setup
    tree = _write_scene(tmp_path, len(BBOXES))
    ds_dir, rgb, mask, maskv, gts, gtis, cams = tree

    def _mk():
        return CropDatasetHost(ds_dir, "test", rgb, mask, maskv, gts,
                               gtis, cams, is_train=False,
                               crop_size_img=128, crop_size_gt=64,
                               detect_bboxes=list(BBOXES))

    step = make_eval_step(
        lambda b, v: model.apply(v, b["image"], train=False), lut,
        crop_img=128, crop_gt=64, base=2, n_bits=N_BITS,
        resize_method="crop_square_resize", loss_type="BCE",
        pnp_cfg=PNP, preprocess_gt=False)
    live = run_inference(_mk(), step, batch_size=2, seed=3,
                         variables=variables)

    sliced = _mk()
    hw = sliced.natural_slice_hw()
    blob = export_serving(serve, batch=2, image_hw=hw,
                          meta={"roi_slice": True})
    prog = load_serving(blob)
    assert prog.meta["roi_slice"] is True
    _check_frame_size(prog, sliced)          # flips + imposes hw
    assert sliced.roi_slice and sliced.get_raw(0)["rgb"].shape[:2] == hw
    got = serve_dataset(prog, sliced, seed=3)
    for a, b in zip(live, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_serve_dataset_pads_tail(setup, tmp_path):
    _, _, _, serve = setup
    blob = export_serving(serve, batch=2, image_hw=(H, W))
    prog = load_serving(blob)

    ds = _StubDataset()
    Rs, ts, ok = serve_dataset(prog, ds, seed=9)
    assert Rs.shape == (3, 3, 3) and ts.shape == (3, 3)
    assert ok.shape == (3,) and ok.dtype == bool

    # first full batch must equal a direct call with run_inference's
    # key stream (fold_in(PRNGKey(seed), batch_start))
    raw = ds.collate([0, 1])
    direct = prog(jnp.asarray(raw["rgb"]),
                  jnp.asarray(raw["roi_param"].astype(np.int32)),
                  jnp.asarray(raw["valid"].astype(np.float32)),
                  jnp.asarray(raw["final_bbox"].astype(np.int32)),
                  jnp.asarray(raw["K"].astype(np.float32)),
                  jax.random.fold_in(jax.random.PRNGKey(9), 0))
    np.testing.assert_array_equal(Rs[:2], np.asarray(direct[0]))
    np.testing.assert_array_equal(ts[:2], np.asarray(direct[1]))
