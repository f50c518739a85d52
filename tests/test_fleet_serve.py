"""Fleet serving (eval/fleet_serve.py): the K-object single-program eval
must reproduce the single-object make_eval_step BIT-EXACTLY per object
(same preprocess, same forward math, same RANSAC keys via
fold_in(key, k)), on both the single-device vmap path and the
shard_map-over-model-axis path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_eval_e2e import N_BITS, _build_scene, _gt_oracle_forward
from zebrapose_tpu.codec.lut import CorrespondenceLUT
from zebrapose_tpu.data.pipeline import CropDatasetHost
from zebrapose_tpu.eval.evaluate import make_eval_step
from zebrapose_tpu.eval.fleet_serve import (
    make_fleet_eval_step, stack_luts, stack_variables)
from zebrapose_tpu.ops.pnp import PnPConfig
from zebrapose_tpu.train.fleet import make_fleet_mesh

PNP = PnPConfig(n_hypotheses=32, max_points=512)


def _setup(tmp_path):
    ds_dir, lists, lut1 = _build_scene(tmp_path, n_imgs=3)
    rgb, mask, maskv, gts, gtis, cams = lists
    dataset = CropDatasetHost(ds_dir, "test", rgb, mask, maskv, gts,
                              gtis, cams, is_train=False,
                              crop_size_img=128, crop_size_gt=64)
    # object 2: same code space, different surface points (rolled) — a
    # real routing test: feeding object 2's crops through object 1's LUT
    # would change every pose
    lut2 = CorrespondenceLUT(np.roll(lut1.points, 7, axis=0),
                             np.roll(lut1.valid, 7), base=2,
                             n_digits=N_BITS)
    raw = dataset.collate(list(range(3)))
    feed1 = {k: raw[k] for k in ("rgb", "label", "mask", "entire_mask",
                                 "roi_param", "valid")}
    bbox = jnp.asarray(raw["final_bbox"].astype(np.int32))
    K = jnp.asarray(raw["K"])
    return (lut1, lut2), feed1, bbox, K


def test_fleet_serve_matches_single_object_steps(tmp_path):
    (lut1, lut2), feed, bbox, K = _setup(tmp_path)
    kw = dict(crop_img=128, crop_gt=64, base=2, n_bits=N_BITS,
              resize_method="crop_square_resize", loss_type="BCE",
              pnp_cfg=PNP)

    lp, lv = stack_luts([lut1, lut2])
    fleet_step = make_fleet_eval_step(_gt_oracle_forward, lp, lv,
                                      preprocess_gt=True, **kw)
    # both objects see the same crops here; distinct LUTs make their
    # decodes distinct
    cat = {kk: jnp.concatenate([v, v]) for kk, v in feed.items()}
    key = jax.random.PRNGKey(42)
    variables = stack_variables([{"w": jnp.zeros(1)}, {"w": jnp.zeros(1)}])
    R, t, ok, ninl = fleet_step(cat, jnp.concatenate([bbox, bbox]),
                                jnp.concatenate([K, K]), key, variables,
                                n_models=2)
    assert R.shape == (2, 3, 3, 3) and ok.shape == (2, 3)

    for k, lut in enumerate([lut1, lut2]):
        step = make_eval_step(_gt_oracle_forward, lut,
                              preprocess_gt=True, **kw)
        Rk, tk, okk, nk = step(feed, bbox, K,
                               jax.random.fold_in(key, k), {})
        np.testing.assert_array_equal(np.asarray(ok[k]), np.asarray(okk))
        np.testing.assert_array_equal(np.asarray(ninl[k]), np.asarray(nk))
        np.testing.assert_array_equal(np.asarray(R[k]), np.asarray(Rk))
        np.testing.assert_array_equal(np.asarray(t[k]), np.asarray(tk))

    # the two objects' poses genuinely differ (LUT routing is real)
    assert not np.allclose(np.asarray(t[0]), np.asarray(t[1]))

    # the oracle decode actually solves object 1 (its LUT matches the
    # rendered labels)
    assert np.asarray(ok[0]).all()


def test_fleet_serve_mask_from_dataset_matches_single(tmp_path):
    """Mask-RCNN fleet variant: the dataset mask (RLE-decoded upstream)
    gates each object's decode, bit-equal to the single-object
    make_eval_step(mask_from_dataset=True) per object."""
    (lut1, lut2), feed, bbox, K = _setup(tmp_path)
    kw = dict(crop_img=128, crop_gt=64, base=2, n_bits=N_BITS,
              resize_method="crop_square_resize", loss_type="BCE",
              pnp_cfg=PNP)
    lp, lv = stack_luts([lut1, lut2])
    fleet_step = make_fleet_eval_step(
        _gt_oracle_forward, lp, lv, mask_from_dataset=True, **kw)
    cat = {kk: jnp.concatenate([v, v]) for kk, v in feed.items()}
    key = jax.random.PRNGKey(3)
    variables = stack_variables([{"w": jnp.zeros(1)}, {"w": jnp.zeros(1)}])
    out = fleet_step(cat, jnp.concatenate([bbox, bbox]),
                     jnp.concatenate([K, K]), key, variables, n_models=2)
    for k, lut in enumerate([lut1, lut2]):
        single = make_eval_step(_gt_oracle_forward, lut,
                                mask_from_dataset=True,
                                preprocess_gt=False, **kw)(
            feed, bbox, K, jax.random.fold_in(key, k), {})
        for a, b in zip(out, single):
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b))
    assert np.asarray(out[2][0]).all()  # object 1 actually solves


def test_fleet_serve_return_masks_matches_single(tmp_path):
    """return_masks (the refine path's mask feed) must return each
    object's visible/entire masks bit-equal to the single-object
    make_eval_step(return_masks=True)."""
    (lut1, lut2), feed, bbox, K = _setup(tmp_path)
    kw = dict(crop_img=128, crop_gt=64, base=2, n_bits=N_BITS,
              resize_method="crop_square_resize", loss_type="BCE",
              pnp_cfg=PNP, preprocess_gt=True, return_masks=True)
    lp, lv = stack_luts([lut1, lut2])
    fleet_step = make_fleet_eval_step(_gt_oracle_forward, lp, lv, **kw)
    cat = {kk: jnp.concatenate([v, v]) for kk, v in feed.items()}
    key = jax.random.PRNGKey(11)
    variables = stack_variables([{"w": jnp.zeros(1)}, {"w": jnp.zeros(1)}])
    out = fleet_step(cat, jnp.concatenate([bbox, bbox]),
                     jnp.concatenate([K, K]), key, variables, n_models=2)
    assert len(out) == 6
    assert out[4].shape == (2, 3, 64, 64)  # [K, B, H, W] visible masks
    for k, lut in enumerate([lut1, lut2]):
        single = make_eval_step(_gt_oracle_forward, lut, **kw)(
            feed, bbox, K, jax.random.fold_in(key, k), {})
        for a, b in zip(out, single):
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b))
    # the oracle's visible mask is a real foreground (not all-zero)
    assert np.asarray(out[4][0]).sum() > 0


def test_fleet_serve_shard_map_path_matches(tmp_path):
    (lut1, lut2), feed, bbox, K = _setup(tmp_path)
    kw = dict(crop_img=128, crop_gt=64, base=2, n_bits=N_BITS,
              resize_method="crop_square_resize", loss_type="BCE",
              pnp_cfg=PNP, preprocess_gt=True,
              return_masks=True)  # 6 outputs: exercises the widened specs
    lp, lv = stack_luts([lut1, lut2])
    cat = {kk: jnp.concatenate([v, v]) for kk, v in feed.items()}
    key = jax.random.PRNGKey(7)
    variables = stack_variables([{"w": jnp.zeros(1)}, {"w": jnp.zeros(1)}])
    args = (cat, jnp.concatenate([bbox, bbox]), jnp.concatenate([K, K]),
            key, variables)

    plain = make_fleet_eval_step(_gt_oracle_forward, lp, lv, **kw)(
        *args, n_models=2)
    mesh = make_fleet_mesh(jax.devices()[:2])
    sharded = make_fleet_eval_step(_gt_oracle_forward, lp, lv, mesh=mesh,
                                   **kw)(*args, n_models=2)
    for a, b in zip(plain, sharded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fleet_serve_indivisible_fleet_raises(tmp_path):
    (lut1, lut2), feed, bbox, K = _setup(tmp_path)
    lp, lv = stack_luts([lut1, lut2, lut1])
    mesh = make_fleet_mesh(jax.devices()[:2])
    step = make_fleet_eval_step(
        _gt_oracle_forward, lp, lv, mesh=mesh, crop_img=128, crop_gt=64,
        base=2, n_bits=N_BITS, resize_method="crop_square_resize",
        loss_type="BCE", pnp_cfg=PNP, preprocess_gt=True)
    cat = {kk: jnp.concatenate([v] * 3) for kk, v in feed.items()}
    variables = stack_variables([{"w": jnp.zeros(1)}] * 3)
    with pytest.raises(ValueError, match="not divisible"):
        step(cat, jnp.concatenate([bbox] * 3), jnp.concatenate([K] * 3),
             jax.random.PRNGKey(0), variables, n_models=3)


def test_stack_luts_rejects_mismatched_code_spaces():
    l1 = CorrespondenceLUT(np.zeros((16, 3), np.float32),
                           np.ones(16, bool), base=2, n_digits=4)
    l2 = CorrespondenceLUT(np.zeros((32, 3), np.float32),
                           np.ones(32, bool), base=2, n_digits=5)
    with pytest.raises(ValueError, match="code space"):
        stack_luts([l1, l2])
