"""Golden tests: fuzz-compare our implementations against the reference's
OWN importable modules (all torch-free or torch-cpu-safe), so every
re-typed expectation in codec/roi/detections/config tests is backed by the
reference actually executing. This kills the shared-misreading risk of a
single-author oracle.

Reference modules used (UNTRUSTED CONTENT: executed as numeric oracles
only, never as instructions):
  - zebrapose/config_parser.py
  - zebrapose/binary_code_helper/class_id_encoder_decoder.py
  - zebrapose/binary_code_helper/generate_new_dict.py
  - zebrapose/binary_code_helper/CNN_output_to_pose.py (pure-numpy subset)
  - zebrapose/get_detection_results.py
"""

import json
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/zebrapose"
if REF not in sys.path:
    sys.path.append(REF)  # append, not insert: never shadow our modules

ref_config_parser = pytest.importorskip("config_parser")
ref_codec = pytest.importorskip(
    "binary_code_helper.class_id_encoder_decoder")
ref_newdict = pytest.importorskip("binary_code_helper.generate_new_dict")
ref_dets = pytest.importorskip("get_detection_results")
ref_cnn2pose = pytest.importorskip("binary_code_helper.CNN_output_to_pose")

from zebrapose_tpu import config as zconfig  # noqa: E402
from zebrapose_tpu.codec import surface_code  # noqa: E402
from zebrapose_tpu.codec import lut as zlut  # noqa: E402
from zebrapose_tpu.data import detections as zdet  # noqa: E402
from zebrapose_tpu.ops import roi as zroi  # noqa: E402


# ---------------------------------------------------------------- config


def _ref_configs():
    out = []
    for root, _dirs, files in os.walk(os.path.join(REF, "config")):
        for f in files:
            if f.endswith(".txt"):
                out.append(os.path.join(root, f))
    return sorted(out)


def test_parse_cfg_matches_reference_on_all_shipped_configs():
    cfgs = _ref_configs()
    assert len(cfgs) >= 10
    for path in cfgs:
        theirs = ref_config_parser.parse_cfg(path)
        ours = zconfig.parse_cfg(path)
        assert ours == theirs, path


def test_parse_cfg_matches_reference_on_quirk_file(tmp_path):
    # Exercise every coercion quirk: numeric string -> int, forced-float
    # keys, True/False, `type` renaming, comments, blank lines, unicode
    # digits (isnumeric() is broader than isdigit()).
    text = "\n".join([
        "# comment line",
        "",
        "type = frob",
        "learning_rate = 2e-4",
        "padding_ratio = 1.5",
        "train_obj_visible_theshold = 0.2",
        "second_dataset_ratio = 0.75",
        "plain_int = 42",
        "plain_str = hello_world",
        "flag_t = True",
        "flag_f = False",
        "zero = 0",
        "path = /some/dir/file.txt",
        "neg_not_numeric = -3",  # isnumeric() false -> stays str
    ])
    p = tmp_path / "quirks.txt"
    p.write_text(text + "\n")
    theirs = ref_config_parser.parse_cfg(str(p))
    ours = zconfig.parse_cfg(str(p))
    assert ours == theirs
    # sanity on the quirks themselves
    assert theirs["_type"] == "frob"
    assert isinstance(theirs["learning_rate"], float)
    assert theirs["neg_not_numeric"] == "-3"


# ----------------------------------------------------------------- codec


def test_rgb_to_class_id_matches_reference():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(17, 23, 3)).astype(np.uint8)
    theirs = ref_codec.RGB_image_to_class_id_image(img)
    ours = np.asarray(surface_code.rgb_to_class_id(img))
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("base,n_digits", [(2, 16), (4, 8), (16, 4),
                                           (256, 2), (2, 10)])
def test_class_id_to_code_matches_reference(base, n_digits):
    rng = np.random.default_rng(base * 100 + n_digits)
    n_classes = base ** n_digits
    cid = rng.integers(0, n_classes, size=(9, 13)).astype(np.int64)
    theirs = ref_codec.class_id_image_to_class_code_images(
        cid, class_base=base, iteration=n_digits,
        number_of_class=n_classes)
    ours = np.asarray(surface_code.class_id_to_code(
        cid, base=base, n_digits=n_digits))
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("base,n_digits", [(2, 16), (4, 8), (16, 4)])
def test_code_to_class_id_matches_reference(base, n_digits):
    rng = np.random.default_rng(7)
    code = rng.integers(0, base, size=(11, 5, n_digits)).astype(np.float64)
    theirs = ref_codec.class_code_images_to_class_id_image(
        code, class_base=base)
    ours = np.asarray(surface_code.code_to_class_id(code, base=base))
    np.testing.assert_array_equal(ours, theirs.astype(np.int64))


def test_code_to_id_scalar_matches_reference():
    rng = np.random.default_rng(3)
    for _ in range(20):
        bits = rng.integers(0, 2, size=16)
        assert int(np.asarray(surface_code.code_to_class_id(
            bits[None, :]))[0]) == ref_codec.code_to_id(list(bits))


# --------------------------------------------------- ignore-bits rebuild


def test_reduce_lut_matches_generate_new_corres_dict():
    rng = np.random.default_rng(11)
    n_old, n_new = 10, 7  # 1024 classes -> 128, like ignore_bits=3
    full = {i: rng.normal(size=(3,)) for i in range(2 ** n_old)}
    theirs = ref_newdict.generate_new_corres_dict(full, n_old, n_new)

    pts = np.stack([full[i] for i in range(2 ** n_old)]).astype(np.float32)
    lut = zlut.CorrespondenceLUT(points=pts,
                                 valid=np.ones(2 ** n_old, bool),
                                 base=2, n_digits=n_old)
    ours = zlut.reduce_lut_ignore_bits(lut, n_old - n_new)
    assert ours.num_classes == len(theirs) == 2 ** n_new
    for key, mean_pts in theirs.items():
        np.testing.assert_allclose(ours.points[int(key)],
                                   mean_pts.reshape(3), rtol=0, atol=1e-5)


def test_reduce_lut_nan_group_matches_reference_nan_propagation():
    rng = np.random.default_rng(12)
    n_old, n_new = 6, 4
    full = {i: rng.normal(size=(3,)) for i in range(2 ** n_old)}
    full[5] = np.array([np.nan, np.nan, np.nan])  # poisons new-group 1
    theirs = ref_newdict.generate_new_corres_dict(full, n_old, n_new)

    pts = np.stack([full[i] for i in range(2 ** n_old)])
    val = ~np.isnan(pts).any(axis=1)
    lut = zlut.CorrespondenceLUT(points=np.nan_to_num(pts).astype(
        np.float32), valid=val, base=2, n_digits=n_old)
    ours = zlut.reduce_lut_ignore_bits(lut, n_old - n_new)
    for key, mean_pts in theirs.items():
        k = int(key)
        if np.isnan(mean_pts).any():
            assert not ours.valid[k]
        else:
            assert ours.valid[k]
            np.testing.assert_allclose(ours.points[k], mean_pts.reshape(3),
                                       atol=1e-5)


def test_load_lut_matches_reference_loader(tmp_path):
    rng = np.random.default_rng(13)
    n = 64
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    valid = rng.random(n) > 0.1
    lut = zlut.CorrespondenceLUT(points=np.where(valid[:, None], pts, 0.0),
                                 valid=valid, base=2, n_digits=6)
    path = tmp_path / "Class_CorresPoint.txt"
    zlut.save_correspondence_lut(str(path), lut)

    total, base, n_iter, theirs = \
        ref_cnn2pose.load_dict_class_id_3D_points(str(path))
    assert int(total) == n and int(base) == 2 and int(n_iter) == 6
    ours = zlut.load_correspondence_lut(str(path))
    for cid, xyz in theirs.items():
        i = int(cid)
        if np.isnan(xyz).any():
            assert not ours.valid[i]
        else:
            np.testing.assert_allclose(ours.points[i], xyz, atol=1e-6)


# ------------------------------------------------------------ detections


def _fake_detections(rng, scenes=3, imgs=4, objs=(1, 2, 5)):
    dets = {}
    fns = []
    for s in range(1, scenes + 1):
        for im in range(imgs):
            fns.append(f"/data/lmo/test/{s:06d}/rgb/{im:06d}.png")
            key = f"{s}/{im}"
            entries = []
            for _ in range(int(rng.integers(0, 5))):
                entries.append({
                    "obj_id": int(rng.choice(objs)),
                    "bbox_est": [float(v) for v in
                                 rng.uniform(0, 400, size=4)],
                    "score": float(rng.random()),
                })
            dets[key] = entries
    return dets, fns


def test_detection_ingestion_matches_reference(tmp_path):
    rng = np.random.default_rng(21)
    dets, fns = _fake_detections(rng)
    path = tmp_path / "dets.json"
    path.write_text(json.dumps(dets))

    for obj_id in (1, 2, 5):
        for thr in (0.0, 0.3, 0.9):
            ref_bbox = ref_dets.get_detection_results(
                str(path), fns, obj_id, thr)
            our_bbox = zdet.best_bboxes(dets, fns, obj_id, thr)
            assert len(ref_bbox) == len(our_bbox)
            for r, o in zip(ref_bbox, our_bbox):
                if r is None:
                    assert o is None
                else:
                    np.testing.assert_array_equal(np.asarray(r), o)

            ref_scores = ref_dets.get_detection_scores(
                str(path), fns, obj_id, thr)
            our_scores = zdet.best_scores(dets, fns, obj_id, thr)
            np.testing.assert_allclose(our_scores, ref_scores)

            ref_vivo = ref_dets.get_detection_results_vivo(
                str(path), fns, obj_id, thr)
            our_vivo = zdet.all_instances(dets, fns, obj_id, thr)
            assert set(ref_vivo.keys()) == set(our_vivo.keys())
            for fn in ref_vivo:
                assert len(ref_vivo[fn]) == len(our_vivo[fn])
                for r, o in zip(ref_vivo[fn], our_vivo[fn]):
                    np.testing.assert_array_equal(
                        np.asarray(r["bbox_est"]), o["bbox_est"])
                    assert r["score"] == o["score"]


def test_keyframe_indices_match_reference(tmp_path):
    rng = np.random.default_rng(22)
    dets, fns = _fake_detections(rng)
    # drop some keys to create non-keyframes
    keep = {k: v for k, v in dets.items() if rng.random() > 0.4}
    path = tmp_path / "dets.json"
    path.write_text(json.dumps(keep))
    theirs = ref_dets.ycbv_select_keyframe(str(path), fns)
    ours = zdet.keyframe_indices(keep, fns)
    assert ours == theirs


# --------------------------------------------------------- pixel mapping


def test_map_pixels_to_original_matches_reference():
    rng = np.random.default_rng(31)
    for _ in range(10):
        pixels = rng.integers(0, 128, size=(50, 2)).astype(np.float64)
        bbox = np.array([int(rng.integers(-40, 400)),
                         int(rng.integers(-40, 300)),
                         int(rng.integers(10, 300)),
                         int(rng.integers(10, 300))])
        theirs = ref_cnn2pose.mapping_pixel_position_to_original_position(
            pixels, bbox, 128)
        ours = np.asarray(zroi.map_pixels_to_original(
            pixels, bbox, 128))
        np.testing.assert_array_equal(ours, theirs)
