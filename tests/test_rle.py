"""RLE decode + Mask-RCNN segmentation replacement path."""

import numpy as np
import pytest

from zebrapose_tpu.data.detections import best_segmentations, decode_rle


def _encode_rle(mask: np.ndarray) -> dict:
    """Column-major uncompressed RLE encoder (test oracle)."""
    flat = mask.reshape(-1, order="F").astype(np.uint8)
    counts = []
    cur, run = 0, 0
    for v in flat:
        if v == cur:
            run += 1
        else:
            counts.append(run)
            cur, run = v, 1
    counts.append(run)
    return {"counts": counts, "size": list(mask.shape)}


def test_rle_roundtrip():
    rng = np.random.default_rng(100)
    mask = (rng.random((37, 23)) > 0.6).astype(np.uint8)
    np.testing.assert_array_equal(decode_rle(_encode_rle(mask)), mask)


def test_rle_all_background_and_foreground():
    z = np.zeros((5, 4), np.uint8)
    np.testing.assert_array_equal(decode_rle(_encode_rle(z)), z)
    o = np.ones((5, 4), np.uint8)
    np.testing.assert_array_equal(decode_rle(_encode_rle(o)), o)


def test_rle_bad_counts_raises():
    with pytest.raises(ValueError):
        decode_rle({"counts": [3, 2], "size": [4, 4]})


def test_best_segmentations_selection():
    seg_a = {"counts": [16], "size": [4, 4]}
    seg_b = {"counts": [0, 16], "size": [4, 4]}
    det = {"2/0": [
        {"obj_id": 1, "bbox_est": [0, 0, 4, 4], "score": 0.5,
         "segmentation": seg_a},
        {"obj_id": 1, "bbox_est": [0, 0, 4, 4], "score": 0.9,
         "segmentation": seg_b},
        {"obj_id": 2, "bbox_est": [0, 0, 4, 4], "score": 0.99,
         "segmentation": seg_a},
    ]}
    out = best_segmentations(det, ["/d/test/000002/rgb/000000.png"], 1)
    assert out[0] is seg_b
    out2 = best_segmentations(det, ["/d/test/000002/rgb/000000.png"], 3)
    assert out2[0] is None
