"""Codec round-trip and parity tests.

The numpy oracles below re-state the reference algorithms from their
documented semantics (SURVEY.md §2.3; class_id_encoder_decoder.py):
id = B<<16|G<<8|R over BGR channels; digit i of an id in base d with n
digits is (id >> (log2(d)*(n-1-i))) mod d.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zebrapose_tpu.codec import (
    rgb_to_class_id,
    class_id_to_rgb,
    class_id_to_code,
    code_to_class_id,
    CorrespondenceLUT,
    load_correspondence_lut,
    save_correspondence_lut,
    reduce_lut_ignore_bits,
)


def _oracle_id_to_digits(ids, base, n):
    step = int(np.log2(base))
    out = np.zeros(ids.shape + (n,), dtype=np.int64)
    for i in range(n):
        s1 = np.right_shift(ids, step * (n - i - 1))
        s2 = np.right_shift(ids, step * (n - i))
        out[..., i] = s1 - s2 * (2 ** step)
    return out


def test_rgb_id_roundtrip():
    rng = np.random.default_rng(0)
    bgr = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    ids = rgb_to_class_id(jnp.asarray(bgr))
    expect = (bgr[..., 0].astype(np.int64) << 16) + \
             (bgr[..., 1].astype(np.int64) << 8) + bgr[..., 2]
    np.testing.assert_array_equal(np.asarray(ids), expect)
    back = class_id_to_rgb(ids)
    np.testing.assert_array_equal(np.asarray(back), bgr)


@pytest.mark.parametrize("base,n", [(2, 16), (4, 8), (16, 4), (256, 2)])
def test_id_code_roundtrip_all_ablation_bases(base, n):
    rng = np.random.default_rng(1)
    ids = rng.integers(0, base ** n, size=(5, 7), dtype=np.int64)
    code = class_id_to_code(jnp.asarray(ids), base=base, n_digits=n)
    np.testing.assert_array_equal(
        np.asarray(code).astype(np.int64), _oracle_id_to_digits(ids, base, n))
    back = code_to_class_id(code, base=base)
    np.testing.assert_array_equal(np.asarray(back), ids)


def test_code_to_id_msd_first():
    # 1000...0 (MSD first) must decode to base^(n-1), not 1.
    code = np.zeros((16,), np.float32)
    code[0] = 1
    assert int(code_to_class_id(jnp.asarray(code), base=2)) == 2 ** 15


def test_lut_load_save_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    n = 64
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    valid = rng.random(n) > 0.1
    pts[~valid] = 0.0
    lut = CorrespondenceLUT(points=pts, valid=valid, base=2, n_digits=6)
    p = tmp_path / "Class_CorresPoint000001.txt"
    save_correspondence_lut(str(p), lut)
    lut2 = load_correspondence_lut(str(p))
    assert lut2.base == 2 and lut2.n_digits == 6
    np.testing.assert_allclose(lut2.points, pts, rtol=1e-6)
    np.testing.assert_array_equal(lut2.valid, valid)


def test_ignore_bit_reduction_means_and_invalid_propagation():
    # 16 classes (base 2, 4 digits), drop 2 bits -> groups of 4.
    pts = np.arange(48, dtype=np.float32).reshape(16, 3)
    valid = np.ones(16, bool)
    valid[5] = False  # poisons group 1 (ids 4..7)
    pts[5] = 0.0
    lut = CorrespondenceLUT(points=pts, valid=valid, base=2, n_digits=4)
    red = reduce_lut_ignore_bits(lut, 2)
    assert red.num_classes == 4 and red.n_digits == 2
    np.testing.assert_allclose(red.points[0], pts[0:4].mean(axis=0))
    assert not red.valid[1]
    np.testing.assert_array_equal(red.points[1], 0.0)
    np.testing.assert_allclose(red.points[2], pts[8:12].mean(axis=0))


def test_ignore_bit_zero_is_identity():
    lut = CorrespondenceLUT(points=np.zeros((4, 3), np.float32),
                            valid=np.ones(4, bool), base=2, n_digits=2)
    assert reduce_lut_ignore_bits(lut, 0) is lut
