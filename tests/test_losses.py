"""Loss parity vs torch oracles of the reference loss math (NCHW torch
formulas from SURVEY.md §2.4: hard-mask hamming histogram, EMA 0.95/0.05,
bin_weights=exp(3*min(h,0.51-h)), per-bit-then-weighted BCE)."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from zebrapose_tpu.models.losses import (
    CodeLossConfig,
    binary_code_loss,
    fresh_histogram,
    hamming_histogram,
    sigmoid_l1_mask_loss,
    total_loss,
)


def _data(seed=30, n=2, h=8, w=8, bits=16):
    rng = np.random.default_rng(seed)
    code_logits = rng.normal(size=(n, h, w, bits)).astype(np.float32) * 2
    mask_logits = rng.normal(size=(n, h, w, 1)).astype(np.float32) * 2
    gt_code = (rng.random((n, h, w, bits)) > 0.5).astype(np.float32)
    gt_mask = (rng.random((n, h, w)) > 0.5).astype(np.float32)
    return code_logits, mask_logits, gt_code, gt_mask


def _torch_hamming(code_logits, gt_code, mask_hard):
    # reference HammingLoss on NCHW tensors
    cl = torch.from_numpy(code_logits.transpose(0, 3, 1, 2))
    gc = torch.from_numpy(gt_code.transpose(0, 3, 1, 2))
    mh = torch.from_numpy(mask_hard)
    mh = mh.round().clamp(0, 1)
    c1 = torch.sigmoid(cl).round().clamp(0, 1)
    c2 = gc.round().clamp(0, 1)
    hamm = torch.abs(c1 - c2) * mh.unsqueeze(1)
    hist = hamm.sum([0, 2, 3]) / (mh.sum() + 1)
    return hist.mean().item(), hist.numpy()


def test_mask_loss_matches_torch():
    _, mask_logits, _, gt_mask = _data()
    got = float(sigmoid_l1_mask_loss(jnp.asarray(mask_logits),
                                     jnp.asarray(gt_mask)))
    ml = torch.from_numpy(mask_logits.transpose(0, 3, 1, 2))
    expect = torch.nn.L1Loss()(torch.sigmoid(ml[:, 0]),
                               torch.from_numpy(gt_mask)).item()
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_hamming_histogram_matches_torch():
    code_logits, mask_logits, gt_code, _ = _data()
    mask_hard = (mask_logits[..., 0] > 0).astype(np.float32)
    loss, hist = hamming_histogram(jnp.asarray(code_logits),
                                   jnp.asarray(gt_code),
                                   jnp.asarray(mask_hard))
    e_loss, e_hist = _torch_hamming(code_logits, gt_code, mask_hard)
    np.testing.assert_allclose(float(loss), e_loss, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hist), e_hist, rtol=1e-5)


def test_hist_weighted_bce_matches_torch_oracle():
    code_logits, mask_logits, gt_code, _ = _data()
    cfg = CodeLossConfig(loss_type="BCE", mask_code_loss=True,
                         use_histogram_weighting=True, n_bits=16)
    hist0 = fresh_histogram(16)
    loss, hist1, _ = binary_code_loss(
        jnp.asarray(code_logits), jnp.asarray(mask_logits),
        jnp.asarray(gt_code), hist0, cfg)

    # torch oracle: first step -> histogram = fresh hamming histogram
    mask_hard = (mask_logits[..., 0] > 0).astype(np.float32)
    _, e_hist = _torch_hamming(code_logits, gt_code, mask_hard)
    np.testing.assert_allclose(np.asarray(hist1), e_hist, rtol=1e-5)

    hist_t = torch.from_numpy(e_hist)
    hist_soft = torch.minimum(hist_t, 0.51 - hist_t)
    bin_w = torch.exp(hist_soft * 3)
    cl = torch.from_numpy(code_logits.transpose(0, 3, 1, 2))
    gc = torch.from_numpy(gt_code.transpose(0, 3, 1, 2))
    mh = torch.from_numpy(mask_hard).unsqueeze(1)
    masked = mh * cl
    per = torch.nn.BCEWithLogitsLoss(reduction="none")(masked, gc)
    per_bit = per.mean([0, 2, 3])
    expect = (per_bit * bin_w).sum() / bin_w.sum()
    np.testing.assert_allclose(float(loss), expect.item(), rtol=1e-5)

    # second step: EMA applies
    loss2, hist2, _ = binary_code_loss(
        jnp.asarray(code_logits), jnp.asarray(mask_logits),
        jnp.asarray(gt_code), hist1, cfg)
    np.testing.assert_allclose(np.asarray(hist2),
                               0.05 * e_hist + 0.95 * e_hist, rtol=1e-5)


def test_plain_bce_and_l1_match_torch():
    code_logits, mask_logits, gt_code, _ = _data()
    cl = torch.from_numpy(code_logits.transpose(0, 3, 1, 2))
    gc = torch.from_numpy(gt_code.transpose(0, 3, 1, 2))
    mask_hard = torch.from_numpy(
        (mask_logits[..., 0] > 0).astype(np.float32)).unsqueeze(1)

    for lt in ("BCE", "L1"):
        cfg = CodeLossConfig(loss_type=lt, mask_code_loss=True,
                             use_histogram_weighting=False, n_bits=16)
        loss, _, _ = binary_code_loss(
            jnp.asarray(code_logits), jnp.asarray(mask_logits),
            jnp.asarray(gt_code), fresh_histogram(16), cfg)
        masked = mask_hard * cl
        if lt == "BCE":
            expect = torch.nn.BCEWithLogitsLoss()(masked, gc).item()
        else:
            expect = torch.nn.L1Loss()(torch.sigmoid(masked), gc).item()
        np.testing.assert_allclose(float(loss), expect, rtol=1e-5,
                                   err_msg=lt)


def test_ce_loss_matches_torch():
    rng = np.random.default_rng(31)
    n, h, w, bits, base = 2, 4, 4, 8, 4
    code_logits = rng.normal(size=(n, h, w, bits * base)).astype(np.float32)
    mask_logits = rng.normal(size=(n, h, w, 1)).astype(np.float32)
    gt = rng.integers(0, base, size=(n, h, w, bits)).astype(np.float32)
    cfg = CodeLossConfig(loss_type="CE", mask_code_loss=False,
                         use_histogram_weighting=False, n_bits=bits,
                         base=base)
    loss, _, _ = binary_code_loss(
        jnp.asarray(code_logits), jnp.asarray(mask_logits),
        jnp.asarray(gt), fresh_histogram(bits), cfg)
    # torch: reshape to (N*... , base, ...) CE
    grouped = torch.from_numpy(code_logits.reshape(n * h * w * bits, base))
    target = torch.from_numpy(gt.reshape(-1)).long()
    expect = torch.nn.CrossEntropyLoss()(grouped, target).item()
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


def test_total_loss_composition():
    code_logits, mask_logits, gt_code, gt_mask = _data()
    outputs = {"code": jnp.asarray(code_logits),
               "mask": jnp.asarray(mask_logits),
               "entire_mask": jnp.asarray(mask_logits)}
    cfg = CodeLossConfig()
    loss, hist, metrics = total_loss(
        outputs, jnp.asarray(gt_mask), jnp.asarray(gt_mask),
        jnp.asarray(gt_code), fresh_histogram(16), cfg,
        binary_loss_weight=3.0)
    expect = 3.0 * metrics["loss_code"] + metrics["loss_mask"] + \
        metrics["loss_entire_mask"]
    np.testing.assert_allclose(float(loss), float(expect), rtol=1e-6)
    assert hist.shape == (16,)
