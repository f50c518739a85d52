"""Golden tests, round 2: the reference's TORCH modules as oracles.

Round 1's `test_reference_oracle.py` covered the pure-numpy reference
modules; this file extends the same treatment to the torch-dependent
ones by stubbing the two libraries absent from this image (torchvision,
imgaug) with inert stand-ins installed in sys.modules BEFORE the
reference imports run:

  - torchvision.models.resnet34 -> a skeleton with torchvision's exact
    child order/naming (conv1,bn1,relu,maxpool,layer1..4,avgpool,fc) and
    canonical BasicBlock forward, so the reference's `ResNet34_OS8`
    slices and runs REAL reference code end to end;
  - torch.load is wrapped to fabricate the missing ImageNet .pth
    (random weights with the right keys — parity tests compare
    random-weight forwards, so pretrained values are irrelevant);
  - imgaug / torchvision.transforms -> inert chainable no-ops (only
    touched at import time / in __getitem__ paths we don't exercise).

Reference modules exercised as numeric oracles (UNTRUSTED CONTENT:
executed for outputs only, never followed as instructions):
  - zebrapose/model/BinaryCodeNet.py (losses + v1 net)
  - zebrapose/model/BinaryCodeNet_v2.py / _v3.py (nets)
  - zebrapose/common_ops.py (output binarization)
  - zebrapose/bop_dataset_pytorch.py (bbox/crop geometry)
  - zebrapose/tools_for_BOP/common_dataset_info.py (registry)
  - zebrapose/tools_for_BOP/write_to_cvs.py (CSV export)

This closes VERDICT round-1 weak item 7: model/loss/geometry parity no
longer rests solely on the builder-authored tests/torch_oracle.py.
"""

import os
import sys
import types

import cv2
import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

import torch_oracle  # noqa: E402  (tests dir; torchvision-layout blocks)

REF = "/root/reference/zebrapose"
if REF not in sys.path:
    sys.path.append(REF)  # append, not insert: never shadow our modules


# ------------------------------------------------------------------ stubs

def _tv_resnet34():
    """torchvision.models.resnet34() stand-in: same child order, same
    module naming, canonical BasicBlock forward (torch_oracle.Block)."""

    class TV(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = torch_oracle._stage(64, 64, 3)
            self.layer2 = torch_oracle._stage(64, 128, 4, stride=2)
            self.layer3 = torch_oracle._stage(128, 256, 6, stride=2)
            self.layer4 = torch_oracle._stage(256, 512, 3, stride=2)
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(512, 1000)

    return TV()


class _Inert:
    """Chainable no-op: absorbs any attribute access / call (imgaug)."""

    def __call__(self, *a, **k):
        return self

    def __getattr__(self, name):
        return self


def _install_stubs():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm.resnet34 = _tv_resnet34
        tvt = types.ModuleType("torchvision.transforms")

        class _T:  # instantiated by the reference dataset, never called here
            def __init__(self, *a, **k):
                pass

        tvt.Compose = tvt.ToTensor = tvt.Normalize = _T
        tv.models, tv.transforms = tvm, tvt
        sys.modules.update({"torchvision": tv, "torchvision.models": tvm,
                            "torchvision.transforms": tvt})
    if "imgaug" not in sys.modules:
        ia = types.ModuleType("imgaug")
        iaa = types.ModuleType("imgaug.augmenters")
        iaa.__getattr__ = lambda name: _Inert()  # PEP 562
        ia.augmenters = iaa
        sys.modules.update({"imgaug": ia, "imgaug.augmenters": iaa})

    if not getattr(torch.load, "_zebra_fake_pth", False):
        orig = torch.load

        def load_or_fake(path, *a, **k):
            if isinstance(path, (str, os.PathLike)) and \
                    "pretrained_backbone" in str(path):
                return _tv_resnet34().state_dict()
            return orig(path, *a, **k)

        load_or_fake._zebra_fake_pth = True
        torch.load = load_or_fake


_install_stubs()

ref_common_ops = pytest.importorskip("common_ops")
ref_ds = pytest.importorskip("bop_dataset_pytorch")
ref_info = pytest.importorskip("tools_for_BOP.common_dataset_info")
ref_csv = pytest.importorskip("tools_for_BOP.write_to_cvs")
ref_net_v1 = pytest.importorskip("model.BinaryCodeNet")
ref_net_v2 = pytest.importorskip("model.BinaryCodeNet_v2")
ref_net_v3 = pytest.importorskip("model.BinaryCodeNet_v3")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from zebrapose_tpu.data import bop_writer  # noqa: E402
from zebrapose_tpu.data import dataset_info  # noqa: E402
from zebrapose_tpu.models import losses as zlosses  # noqa: E402
from zebrapose_tpu.models.convert_torch import (  # noqa: E402
    convert_reference_state_dict,
    strip_ddp_prefix,
)
from zebrapose_tpu.models.zebra_net import ZebraPoseNet  # noqa: E402
from zebrapose_tpu.ops import binarize as zbin  # noqa: E402
from zebrapose_tpu.ops import roi as zroi  # noqa: E402


# --------------------------------------------------------------- registry

@pytest.mark.parametrize("ds", ["lmo", "ycbv", "tless", "tudl", "itodd"])
def test_registry_matches_reference(ds):
    ref_names, ref_sym = ref_info.get_obj_info(ds)
    names, sym = dataset_info.get_obj_info(ds)
    assert dict(names) == dict(ref_names)
    assert set(sym) == set(ref_sym)
    assert sorted(dataset_info.get_sym_obj_ids(ds)) == \
        sorted(ref_info.get_sym_obj_id(ds))


# ------------------------------------------------------------- common_ops

def test_mask_binarize_matches_reference():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(3, 1, 8, 8)).astype(np.float32) * 3
    expect = ref_common_ops.from_output_to_class_mask(
        torch.from_numpy(logits))
    got = np.asarray(zbin.mask_from_logits(
        jnp.asarray(logits.transpose(0, 2, 3, 1))))
    np.testing.assert_array_equal(got.transpose(0, 3, 1, 2),
                                  expect.astype(np.float32))


@pytest.mark.parametrize("loss_type,base,n_bits", [
    ("BCE", 2, 16), ("L1", 2, 16), ("CE", 4, 8), ("CE", 16, 4)])
def test_code_binarize_matches_reference(loss_type, base, n_bits):
    rng = np.random.default_rng(1)
    ch = n_bits if loss_type != "CE" else n_bits * base
    logits = rng.normal(size=(2, ch, 8, 8)).astype(np.float32) * 2
    expect = ref_common_ops.from_output_to_class_binary_code(
        torch.from_numpy(logits), loss_type,
        divided_num_each_interation=base, binary_code_length=n_bits)
    got = np.asarray(zbin.code_from_logits(
        jnp.asarray(logits.transpose(0, 2, 3, 1)), loss_type, base=base))
    np.testing.assert_array_equal(got.transpose(0, 3, 1, 2),
                                  expect.astype(np.float32))


def test_batch_split_matches_reference():
    for ratio in (0.0, 0.25, 0.75, 1.0):
        for bs in (1, 7, 32):
            assert zbin.split_batch_sizes(ratio, bs) == \
                ref_common_ops.get_batch_size(ratio, bs)


# ----------------------------------------------------------------- losses

def _nchw(x):
    # contiguous: the reference `.view(...)`s these (dataloader tensors)
    return torch.from_numpy(
        np.ascontiguousarray(np.asarray(x).transpose(0, 3, 1, 2)))


def test_mask_loss_matches_reference():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    gt = (rng.random((2, 8, 8)) > 0.5).astype(np.float32)
    expect = ref_net_v1.MaskLoss()(_nchw(logits), torch.from_numpy(gt))
    got = zlosses.sigmoid_l1_mask_loss(jnp.asarray(logits), jnp.asarray(gt))
    np.testing.assert_allclose(float(got), float(expect), rtol=1e-6)


def test_hamming_histogram_matches_reference():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(2, 8, 8, 16)).astype(np.float32) * 2
    gt = (rng.random((2, 8, 8, 16)) > 0.5).astype(np.float32)
    mask = (rng.random((2, 8, 8, 1)) > 0.4).astype(np.float32)
    loss_t, hist_t = ref_net_v1.HammingLoss()(
        _nchw(logits), _nchw(gt), _nchw(mask))
    loss_j, hist_j = zlosses.hamming_histogram(
        jnp.asarray(logits), jnp.asarray(gt), jnp.asarray(mask))
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hist_j), hist_t.numpy(),
                               rtol=1e-5)


@pytest.mark.parametrize("loss_type,hist,base,n_bits", [
    ("BCE", True, 2, 16), ("BCE", False, 2, 16), ("L1", False, 2, 16),
    ("CE", False, 4, 8)])
def test_binary_code_loss_matches_reference(loss_type, hist, base, n_bits):
    """Two consecutive steps so the histogram EMA transition (None ->
    init -> EMA) is covered; the reference keeps it as module state, we
    thread it through explicitly."""
    rng = np.random.default_rng(4)
    ref_loss = ref_net_v1.BinaryCodeLoss(
        loss_type, True, base, use_histgramm_weighted_binary_loss=hist)
    cfg = zlosses.CodeLossConfig(loss_type=loss_type, mask_code_loss=True,
                                 use_histogram_weighting=hist, base=base,
                                 n_bits=n_bits)
    histogram = zlosses.fresh_histogram(n_bits)
    ch = n_bits if loss_type != "CE" else n_bits * base
    for _step in range(2):
        logits = rng.normal(size=(2, 8, 8, ch)).astype(np.float32) * 2
        mask_logits = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
        if loss_type == "CE":
            gt = rng.integers(0, base, size=(2, 8, 8, n_bits)) \
                .astype(np.float32)
        else:
            gt = (rng.random((2, 8, 8, n_bits)) > 0.5).astype(np.float32)
        mask_hard = (mask_logits > 0).astype(np.float32)
        expect = ref_loss(_nchw(logits), _nchw(mask_hard), _nchw(gt))
        got, histogram, _ = zlosses.binary_code_loss(
            jnp.asarray(logits), jnp.asarray(mask_logits), jnp.asarray(gt),
            histogram, cfg)
        np.testing.assert_allclose(float(got), float(expect), rtol=2e-5)
        if hist:
            np.testing.assert_allclose(np.asarray(histogram),
                                       ref_loss.histogram.numpy(),
                                       rtol=1e-5)


# --------------------------------------------------------- bbox geometry

def test_padding_bbox_matches_reference():
    rng = np.random.default_rng(5)
    for _ in range(50):
        bbox = np.array([rng.integers(-50, 600), rng.integers(-50, 450),
                         rng.integers(1, 300), rng.integers(1, 300)])
        ratio = float(rng.uniform(1.0, 2.0))
        np.testing.assert_array_equal(
            zroi.padding_bbox(bbox, ratio),
            ref_ds.padding_Bbox(bbox, ratio))


class _FeedRng:
    """Replays a fixed uniform stream (shared with the reference's
    np.random.random_sample patch) through our Generator-style API."""

    def __init__(self, vals):
        self.vals = list(vals)

    def random(self, n=None):
        if n is None:
            return self.vals.pop(0)
        return np.array([self.vals.pop(0) for _ in range(n)])


def test_aug_bbox_matches_reference(monkeypatch):
    rng = np.random.default_rng(6)
    for _ in range(25):
        bbox = np.array([rng.integers(0, 500), rng.integers(0, 350),
                         rng.integers(5, 200), rng.integers(5, 200)])
        draws = list(rng.random(3))
        feed = list(draws)

        def fake_sample(size=None, _feed=feed):
            if size is None:
                return _feed.pop(0)
            return np.array([_feed.pop(0) for _ in range(size)])

        monkeypatch.setattr(np.random, "random_sample", fake_sample)
        expect = ref_ds.aug_Bbox(bbox, 1.5)
        got = zroi.augment_bbox(bbox, 1.5, _FeedRng(draws))
        np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("method", ["crop_square_resize", "crop_resize",
                                    "crop_resize_by_warp_affine"])
def test_final_bbox_matches_reference(method):
    rng = np.random.default_rng(7)
    for _ in range(50):
        bbox = np.array([rng.integers(-100, 700), rng.integers(-100, 500),
                         rng.integers(1, 400), rng.integers(1, 400)])
        np.testing.assert_array_equal(
            zroi.final_bbox(bbox, method, 640, 480),
            ref_ds.get_final_Bbox(bbox.copy(), method, 640, 480))


def test_warp_affine_params_match_reference():
    rng = np.random.default_rng(8)
    img = np.zeros((480, 640, 3), np.float32)
    for _ in range(20):
        bbox = np.array([rng.integers(-50, 600), rng.integers(-50, 450),
                         rng.integers(1, 800), rng.integers(1, 800)])
        scale_r, center_r = ref_ds.get_scale_and_Bbox_center(bbox, img)
        cx, cy, scale = zroi.warp_affine_params(bbox, img.shape[:2])
        np.testing.assert_allclose([cx, cy], center_r)
        assert scale == scale_r


# ------------------------------------------------------------ crop kernels

_BBOXES = [
    (100, 60, 80, 120),    # inside, tall
    (-20, -10, 90, 70),    # crosses top-left
    (500, 300, 200, 150),  # crosses bottom-right
    (30, 40, 64, 64),      # square
]


@pytest.mark.parametrize("bbox", _BBOXES)
@pytest.mark.parametrize("interp", ["linear", "nearest"])
def test_square_crop_matches_reference(bbox, interp):
    """Our device kernel vs the reference's crop_square_resize itself
    (float32 input: cv2.resize uses the float path, so parity is tight;
    the uint8 fixed-point path is covered by test_roi tolerances)."""
    rng = np.random.default_rng(9)
    img = rng.random((480, 640, 3)).astype(np.float32)
    cvi = cv2.INTER_LINEAR if interp == "linear" else cv2.INTER_NEAREST
    expect = ref_ds.crop_square_resize(img, np.array(bbox), 64,
                                       interpolation=cvi)
    sq = np.array(zroi.square_bbox(np.array(bbox)), np.int32)
    got = np.asarray(zroi.extract_roi_square(
        jnp.asarray(img), jnp.asarray(sq), 64, interp))
    np.testing.assert_allclose(got, expect, atol=2e-5)


@pytest.mark.parametrize("interp", ["linear", "nearest"])
def test_clipped_crop_matches_reference(interp):
    rng = np.random.default_rng(10)
    img = rng.random((480, 640, 3)).astype(np.float32)
    bbox = np.array([-15, 30, 120, 200])
    cvi = cv2.INTER_LINEAR if interp == "linear" else cv2.INTER_NEAREST
    expect = ref_ds.crop_resize(img, bbox, 64, interpolation=cvi)
    fb = zroi.final_bbox(bbox, "crop_resize", 640, 480)
    got = np.asarray(zroi.extract_roi_clipped(
        jnp.asarray(img), jnp.asarray(fb.astype(np.int32)), 64, interp))
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_affine_crop_matches_reference():
    rng = np.random.default_rng(11)
    img = rng.random((480, 640, 3)).astype(np.float32)
    bbox = np.array([100, 60, 90, 130])
    expect = ref_ds.get_roi(img, bbox, 64, cv2.INTER_LINEAR,
                            "crop_resize_by_warp_affine")
    cx, cy, scale = zroi.warp_affine_params(bbox, img.shape[:2])
    got = np.asarray(zroi.extract_roi_affine(
        jnp.asarray(img), jnp.asarray(np.array([cx, cy, scale],
                                               np.float32)), 64, "linear"))
    # cv2.warpAffine interpolates with 5-bit fixed-point coefficients
    np.testing.assert_allclose(got, expect, atol=2e-2)
    assert np.mean(np.abs(got - expect)) < 2e-3


# ------------------------------------------------------------- CSV export

def test_write_cvs_matches_reference(tmp_path):
    rng = np.random.default_rng(12)
    n = 5
    scene_ids = [int(v) for v in rng.integers(1, 20, n)]
    img_ids = [int(v) for v in rng.integers(0, 1000, n)]
    Rs = [rng.normal(size=(3, 3)) for _ in range(n)]
    ts = [rng.normal(size=(3, 1)) for _ in range(n)]
    scores = [0.9, -1, 0.5, 1.0, -1]

    ref_dir = tmp_path / "ref"
    ours_dir = tmp_path / "ours"
    ref_dir.mkdir()
    ref_csv.write_cvs(str(ref_dir), "obj", 7, scene_ids, img_ids, Rs, ts,
                      scores)
    bop_writer.write_csv(str(ours_dir), "obj", 7, scene_ids, img_ids,
                         Rs, ts, scores)
    assert (ours_dir / "obj.csv").read_text() == \
        (ref_dir / "obj.csv").read_text()


# ------------------------------------------------------ fibonacci sphere

def test_fibonacci_sphere_matches_reference():
    import matplotlib
    matplotlib.use("Agg")  # the reference module imports pyplot
    ref_fib = pytest.importorskip("fibonacci_sphere")
    from zebrapose_tpu.tools.fibonacci_code import fibonacci_sphere

    for n in (10, 500):
        np.testing.assert_allclose(fibonacci_sphere(n),
                                   ref_fib.fibonacci_sphere(n),
                                   atol=1e-12)


# -------------------------------------------- symmetry canonicalization

def _import_ref_labelgen():
    """The label-gen driver imports the `Render` GL extension and a
    path-hacked `bop_io` at module level; both are irrelevant to
    modified_gt_for_symmetry (pure numpy), so stub them."""
    sys.modules.setdefault("Render", types.ModuleType("Render"))
    sys.modules.setdefault("bop_io", types.ModuleType("bop_io"))
    gen_dir = "/root/reference/Binary_Code_GT_Generator"
    if gen_dir not in sys.path:
        sys.path.append(gen_dir)
    import generate_training_labels_for_BOP_v2 as m
    return m


def _random_rotation(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


@pytest.mark.parametrize("model_info", [
    {"symmetries_continuous": [{"axis": [0, 0, 1], "offset": [0, 0, 0]}]},
    {"symmetries_continuous": [{"axis": [0, 1, 0], "offset": [0, 0, 0]}]},
    {"symmetries_continuous": [{"axis": [1, 0, 0], "offset": [0, 0, 0]}]},
    {"symmetries_discrete": [
        [-1, 0, 0, 0, 0, -1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1],
        [0, -1, 0, 2.5, 1, 0, 0, -1.0, 0, 0, 1, 0, 0, 0, 0, 1]]},
    {"symmetries_continuous": [{"axis": [0, 0, 1], "offset": [0, 0, 0]}],
     "symmetries_discrete": [
        [-1, 0, 0, 0, 0, -1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1]]},
    {},
], ids=["cont-z", "cont-y", "cont-x", "discrete", "both", "none"])
def test_symmetry_canonicalization_matches_reference(model_info):
    from zebrapose_tpu.tools.symmetry import canonicalize_pose

    ref = _import_ref_labelgen()
    rng = np.random.default_rng(30)
    for _ in range(20):
        R = _random_rotation(rng)
        t = rng.uniform(-50, 600, (3, 1))
        Rr, tr = ref.modified_gt_for_symmetry(R.copy(), t.copy(),
                                              dict(model_info))
        Ro, to = canonicalize_pose(R, t, dict(model_info))
        np.testing.assert_allclose(Ro, Rr, atol=1e-9)
        np.testing.assert_allclose(to, tr, atol=1e-9)


# ---------------------------------------------------- model forward parity

def _forward_parity(ref_net, variant, atol=2e-4):
    ref_net = ref_net.eval()
    variables = convert_reference_state_dict(
        strip_ddp_prefix(ref_net.state_dict()), variant=variant)
    rng = np.random.default_rng(21)
    # same shape as test_model_parity (1-core host: reuse compiled shapes)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        outs_t = ref_net(torch.from_numpy(x))
    model = ZebraPoseNet(binary_code_length=16, base=2, variant=variant,
                         concat=True, output_kernel_size=1)
    outs = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       train=False)
    keys = {"v1": ("mask", "code"),
            "v2": ("mask", "entire_mask", "code"),
            "v3": ("mask", "entire_mask", "code")}[variant]
    for ours, theirs in zip((outs[k] for k in keys), outs_t):
        err = np.abs(np.asarray(ours).transpose(0, 3, 1, 2) -
                     theirs.numpy()).max()
        assert err < atol, f"{variant} max err {err}"


def test_reference_net_v1_forward_parity():
    torch.manual_seed(40)
    _forward_parity(ref_net_v1.BinaryCodeNet_Deeplab(
        34, 16, 2, concat=True, output_kernel_size=1), "v1")


def test_reference_net_v2_forward_parity():
    torch.manual_seed(41)
    _forward_parity(ref_net_v2.BinaryCodeNet_Deeplab_v2(
        34, 16, 2, concat=True, output_kernel_size=1), "v2")


def test_reference_net_v3_decoder_parity():
    """The reference's ASPP_v3 hardcodes the mask-skip resize to (64,64)
    (aspp_v3.py:95), so its full v3 net only runs at 256^2 input — a
    full-net compare at the cheap 64^2 test shape is impossible (the
    reference crashes) and 256^2 would compile our net at a new shape for
    ~10 min on this 1-core host. Instead: golden-compare the
    mask-conditioned second decoder ALONE at its true 256-crop operating
    shapes (mask 128^2, x_high 32^2, skips 64^2/128^2), where the
    hardcoded and dynamic size computations must agree. Full-net v3
    parity at 64^2 is covered against torch_oracle (test_model_parity),
    whose DecoderV3 computes sizes dynamically."""
    from zebrapose_tpu.models.aspp import ASPPv3

    torch.manual_seed(42)
    ref3 = ref_net_v3.BinaryCodeNet_Deeplab_v3(
        34, 16, 2, concat=True, output_kernel_size=1).eval()
    full = convert_reference_state_dict(
        strip_ddp_prefix(ref3.state_dict()), variant="v3")
    variables = {"params": full["params"]["aspp_v3"],
                 "batch_stats": full["batch_stats"]["aspp_v3"]}

    rng = np.random.default_rng(23)
    mask = rng.normal(size=(1, 128, 128, 1)).astype(np.float32)
    x_high = rng.normal(size=(1, 32, 32, 512)).astype(np.float32)
    x_128 = rng.normal(size=(1, 128, 128, 64)).astype(np.float32)
    x_64 = rng.normal(size=(1, 64, 64, 64)).astype(np.float32)

    with torch.no_grad():
        expect = ref3.net.aspp_v3(
            _nchw(mask), _nchw(x_high), x_128=_nchw(x_128),
            x_64=_nchw(x_64))

    got = ASPPv3(num_classes=1, output_kernel_size=1).apply(
        variables, jnp.asarray(mask), jnp.asarray(x_high),
        jnp.asarray(x_128), jnp.asarray(x_64), train=False)
    err = np.abs(np.asarray(got).transpose(0, 3, 1, 2) -
                 expect.numpy()).max()
    assert err < 2e-4, f"v3 decoder max err {err}"
