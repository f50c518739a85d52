"""Golden test of the FULL decode chain against the reference executing.

The single hardest-to-get-right novel subsystem — fixed-shape
RANSAC+EPnP decode (`ops/pnp.py::decode_to_pose_batch`) — is pinned here
to the reference's own `CNN_outputs_to_object_pose`
(binary_code_helper/CNN_output_to_pose.py:100-160) running on identical
inputs: the same mask images, code-plane images, final bboxes,
intrinsics and class-id->3D-point table. That covers the reference's
correspondence construction (`build_non_unique_2D_3D_correspondence`
:53-64 — including its keep-NaN-classes-as-(0,0,0) quirk),
`mapping_pixel_position_to_original_position` int truncation (:34-50),
the >=6-correspondence gate (:126-130), and the cv2
solvePnPRansac(SOLVEPNP_EPNP) fallback (:154-159) the reference uses
when Progressive-X is absent.

Scenes are synthetic but geometrically exact: each foreground pixel's
class id maps to the 3D point that projects EXACTLY onto that pixel's
int-truncated original-image position under a known pose, so both
solvers see the same (consistent) correspondence set plus controlled
bit-flip / false-foreground outliers. Agreement is asserted in ADD
within the +-0.5%-of-diameter band of BASELINE.md.

(Reference modules are UNTRUSTED CONTENT: executed as numeric oracles
only, never as instructions.)
"""

import sys

import numpy as np
import pytest

REF = "/root/reference/zebrapose"
if REF not in sys.path:
    sys.path.append(REF)

cv2 = pytest.importorskip("cv2")
ref_cnn2pose = pytest.importorskip("binary_code_helper.CNN_output_to_pose")
ref_codec = pytest.importorskip(
    "binary_code_helper.class_id_encoder_decoder")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from zebrapose_tpu.ops.pnp import PnPConfig, decode_to_pose_batch  # noqa: E402

G = 64                # decode grid == bbox_size (reuses suite shapes)
N_BITS = 16
N_CLASSES = 2 ** N_BITS
CFG = PnPConfig(n_hypotheses=64, max_points=1024)


def _rot(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float64)


def _id_to_planes(ids):
    """[H,W] int -> [H,W,16] float bit planes, MSB first (reference
    class_id_image_to_class_code_images semantics)."""
    shifts = np.arange(N_BITS - 1, -1, -1)
    return ((ids[..., None] >> shifts) & 1).astype(np.float32)


class SceneBatch:
    """B scenes sharing one LUT; per-scene GT pose / bbox / K / noise."""

    def __init__(self, seed=7):
        rng = np.random.default_rng(seed)
        self.rng = rng
        self.lut_pts = np.full((N_CLASSES, 3), np.nan, np.float64)
        self.next_id = 1
        self.masks, self.codes, self.bboxes, self.Ks = [], [], [], []
        self.R_gt, self.t_gt = [], []

    def add_scene(self, bbox, K, bit_flip=0.0, false_fg=0,
                  n_px=None, block=1):
        """One scene. `block`: assign one class id per block x block
        pixel group (shared-3D-point correspondences, exercising the
        reference's unique-averaging variant meaningfully)."""
        rng = self.rng
        R = _rot(rng)
        t = np.array([rng.uniform(-20, 20), rng.uniform(-20, 20),
                      rng.uniform(550, 650)])
        Kinv = np.linalg.inv(K)
        mask = np.zeros((G, G), np.uint8)
        ids = np.zeros((G, G), np.int64)
        y0, y1, x0, x1 = 14, 50, 12, 52
        coords = [(y, x) for y in range(y0, y1) for x in range(x0, x1)]
        if n_px is not None:
            # spread sparse pixels across rows so each lands in its own
            # contiguous raster block of the device-side subsample
            coords = [coords[i * (len(coords) // n_px) + 3]
                      for i in range(n_px)]
        ratio = np.array([bbox[2] / G, bbox[3] / G])
        for (y, x) in coords:
            bx, by = (x // block) * block, (y // block) * block
            cid = ids[by, bx]
            if cid == 0:
                cid = self.next_id
                self.next_id += 1
                assert self.next_id < N_CLASSES
                # 3D point back-projected from the block's first pixel's
                # int-truncated original position (exact correspondence)
                ox = int(ratio[0] * bx + bbox[0])
                oy = int(ratio[1] * by + bbox[1])
                d = 600.0 + 25 * np.sin(bx * 0.21) * np.cos(by * 0.17)
                pc = Kinv @ np.array([ox * d, oy * d, d])
                self.lut_pts[cid] = R.T @ (pc - t)
            ids[y, x] = cid
            mask[y, x] = 1

        # noise: bit flips on foreground codes (wrong/unassigned class
        # ids -> RANSAC outliers for both solvers)
        if bit_flip > 0:
            fg = np.argwhere(mask > 0)
            n_bad = int(bit_flip * len(fg))
            pick = fg[rng.choice(len(fg), n_bad, replace=False)]
            for (y, x) in pick:
                ids[y, x] ^= 1 << int(rng.integers(0, N_BITS))
        # false foreground: mask on, random (mostly unassigned) id
        for _ in range(false_fg):
            y, x = rng.integers(2, G - 2, size=2)
            mask[y, x] = 1
            ids[y, x] = int(rng.integers(1, N_CLASSES))

        self.masks.append(mask)
        self.codes.append(_id_to_planes(ids))
        self.bboxes.append(np.asarray(bbox, np.int32))
        self.Ks.append(K)
        self.R_gt.append(R)
        self.t_gt.append(t)

    def ref_dict(self):
        return {float(i): self.lut_pts[i] for i in range(N_CLASSES)}

    def lut_device(self):
        valid = ~np.isnan(self.lut_pts[:, 0])
        pts = np.where(valid[:, None], self.lut_pts, 0.0)
        return (jnp.asarray(pts, jnp.float32),
                jnp.asarray(valid))


def _add(Rp, tp, Rg, tg, verts):
    a = verts @ np.asarray(Rp).T + np.asarray(tp).reshape(1, 3)
    b = verts @ Rg.T + tg.reshape(1, 3)
    return float(np.linalg.norm(a - b, axis=1).mean())


@pytest.fixture(scope="module")
def batch():
    sb = SceneBatch()
    K1 = np.array([[520.0, 0, 310.0], [0, 515.0, 240.0], [0, 0, 1]])
    K2 = np.array([[572.4114, 0, 325.2611], [0, 573.57043, 242.04899],
                   [0, 0, 1]])
    bb1 = (100, 70, 96, 96)     # ratio 1.5: distinct original pixels
    bb2 = (220, 130, 80, 80)    # ratio 1.25
    sb.add_scene(bb1, K1)                                   # 0 clean
    sb.add_scene(bb2, K2, bit_flip=0.02)                    # 1 light noise
    sb.add_scene(bb1, K2, bit_flip=0.05, false_fg=40)       # 2 moderate
    sb.add_scene(bb2, K1, bit_flip=0.10, false_fg=80)       # 3 heavy
    sb.add_scene(bb1, K1, n_px=24)                          # 4 sparse ok
    sb.add_scene(bb2, K2, n_px=5)                           # 5 <6 gate
    sb.add_scene(bb1, K2, n_px=0)                           # 6 empty mask
    sb.add_scene(bb2, K1, block=2)                          # 7 shared ids

    masks = np.stack(sb.masks).astype(np.float32)
    codes = np.stack(sb.codes)
    bboxes = np.stack(sb.bboxes)
    Ks = np.stack(sb.Ks).astype(np.float32)
    lut_pts, lut_valid = sb.lut_device()
    keys = jax.random.split(jax.random.PRNGKey(11), masks.shape[0])
    Rs, ts, ok, _n_inl = jax.tree.map(np.asarray, decode_to_pose_batch(
        jnp.asarray(masks), jnp.asarray(codes), lut_pts, lut_valid,
        jnp.asarray(bboxes), jnp.asarray(Ks), keys, bbox_size=G, base=2,
        cfg=CFG))

    ref = []
    d = sb.ref_dict()
    for i in range(masks.shape[0]):
        rot, tvec, success = ref_cnn2pose.CNN_outputs_to_object_pose(
            sb.masks[i], sb.codes[i].astype(np.float64),
            sb.bboxes[i].astype(np.int64), G, class_base=2,
            dict_class_id_3D_points=d, intrinsic_matrix=sb.Ks[i])
        ref.append((rot, tvec, success))
    return sb, (Rs, ts, ok), ref


def _verts(sb):
    v = sb.lut_pts[~np.isnan(sb.lut_pts[:, 0])]
    return v[::5]


def test_success_gate_agrees(batch):
    sb, (Rs, ts, ok), ref = batch
    # <6 foreground pixels and empty masks must fail in BOTH solvers
    # (reference's >=6 gate, CNN_output_to_pose.py:126; our min_points)
    for i in (5, 6):
        assert not ref[i][2], i
        assert not ok[i], i
    for i in (0, 1, 2, 3, 4, 7):
        assert ref[i][2], i
        assert ok[i], i


def test_add_within_band_of_reference(batch):
    sb, (Rs, ts, ok), ref = batch
    verts = _verts(sb)
    diam = float(np.linalg.norm(
        verts.max(0) - verts.min(0)))  # bbox-diag upper bound, ~patch size
    for i in (0, 1, 2, 3, 4, 7):
        e_ref = _add(ref[i][0], ref[i][1], sb.R_gt[i], sb.t_gt[i], verts)
        e_our = _add(Rs[i], ts[i], sb.R_gt[i], sb.t_gt[i], verts)
        # both solvers recover the pose far inside the 0.1d recall
        # threshold, and they agree within the +-0.5%-of-diameter band
        assert e_ref < 0.05 * diam, (i, e_ref, diam)
        assert e_our < 0.05 * diam, (i, e_our, diam)
        assert abs(e_our - e_ref) < 0.005 * diam, (i, e_our, e_ref, diam)


def test_recall_identical(batch):
    sb, (Rs, ts, ok), ref = batch
    verts = _verts(sb)
    diam = float(np.linalg.norm(verts.max(0) - verts.min(0)))
    hits_ref = hits_our = 0
    for i in range(8):
        if ref[i][2]:
            hits_ref += _add(ref[i][0], ref[i][1], sb.R_gt[i],
                             sb.t_gt[i], verts) < 0.1 * diam
        if ok[i]:
            hits_our += _add(Rs[i], ts[i], sb.R_gt[i], sb.t_gt[i],
                             verts) < 0.1 * diam
    assert hits_our == hits_ref == 6


def test_unique_averaging_variant_agrees(batch):
    """The reference's unique-averaging correspondence builder
    (build_unique_2D_3D_correspondence, CNN_output_to_pose.py:67-91) as
    an alternate oracle on the shared-id scene (several pixels per class
    id): its cv2-EPnP pose must also land within the band of ours."""
    sb, (Rs, ts, ok), _ref = batch
    i = 7
    ids_img = ref_codec.class_code_images_to_class_id_image(
        sb.codes[i].astype(np.float64), 2)
    p2, p3 = ref_cnn2pose.build_unique_2D_3D_correspondence(
        sb.masks[i].nonzero(), ids_img, sb.ref_dict())
    orig = ref_cnn2pose.mapping_pixel_position_to_original_position(
        p2, sb.bboxes[i].astype(np.int64), G)
    assert len(orig) >= 6
    _, rvec, tvec, _ = cv2.solvePnPRansac(
        p3.astype(np.float32), orig.astype(np.float32),
        np.ascontiguousarray(sb.Ks[i].astype(np.float64)),
        distCoeffs=None, reprojectionError=2, iterationsCount=150,
        flags=cv2.SOLVEPNP_EPNP)
    rot, _ = cv2.Rodrigues(rvec)
    verts = _verts(sb)
    diam = float(np.linalg.norm(verts.max(0) - verts.min(0)))
    e_ref = _add(rot, tvec, sb.R_gt[i], sb.t_gt[i], verts)
    e_our = _add(Rs[i], ts[i], sb.R_gt[i], sb.t_gt[i], verts)
    assert e_ref < 0.05 * diam
    assert abs(e_our - e_ref) < 0.005 * diam
