"""Non-binary (base-d) ablation path end-to-end: CE-head model shape,
CE binarization, base-4 decode -> pose (reference config_ablation
4^8/16^4/256^2 family)."""

import numpy as np
import jax
import jax.numpy as jnp

from zebrapose_tpu.codec.surface_code import class_id_to_code
from zebrapose_tpu.models.zebra_net import ZebraPoseNet
from zebrapose_tpu.ops.binarize import code_from_logits
from zebrapose_tpu.ops.pnp import PnPConfig, decode_to_pose

K = np.array([[500.0, 0, 64.0], [0, 500.0, 48.0], [0, 0, 1]], np.float32)


def test_nonbinary_model_heads():
    model = ZebraPoseNet(binary_code_length=8, base=4, variant="v1",
                         concat=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    out = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out["mask"].shape == (2, 32, 32, 1)
    assert out["code"].shape == (2, 32, 32, 8 * 4)  # split CE head


def test_ce_binarize_groups():
    rng = np.random.default_rng(120)
    logits = rng.normal(size=(1, 4, 4, 8 * 4)).astype(np.float32)
    code = np.asarray(code_from_logits(jnp.asarray(logits), "CE", base=4))
    assert code.shape == (1, 4, 4, 8)
    assert code.min() >= 0 and code.max() <= 3
    # argmax per group matches numpy
    grouped = logits.reshape(1, 4, 4, 8, 4)
    np.testing.assert_array_equal(code, grouped.argmax(-1))


def test_base4_decode_to_pose():
    """Exact-geometry synthetic decode with base-4 digits (4^8 = 65536
    classes, 8 digit planes)."""
    rng = np.random.default_rng(121)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    R = q.astype(np.float32)
    t = np.array([0, 0, 500.0], np.float32)

    crop = 32
    bbox = np.array([180, 140, 96, 96], np.int32)
    n_digits, base = 8, 4
    lut_pts = np.zeros((base ** n_digits, 3), np.float32)
    lut_valid = np.zeros((base ** n_digits,), bool)
    mask = np.zeros((crop, crop), np.float32)
    code = np.zeros((crop, crop, n_digits), np.float32)
    Kinv = np.linalg.inv(K)
    next_id = 1
    for y in range(4, 28):
        for x in range(4, 28):
            ox = int(bbox[2] / crop * x + bbox[0])
            oy = int(bbox[3] / crop * y + bbox[1])
            depth = 500.0 + 5 * np.sin(x * 0.3)
            pc = Kinv @ np.array([ox * depth, oy * depth, depth])
            cid = next_id
            next_id += 1
            lut_pts[cid] = R.T @ (pc - t)
            lut_valid[cid] = True
            mask[y, x] = 1.0
            code[y, x] = np.asarray(class_id_to_code(
                jnp.asarray(np.int32(cid)), base=base, n_digits=n_digits))

    Re, te, ok, _ = decode_to_pose(
        jnp.asarray(mask), jnp.asarray(code), jnp.asarray(lut_pts),
        jnp.asarray(lut_valid), jnp.asarray(bbox), jnp.asarray(K),
        jax.random.PRNGKey(5), bbox_size=crop, base=base,
        cfg=PnPConfig(n_hypotheses=64, max_points=1024))
    assert bool(ok)
    c = (np.trace(R.T @ np.asarray(Re)) - 1) / 2
    assert np.degrees(np.arccos(np.clip(c, -1, 1))) < 2.0
    assert np.linalg.norm(np.asarray(te) - t) < 15.0
