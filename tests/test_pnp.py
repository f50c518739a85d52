"""EPnP/RANSAC solver tests on synthetic correspondences + cv2 oracle."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from zebrapose_tpu.ops.pnp import (
    PnPConfig,
    decode_to_pose,
    epnp,
    project_points,
    ransac_pnp,
)

K = np.array([[572.4114, 0, 325.2611],
              [0, 573.57043, 242.04899],
              [0, 0, 1]], dtype=np.float32)


def _random_pose(rng):
    a = rng.normal(size=(3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = np.array([rng.uniform(-30, 30), rng.uniform(-30, 30),
                  rng.uniform(400, 900)], dtype=np.float32)
    return q.astype(np.float32), t


def _object_points(rng, n=200):
    return rng.uniform(-40, 40, size=(n, 3)).astype(np.float32)


def _rot_err_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def test_project_points_matches_cv2():
    rng = np.random.default_rng(10)
    pts = _object_points(rng, 50)
    R, t = _random_pose(rng)
    rvec, _ = cv2.Rodrigues(R)
    expect, _ = cv2.projectPoints(pts, rvec, t, K, None)
    got = np.asarray(project_points(jnp.asarray(pts), jnp.asarray(R),
                                    jnp.asarray(t), jnp.asarray(K)))
    np.testing.assert_allclose(got, expect[:, 0, :], atol=1e-2)


def test_epnp_exact_correspondences():
    rng = np.random.default_rng(11)
    pts = _object_points(rng, 100)
    R, t = _random_pose(rng)
    uv = np.array(project_points(jnp.asarray(pts), jnp.asarray(R),
                                   jnp.asarray(t), jnp.asarray(K)))
    w = np.ones(100, np.float32)
    Re, te = epnp(jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(w),
                  jnp.asarray(K))
    assert _rot_err_deg(np.asarray(Re), R) < 0.5
    assert np.linalg.norm(np.asarray(te) - t) < 2.0


def test_epnp_weights_ignore_garbage():
    rng = np.random.default_rng(12)
    pts = _object_points(rng, 120)
    R, t = _random_pose(rng)
    uv = np.array(project_points(jnp.asarray(pts), jnp.asarray(R),
                                   jnp.asarray(t), jnp.asarray(K)))
    # corrupt the last 40 correspondences but zero their weight
    uv[80:] += rng.uniform(-200, 200, size=(40, 2))
    w = np.concatenate([np.ones(80), np.zeros(40)]).astype(np.float32)
    Re, te = epnp(jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(w),
                  jnp.asarray(K))
    assert _rot_err_deg(np.asarray(Re), R) < 0.5
    assert np.linalg.norm(np.asarray(te) - t) < 2.0


def test_ransac_with_outliers_matches_cv2_quality():
    rng = np.random.default_rng(13)
    pts = _object_points(rng, 400)
    R, t = _random_pose(rng)
    uv = np.array(project_points(jnp.asarray(pts), jnp.asarray(R),
                                   jnp.asarray(t), jnp.asarray(K)))
    uv += rng.normal(scale=0.3, size=uv.shape)  # inlier pixel noise
    n_out = 120
    out_idx = rng.choice(400, n_out, replace=False)
    uv[out_idx] = rng.uniform(0, 640, size=(n_out, 2))  # 30% outliers
    w = np.ones(400, np.float32)

    cfg = PnPConfig(n_hypotheses=128, refine_iters=2)
    Re, te, ok, n_in = ransac_pnp(
        jnp.asarray(pts), jnp.asarray(uv.astype(np.float32)),
        jnp.asarray(w), jnp.asarray(K), jax.random.PRNGKey(0), cfg)
    assert bool(ok)
    assert int(n_in) > 200
    assert _rot_err_deg(np.asarray(Re), R) < 1.0
    assert np.linalg.norm(np.asarray(te) - t) < 5.0

    # cv2 oracle on identical data for quality comparison
    okc, rvec, tvec, inl = cv2.solvePnPRansac(
        pts, uv.astype(np.float32), K, None, reprojectionError=2,
        iterationsCount=150, flags=cv2.SOLVEPNP_EPNP)
    Rc, _ = cv2.Rodrigues(rvec)
    # our solution should be in the same quality class as cv2's
    assert _rot_err_deg(np.asarray(Re), R) < _rot_err_deg(Rc, R) + 1.0


def test_ransac_lo_top_k_no_worse_than_winner_only():
    """lo_top_k>1 (LO on the top-k hypotheses, ProgX-style) must never
    end with fewer inliers than refine-the-winner, and stays accurate
    on a hard 50%-outlier scene. Small sizes — fast-subset test."""
    rng = np.random.default_rng(31)
    n, P = 80, 128
    pts = _object_points(rng, n)
    R, t = _random_pose(rng)
    uv = np.array(project_points(jnp.asarray(pts), jnp.asarray(R),
                                 jnp.asarray(t), jnp.asarray(K)))
    uv += rng.normal(scale=0.5, size=uv.shape)
    n_out = int(0.4 * n)          # 0.4^-6 clean-sample odds: ~99.8%
    out_idx = rng.choice(n, n_out, replace=False)  # success at H=128
    uv[out_idx] = rng.uniform(0, 640, size=(n_out, 2))
    p3 = np.zeros((P, 3), np.float32)
    p2 = np.zeros((P, 2), np.float32)
    w = np.zeros(P, np.float32)
    p3[:n], p2[:n], w[:n] = pts, uv, 1

    res = {}
    for k in (1, 4):
        cfg = PnPConfig(n_hypotheses=128, max_points=P, lo_top_k=k)
        Re, te, ok, n_in = ransac_pnp(
            jnp.asarray(p3), jnp.asarray(p2), jnp.asarray(w),
            jnp.asarray(K), jax.random.PRNGKey(5), cfg)
        assert bool(ok), f"lo_top_k={k} failed"
        res[k] = (int(n_in), _rot_err_deg(np.asarray(Re), R))
    assert res[4][0] >= res[1][0]     # LO width never loses inliers
    assert res[4][1] < 2.0
    """P not a multiple of max_points: the block subset pads with
    zero-weight points instead of silently skipping the bound."""
    rng = np.random.default_rng(14)
    pts = _object_points(rng, 600)
    R, t = _random_pose(rng)
    uv = np.array(project_points(jnp.asarray(pts), jnp.asarray(R),
                                 jnp.asarray(t), jnp.asarray(K)))
    uv += rng.normal(scale=0.3, size=uv.shape)
    w = np.ones(600, np.float32)
    cfg = PnPConfig(n_hypotheses=32, max_points=256)  # 600 -> pad 768
    Re, te, ok, n_in = ransac_pnp(
        jnp.asarray(pts), jnp.asarray(uv.astype(np.float32)),
        jnp.asarray(w), jnp.asarray(K), jax.random.PRNGKey(3), cfg)
    assert bool(ok)
    assert int(n_in) > 150          # bounded by the 256-point subset
    assert _rot_err_deg(np.asarray(Re), R) < 1.0
    assert np.linalg.norm(np.asarray(te) - t) < 5.0


def test_ransac_empty_mask_fails_gracefully():
    pts = np.zeros((64, 3), np.float32)
    uv = np.zeros((64, 2), np.float32)
    w = np.zeros(64, np.float32)
    R, t, ok, n_in = ransac_pnp(jnp.asarray(pts), jnp.asarray(uv),
                                jnp.asarray(w), jnp.asarray(K),
                                jax.random.PRNGKey(1),
                                PnPConfig(n_hypotheses=16))
    assert not bool(ok)
    np.testing.assert_array_equal(np.asarray(R), np.eye(3))
    np.testing.assert_array_equal(np.asarray(t), 0)


def test_ransac_concentrated_mask_exact_tail():
    """A mask whose foreground pixels all fall inside ONE contiguous
    raster strip used to hard-fail the block subsample (all block
    representatives collide). The exact-compaction tail of the subset
    guarantees min(n_fg, E) distinct representatives, so any mask the
    reference's >=6-correspondence gate accepts
    (CNN_output_to_pose.py:126-131) reaches the solver here too."""
    rng = np.random.default_rng(15)
    R, t = _random_pose(rng)
    P = 128 * 128
    pts = np.zeros((P, 3), np.float32)
    uv = np.zeros((P, 2), np.float32)
    w = np.zeros(P, np.float32)
    # 12 consecutive raster indices: spans at most 2 of the ~9-pixel
    # blocks of a max_points=2048 subset over P=16384
    fg_idx = np.arange(5000, 5012)
    obj = _object_points(rng, len(fg_idx))
    proj = np.array(project_points(jnp.asarray(obj), jnp.asarray(R),
                                   jnp.asarray(t), jnp.asarray(K)))
    pts[fg_idx] = obj
    uv[fg_idx] = proj
    w[fg_idx] = 1.0

    cfg = PnPConfig(n_hypotheses=64, max_points=2048)
    Re, te, ok, n_in = ransac_pnp(
        jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(w),
        jnp.asarray(K), jax.random.PRNGKey(4), cfg)
    assert bool(ok), "concentrated mask must reach the solver"
    assert _rot_err_deg(np.asarray(Re), R) < 1.0
    assert np.linalg.norm(np.asarray(te) - t) < 5.0

    # the success gate counts TRUE distinct foreground, not subset
    # entries: 5 pixels (< min_points=6) must still fail even though
    # the subset carries them twice (block rep + exact tail)
    w5 = np.zeros(P, np.float32)
    w5[fg_idx[:5]] = 1.0
    _, _, ok5, _ = ransac_pnp(
        jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(w5),
        jnp.asarray(K), jax.random.PRNGKey(4), cfg)
    assert not bool(ok5)


def test_decode_to_pose_end_to_end():
    """Synthetic crop: every foreground pixel's class id maps (via LUT) to
    the 3D point whose projection is that pixel's original-image position,
    under a known pose. decode_to_pose must recover that pose."""
    rng = np.random.default_rng(14)
    R, t = _random_pose(rng)
    crop = 32
    bbox = np.array([200, 150, 96, 96], dtype=np.int64)  # x, y, w, h
    n_bits = 10
    lut_pts = np.zeros((2 ** n_bits, 3), np.float32)
    lut_valid = np.zeros((2 ** n_bits,), bool)

    mask = np.zeros((crop, crop), np.float32)
    code = np.zeros((crop, crop, n_bits), np.float32)
    Kinv = np.linalg.inv(K)
    next_id = 1
    for y in range(4, 28):
        for x in range(4, 28):
            # original-image pixel with reference int truncation
            ox = int(bbox[2] / crop * x + bbox[0])
            oy = int(bbox[3] / crop * y + bbox[1])
            depth = 600.0 + 5 * np.sin(x * 0.3) * np.cos(y * 0.2)
            pc = Kinv @ np.array([ox * depth, oy * depth, depth])
            pw = R.T @ (pc - t)
            cid = next_id
            next_id += 1
            lut_pts[cid] = pw
            lut_valid[cid] = True
            mask[y, x] = 1.0
            code[y, x] = [(cid >> (n_bits - 1 - i)) & 1
                          for i in range(n_bits)]

    cfg = PnPConfig(n_hypotheses=64, max_points=1024)
    Re, te, ok, n_in = decode_to_pose(
        jnp.asarray(mask), jnp.asarray(code), jnp.asarray(lut_pts),
        jnp.asarray(lut_valid), jnp.asarray(bbox.astype(np.int32)),
        jnp.asarray(K), jax.random.PRNGKey(2), bbox_size=crop, base=2,
        cfg=cfg)
    assert bool(ok)
    # quantization to integer original pixels bounds accuracy (~1.5px)
    assert _rot_err_deg(np.asarray(Re), R) < 2.0
    assert np.linalg.norm(np.asarray(te) - t) < 15.0


def test_polish_reduces_reprojection_error():
    """GN polish is a reprojection optimizer: from a perturbed pose it
    must drive weighted reprojection error down (3D pose error under
    pixel noise is only better in expectation, not per-instance)."""
    from zebrapose_tpu.ops.pnp import gauss_newton_pose_polish
    rng = np.random.default_rng(15)
    pts = _object_points(rng, 300)
    R, t = _random_pose(rng)
    uv = np.array(project_points(jnp.asarray(pts), jnp.asarray(R),
                                 jnp.asarray(t), jnp.asarray(K)))
    uv += rng.normal(scale=0.5, size=uv.shape)
    w = np.ones(300, np.float32)
    # perturb the start
    th = np.radians(2.0)
    Rp = R @ np.array([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0], [0, 0, 1]],
                      np.float32)
    tp = t + np.array([3.0, -2.0, 8.0], np.float32)

    def reproj_rms(Rm, tm):
        p = np.array(project_points(jnp.asarray(pts), jnp.asarray(Rm),
                                    jnp.asarray(tm), jnp.asarray(K)))
        return float(np.sqrt(np.mean(np.sum((p - uv) ** 2, -1))))

    e0 = reproj_rms(Rp, tp)
    R2, t2 = gauss_newton_pose_polish(
        jnp.asarray(pts), jnp.asarray(uv.astype(np.float32)),
        jnp.asarray(w), jnp.asarray(K), jnp.asarray(Rp),
        jnp.asarray(tp), iters=5)
    e1 = reproj_rms(np.asarray(R2), np.asarray(t2))
    assert e1 < e0 * 0.3            # large perturbation mostly removed
    assert e1 < 0.8                 # close to the 0.5px noise floor
    # and the pose itself lands near GT
    assert _rot_err_deg(np.asarray(R2), R) < 0.5
    assert np.linalg.norm(np.asarray(t2) - t) < 5.0


def test_prepare_onehot_extraction_is_exact_gather():
    """The one-hot-matmul minimal-set extraction must equal a plain row
    gather bit-for-bit (each output row accumulates exactly one nonzero
    term under HIGHEST precision)."""
    from zebrapose_tpu.ops import pnp as pnp_mod

    rng = np.random.default_rng(21)
    cfg = PnPConfig(n_hypotheses=16, max_points=64)
    P = 256                                    # P > max_points: subset path
    pts3d = jnp.asarray(rng.uniform(-40, 40, (P, 3)).astype(np.float32))
    pts2d = jnp.asarray(rng.uniform(0, 640, (P, 2)).astype(np.float32))
    w = jnp.asarray((rng.random(P) < 0.3).astype(np.float32))
    key = jax.random.PRNGKey(3)

    sub3d, sub2d, sub_w, samp3d, samp2d, _ = jax.jit(
        pnp_mod._ransac_prepare, static_argnums=4)(
            pts3d, pts2d, w, key, cfg)

    # re-derive the sampled indices exactly as _ransac_prepare does and
    # compare the one-hot extraction against the gather formulation
    cdf = jnp.cumsum((sub_w > 0).astype(jnp.float32))
    u = jax.random.uniform(key, (cfg.n_hypotheses, cfg.sample_size),
                           maxval=jnp.maximum(cdf[-1], 1.0))
    idx = jnp.clip(jnp.searchsorted(cdf, u, side="right",
                                    method="compare_all"),
                   0, sub3d.shape[0] - 1)
    if cfg.sample_size < 6:   # sampler pads minimal sets to kernel width
        idx = jnp.concatenate(
            [idx, jnp.broadcast_to(idx[:, -1:],
                                   (idx.shape[0], 6 - cfg.sample_size))],
            axis=1)
    np.testing.assert_array_equal(np.asarray(samp3d),
                                  np.asarray(sub3d)[np.asarray(idx)])
    np.testing.assert_array_equal(np.asarray(samp2d),
                                  np.asarray(sub2d)[np.asarray(idx)])
    # every sampled point is foreground (weight > 0) when any exists
    assert float(jnp.min(sub_w[idx] > 0)) == 1.0


def test_ransac_escalation_recovers_weak_first_round():
    """Adaptive second stage (PnPConfig.escalate_hypotheses): on an
    extreme regime (60% outliers) a tiny first round (H=8) often lands
    a weak consensus; escalation to H=256 must recover the pose — the
    fixed-shape equivalent of cv2's adaptive iteration count
    (CNN_output_to_pose.py:154-159). Also: a strong first round must
    return bit-identical results with escalation configured (the
    lax.cond untaken branch changes nothing)."""
    rng = np.random.default_rng(77)
    n, P = 120, 128
    pts = _object_points(rng, n)
    R, t = _random_pose(rng)
    uv = np.array(project_points(jnp.asarray(pts), jnp.asarray(R),
                                 jnp.asarray(t), jnp.asarray(K)))
    uv += rng.normal(scale=0.5, size=uv.shape)
    n_out = int(0.6 * n)
    out_idx = rng.choice(n, n_out, replace=False)
    uv[out_idx] = rng.uniform(0, 640, size=(n_out, 2))
    p3 = np.zeros((P, 3), np.float32)
    p2 = np.zeros((P, 2), np.float32)
    w = np.zeros(P, np.float32)
    p3[:n], p2[:n], w[:n] = pts, uv.astype(np.float32), 1

    base = dict(n_hypotheses=8, max_points=P, sample_size=5)
    cfg0 = PnPConfig(**base)
    cfg1 = PnPConfig(**base, escalate_hypotheses=256)
    args = (jnp.asarray(p3), jnp.asarray(p2), jnp.asarray(w),
            jnp.asarray(K))
    # find a key where the small first round is weak (it usually is:
    # 0.4^5 clean-sample odds ~1% per draw)
    weak_seen = False
    for seed in range(6):
        key = jax.random.PRNGKey(seed)
        R0, t0, ok0, n0 = ransac_pnp(*args, key, cfg0)
        R1, t1, ok1, n1 = ransac_pnp(*args, key, cfg1)
        assert int(n1) >= int(n0)       # escalation never loses support
        if not bool(ok0) or int(n0) < 0.4 * n:
            weak_seen = True
            # escalated run must nail the pose
            assert bool(ok1)
            assert _rot_err_deg(np.asarray(R1), R) < 2.0
            break
    assert weak_seen, "no weak first round in 6 seeds; raise outliers"

    # strong consensus: 10% outliers at H=64 -> escalation not taken
    uv2 = np.array(project_points(jnp.asarray(pts), jnp.asarray(R),
                                  jnp.asarray(t), jnp.asarray(K)))
    uv2 += rng.normal(scale=0.3, size=uv2.shape)
    p2s = np.zeros((P, 2), np.float32)
    p2s[:n] = uv2.astype(np.float32)
    strong = dict(n_hypotheses=64, max_points=P, sample_size=5)
    a2 = (jnp.asarray(p3), jnp.asarray(p2s), jnp.asarray(w),
          jnp.asarray(K), jax.random.PRNGKey(2))
    Ra, ta, oka, na = ransac_pnp(*a2, PnPConfig(**strong))
    Rb, tb, okb, nb = ransac_pnp(
        *a2, PnPConfig(**strong, escalate_hypotheses=256))
    assert bool(oka) and int(na) == int(nb)
    np.testing.assert_array_equal(np.asarray(Ra), np.asarray(Rb))
    np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))
