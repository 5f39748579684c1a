"""ORB secondary path (ORBMatch/ORBFeatureMatcher.cpp parity at the
capability level: recover the homography between two views)."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from fastest_image_pattern_matching_tpu.models.orb import (
    ORBConfig, detect_and_describe, hamming_match, orb_match,
    ransac_homography)


def _textured(rng, h, w):
    img = rng.integers(0, 255, size=(h // 8, w // 8), dtype=np.uint8)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_NEAREST)
    img = cv2.GaussianBlur(img, (5, 5), 1.0)
    for _ in range(40):
        x, y = rng.integers(10, w - 10), rng.integers(10, h - 10)
        cv2.circle(img, (int(x), int(y)), int(rng.integers(3, 9)),
                   int(rng.integers(0, 255)), -1)
    return img


def test_detect_finds_corners(rng):
    img = np.zeros((120, 160), np.uint8)
    cv2.rectangle(img, (40, 30), (120, 90), 255, -1)
    cfg = ORBConfig(max_features=64, n_levels=2, fast_threshold=20)
    pts, desc, valid = detect_and_describe(img, cfg)
    pts = np.asarray(pts)[np.asarray(valid)]
    assert len(pts) >= 4
    # The rectangle corners must be among detections (within 3 px).
    for target in [(40, 30), (120, 30), (40, 90), (120, 90)]:
        d = np.min(np.linalg.norm(pts - np.array(target), axis=1))
        assert d <= 3.0, f"corner {target} missed (nearest {d})"


def test_hamming_match_exact(rng):
    a = rng.choice([-1.0, 1.0], size=(10, 256)).astype(np.float32)
    b = np.concatenate([a[5:], rng.choice([-1.0, 1.0], size=(11, 256))
                        .astype(np.float32)])
    ti, dist = hamming_match(jnp.asarray(a), jnp.ones(10, bool),
                             jnp.asarray(b), jnp.ones(16, bool))
    ti = np.asarray(ti)
    dist = np.asarray(dist)
    # a[5..9] == b[0..4] -> perfect matches at distance 0.
    for i in range(5, 10):
        assert ti[i] == i - 5
        assert dist[i] == 0.0
    # Distances equal true hamming distances.
    for i in range(5):
        true = np.sum(a[i] != b[ti[i]])
        assert dist[i] == true


def test_ransac_recovers_known_homography(rng):
    H_true = np.array([[0.95, 0.08, 12.0], [-0.06, 1.02, -7.0],
                       [1e-5, -2e-5, 1.0]])
    src = rng.uniform(0, 300, size=(80, 2))
    ph = np.concatenate([src, np.ones((80, 1))], 1) @ H_true.T
    dst = ph[:, :2] / ph[:, 2:3]
    # 25% outliers.
    dst[:20] = rng.uniform(0, 300, size=(20, 2))
    H, mask = ransac_homography(
        jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32),
        jnp.ones(80, bool), 2.0, 500)
    H = np.asarray(H)
    mask = np.asarray(mask)
    assert mask.sum() >= 55
    # Project a probe grid and compare against the true map.
    probe = rng.uniform(20, 280, size=(20, 2))
    def proj(M, p):
        q = np.concatenate([p, np.ones((len(p), 1))], 1) @ M.T
        return q[:, :2] / q[:, 2:3]
    err = np.linalg.norm(proj(H, probe) - proj(H_true, probe), axis=1)
    assert np.median(err) < 1.0, err


def test_orb_match_end_to_end_translation(rng):
    base = _textured(rng, 240, 320)
    template = base[60:180, 80:240].copy()
    res = orb_match(base, template)
    assert res.is_matched
    assert res.num_inliers >= 10
    # H maps source pts -> template pts; the template's corner (0,0) must
    # land near (80,60) in the source (corners = H^-1 * template corners).
    assert res.corners is not None
    assert np.linalg.norm(res.corners[0] - [80, 60]) < 4.0, res.corners
    assert np.linalg.norm(res.corners[2] - [240, 180]) < 4.0, res.corners


def test_orb_match_rotation(rng):
    base = _textured(rng, 260, 340)
    m = cv2.getRotationMatrix2D((170, 130), 20.0, 1.0)
    rotated = cv2.warpAffine(base, m, (340, 260))
    template = base[40:220, 60:300].copy()
    res = orb_match(rotated, template, ORBConfig(ransac_iters=1000))
    assert res.is_matched
    assert res.num_inliers >= 8
    # The recovered homography composed with the known rotation should be
    # near-identity on the overlap: check one known correspondence.
    # Template (0,0) corresponds to base (60,40); in the rotated source it
    # sits at m * (60,40).
    want = m[:, :2] @ np.array([60, 40]) + m[:, 2]
    got = res.corners[0]
    assert np.linalg.norm(got - want) < 5.0, (got, want)


def test_orb_match_failure_on_unrelated(rng):
    a = _textured(rng, 200, 200)
    flat = np.full((100, 100), 128, np.uint8)
    res = orb_match(a, flat)
    assert not res.is_matched


def test_orb_agrees_with_opencv_pipeline(rng):
    """Run OpenCV's own ORB+BFMatcher+findHomography on the same pair and
    compare recovered corner projections — path-level conformance with the
    reference's exact stack (ORBFeatureMatcher.cpp:43-109)."""
    base = _textured(rng, 260, 340)
    template = base[50:210, 70:290].copy()

    ours = orb_match(base, template)
    assert ours.is_matched

    orb = cv2.ORB_create(500, 1.2, 8, 31, 0, 2, cv2.ORB_HARRIS_SCORE, 31)
    ks, ds = orb.detectAndCompute(base, None)
    kt, dt = orb.detectAndCompute(template, None)
    matches = cv2.BFMatcher(cv2.NORM_HAMMING).match(ds, dt)
    matches = sorted(matches, key=lambda m: m.distance)[:150]
    s_pts = np.float32([ks[m.queryIdx].pt for m in matches])
    t_pts = np.float32([kt[m.trainIdx].pt for m in matches])
    H_cv, _ = cv2.findHomography(s_pts, t_pts, cv2.RANSAC, 2.0)
    tc = np.float32([[0, 0], [220, 0], [220, 160], [0, 160]]).reshape(-1, 1, 2)
    cv_corners = cv2.perspectiveTransform(tc, np.linalg.inv(H_cv)).reshape(-1, 2)

    err = np.linalg.norm(ours.corners - cv_corners, axis=1)
    assert np.max(err) < 5.0, (ours.corners, cv_corners)
    # Scale/rotation extraction sanity for the identity-ish transform.
    assert abs(ours.rotation_angle) < 3.0
    assert ours.scale_mm_per_pix > 0
