"""Template-ROI learning, polygon region marking/projection, and the debug
candidate dump — the headless equivalents of the reference UI's user-rect,
polygon marking (src/MatchToolDialog.cpp:909-1530) and m_bDebugMode
candidate overlay (MatchTool/MatchToolDlg.cpp:897-931)."""

import numpy as np
import pytest

from fastest_image_pattern_matching_tpu import (LearnedPattern, MatchConfig,
                                                learn_pattern, match,
                                                match_candidates)


def _structured(h, w, seed=3):
    rng = np.random.default_rng(seed)
    img = rng.integers(20, 60, (h, w), np.uint8)
    img[h // 4:h // 2, w // 5:w // 2] = 220
    img[int(h * .6):int(h * .8), int(w * .55):int(w * .9)] = 140
    img[h // 8:h // 6, :] = 90
    for i in range(0, min(h, w), 7):
        img[i, i] = 255
    return img


def test_learn_roi_validation():
    t = _structured(60, 80)
    with pytest.raises(ValueError):
        learn_pattern(t, 256, roi=(70, 0, 20, 20))
    with pytest.raises(ValueError):
        learn_pattern(t, 256, roi=(0, 0, 0, 10))
    with pytest.raises(ValueError):
        learn_pattern(t, 256, regions=[[(0, 0), (1, 1)]])  # < 3 points


def test_roi_learning_matches_crop():
    """Learning with roi= must behave exactly like learning the crop."""
    t = _structured(90, 120)
    roi = (15, 10, 80, 64)
    pat_roi = learn_pattern(t, 256, roi=roi)
    pat_crop = learn_pattern(t[10:74, 15:95], 256)
    assert pat_roi.shapes == pat_crop.shapes
    for a, b in zip(pat_roi.levels, pat_crop.levels):
        np.testing.assert_array_equal(a.templ, b.templ)
        assert a.mean == b.mean and a.norm == b.norm

    # End-to-end: plant the crop in a scene; the ROI-learned pattern finds
    # it at the crop's location.
    rng = np.random.default_rng(0)
    scene = rng.integers(0, 25, (300, 400), np.uint8)
    scene[40:104, 60:140] = t[10:74, 15:95]
    cfg = MatchConfig(max_pos=2, score=0.8, tolerance_angle=0.0)
    res = match(scene, pat_roi, cfg)
    assert len(res) == 1 and res[0].score > 0.95
    assert abs(res[0].lt[0] - 60) < 1.0 and abs(res[0].lt[1] - 40) < 1.0


def test_region_projection_identity():
    """Unrotated match: marked polygon projects to plant position + offset."""
    t = _structured(64, 96, seed=5)
    region = [(20.0, 12.0), (60.0, 12.0), (60.0, 40.0), (20.0, 40.0)]
    pat = learn_pattern(t, 256, regions=[region])
    rng = np.random.default_rng(1)
    scene = rng.integers(0, 25, (260, 340), np.uint8)
    scene[77:141, 103:199] = t
    cfg = MatchConfig(max_pos=1, score=0.8, tolerance_angle=0.0)
    res = match(scene, pat, cfg)
    assert len(res) == 1
    assert res[0].regions and res[0].regions[0].shape == (4, 2)
    want = np.asarray(region) + np.array([103.0, 77.0])
    assert np.abs(res[0].regions[0] - want).max() < 1.0


def test_region_projection_rotated_within_1px():
    """Rotated match: projected polygon lands within 1 px of the planting
    transform (VERDICT done-criterion; reference transformPolygonToResult,
    src/MatchToolDialog.cpp:1481-1530)."""
    import cv2
    t = _structured(64, 96, seed=7)
    region = np.array([(18.0, 10.0), (70.0, 14.0), (55.0, 50.0), (22.0, 44.0)],
                      np.float64)
    pat = learn_pattern(t, 256, regions=[region])

    ang = 30.0  # counter-clockwise in cv2 convention
    diag = 200
    canvas = np.zeros((diag, diag), np.uint8)
    y0, x0 = (diag - 64) // 2, (diag - 96) // 2
    canvas[y0:y0 + 64, x0:x0 + 96] = t
    m = cv2.getRotationMatrix2D(((diag - 1) / 2, (diag - 1) / 2), ang, 1.0)
    rot = cv2.warpAffine(canvas, m, (diag, diag))
    rng = np.random.default_rng(2)
    scene = rng.integers(0, 20, (420, 420), np.uint8)
    oy, ox = 90, 120
    mask = cv2.warpAffine((canvas > 0).astype(np.uint8) * 255, m,
                          (diag, diag), flags=cv2.INTER_NEAREST)
    reg = scene[oy:oy + diag, ox:ox + diag]
    reg[mask > 0] = rot[mask > 0]

    cfg = MatchConfig(max_pos=1, score=0.7, tolerance_angle=180.0)
    res = match(scene, pat, cfg)
    assert len(res) == 1, [r.score for r in res]
    assert abs(abs(res[0].angle) - ang) < 1.0

    # Ground truth: template point p maps through the same affine chain the
    # scene was built with (template LT at (x0, y0) in canvas, then m, then
    # +(ox, oy)).
    pts_h = np.concatenate([region + np.array([x0, y0]),
                            np.ones((4, 1))], axis=1)
    want = pts_h @ np.asarray(m).T + np.array([ox, oy])
    got = res[0].regions[0]
    assert np.abs(got - want).max() < 1.0, (got, want)


def test_match_candidates_debug_dump():
    """m_bDebugMode analogue: the dump exposes every top-layer candidate."""
    t = _structured(48, 64, seed=9)
    rng = np.random.default_rng(4)
    scene = rng.integers(0, 25, (300, 400), np.uint8)
    plants = [(30, 40), (180, 250)]
    for (y, x) in plants:
        scene[y:y + 48, x:x + 64] = t
    pat = learn_pattern(t, 256)
    cfg = MatchConfig(max_pos=5, score=0.8, tolerance_angle=0.0)
    cand = match_candidates(scene, pat, cfg)
    assert set(cand) == {"x", "y", "angle", "score", "alive"}
    alive = cand["alive"]
    assert alive.sum() >= 2
    # The two planted targets must appear among alive candidates (top-layer
    # grid resolution: within one top-layer pixel = 2^top at level 0).
    tol = 2.0 ** pat.top_layer
    for (y, x) in plants:
        d = np.hypot(cand["x"][alive] - x, cand["y"][alive] - y)
        assert d.min() <= tol, (x, y, cand["x"][alive], cand["y"][alive])
    assert cand["score"][alive].max() > 0.9
