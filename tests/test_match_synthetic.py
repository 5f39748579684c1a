"""End-to-end matching on synthetic scenes with known ground truth.

The reference has no automated tests (SURVEY.md §4); its conformance spec is
golden (score, angle, x, y) tables. We generate scenes by pasting rotated
template instances at known poses and assert recovery — a stronger,
self-contained equivalent.
"""

import cv2
import numpy as np
import pytest

from fastest_image_pattern_matching_tpu import MatchConfig, learn_pattern, match


def _make_template(rng, h=48, w=64):
    """A structured, asymmetric template (so angle is well-defined)."""
    t = np.full((h, w), 40, np.uint8)
    cv2.rectangle(t, (6, 6), (w - 7, h - 7), 220, 2)
    cv2.circle(t, (w // 3, h // 2), 8, 180, -1)
    cv2.line(t, (w // 2, 8), (w - 10, h - 10), 255, 3)
    cv2.putText(t, "R", (8, h - 12), cv2.FONT_HERSHEY_SIMPLEX, 0.9, 255, 2)
    noise = rng.integers(0, 25, size=t.shape, dtype=np.uint8)
    return cv2.add(t, noise)


def _paste_rotated(scene, templ, cx, cy, angle_deg):
    """Paste templ rotated by angle_deg (visual CCW, matching the tool's
    reported positive angle) centered at (cx, cy)."""
    h, w = templ.shape
    diag = int(np.ceil(np.hypot(h, w))) + 4
    canvas = np.zeros((diag, diag), np.uint8)
    mask = np.zeros((diag, diag), np.uint8)
    y0 = (diag - h) // 2
    x0 = (diag - w) // 2
    canvas[y0:y0 + h, x0:x0 + w] = templ
    mask[y0:y0 + h, x0:x0 + w] = 255
    m = cv2.getRotationMatrix2D(((diag - 1) / 2, (diag - 1) / 2), angle_deg, 1)
    rc = cv2.warpAffine(canvas, m, (diag, diag), flags=cv2.INTER_LINEAR)
    rm = cv2.warpAffine(mask, m, (diag, diag), flags=cv2.INTER_NEAREST)
    ys = int(round(cy - (diag - 1) / 2))
    xs = int(round(cx - (diag - 1) / 2))
    region = scene[ys:ys + diag, xs:xs + diag]
    region[rm > 0] = rc[rm > 0]


@pytest.fixture(scope="module")
def template():
    return _make_template(np.random.default_rng(7))


def test_single_target_no_rotation(template):
    rng = np.random.default_rng(3)
    scene = rng.integers(0, 30, size=(300, 400), dtype=np.uint8)
    h, w = template.shape
    scene[101:101 + h, 150:150 + w] = template
    pat = learn_pattern(template, 256)
    cfg = MatchConfig(max_pos=5, score=0.7, tolerance_angle=0.0,
                      min_reduce_area=256)
    res = match(scene, pat, cfg)
    assert len(res) == 1
    r = res[0]
    assert r.score > 0.95
    assert abs(r.angle) < 0.5
    assert abs(r.center[0] - (150 + (w - 1) / 2)) < 1.0
    assert abs(r.center[1] - (101 + (h - 1) / 2)) < 1.0


def test_multi_target_no_rotation(template):
    rng = np.random.default_rng(4)
    scene = rng.integers(0, 30, size=(400, 500), dtype=np.uint8)
    h, w = template.shape
    spots = [(30, 40), (200, 60), (90, 300), (300, 380), (310, 150)]
    for (y, x) in spots:
        scene[y:y + h, x:x + w] = template
    pat = learn_pattern(template, 256)
    cfg = MatchConfig(max_pos=8, score=0.8, tolerance_angle=0.0,
                      min_reduce_area=256, max_overlap=0.2)
    res = match(scene, pat, cfg)
    assert len(res) == len(spots)
    centers = sorted((round(r.center[1]), round(r.center[0])) for r in res)
    want = sorted((y + (h - 1) // 2, x + (w - 1) // 2) for (y, x) in spots)
    for (gy, gx), (wy, wx) in zip(centers, want):
        assert abs(gy - wy) <= 1.5 and abs(gx - wx) <= 1.5


@pytest.mark.parametrize("angle", [15.0, -37.0, 101.0, -140.0])
def test_single_target_rotated(template, angle):
    rng = np.random.default_rng(5)
    scene = rng.integers(0, 30, size=(360, 440), dtype=np.uint8)
    cx, cy = 220.0, 180.0
    _paste_rotated(scene, template, cx, cy, angle)
    pat = learn_pattern(template, 256)
    cfg = MatchConfig(max_pos=3, score=0.6, tolerance_angle=180.0,
                      min_reduce_area=256)
    res = match(scene, pat, cfg)
    assert len(res) >= 1
    r = res[0]
    assert r.score > 0.85, f"score {r.score}"
    err = (r.angle - angle + 180) % 360 - 180
    assert abs(err) < 1.5, f"angle {r.angle} vs {angle}"
    assert abs(r.center[0] - cx) < 2.0
    assert abs(r.center[1] - cy) < 2.0


def test_three_rotated_targets(template):
    """The Src7/Dst7-style regime: 3 targets at 0/+120/-120 degrees."""
    rng = np.random.default_rng(6)
    scene = rng.integers(0, 30, size=(500, 600), dtype=np.uint8)
    poses = [(150.0, 130.0, 0.0), (430.0, 160.0, 120.0), (280.0, 380.0, -120.0)]
    for (cx, cy, a) in poses:
        _paste_rotated(scene, template, cx, cy, a)
    pat = learn_pattern(template, 256)
    cfg = MatchConfig(max_pos=3, score=0.5, tolerance_angle=180.0,
                      min_reduce_area=256, max_overlap=0.1)
    res = match(scene, pat, cfg)
    assert len(res) == 3
    used = set()
    for (cx, cy, a) in poses:
        best = min(range(3), key=lambda i: np.hypot(
            res[i].center[0] - cx, res[i].center[1] - cy))
        assert best not in used
        used.add(best)
        r = res[best]
        assert np.hypot(r.center[0] - cx, r.center[1] - cy) < 2.5
        err = (r.angle - a + 180) % 360 - 180
        assert abs(err) < 1.5


def test_fast_mode_and_bitwise_not(template):
    rng = np.random.default_rng(8)
    scene = rng.integers(0, 30, size=(300, 400), dtype=np.uint8)
    h, w = template.shape
    scene[60:60 + h, 90:90 + w] = template
    pat = learn_pattern(template, 256)
    cfg = MatchConfig(max_pos=2, score=0.5, tolerance_angle=0.0,
                      fast_mode=True)
    res = match(scene, pat, cfg)
    assert len(res) >= 1
    assert abs(res[0].center[0] - (90 + (w - 1) / 2)) < 3.0

    inv_scene = (255 - scene).astype(np.uint8)
    cfg2 = MatchConfig(max_pos=2, score=0.5, tolerance_angle=0.0,
                       bitwise_not=True)
    res2 = match(inv_scene, pat, cfg2)
    assert len(res2) >= 1
    assert abs(res2[0].center[0] - (90 + (w - 1) / 2)) < 1.5


def test_no_match_below_score(template):
    rng = np.random.default_rng(9)
    scene = rng.integers(0, 255, size=(200, 200), dtype=np.uint8)
    pat = learn_pattern(template, 256)
    cfg = MatchConfig(max_pos=3, score=0.9, tolerance_angle=0.0)
    res = match(scene, pat, cfg)
    assert res == []


def test_template_matcher_setters(template):
    """Qt TemplateMatcher setter-surface parity (TemplateMatcher.h:16-51)."""
    from fastest_image_pattern_matching_tpu import TemplateMatcher
    m = TemplateMatcher()
    m.set_max_positions(4)
    m.set_score(0.6)
    m.set_tolerance_angle(0.0)
    m.set_max_overlap(0.3)
    m.set_sub_pixel(False)
    assert m.config.max_pos == 4 and m.config.score == 0.6
    m.learn_pattern(template)
    rng = np.random.default_rng(12)
    scene = rng.integers(0, 30, size=(200, 300), dtype=np.uint8)
    h, w = template.shape
    scene[40:40 + h, 90:90 + w] = template
    res = m.match(scene)
    assert len(res) == 1 and res[0].score > 0.9
    m.set_min_reduce_area(1024)
    assert m.pattern is None  # must re-learn
    with pytest.raises(ValueError):
        m.set_score(2.0)


def test_tiny_template_fast_mode(rng):
    """top_layer == stop_layer == 1: descent skipped entirely, results
    scaled straight from the top sweep (Match() :949-953)."""
    t = np.full((20, 24), 30, np.uint8)
    cv2.rectangle(t, (2, 2), (21, 17), 220, 2)
    cv2.line(t, (4, 4), (20, 16), 255, 2)
    scene = rng.integers(0, 30, size=(200, 260), dtype=np.uint8)
    scene[50:70, 80:104] = t
    scene[120:140, 180:204] = t
    pat = learn_pattern(t, 256)
    assert pat.top_layer == 1
    cfg = MatchConfig(max_pos=4, score=0.5, tolerance_angle=0.0,
                      fast_mode=True, min_reduce_area=256)
    res = match(scene, pat, cfg)
    assert len(res) == 2
    xs = sorted(round(r.center[0]) for r in res)
    assert abs(xs[0] - 91) <= 3 and abs(xs[1] - 191) <= 3


def test_tiny_template_no_pyramid(rng):
    """Template below min_reduce_area: top_layer == 0, single-level match
    (the plain-NCC config 1 regime inside the full driver)."""
    t = np.full((14, 16), 30, np.uint8)
    cv2.rectangle(t, (1, 1), (14, 12), 220, 2)
    scene = rng.integers(0, 30, size=(120, 150), dtype=np.uint8)
    scene[40:54, 60:76] = t
    pat = learn_pattern(t, 256)
    assert pat.top_layer == 0
    cfg = MatchConfig(max_pos=3, score=0.6, tolerance_angle=0.0)
    res = match(scene, pat, cfg)
    assert len(res) == 1
    assert abs(res[0].center[0] - 67.5) < 1.0
    assert abs(res[0].center[1] - 46.5) < 1.0
