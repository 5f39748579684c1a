"""Sharded serving paths beyond NCC (VERDICT r4 item 6): ORB batch and
glyph-set matching sharded over a virtual 8-device data mesh must equal
their single-chip counterparts element-wise."""

import cv2
import numpy as np
import pytest

from fastest_image_pattern_matching_tpu import (
    MatchConfig, ORBConfig, learn_pattern, match_patterns,
    match_patterns_sharded, orb_match_many, orb_match_many_sharded)
from fastest_image_pattern_matching_tpu.parallel.serving import (
    make_data_mesh)


def _orb_scene(rng, tpl, dx, dy):
    H, W = 240, 320
    scene = rng.integers(0, 50, (H, W)).astype(np.uint8)
    th, tw = tpl.shape
    scene[dy:dy + th, dx:dx + tw] = tpl
    return scene


@pytest.fixture(scope="module")
def orb_setup():
    rng = np.random.default_rng(3)
    tpl = np.full((90, 110), 40, np.uint8)
    cv2.rectangle(tpl, (8, 8), (101, 81), 220, 3)
    cv2.circle(tpl, (40, 45), 18, 150, -1)
    cv2.line(tpl, (15, 70), (95, 20), 255, 3)
    cv2.putText(tpl, "OK", (50, 60), cv2.FONT_HERSHEY_SIMPLEX, 1.0, 250, 2)
    srcs = np.stack([_orb_scene(rng, tpl, 30 + 17 * i, 40 + 9 * i)
                     for i in range(5)])
    return tpl, srcs


def test_orb_sharded_equals_single_chip(orb_setup):
    tpl, srcs = orb_setup
    cfg = ORBConfig(max_features=200, max_good_matches=80)
    ref = orb_match_many(srcs, tpl, cfg)
    out = orb_match_many_sharded(srcs, tpl, cfg, mesh=make_data_mesh())
    assert len(out) == len(ref) == 5
    for r, o in zip(ref, out):
        assert o.is_matched == r.is_matched
        assert o.num_inliers == r.num_inliers
        assert o.num_good_matches == r.num_good_matches
        if r.is_matched:
            np.testing.assert_allclose(o.homography, r.homography,
                                       atol=1e-5)
            np.testing.assert_allclose(o.corners, r.corners, atol=1e-3)


def _glyph(rng, ch):
    g = np.full((28, 24), 30, np.uint8)
    cv2.putText(g, ch, (2, 22), cv2.FONT_HERSHEY_SIMPLEX, 0.8, 230, 2)
    return g


def test_match_patterns_sharded_equals_single_chip():
    rng = np.random.default_rng(9)
    chars = list("M12X05")
    glyphs = [_glyph(rng, c) for c in chars]
    scene = rng.integers(0, 25, (120, 260)).astype(np.uint8)
    for i, g in enumerate(glyphs):
        scene[40:68, 20 + i * 36:44 + i * 36] = g
    pats = [learn_pattern(g, 256) for g in glyphs]
    cfg = MatchConfig(max_pos=4, score=0.85, tolerance_angle=0.0,
                      max_overlap=0.4)
    ref = match_patterns(scene, pats, cfg)
    out = match_patterns_sharded(scene, pats, cfg, mesh=make_data_mesh())
    assert len(out) == len(ref) == len(chars)
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(o["valid"], r["valid"])
        nv = int(r["valid"].sum())
        np.testing.assert_allclose(o["score"][:nv], r["score"][:nv],
                                   atol=1e-5)
        np.testing.assert_allclose(o["center"][:nv], r["center"][:nv],
                                   atol=1e-3)


def test_orb_sharded_batch_not_multiple_of_mesh(orb_setup):
    """B=5 on an 8-device mesh: padding rows must be dropped."""
    tpl, srcs = orb_setup
    cfg = ORBConfig(max_features=150, max_good_matches=60)
    out = orb_match_many_sharded(srcs[:3], tpl, cfg, mesh=make_data_mesh())
    assert len(out) == 3
