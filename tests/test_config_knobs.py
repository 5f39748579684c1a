"""TPU-native MatchConfig knobs: two_phase and narrow_candidates.

Both are alternate dispatch pipelines (template_matcher._dispatch /
descend_range) that previously had no CPU coverage. two_phase is
result-exact by construction (only already-dead candidates are dropped
between phases); narrow_candidates is a documented divergence knob that
keeps the top scorers — exact whenever every surviving target ranks
within the narrowed bound, which these scenes guarantee.
"""

import cv2
import numpy as np
import pytest

import fastest_image_pattern_matching_tpu as fipm


def _build_scene(rng, tpl, placements, shape=(420, 460)):
    """Paste rotated template instances into a noise background (the same
    construction as bench.py's flagship scene)."""
    H, W = shape
    scene = rng.integers(0, 40, size=(H, W), dtype=np.uint8)
    th, tw = tpl.shape
    diag = int(np.ceil(np.hypot(th, tw))) + 4
    for (cx, cy, ang) in placements:
        canvas = np.zeros((diag, diag), np.uint8)
        mask = np.zeros((diag, diag), np.uint8)
        y0, x0 = (diag - th) // 2, (diag - tw) // 2
        canvas[y0:y0 + th, x0:x0 + tw] = tpl
        mask[y0:y0 + th, x0:x0 + tw] = 255
        m = cv2.getRotationMatrix2D(((diag - 1) / 2, (diag - 1) / 2), ang, 1)
        rc = cv2.warpAffine(canvas, m, (diag, diag))
        rm = cv2.warpAffine(mask, m, (diag, diag), flags=cv2.INTER_NEAREST)
        ys = int(round(cy - (diag - 1) / 2))
        xs = int(round(cx - (diag - 1) / 2))
        reg = scene[max(ys, 0):ys + diag, max(xs, 0):xs + diag]
        rm2 = rm[:reg.shape[0], :reg.shape[1]]
        rc2 = rc[:reg.shape[0], :reg.shape[1]]
        reg[rm2 > 0] = rc2[rm2 > 0]
    return scene


@pytest.fixture(scope="module")
def scene_and_pattern():
    rng = np.random.default_rng(3)
    # 96x96 template: layer 0 (9216 px) exceeds the 4096-px gate that both
    # knobs trigger on, with a 3-level pyramid above it.
    tpl = np.full((96, 96), 60, np.uint8)
    cv2.rectangle(tpl, (8, 8), (87, 87), 200, 6)
    cv2.circle(tpl, (48, 48), 22, 240, -1)
    cv2.line(tpl, (12, 80), (80, 16), 20, 5)
    tpl = cv2.add(tpl, rng.integers(0, 15, tpl.shape, dtype=np.uint8))
    scene = _build_scene(rng, tpl, [(110.0, 120.0, 10.0),
                                    (300.0, 140.0, -25.0),
                                    (180.0, 320.0, 0.0)])
    pattern = fipm.learn_pattern(tpl, 256)
    return scene, pattern


def _cfg(**kw):
    base = dict(max_pos=5, score=0.7, tolerance_angle=30.0, max_overlap=0.2)
    base.update(kw)
    return fipm.MatchConfig(**base)


def test_two_phase_split_exists(scene_and_pattern):
    """The scene is constructed so the adaptive split actually engages —
    otherwise two_phase silently tests nothing."""
    from fastest_image_pattern_matching_tpu.models.template_matcher import (
        _make_plan, _stage_split, _stats_key)
    scene, pattern = scene_and_pattern
    cfg = _cfg(two_phase=True)
    plan = _make_plan(scene.shape, pattern, cfg)
    stats = tuple((lv.mean, lv.norm, lv.inv_area, lv.result_equal1)
                  for lv in pattern.levels)
    assert _stage_split(plan, _stats_key(stats)) is not None


def test_two_phase_equals_default(scene_and_pattern):
    scene, pattern = scene_and_pattern
    base = fipm.match_arrays(scene, pattern, _cfg())
    two = fipm.match_arrays(scene, pattern, _cfg(two_phase=True))
    assert np.array_equal(base["valid"], two["valid"])
    np.testing.assert_allclose(two["score"], base["score"], atol=1e-6)
    np.testing.assert_allclose(two["center"][base["valid"]],
                               base["center"][base["valid"]], atol=1e-4)
    np.testing.assert_allclose(two["angle"][base["valid"]],
                               base["angle"][base["valid"]], atol=1e-4)
    assert int(base["valid"].sum()) == 3  # all three planted targets


def test_two_phase_empty_scene(scene_and_pattern):
    """No candidates above threshold: phase A short-circuits host-side."""
    _, pattern = scene_and_pattern
    rng = np.random.default_rng(8)
    noise = rng.integers(0, 40, size=(420, 460), dtype=np.uint8)
    out = fipm.match_arrays(noise, pattern, _cfg(two_phase=True))
    assert not out["valid"].any()


def test_narrow_candidates_strong_targets_exact(scene_and_pattern):
    """With targets that rank at the top of the sweep, narrowing to the
    top scorers must not change anything (the documented-safe regime)."""
    scene, pattern = scene_and_pattern
    base = fipm.match_arrays(scene, pattern, _cfg())
    nar = fipm.match_arrays(scene, pattern, _cfg(narrow_candidates=True))
    assert np.array_equal(base["valid"], nar["valid"])
    np.testing.assert_allclose(nar["score"], base["score"], atol=1e-6)
    np.testing.assert_allclose(nar["center"][base["valid"]],
                               base["center"][base["valid"]], atol=1e-4)


def test_narrow_candidates_bound(scene_and_pattern):
    """The narrowed candidate set is max(2*max_pos+4, 16) — with max_pos=1
    that is 16; all three targets must still surface as the top scorer is
    re-selected per dispatch."""
    scene, pattern = scene_and_pattern
    out = fipm.match_arrays(scene, pattern,
                            _cfg(max_pos=1, narrow_candidates=True))
    assert int(out["valid"].sum()) == 1
    assert out["score"][0] > 0.9
