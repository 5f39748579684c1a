"""Configs that differ only in `score` must share one compiled XLA
program (traced thresholds — the cold-compile tax is paid once per
shape/structure, not once per score value)."""

import numpy as np

import fastest_image_pattern_matching_tpu as fipm
from fastest_image_pattern_matching_tpu.models import template_matcher as tm


def _scene(hw=(200, 260), tpl_hw=(40, 32)):
    rng = np.random.default_rng(11)
    tpl = rng.integers(0, 255, tpl_hw, dtype=np.uint8)
    scene = rng.integers(80, 150, hw, dtype=np.uint8)
    scene[30:30 + tpl_hw[0], 50:50 + tpl_hw[1]] = tpl
    scene[120:120 + tpl_hw[0], 180:180 + tpl_hw[1]] = tpl
    return scene, tpl


def test_score_values_share_one_program():
    scene, tpl = _scene()
    pat = fipm.learn_pattern(tpl, 256)
    cfgs = [fipm.MatchConfig(max_pos=5, score=s, tolerance_angle=15.0)
            for s in (0.55, 0.7, 0.85)]

    fns = []
    for cfg in cfgs:
        plan, ekey, args = tm._prepare(scene, pat, cfg)
        fns.append(tm._compiled(tm._shared_plan(plan), ekey))
    assert fns[0] is fns[1] is fns[2], \
        "score-only config changes must reuse the cached compiled fn"

    # And the jit cache compiles exactly one executable for all three.
    before = fns[0]._cache_size()
    results = [fipm.match(scene, pat, cfg) for cfg in cfgs]
    after = fns[0]._cache_size()
    assert after - before <= 1

    # Semantics unchanged: lower threshold finds >= matches of higher.
    assert len(results[0]) >= len(results[1]) >= len(results[2])
    assert len(results[0]) >= 2
    for r in results[0]:
        assert r.score >= 0.55 - 1e-6


def test_threshold_still_exact_per_layer():
    """The traced thresholds must reproduce the score*0.9^l per-layer
    gating: a weak planted target admitted at score=0.5 must vanish at
    score just above its measured score."""
    scene, tpl = _scene()
    pat = fipm.learn_pattern(tpl, 256)
    lo = fipm.match(scene, pat, fipm.MatchConfig(
        max_pos=5, score=0.5, tolerance_angle=0.0))
    assert len(lo) >= 2
    s2 = sorted((r.score for r in lo), reverse=True)[1]
    hi = fipm.match(scene, pat, fipm.MatchConfig(
        max_pos=5, score=min(1.0, s2 + 0.005), tolerance_angle=0.0))
    assert len(hi) < len(lo)
