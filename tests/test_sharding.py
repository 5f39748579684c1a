"""Sharded matching over a virtual 8-device CPU mesh: the merged result
must equal the single-chip result (SURVEY.md §4: 'multi-host tests that a
sharded run merges to the identical match list as the single-chip run')."""

import cv2
import numpy as np
import pytest

import jax

from fastest_image_pattern_matching_tpu import MatchConfig, learn_pattern, match_arrays
from fastest_image_pattern_matching_tpu.parallel.matcher import match_batch_sharded
from fastest_image_pattern_matching_tpu.parallel.mesh import make_mesh


def _scene(rng, template, poses, hw=(300, 380)):
    scene = rng.integers(0, 30, size=hw, dtype=np.uint8)
    h, w = template.shape
    for (y, x) in poses:
        scene[y:y + h, x:x + w] = template
    return scene


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    t = np.full((40, 56), 30, np.uint8)
    cv2.rectangle(t, (4, 4), (51, 35), 200, 2)
    cv2.line(t, (8, 8), (48, 30), 255, 3)
    cv2.circle(t, (18, 26), 6, 120, -1)
    scenes = np.stack([
        _scene(rng, t, [(40, 60), (180, 200)]),
        _scene(rng, t, [(100, 150)]),
        _scene(rng, t, [(20, 30), (150, 80), (200, 280)]),
    ])
    return t, scenes


def test_mesh_shapes():
    m = make_mesh()
    assert m.devices.size == 8
    assert m.axis_names == ("data", "angle")
    m2 = make_mesh((4, 2))
    assert m2.devices.shape == (4, 2)


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2)])
def test_sharded_matches_single_chip(setup, mesh_shape):
    t, scenes = setup
    pat = learn_pattern(t, 256)
    cfg = MatchConfig(max_pos=4, score=0.7, tolerance_angle=180.0,
                      max_overlap=0.2)
    mesh = make_mesh(mesh_shape)
    out = match_batch_sharded(scenes, pat, cfg, mesh)

    for b in range(scenes.shape[0]):
        ref = match_arrays(scenes[b], pat, cfg)
        np.testing.assert_array_equal(out["valid"][b], ref["valid"])
        nv = ref["valid"].sum()
        np.testing.assert_allclose(out["score"][b][:nv], ref["score"][:nv],
                                   atol=1e-5)
        np.testing.assert_allclose(out["center"][b][:nv], ref["center"][:nv],
                                   atol=1e-3)
        np.testing.assert_allclose(out["angle"][b][:nv], ref["angle"][:nv],
                                   atol=1e-3)


def test_sharded_batch_not_multiple_of_data_axis(setup):
    t, scenes = setup
    pat = learn_pattern(t, 256)
    cfg = MatchConfig(max_pos=2, score=0.7, tolerance_angle=0.0)
    mesh = make_mesh((2, 4))
    out = match_batch_sharded(scenes, pat, cfg, mesh)  # B=3 on data=2
    assert out["valid"].shape[0] == 3
    assert out["valid"][1].sum() == 1


def test_sharded_nms_overflow_redispatch(setup):
    """Force more above-threshold candidates than the NMS cap: the sharded
    path must re-dispatch uncapped and still equal single-chip (the round-3
    gap: parallel returned the capped result silently)."""
    rng = np.random.default_rng(5)
    t = np.full((24, 24), 40, np.uint8)
    cv2.rectangle(t, (3, 3), (20, 20), 220, 2)
    cv2.line(t, (5, 18), (18, 5), 255, 2)
    # Dense grid of targets; the template is ~180-deg symmetric, so the
    # full-circle sweep yields ~2 above-threshold candidates per target —
    # more than nms_cap (4*max_pos+64), forcing the overflow flag.
    scene = rng.integers(0, 25, size=(360, 360), dtype=np.uint8)
    for y in range(10, 330, 33):
        for x in range(10, 330, 33):
            scene[y:y + 24, x:x + 24] = t
    pat = learn_pattern(t, 256)
    cfg = MatchConfig(max_pos=20, score=0.5, tolerance_angle=180.0,
                      max_overlap=0.5)
    from fastest_image_pattern_matching_tpu.models.template_matcher import (
        _make_plan)
    plan = _make_plan(scene.shape, pat, cfg)
    assert plan.nms_cap < plan.c_max, "config must exercise the capped path"

    ref = match_arrays(scene, pat, cfg)
    assert ref["valid"].sum() == 20
    from fastest_image_pattern_matching_tpu.parallel import matcher as pm
    pm._compiled_sharded.cache_clear()
    out = match_batch_sharded(scene[None], pat, cfg, make_mesh((1, 8)))
    # Overflow must have fired the uncapped re-dispatch (a second program).
    assert pm._compiled_sharded.cache_info().misses == 2
    np.testing.assert_array_equal(out["valid"][0], ref["valid"])
    np.testing.assert_allclose(out["score"][0], ref["score"], atol=1e-5)
    np.testing.assert_allclose(out["center"][0], ref["center"], atol=1e-3)


def test_sharded_program_reused_across_scores(setup):
    """Score-only config changes must reuse the compiled sharded program
    (thresholds are traced, like the single-chip path)."""
    from fastest_image_pattern_matching_tpu.parallel import matcher as pm
    t, scenes = setup
    pat = learn_pattern(t, 256)
    mesh = make_mesh((2, 4))
    pm._compiled_sharded.cache_clear()
    out1 = match_batch_sharded(scenes, pat,
                               MatchConfig(max_pos=4, score=0.7,
                                           tolerance_angle=180.0), mesh)
    h1 = pm._compiled_sharded.cache_info()
    out2 = match_batch_sharded(scenes, pat,
                               MatchConfig(max_pos=4, score=0.9,
                                           tolerance_angle=180.0), mesh)
    h2 = pm._compiled_sharded.cache_info()
    assert h2.misses == h1.misses == 1  # second score was a cache hit
    assert out2["valid"].sum() <= out1["valid"].sum()
    # And the higher threshold actually filtered.
    ref = match_arrays(scenes[0], pat,
                       MatchConfig(max_pos=4, score=0.9,
                                   tolerance_angle=180.0))
    np.testing.assert_array_equal(out2["valid"][0], ref["valid"])


def test_sharded_dual_range_and_fast_mode(setup):
    """Dual tolerance ranges and fast_mode through the sharded path."""
    t, scenes = setup
    pat = learn_pattern(t, 256)
    for cfg in (MatchConfig(max_pos=4, score=0.7,
                            tolerance_ranges=(-10.0, 10.0, 170.0, 190.0)),
                MatchConfig(max_pos=4, score=0.6, tolerance_angle=30.0,
                            fast_mode=True)):
        out = match_batch_sharded(scenes, pat, cfg, make_mesh((2, 4)))
        for b in range(scenes.shape[0]):
            ref = match_arrays(scenes[b], pat, cfg)
            np.testing.assert_array_equal(out["valid"][b], ref["valid"])
            nv = ref["valid"].sum()
            np.testing.assert_allclose(out["score"][b][:nv],
                                       ref["score"][:nv], atol=1e-5)


def test_sharded_input_guards(setup):
    """match_batch_sharded applies the single-chip guards
    (MatchToolDlg.cpp:774-781): too-large template, out-of-range values,
    wrong rank."""
    t, scenes = setup
    pat = learn_pattern(t, 256)
    cfg = MatchConfig(max_pos=2, score=0.7, tolerance_angle=0.0)
    mesh = make_mesh((2, 4))
    big_pat = learn_pattern(np.full((400, 400), 128, np.uint8), 256)
    with pytest.raises(ValueError, match="larger than source"):
        match_batch_sharded(scenes, big_pat, cfg, mesh)
    with pytest.raises(ValueError, match="0, 255"):
        match_batch_sharded(scenes.astype(np.float32) + 300.0, pat, cfg,
                            mesh)
    with pytest.raises(ValueError, match="B, H, W"):
        match_batch_sharded(scenes[0], pat, cfg, mesh)


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
def test_sharded_narrow_candidates_matches_single_chip(mesh_shape):
    """cfg.narrow_candidates under sharding (ADVICE r4 medium): the
    sharded path must narrow the GLOBAL candidate set, not each shard's
    slice — asserted by equality with the single-chip narrowed result on
    a template large enough (level-0 area > 4096) to trigger narrowing
    with more candidates than the narrow bound."""
    rng = np.random.default_rng(21)
    t = np.full((72, 88), 35, np.uint8)
    cv2.rectangle(t, (6, 6), (81, 65), 210, 3)
    cv2.line(t, (10, 60), (78, 12), 255, 4)
    cv2.circle(t, (30, 40), 12, 130, -1)
    scene = rng.integers(0, 30, size=(420, 500), dtype=np.uint8)
    for (y, x) in [(30, 40), (200, 300), (310, 90)]:
        scene[y:y + 72, x:x + 88] = t
    pat = learn_pattern(t, 256)
    cfg = MatchConfig(max_pos=3, score=0.6, tolerance_angle=180.0,
                      narrow_candidates=True)
    from fastest_image_pattern_matching_tpu.models.template_matcher import (
        _make_plan)
    plan = _make_plan(scene.shape, pat, cfg)
    assert plan.c_max > max(2 * cfg.max_pos + 4, 16), \
        "config must actually exercise narrowing"
    ref = match_arrays(scene, pat, cfg)
    assert ref["valid"].sum() == 3
    out = match_batch_sharded(scene[None], pat, cfg, make_mesh(mesh_shape))
    np.testing.assert_array_equal(out["valid"][0], ref["valid"])
    np.testing.assert_allclose(out["score"][0], ref["score"], atol=1e-5)
    np.testing.assert_allclose(out["center"][0], ref["center"], atol=1e-3)
    np.testing.assert_allclose(out["angle"][0], ref["angle"], atol=1e-3)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sharded_equals_single_chip_fuzz(seed):
    """Randomized configs/scenes: sharded must equal single-chip for
    arbitrary (max_pos, score, tolerance, overlap) draws — the broad
    invariant behind the angle-sharded descent."""
    rng = np.random.default_rng(100 + seed)
    th = int(rng.integers(20, 36))
    tw = int(rng.integers(24, 48))
    t = rng.integers(0, 256, (th, tw)).astype(np.uint8)
    scene = rng.integers(0, 60, (int(rng.integers(160, 240)),
                                 int(rng.integers(180, 260)))).astype(
                                     np.uint8)
    for _ in range(int(rng.integers(1, 4))):
        y = int(rng.integers(0, scene.shape[0] - th))
        x = int(rng.integers(0, scene.shape[1] - tw))
        scene[y:y + th, x:x + tw] = t
    cfg = MatchConfig(
        max_pos=int(rng.integers(1, 8)),
        score=float(rng.uniform(0.4, 0.9)),
        tolerance_angle=float(rng.choice([0.0, 15.0, 40.0])),
        max_overlap=float(rng.uniform(0.0, 0.8)))
    pat = learn_pattern(t, 256)
    ref = match_arrays(scene, pat, cfg)
    out = match_batch_sharded(scene[None], pat, cfg, make_mesh((1, 8)))
    np.testing.assert_array_equal(out["valid"][0], ref["valid"])
    nv = int(ref["valid"].sum())
    np.testing.assert_allclose(out["score"][0][:nv], ref["score"][:nv],
                               atol=1e-5)
    np.testing.assert_allclose(out["center"][0][:nv], ref["center"][:nv],
                               atol=1e-3)
