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
