"""finalize's greedy NMS must be independent of candidate array order —
the invariant that makes the angle-sharded descent (which reorders
candidates) exactly equal to single-chip, even under exact score ties
(the position-based lexicographic tie-break in build_stages.finalize)."""

import numpy as np
import pytest

import jax.numpy as jnp

import fastest_image_pattern_matching_tpu as fipm
from fastest_image_pattern_matching_tpu.models.template_matcher import (
    _make_plan, build_stages)


@pytest.fixture(scope="module")
def stages():
    t = np.full((24, 32), 128, np.uint8)
    t[4:20, 6:26] = 40
    pat = fipm.learn_pattern(t, 256)
    cfg = fipm.MatchConfig(max_pos=6, score=0.5, tolerance_angle=0.0,
                           max_overlap=0.3)
    plan = _make_plan((200, 220), pat, cfg)
    stats = tuple((lv.mean, lv.norm, lv.inv_area, lv.result_equal1)
                  for lv in pat.levels)
    return build_stages(plan, stats), plan


def _finalize(st, pt, ang, score, alive):
    out = st.finalize(jnp.asarray(pt, jnp.float32),
                      jnp.asarray(ang, jnp.float32),
                      jnp.asarray(score, jnp.float32),
                      jnp.asarray(alive))
    return {k: np.asarray(v) for k, v in out.items()}


def test_exact_ties_resolve_identically_under_permutation(stages):
    st, plan = stages
    rng = np.random.default_rng(0)
    C = plan.c_max
    pt = np.zeros((C, 2), np.float32)
    ang = np.zeros(C, np.float32)
    score = np.full(C, -1.0, np.float32)
    alive = np.zeros(C, bool)
    # Five candidates with EXACTLY tied scores; two pairs overlap, so the
    # greedy keep-set depends on the order unless the tie-break is
    # position-based.
    locs = [(10.0, 10.0), (14.0, 12.0),     # overlapping tie pair
            (80.0, 40.0), (84.0, 42.0),     # overlapping tie pair
            (150.0, 120.0)]                 # isolated
    for i, (x, y) in enumerate(locs):
        pt[i] = (x, y)
        score[i] = 0.875
        alive[i] = True

    ref = _finalize(st, pt, ang, score, alive)
    for seed in range(5):
        perm = np.random.default_rng(seed).permutation(C)
        out = _finalize(st, pt[perm], ang[perm], score[perm], alive[perm])
        for k in ("score", "angle", "center", "valid"):
            np.testing.assert_array_equal(out[k], ref[k], err_msg=k)
    # Sanity: the tie-break kept exactly one of each overlapping pair.
    assert int(ref["valid"].sum()) == 3
