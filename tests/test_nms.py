"""Rotated-rect NMS parity vs OpenCV rotatedRectangleIntersection +
contourArea (the reference's FilterWithRotatedRect, MatchToolDlg.cpp:1498-1557)."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from fastest_image_pattern_matching_tpu.ops.nms import (
    filter_overlaps, quad_intersection_area, rotated_rect_corners)


def _cv_quad(pt_lt, angle_deg, w, h):
    ra = -angle_deg * np.pi / 180.0
    c, s = np.cos(ra), np.sin(ra)
    lt = np.array(pt_lt)
    rt = lt + [w * c, -w * s]
    lb = lt + [h * s, h * c]
    rb = rt + [h * s, h * c]
    return np.array([lt, rt, rb, lb], np.float32)


def test_quad_intersection_vs_opencv(rng):
    for _ in range(50):
        q1 = _cv_quad(rng.uniform(0, 50, 2), rng.uniform(-180, 180), 30, 20)
        q2 = _cv_quad(rng.uniform(0, 50, 2), rng.uniform(-180, 180), 30, 20)
        got = float(quad_intersection_area(jnp.asarray(q1), jnp.asarray(q2)))
        r1 = cv2.minAreaRect(q1)
        r2 = cv2.minAreaRect(q2)
        kind, pts = cv2.rotatedRectangleIntersection(r1, r2)
        if kind == cv2.INTERSECT_NONE or pts is None or len(pts) < 3:
            want = 0.0
        else:
            hull = cv2.convexHull(pts.reshape(-1, 2))
            want = cv2.contourArea(hull)
        assert abs(got - want) < max(1.0, 0.02 * want), (got, want)


def test_identical_quads_full_overlap():
    q = _cv_quad((5, 5), 30.0, 20, 10)
    a = float(quad_intersection_area(jnp.asarray(q), jnp.asarray(q)))
    assert abs(a - 200.0) < 1e-2


def test_disjoint_quads_zero():
    q1 = _cv_quad((0, 0), 0.0, 10, 10)
    q2 = _cv_quad((100, 100), 45.0, 10, 10)
    assert float(quad_intersection_area(jnp.asarray(q1), jnp.asarray(q2))) == 0.0


def test_filter_overlaps_greedy():
    # Three candidates: #0 best, #1 overlaps #0 heavily, #2 far away.
    pts = jnp.asarray(np.array([[0, 0], [3, 2], [100, 100]], np.float32))
    angs = jnp.asarray(np.zeros(3, np.float32))
    quads = rotated_rect_corners(pts, angs, 20.0, 10.0)
    valid = jnp.asarray(np.array([True, True, True]))
    keep = np.asarray(filter_overlaps(quads, valid, 200.0, 0.25))
    assert keep.tolist() == [True, False, True]

    # With a high overlap tolerance all three survive.
    keep2 = np.asarray(filter_overlaps(quads, valid, 200.0, 0.8))
    assert keep2.tolist() == [True, True, True]


def test_filter_overlaps_respects_valid_mask():
    pts = jnp.asarray(np.array([[0, 0], [3, 2]], np.float32))
    quads = rotated_rect_corners(pts, jnp.zeros(2), 20.0, 10.0)
    # #0 invalid: it must not suppress #1.
    keep = np.asarray(filter_overlaps(
        quads, jnp.asarray(np.array([False, True])), 200.0, 0.25))
    assert keep.tolist() == [False, True]


def test_filter_overlaps_matches_sequential_greedy(rng):
    # The round-based while_loop must reproduce the reference's sequential
    # greedy (FilterWithRotatedRect, MatchToolDlg.cpp:1498-1557) on dense
    # random conflict patterns, including kill-chains (A kills B, so B
    # cannot kill C).
    for trial in range(6):
        r = np.random.default_rng(100 + trial)
        C = 40
        pts = r.uniform(0, 60, (C, 2)).astype(np.float32)  # dense overlaps
        angs = r.uniform(-180, 180, C).astype(np.float32)
        valid = r.random(C) > 0.2
        w, h = 20.0, 12.0
        quads = rotated_rect_corners(jnp.asarray(pts), jnp.asarray(angs), w, h)
        got = np.asarray(filter_overlaps(
            quads, jnp.asarray(valid), w * h, 0.25))

        # Sequential greedy oracle in numpy on the same pair areas.
        qn = np.asarray(quads)
        pair = np.zeros((C, C))
        for i in range(C):
            for j in range(C):
                pair[i, j] = float(quad_intersection_area(
                    jnp.asarray(qn[i]), jnp.asarray(qn[j])))
        conflict = (pair >= w * h * (1 - 1e-6)) | (pair / (w * h) > 0.25)
        alive = valid.copy()
        for i in range(C):
            if not alive[i]:
                continue
            for j in range(i + 1, C):
                if alive[j] and conflict[i, j]:
                    alive[j] = False
        assert got.tolist() == alive.tolist(), trial


def test_filter_overlaps_two_axis_chunking_fuzz(rng):
    """C > 64 exercises the round-5 two-axis chunk skipping (row AND
    column chunks, interior all-dead chunks included via unsorted valid
    patterns); must still equal the sequential greedy oracle."""
    for trial in range(3):
        r = np.random.default_rng(300 + trial)
        C = 200
        pts = r.uniform(0, 160, (C, 2)).astype(np.float32)
        angs = r.uniform(-180, 180, C).astype(np.float32)
        valid = r.random(C) > 0.5
        # Kill a whole interior block so a middle chunk is all-dead on
        # both axes.
        valid[64:128] = False
        w, h = 22.0, 14.0
        quads = rotated_rect_corners(jnp.asarray(pts), jnp.asarray(angs),
                                     w, h)
        got = np.asarray(filter_overlaps(
            quads, jnp.asarray(valid), w * h, 0.25))

        qn = np.asarray(quads)
        # Vectorized-ish oracle: areas only where needed.
        conflict = np.zeros((C, C), bool)
        area_fn = jax.jit(jax.vmap(jax.vmap(
            quad_intersection_area, (None, 0)), (0, None)))
        pair = np.asarray(area_fn(jnp.asarray(qn), jnp.asarray(qn)))
        conflict = (pair >= w * h * (1 - 1e-6)) | (pair / (w * h) > 0.25)
        alive = valid.copy()
        for i in range(C):
            if not alive[i]:
                continue
            for j in range(i + 1, C):
                if alive[j] and conflict[i, j]:
                    alive[j] = False
        assert got.tolist() == alive.tolist(), trial
