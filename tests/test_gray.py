"""Color-input handling: 3-channel frames are converted with BT.601 luma
(bit-exact vs cv::cvtColor BGR2GRAY), not dropped to channel 0 — the
reference grayscales everything at load time (MatchToolDlg.cpp:506-525)."""

import cv2
import numpy as np
import pytest

import fastest_image_pattern_matching_tpu as fipm
from fastest_image_pattern_matching_tpu.utils.imageio import ensure_gray


def test_ensure_gray_bit_exact_vs_cv2():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (180, 211, 3), np.uint8)
    np.testing.assert_array_equal(
        ensure_gray(img), cv2.cvtColor(img, cv2.COLOR_BGR2GRAY))


def test_ensure_gray_squeeze_and_errors():
    img = np.zeros((8, 9, 1), np.uint8)
    assert ensure_gray(img).shape == (8, 9)
    with pytest.raises(ValueError):
        ensure_gray(np.zeros((8, 9, 2), np.uint8))
    with pytest.raises(ValueError):
        ensure_gray(np.zeros((8, 9, 3), np.uint8), channel_axis_only=True)


def test_color_match_equals_gray_match():
    rng = np.random.default_rng(3)
    t = np.full((40, 56), 30, np.uint8)
    cv2.rectangle(t, (4, 4), (51, 35), 200, 2)
    cv2.line(t, (8, 8), (48, 30), 255, 3)
    src = rng.integers(0, 30, (200, 240), np.uint8)
    src[40:80, 60:116] = t
    cfg = fipm.MatchConfig(max_pos=2, score=0.8, tolerance_angle=0.0)

    # A genuinely colored scene whose luma equals the gray scene.
    src3 = np.stack([src, src, src], -1)
    t3 = np.stack([t, t, t], -1)
    res_gray = fipm.match(src, fipm.learn_pattern(t, 256), cfg)
    res_col = fipm.match(src3, fipm.learn_pattern(t3, 256), cfg)
    assert len(res_gray) == len(res_col) == 1
    assert abs(res_gray[0].score - res_col[0].score) < 1e-6
    assert abs(res_gray[0].pos_x - res_col[0].pos_x) < 1e-4


def test_ensure_gray_identical_across_array_types():
    """numpy-uint8, numpy-float32 and jax-array inputs must produce the
    SAME gray values — public APIs route color input through different
    array types, and per-path formulas would break exactness parity."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 77, 3), np.uint8)
    a = ensure_gray(img)
    b = ensure_gray(img.astype(np.float32))
    c = np.asarray(ensure_gray(jnp.asarray(img, jnp.float32)))
    np.testing.assert_array_equal(a.astype(np.float32), b)
    np.testing.assert_array_equal(b, c)
