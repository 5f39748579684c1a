"""cv::pyrDown / buildPyramid parity (reference uses them at
MatchToolDlg.cpp:459 and :788-796)."""

import cv2
import numpy as np
import pytest

from fastest_image_pattern_matching_tpu.ops.pyramid import build_pyramid, pyr_down
from fastest_image_pattern_matching_tpu.utils.geometry import (
    pyr_down_size, pyramid_sizes, top_layer)


@pytest.mark.parametrize("shape", [(64, 64), (63, 61), (100, 37), (7, 9),
                                   (521, 762)])
def test_pyr_down_matches_opencv(rng, shape):
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    ours = np.asarray(pyr_down(img))
    ref = cv2.pyrDown(img)
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours.astype(np.uint8), ref)


def test_build_pyramid_matches_opencv(rng):
    img = rng.integers(0, 256, size=(233, 177), dtype=np.uint8)
    levels = 3
    ours = build_pyramid(img, levels)
    ref = [img]
    for _ in range(levels):
        ref.append(cv2.pyrDown(ref[-1]))
    assert len(ours) == levels + 1
    for o, r in zip(ours, ref):
        np.testing.assert_array_equal(np.asarray(o).astype(np.uint8), r)


def test_pyr_down_size():
    assert pyr_down_size((521, 762)) == (261, 381)
    assert pyr_down_size((7, 9)) == (4, 5)


def test_top_layer_matches_reference_formula():
    # GetTopLayer: while (area > minLen^2) area /= 4 (MatchToolDlg.cpp:493-504)
    assert top_layer((521, 762), 256) == 6
    assert top_layer((16, 16), 256) == 0
    assert top_layer((54, 54), 256) == 2
    sizes = pyramid_sizes((521, 762), 2)
    assert sizes == [(521, 762), (261, 381), (131, 191)]
