"""Native C++ runtime components: BMP codec, threaded loader, host
post-processing oracles (see native/src/fipm_native.cc)."""

import ctypes
import os

import cv2
import numpy as np
import pytest

from fastest_image_pattern_matching_tpu.native import get_lib
from fastest_image_pattern_matching_tpu.native import bmp as nbmp
from fastest_image_pattern_matching_tpu.native.loader import BatchLoader

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native build unavailable")


def test_bmp_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, size=(37, 53), dtype=np.uint8)
    p = str(tmp_path / "x.bmp")
    nbmp.save_gray(p, img)
    back = nbmp.load_gray(p)
    np.testing.assert_array_equal(back, img)
    # cv2 agrees with our encoder.
    cv_read = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
    np.testing.assert_array_equal(cv_read, img)


def test_bmp_load_reference_images():
    """Decode the reference's real BMPs identically to OpenCV."""
    for name in ["Dst1.bmp", "Dst4.bmp", "Src4.bmp", "Dst7.bmp"]:
        p = f"/root/reference/Test Images/{name}"
        if not os.path.exists(p):
            continue
        ours = nbmp.load_gray(p)
        ref = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        assert ours.shape == ref.shape
        # BT.601 rounding may differ by 1 LSB from OpenCV's fixed-point.
        assert np.max(np.abs(ours.astype(int) - ref.astype(int))) <= 1


def test_bmp_load_missing():
    with pytest.raises(ValueError):
        nbmp.load_gray("/tmp/definitely_missing_4242.bmp")


def test_batch_loader(tmp_path, rng):
    paths = []
    imgs = []
    for i in range(6):
        img = rng.integers(0, 256, size=(20 + i, 30 + i), dtype=np.uint8)
        p = str(tmp_path / f"img{i}.bmp")
        nbmp.save_gray(p, img)
        paths.append(p)
        imgs.append(img)
    paths.append("/tmp/missing_9999.bmp")
    with BatchLoader(paths, n_threads=3) as bl:
        for i in range(6):
            got = bl.take(i)
            np.testing.assert_array_equal(got, imgs[i])
        assert bl.take(6) is None


def test_native_extract_peaks_matches_jax(rng):
    import jax.numpy as jnp
    from fastest_image_pattern_matching_tpu.ops.peaks import extract_peaks

    lib = get_lib()
    score = rng.random((45, 60)).astype(np.float32)
    k, tw, th, ov = 6, 10, 8, 0.25
    vals_j, locs_j = extract_peaks(jnp.asarray(score)[None], k, (tw, th), ov)

    buf = score.copy()
    ox = (ctypes.c_int * k)()
    oy = (ctypes.c_int * k)()
    ov_ = (ctypes.c_float * k)()
    n = lib.fipm_extract_peaks(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 45, 60, k,
        tw, th, ov, ox, oy, ov_)
    assert n == k
    for i in range(k):
        assert (int(locs_j[0, i, 0]), int(locs_j[0, i, 1])) == (ox[i], oy[i])
        assert abs(float(vals_j[0, i]) - ov_[i]) < 1e-6


def test_native_filter_overlaps_matches_jax():
    import jax.numpy as jnp
    from fastest_image_pattern_matching_tpu.ops.nms import (
        filter_overlaps, rotated_rect_corners)

    lib = get_lib()
    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 60, size=(12, 2)).astype(np.float32)
    angs = rng.uniform(-180, 180, size=12).astype(np.float32)
    quads = rotated_rect_corners(jnp.asarray(pts), jnp.asarray(angs),
                                 30.0, 18.0)
    valid = jnp.ones(12, bool)
    keep_j = np.asarray(filter_overlaps(quads, valid, 540.0, 0.3))

    q = np.asarray(quads, np.float64).copy()
    alive = np.ones(12, np.uint8)
    lib.fipm_filter_overlaps(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), 12,
        alive.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 540.0, 0.3)
    np.testing.assert_array_equal(alive.astype(bool), keep_j)
