"""Fused NCC kernel parity vs cv::matchTemplate(TM_CCOEFF_NORMED)
(the reference computes the same quantity as TM_CCORR + CCOEFF_Denominator,
MatchToolDlg.cpp:1275-1400)."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from fastest_image_pattern_matching_tpu.ops.ncc import ncc_score_map, window_sums


def _stats(templ):
    area = templ.size
    mean = float(np.mean(templ, dtype=np.float64))
    var = float(np.mean((templ.astype(np.float64) - mean) ** 2))
    return mean, float(np.sqrt(var) * np.sqrt(area)), 1.0 / area


@pytest.mark.parametrize("dtype", ["f32", "bf16"])
@pytest.mark.parametrize("shape", [((64, 80), (16, 24)), ((120, 90), (33, 17)),
                                   ((50, 50), (50, 50))])
def test_ncc_matches_opencv(rng, dtype, shape):
    (H, W), (h, w) = shape
    src = rng.integers(0, 256, size=(H, W), dtype=np.uint8)
    templ = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    ref = cv2.matchTemplate(src, templ, cv2.TM_CCOEFF_NORMED)
    mean, norm, inv_area = _stats(templ)
    got = np.asarray(ncc_score_map(
        jnp.asarray(src, jnp.float32)[None], jnp.asarray(templ, jnp.float32),
        mean, norm, inv_area, False, dtype))[0]
    assert got.shape == ref.shape
    atol = 2e-4 if dtype == "f32" else 2e-3
    np.testing.assert_allclose(got, ref, atol=atol)


def test_ncc_large_template_precision(rng):
    """Layer-0-sized template: accumulation over ~400k pixels."""
    H, W, h, w = 530, 770, 521, 762
    src = rng.integers(0, 256, size=(H, W), dtype=np.uint8)
    templ = src[4:4 + h, 3:3 + w].copy()
    ref = cv2.matchTemplate(src, templ, cv2.TM_CCOEFF_NORMED)
    mean, norm, inv_area = _stats(templ)
    got = np.asarray(ncc_score_map(
        jnp.asarray(src, jnp.float32)[None], jnp.asarray(templ, jnp.float32),
        mean, norm, inv_area, False, "bf16"))[0]
    # Peak must be exactly at the crop location with score ~1.
    assert np.unravel_index(np.argmax(got), got.shape) == (4, 3)
    assert got[4, 3] > 0.999
    np.testing.assert_allclose(got, ref, atol=5e-3)


def test_flat_template_all_ones(rng):
    src = rng.integers(0, 256, size=(40, 40), dtype=np.uint8)
    templ = np.full((8, 8), 77, np.uint8)
    got = np.asarray(ncc_score_map(
        jnp.asarray(src, jnp.float32)[None], jnp.asarray(templ, jnp.float32),
        77.0, 0.0, 1 / 64.0, True, "f32"))[0]
    np.testing.assert_array_equal(got, np.ones_like(got))


def test_flat_window_guard(rng):
    """Flat source windows must score 0 (the reference's epsilon guard,
    MatchToolDlg.cpp:1384-1395), not NaN."""
    src = np.full((40, 60), 13, np.uint8)
    templ = rng.integers(0, 256, size=(9, 11), dtype=np.uint8)
    mean, norm, inv_area = _stats(templ)
    got = np.asarray(ncc_score_map(
        jnp.asarray(src, jnp.float32)[None], jnp.asarray(templ, jnp.float32),
        mean, norm, inv_area, False, "f32"))[0]
    ref = cv2.matchTemplate(src, templ, cv2.TM_CCOEFF_NORMED)
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_window_sums(rng):
    x = rng.normal(size=(2, 20, 30)).astype(np.float32)
    got = np.asarray(window_sums(jnp.asarray(x), (5, 7)))
    want = np.zeros((2, 16, 24), np.float32)
    for i in range(16):
        for j in range(24):
            want[:, i, j] = x[:, i:i + 5, j:j + 7].sum(axis=(1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ncc_fft_matches_opencv(rng):
    src = rng.integers(0, 256, size=(160, 190), dtype=np.uint8)
    templ = rng.integers(0, 256, size=(70, 90), dtype=np.uint8)
    ref = cv2.matchTemplate(src, templ, cv2.TM_CCOEFF_NORMED)
    mean, norm, inv_area = _stats(templ)
    got = np.asarray(ncc_score_map(
        jnp.asarray(src, jnp.float32)[None], jnp.asarray(templ, jnp.float32),
        mean, norm, inv_area, False, "f32", method="fft"))[0]
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_match_template_public_api(rng):
    from fastest_image_pattern_matching_tpu import match_template
    src = rng.integers(0, 256, size=(100, 120), dtype=np.uint8)
    templ = src[30:70, 40:95].copy()
    for method in ("conv", "fft", "auto"):
        got = match_template(src, templ, method=method)
        ref = cv2.matchTemplate(src, templ, cv2.TM_CCOEFF_NORMED)
        assert got.shape == ref.shape
        assert np.unravel_index(np.argmax(got), got.shape) == (30, 40)
        np.testing.assert_allclose(got, ref, atol=3e-3)


def test_ncc_int8_matches_opencv(rng):
    src = rng.integers(0, 256, size=(80, 90), dtype=np.uint8)
    templ = rng.integers(0, 256, size=(17, 23), dtype=np.uint8)
    ref = cv2.matchTemplate(src, templ, cv2.TM_CCOEFF_NORMED)
    mean, norm, inv_area = _stats(templ)
    got = np.asarray(ncc_score_map(
        jnp.asarray(src, jnp.float32)[None], jnp.asarray(templ, jnp.float32),
        mean, norm, inv_area, False, "int8", method="conv"))[0]
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_ncc_shiftmm_matches_conv(rng):
    """Shifted-template matmul backend == conv backend (the descent
    refinement regime: small search window over a big template)."""
    H, W, h, w = 78, 109, 71, 102  # 8x8 output, area > 4096
    src = rng.integers(0, 256, size=(2, H, W), dtype=np.uint8)
    templ = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    mean, norm, inv_area = _stats(templ)
    a = np.asarray(ncc_score_map(
        jnp.asarray(src, jnp.float32), jnp.asarray(templ, jnp.float32),
        mean, norm, inv_area, False, "bf16", method="shiftmm"))
    b = np.asarray(ncc_score_map(
        jnp.asarray(src, jnp.float32), jnp.asarray(templ, jnp.float32),
        mean, norm, inv_area, False, "bf16", method="conv"))
    np.testing.assert_allclose(a, b, atol=1e-6)
    ref = cv2.matchTemplate(src[0], templ, cv2.TM_CCOEFF_NORMED)
    np.testing.assert_allclose(a[0], ref, atol=2e-3)
    # auto must route this regime to shiftmm-compatible results
    c = np.asarray(ncc_score_map(
        jnp.asarray(src, jnp.float32), jnp.asarray(templ, jnp.float32),
        mean, norm, inv_area, False, "bf16", method="auto"))
    np.testing.assert_allclose(c, a, atol=1e-6)


# ---------------------------------------------------------------------------
# Banded-Toeplitz backend (the Test6/Test7 many-target regime; previously
# validated only in TPU job logs — these are the committed CPU twins).
# ---------------------------------------------------------------------------

def test_ncc_banded_matches_conv_small(rng):
    """Direct banded == conv parity on a small map (below the auto gate)."""
    from fastest_image_pattern_matching_tpu.ops.ncc import (ccorr_banded,
                                                            ccorr_conv)
    src = rng.integers(0, 256, size=(3, 60, 72), dtype=np.uint8)
    templ = rng.integers(0, 256, size=(11, 14), dtype=np.uint8)
    sc = jnp.asarray(src, jnp.float32) - 128.0
    tc = jnp.asarray(templ, jnp.float32) - 128.0
    for dt in ("f32", "bf16", "int8"):
        a = np.asarray(ccorr_banded(sc, tc, dt))
        b = np.asarray(ccorr_conv(sc, tc, "f32"))
        # integer-valued inputs: bf16/int8 banded are exact
        np.testing.assert_allclose(a, b, atol=1e-2, rtol=0)
        if dt in ("bf16", "int8"):
            np.testing.assert_array_equal(a, np.asarray(
                ccorr_banded(sc, tc, "f32")))


def test_ncc_banded_above_auto_gate(rng):
    """Shape above the Ho*Wo>65536 auto gate: 'auto' must route to banded
    and match cv2. Dispatch is asserted by monkeypatching the backend."""
    from fastest_image_pattern_matching_tpu.ops import ncc as ncc_mod
    H, W, h, w = 280, 300, 12, 16   # Ho*Wo = 269*285 = 76665 > 65536
    src = rng.integers(0, 256, size=(H, W), dtype=np.uint8)
    templ = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    mean, norm, inv_area = _stats(templ)
    calls = []
    orig = ncc_mod.ccorr_banded

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    ncc_mod.ccorr_banded = spy
    try:
        got = np.asarray(ncc_mod.ncc_score_map(
            jnp.asarray(src, jnp.float32)[None],
            jnp.asarray(templ, jnp.float32),
            mean, norm, inv_area, False, "bf16", method="auto"))[0]
    finally:
        ncc_mod.ccorr_banded = orig
    assert calls, "auto did not select the banded backend above the gate"
    ref = cv2.matchTemplate(src, templ, cv2.TM_CCOEFF_NORMED)
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_ncc_banded_below_auto_gate_not_selected(rng):
    """Below the Ho*Wo gate, auto must NOT pick banded (conv/fft wins)."""
    from fastest_image_pattern_matching_tpu.ops import ncc as ncc_mod
    src = rng.integers(0, 256, size=(100, 120), dtype=np.uint8)  # Ho*Wo small
    templ = rng.integers(0, 256, size=(12, 16), dtype=np.uint8)
    mean, norm, inv_area = _stats(templ)
    calls = []
    orig = ncc_mod.ccorr_banded

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    ncc_mod.ccorr_banded = spy
    try:
        got = np.asarray(ncc_mod.ncc_score_map(
            jnp.asarray(src, jnp.float32)[None],
            jnp.asarray(templ, jnp.float32),
            mean, norm, inv_area, False, "bf16", method="auto"))[0]
    finally:
        ncc_mod.ccorr_banded = orig
    assert not calls
    ref = cv2.matchTemplate(src, templ, cv2.TM_CCOEFF_NORMED)
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_ncc_banded_budget_gate_fallback(rng):
    """With the band HBM budget shrunk below eligibility, auto must fall
    through to another backend and stay correct."""
    from fastest_image_pattern_matching_tpu.ops import ncc as ncc_mod
    H, W, h, w = 280, 300, 12, 16
    src = rng.integers(0, 256, size=(H, W), dtype=np.uint8)
    templ = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    mean, norm, inv_area = _stats(templ)
    calls = []
    orig_budget = ncc_mod._BANDED_BUDGET_ELEMS
    orig = ncc_mod.ccorr_banded

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    ncc_mod.ccorr_banded = spy
    ncc_mod._BANDED_BUDGET_ELEMS = 16
    try:
        got = np.asarray(ncc_mod.ncc_score_map(
            jnp.asarray(src, jnp.float32)[None],
            jnp.asarray(templ, jnp.float32),
            mean, norm, inv_area, False, "bf16", method="auto"))[0]
    finally:
        ncc_mod._BANDED_BUDGET_ELEMS = orig_budget
        ncc_mod.ccorr_banded = orig
    assert not calls, "banded selected past its band-memory budget"
    ref = cv2.matchTemplate(src, templ, cv2.TM_CCOEFF_NORMED)
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_ncc_banded_int8_accumulator_gate(rng):
    """int8 banded past the h*w*128^2 int32 bound must fall back to bf16
    inside ccorr_banded (same API, still exact for integer inputs)."""
    from fastest_image_pattern_matching_tpu.ops.ncc import (ccorr_banded,
                                                            ccorr_conv)
    # h*w = 368*368 > 2^31/128^2 = 131072 -> int8 ineligible
    h = w = 368
    src = rng.integers(0, 256, size=(1, h + 8, w + 8), dtype=np.uint8)
    templ = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    sc = jnp.asarray(src, jnp.float32) - 128.0
    tc = jnp.asarray(templ, jnp.float32) - 128.0
    a = np.asarray(ccorr_banded(sc, tc, "int8"))
    b = np.asarray(ccorr_conv(sc, tc, "f32"))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_ncc_shiftmm_int8_large_roi(rng):
    """ADVICE r2: the shiftmm int8 bound is h*w (padded shifted entries
    contribute zero products) — a large ROI whose H*W exceeds the old
    bound but whose h*w does not must stay int8-exact."""
    from fastest_image_pattern_matching_tpu.ops.ncc import (ccorr_conv,
                                                            ccorr_shiftmm)
    # h*w = 320*360 = 115200 < 131072;  H*W = 326*366 = 119316... both under
    # -> also test h*w just below with H*W just above 131072:
    h, w = 350, 374   # h*w = 130900 < 131072
    H, W = 356, 380   # H*W = 135280 > 131072 (old bound would reject)
    src = rng.integers(0, 256, size=(1, H, W), dtype=np.uint8)
    templ = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    sc = jnp.asarray(src, jnp.float32) - 128.0
    tc = jnp.asarray(templ, jnp.float32) - 128.0
    a = np.asarray(ccorr_shiftmm(sc, tc, "int8"))
    b = np.asarray(ccorr_conv(sc, tc, "f32"))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_ncc_method_name_validated():
    import jax.numpy as jnp
    import pytest as _pytest
    from fastest_image_pattern_matching_tpu.ops.ncc import ncc_score_map
    c = jnp.zeros((1, 32, 32), jnp.float32) + 10.0
    t = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
    with _pytest.raises(ValueError, match="unknown correlation method"):
        ncc_score_map(c, t, 31.5, 100.0, 1 / 64.0, False, "bf16", "covn")
