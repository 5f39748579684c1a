"""Exactness of the Pallas tiled-band correlation kernel (interpret mode
on CPU) vs the MXU conv backend — the many-target-regime kernel
(MatchToolDlg.cpp:1275-1311; README.md:23-29)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fastest_image_pattern_matching_tpu.ops.ncc import ccorr_conv, ncc_score_map
from fastest_image_pattern_matching_tpu.ops.pallas.corr_kernel import (
    MAX_H, MAX_W, ccorr_tiledband_pallas, eligible)


@pytest.mark.parametrize("shape", [
    (1, 300, 333, 27, 27),   # Test7 top-layer geometry (Dst10 54x54 / 2)
    (2, 140, 150, 5, 13),    # batched, asymmetric
    (1, 260, 139, 33, 2),    # minimal width
    (1, 200, 310, 11, 100),  # wide template, Wo not a tile multiple
])
@pytest.mark.parametrize("dtype", ["bf16", "int8", "f32"])
def test_tiledband_exact_vs_conv(shape, dtype):
    B, H, W, h, w = shape
    rng = np.random.default_rng(B * H + h)
    S = rng.integers(0, 256, (B, H, W)).astype(np.float32) - 128.0
    T = rng.integers(0, 256, (h, w)).astype(np.float32) - 128.0
    ref = np.asarray(ccorr_conv(jnp.asarray(S), jnp.asarray(T), "f32"))
    got = np.asarray(ccorr_tiledband_pallas(
        jnp.asarray(S), jnp.asarray(T), dtype, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_small_output_tall_template_tile_rows64():
    """tile_rows=64 with a tall template and a short output: the rotation
    staging needs G >= 8*ceil(h/8)+7 slab rows, which the kernel satisfies
    by bumping the row-tiles-per-step (ADVICE r4: this used to fail at
    trace time with an opaque slice error)."""
    rng = np.random.default_rng(3)
    B, H, W, h, w = 1, 90, 180, 57, 9
    S = rng.integers(0, 256, (B, H, W)).astype(np.float32) - 128.0
    T = rng.integers(0, 256, (h, w)).astype(np.float32) - 128.0
    ref = np.asarray(ccorr_conv(jnp.asarray(S), jnp.asarray(T), "f32"))
    got = np.asarray(ccorr_tiledband_pallas(
        jnp.asarray(S), jnp.asarray(T), "int8", interpret=True,
        tile_rows=64))
    np.testing.assert_array_equal(got, ref)


def test_eligibility_bounds():
    assert eligible(27, 27) and eligible(MAX_H, MAX_W) and eligible(1, 2)
    assert not eligible(MAX_H + 1, 27)
    assert not eligible(27, MAX_W + 1)
    assert not eligible(27, 1)


def test_ncc_score_map_tiledband_matches_conv():
    rng = np.random.default_rng(7)
    S = rng.integers(0, 256, (1, 220, 260)).astype(np.float32)
    T = rng.integers(0, 256, (21, 17)).astype(np.float32)
    area = T.size
    mean = float(np.mean(T, dtype=np.float64))
    var = float(np.mean((T.astype(np.float64) - mean) ** 2))
    norm = float(np.sqrt(var) * np.sqrt(area))
    args = (jnp.asarray(S), jnp.asarray(T), mean, norm, 1.0 / area, False)
    ref = np.asarray(ncc_score_map(*args, "f32", "conv"))
    got = np.asarray(ncc_score_map(*args, "bf16", "tiledband"))
    np.testing.assert_allclose(got, ref, atol=2e-6)
