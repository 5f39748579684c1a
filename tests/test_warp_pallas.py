"""Pallas warp kernel parity (interpret mode, CPU-runnable).

The matmul-interpolation Mosaic kernel (ops/pallas/warp_kernel.py) is the
default TPU warp path; these tests pin it against the XLA gather reference
(ops/warp.py::warp_affine_batch — itself cv2-parity-tested in test_warp.py)
without TPU hardware, covering every kernel configuration knob: tile_h
8/16/32, both matmul precision schemes, multi-tile grids (slot rotation in
the double-buffered DMA pipeline), and edge-clipped windows.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fastest_image_pattern_matching_tpu.ops.pallas.warp_kernel import (
    warp_affine_pallas)
from fastest_image_pattern_matching_tpu.ops.warp import warp_affine_batch
from fastest_image_pattern_matching_tpu.utils import geometry


def _rot_invmaps(src_hw, angles, shift=(0.0, 0.0)):
    """Inverse dst->src affines for rotations about the source center plus
    a translation — the exact construction the sweep uses."""
    h, w = src_hw
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    mats = []
    for a in angles:
        m = geometry.rotation_matrix((cx, cy), a)
        m[0, 2] += shift[0]
        m[1, 2] += shift[1]
        mats.append(geometry.invert_affine(m))
    return np.asarray(mats, np.float32)


@pytest.fixture(scope="module")
def src():
    rng = np.random.default_rng(99)
    return rng.integers(0, 256, size=(200, 260), dtype=np.uint8).astype(
        np.float32)


def _assert_quantized_parity(got, ref, ref_unq):
    """Quantized outputs must agree except at half-integer rounding
    boundaries: the kernel's folded y-blend reassociates the f32 bilinear
    sum, so a value within ulps of X.5 may round the other way. Every
    mismatch must be (a) ±1, (b) rare, and (c) provably at a boundary."""
    d = got - ref
    bad = d != 0
    assert np.abs(d).max(initial=0) <= 1
    assert bad.mean() < 1e-3, f"{bad.sum()} mismatches of {bad.size}"
    if bad.any():
        frac = np.abs(ref_unq[bad] - np.floor(ref_unq[bad]) - 0.5)
        # Coordinate association also differs (a*x+b*y+t orderings), so the
        # boundary window is a few f32 ulps of the ~1e2-magnitude blend.
        assert frac.max() < 1e-2, "mismatch away from a .5 boundary"


@pytest.mark.parametrize("tile_h", [8, 16, 32])
@pytest.mark.parametrize("matmul_dtype", ["bf16", "int8"])
def test_pallas_matches_gather_quantized(src, tile_h, matmul_dtype):
    """Quantized (round-to-int) parity vs the gather path for every tile
    height and precision scheme, up to .5-boundary rounding."""
    inv = _rot_invmaps(src.shape, [0.0, 13.5, -37.25, 120.0])
    out_hw = (48, 150)  # n_ti >= 2 for th=8/16, n_tj = 2 -> multi-tile grid
    ref = np.asarray(warp_affine_batch(jnp.asarray(src), jnp.asarray(inv),
                                       out_hw, 64.0, quantize=True))
    ref_unq = np.asarray(warp_affine_batch(
        jnp.asarray(src), jnp.asarray(inv), out_hw, 64.0, quantize=False))
    got = np.asarray(warp_affine_pallas(
        jnp.asarray(src), jnp.asarray(inv), out_hw, 64.0, quantize=True,
        matmul_dtype=matmul_dtype, tile_h=tile_h, interpret=True))
    _assert_quantized_parity(got, ref, ref_unq)


def test_pallas_unquantized_close(src):
    """Unquantized outputs: the folded y-blend reassociates the bilinear
    sum, so parity is ulp-level, not bitwise."""
    inv = _rot_invmaps(src.shape, [7.0, -97.6])
    out_hw = (40, 130)
    ref = np.asarray(warp_affine_batch(jnp.asarray(src), jnp.asarray(inv),
                                       out_hw, 0.0, quantize=False))
    got = np.asarray(warp_affine_pallas(
        jnp.asarray(src), jnp.asarray(inv), out_hw, 0.0, quantize=False,
        interpret=True))
    np.testing.assert_allclose(got, ref, atol=5e-3)


def test_pallas_edge_clipped_border(src):
    """Output canvas bigger than the source + translation pushing samples
    far outside: every out-of-image tap must read the border constant,
    matching cv2-style BORDER_CONSTANT blending at the true edge."""
    h, w = src.shape
    # Canvas larger than the rotated source: many tiles fully out of range.
    angles = [30.0, -150.0]
    inv = _rot_invmaps(src.shape, angles, shift=(-60.0, -40.0))
    out_hw = (264, 390)
    ref = np.asarray(warp_affine_batch(jnp.asarray(src), jnp.asarray(inv),
                                       out_hw, 200.0, quantize=True))
    ref_unq = np.asarray(warp_affine_batch(
        jnp.asarray(src), jnp.asarray(inv), out_hw, 200.0, quantize=False))
    got = np.asarray(warp_affine_pallas(
        jnp.asarray(src), jnp.asarray(inv), out_hw, 200.0, quantize=True,
        interpret=True))
    _assert_quantized_parity(got, ref, ref_unq)
    # Sanity: the border value actually appears (windows were clipped).
    assert (got == 200.0).any()


def test_pallas_identity_roundtrip(src):
    """Angle 0, zero shift: the kernel must reproduce the source exactly
    (bilinear taps collapse to unit weights)."""
    inv = _rot_invmaps(src.shape, [0.0])
    out_hw = src.shape
    got = np.asarray(warp_affine_pallas(
        jnp.asarray(src), jnp.asarray(inv), out_hw, 0.0, quantize=True,
        interpret=True))
    np.testing.assert_array_equal(got[0], src)


def test_pallas_many_batch_slot_rotation(src):
    """B=7 x multi-tile grid: odd total cell count exercises both DMA
    slots and the cross-batch prefetch (cell k prefetches k+1 across the
    batch boundary)."""
    inv = _rot_invmaps(src.shape, [0.0, 5.0, 45.0, 90.0, -5.0, -45.0, -90.0])
    out_hw = (24, 140)
    ref = np.asarray(warp_affine_batch(jnp.asarray(src), jnp.asarray(inv),
                                       out_hw, 0.0, quantize=True))
    ref_unq = np.asarray(warp_affine_batch(
        jnp.asarray(src), jnp.asarray(inv), out_hw, 0.0, quantize=False))
    got = np.asarray(warp_affine_pallas(
        jnp.asarray(src), jnp.asarray(inv), out_hw, 0.0, quantize=True,
        interpret=True))
    _assert_quantized_parity(got, ref, ref_unq)


@pytest.mark.parametrize("out_hw,expect_bucket", [
    ((23, 30), 0),    # L5-like descent ROI -> small bucket (span ~38)
    ((39, 54), 1),    # L4-like ROI -> medium bucket (span ~66)
    ((16, 100), 1),   # wide-flat ROI (span ~101)
    ((30, 28), 1),    # just past the small bucket edge (span ~41)
    ((68, 70), 1),    # flagship top-sweep canvas
])
@pytest.mark.parametrize("matmul_dtype", ["int8", "bf16"])
def test_pallas_small_roi_buckets(src, out_hw, expect_bucket, matmul_dtype):
    """The small/medium window buckets (effective-extent clamping for
    partial tiles) must stay exact vs the gather path at arbitrary
    rotation angles — these are the descent-ROI shapes that dominate the
    flagship's on-chip time."""
    import math
    from fastest_image_pattern_matching_tpu.ops.pallas.warp_kernel import (
        BUCKETS, TW)
    Ho, Wo = out_hw
    th = 8 if Ho <= 8 else (16 if Ho <= 16 else (32 if Ho <= 32 else 16))
    span = int(math.ceil(math.hypot(min(TW, Wo), min(th, Ho))))
    bucket = next(i for i, b in enumerate(BUCKETS) if span <= b[0])
    assert bucket == expect_bucket, (span, bucket)

    inv = _rot_invmaps(src.shape, [0.0, 13.5, -37.25, 120.0, 89.5],
                       shift=(31.25, -12.75))
    ref = np.asarray(warp_affine_batch(jnp.asarray(src), jnp.asarray(inv),
                                       out_hw, 64.0, quantize=True))
    ref_unq = np.asarray(warp_affine_batch(
        jnp.asarray(src), jnp.asarray(inv), out_hw, 64.0, quantize=False))
    got = np.asarray(warp_affine_pallas(
        jnp.asarray(src), jnp.asarray(inv), out_hw, 64.0, quantize=True,
        matmul_dtype=matmul_dtype, interpret=True))
    _assert_quantized_parity(got, ref, ref_unq)


def test_pallas_small_roi_near_border(src):
    """Small-bucket windows at the image edge: clamped sampling into the
    constant border region must match the gather path."""
    inv = _rot_invmaps(src.shape, [4.0, -170.0],
                       shift=(-src.shape[1] / 2 + 4, -src.shape[0] / 2 + 6))
    out_hw = (24, 32)
    ref = np.asarray(warp_affine_batch(jnp.asarray(src), jnp.asarray(inv),
                                       out_hw, 200.0, quantize=True))
    ref_unq = np.asarray(warp_affine_batch(
        jnp.asarray(src), jnp.asarray(inv), out_hw, 200.0, quantize=False))
    got = np.asarray(warp_affine_pallas(
        jnp.asarray(src), jnp.asarray(inv), out_hw, 200.0, quantize=True,
        interpret=True))
    _assert_quantized_parity(got, ref, ref_unq)
