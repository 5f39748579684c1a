"""Pallas TPU kernel: batched affine bilinear warp without gathers.

XLA lowers bilinear sampling to a scalarized gather (~12 ns/sample on
v5e) — it was >75% of end-to-end match time. This kernel reformulates
interpolation as dense ops the TPU is built for:

  For each [TH, TW] output tile of each batched affine map:
    1. The needed source pixels lie in the rotated tile's bbox — at unit
       scale at most (TW + TH + 3)^2. One async DMA pulls that WIN x WIN
       window from the (pre-padded) source in HBM into VMEM.
    2. X interpolation = one dense matmul:  C = window @ Wx, where
       Wx[x, n] = (x==x0_n)(1-ax_n) + (x==x0_n+1) ax_n  is built on the
       VPU from broadcasted iota compares (2 taps per output column).
    3. X fractional blend on the VPU (cx = (1-ax) C0 + ax C1), then
       Y interpolation as ONE weighted masked reduction:
       out[n] = sum_y Wy[y, n] cx[y, n], Wy carrying the (1-ay, ay)
       fractional weights on its two taps.

Exactness-preserving precision scheme (two variants):
  * "bf16": window values are u8-valued integers (exact in bf16), the
    selection matrices are 0/1 (exact), so both bf16 matmuls are exact
    with f32 accumulation; fractional weights applied afterwards in f32.
  * "int8": window values centered to [-128, 127] (exact in int8),
    selection 0/1 int8, int32 accumulation, +128 added back after the
    row-select — also exact, at 2x the MXU rate on v5e (394 int8 TOPS vs
    197 bf16 TFLOPS).

Border semantics: the caller pre-pads the source with `border_value` by
PAD=WIN on every side and passes sampling coordinates in the original
frame; all clamped accesses then land in the pad region, reproducing
cv::warpAffine BORDER_CONSTANT including partial-tap blending at the true
image edge (reference: MatchToolDlg.cpp:856, :1327).

Restriction: |affine linear part| <= 1 per coefficient (pure
rotation+translation — all uses in this framework). Asserted by caller.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8      # default output tile sublanes (see tile_h below)
TW = 128    # output tile lanes
# Source window per tile: must cover the rotated tile bbox plus origin
# alignment slack (8 sublanes / 128 lanes, required for DMA slicing of
# tiled memrefs). For a pure rotation the bbox span per axis is bounded
# by hypot(tile_w_eff, tile_h_eff), where the EFFECTIVE tile extent
# clamps to the real output size (out-of-range lanes/rows replicate the
# last valid coordinate — they are sliced away by the caller, so they
# need no window coverage of their own). Window sizes are therefore
# picked per (out_hw, tile_h) from BUCKETS below: small descent ROIs
# (e.g. a 23x30 refinement ROI, span ~38) fetch a 56x256 window and
# contract over 48 lanes instead of the full-tile 144x384/144 — ~4x less
# DMA and 3x less matmul work on the layers that dominate descent time.
#   SEL_W >= span + 9 (2 taps + 1 floor slack + alignment remainder
#   headroom is handled by the roll); WIN_H >= span + 10 (2 taps +
#   1 floor + 7 sublane-align slack); WIN_W - SEL_W >= 128 so the
#   128-aligned DMA origin stays within roll range of the desired lane
#   origin (requires Wp % 128 == 0, which the host pad guarantees).
# Buckets: (max_span, WIN_H, WIN_W, SEL_W).
BUCKETS = (
    (39, 56, 256, 48),
    (103, 120, 256, 112),
    (132, 144, 384, 144),
)
PAD = 288   # host-side border padding (>= max WIN_H, multiple of 8)

# Matmul precision scheme: "int8" (2x MXU rate, exact — see module doc)
# with "bf16" fallback (also exact). Overridable for A/B timing.
# On-chip A/B (v5e, job 200_warp_ab): both exact vs the gather path;
# int8 ~26% faster at flagship L0 shapes (3.7ms vs 5.0ms compute for
# B=12 (528,768) warps) — int8 is the default.
MATMUL_DTYPE = "int8"


@functools.partial(
    jax.jit,
    static_argnames=("out_hw", "quantize", "matmul_dtype", "interpret",
                     "tile_h"))
def warp_affine_pallas(
    src: jnp.ndarray,          # [H, W] f32 (unpadded)
    inv_mats: jnp.ndarray,     # [B, 2, 3] f32
    out_hw: Tuple[int, int],
    border_value: float,
    quantize: bool = True,
    matmul_dtype: str = None,
    interpret: bool = False,
    tile_h: int = None,
) -> jnp.ndarray:
    H, W = src.shape
    Ho, Wo = out_hw
    B = inv_mats.shape[0]
    if tile_h is None:
        if Ho <= 32:
            # One row-tile for small descent ROIs (halves grid cells on
            # e.g. a 23-row ROI vs th=16).
            tile_h = 8 if Ho <= 8 else (16 if Ho <= 16 else 32)
        else:
            # Large ROIs are partly DMA-bound: taller tiles amortize the
            # fixed window fetch over more output rows AND cut the
            # per-pixel selection-matmul redundancy (2*WIN_H*SEL_W MACs
            # per output pixel, amortized over th*TW pixels per tile).
            # Round-5 scanned-protocol A/B (/tmp job 007, v5e): th=32
            # beats th=16 at both flagship descent shapes (L0 24x527x768:
            # 11.0 vs 12.4 ms; L1: 3.8 vs 4.2) and th=8 is worst (13.8) —
            # the r4 single-dispatch A/B that picked 16 was dominated by
            # per-dispatch overhead, not kernel time.
            tile_h = 32
    assert tile_h in (8, 16, 32), tile_h
    th = tile_h
    n_ti = pl.cdiv(Ho, th)
    n_tj = pl.cdiv(Wo, TW)
    # Window bucket from the EFFECTIVE rotated-tile span (coords of
    # out-of-range lanes/rows are clamped in-kernel to the last valid
    # output position, so only the real output extent needs coverage).
    import math
    span = int(math.ceil(math.hypot(min(TW, Wo), min(th, Ho))))
    for max_span, win_h, win_w, sel_w in BUCKETS:
        if span <= max_span:
            break
    else:
        raise AssertionError(f"tile span {span} exceeds largest bucket")
    if matmul_dtype is None:
        matmul_dtype = MATMUL_DTYPE

    padded = jnp.pad(src, PAD, constant_values=jnp.float32(border_value))
    # Round the padded width up to a 128-lane multiple: with Wp % 128 == 0
    # the clipped-and-floored DMA origin stays within WIN_W - SEL_W lanes
    # of the desired origin, so the post-roll SEL_W slice never wraps.
    extra = (-padded.shape[1]) % 128
    if extra:
        padded = jnp.pad(padded, ((0, 0), (0, extra)),
                         constant_values=jnp.float32(border_value))
    Hp, Wp = padded.shape

    params = jnp.concatenate([
        inv_mats[:, 0, :], inv_mats[:, 1, :],
        jnp.broadcast_to(jnp.array([[float(H), float(W),
                                     float(Hp), float(Wp)]], jnp.float32),
                         (B, 4)),
    ], axis=1)  # [B, 10]

    body = functools.partial(_warp_kernel_body, matmul_dtype, th,
                             (win_h, win_w, sel_w), (Ho, Wo))
    out = pl.pallas_call(
        body,
        grid=(B, n_ti, n_tj),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, th, TW), lambda b, i, j: (b, i, j)),
        out_shape=jax.ShapeDtypeStruct((B, n_ti * th, n_tj * TW),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, win_h, win_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(params, padded)
    out = out[:, :Ho, :Wo]
    if quantize:
        out = jnp.round(out)
    return out


def _warp_kernel_body(matmul_dtype, th, win_shape, out_hw, inv_ref, src_hbm,
                      out_ref, win_ref, sem):
    WIN_H, WIN_W, SEL_W = win_shape
    Ho, Wo = out_hw
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    nb = pl.num_programs(0)
    nti = pl.num_programs(1)
    ntj = pl.num_programs(2)
    Hp = inv_ref[0, 8].astype(jnp.int32)   # padded dims: same for all b
    Wp = inv_ref[0, 9].astype(jnp.int32)

    def origins(b_, i_, j_):
        """Window origins for grid cell (b_, i_, j_): the DMA origin
        (oy, ox) and the desired unaligned lane origin ux. Corner extents
        clamp to the last VALID output position (Ho-1, Wo-1) — matching
        the clamped per-lane coords below — so partial tiles only need
        window coverage for real outputs (this is what lets small-ROI
        tiles use the small window buckets)."""
        a_ = inv_ref[b_, 0]
        b2 = inv_ref[b_, 1]
        tx_ = inv_ref[b_, 2]
        c_ = inv_ref[b_, 3]
        d_ = inv_ref[b_, 4]
        ty_ = inv_ref[b_, 5]
        H_ = inv_ref[b_, 6]
        W_ = inv_ref[b_, 7]
        i0_ = (i_ * th).astype(jnp.float32)
        j0_ = (j_ * TW).astype(jnp.float32)
        i1_ = jnp.minimum(i0_ + th - 1, jnp.float32(Ho - 1))
        j1_ = jnp.minimum(j0_ + TW - 1, jnp.float32(Wo - 1))
        lo_x_ = -jnp.float32(PAD - 2)
        hi_x_ = W_ + jnp.float32(PAD - 3)
        lo_y_ = -jnp.float32(PAD - 2)
        hi_y_ = H_ + jnp.float32(PAD - 3)

        def corner(ii_, jj_):
            fx_ = a_ * jj_ + b2 * ii_ + tx_
            fy_ = c_ * jj_ + d_ * ii_ + ty_
            return (jnp.clip(fx_, lo_x_, hi_x_),
                    jnp.clip(fy_, lo_y_, hi_y_))

        cs = [corner(i0_, j0_), corner(i1_, j0_),
              corner(i0_, j1_), corner(i1_, j1_)]
        min_fx = jnp.minimum(jnp.minimum(cs[0][0], cs[1][0]),
                             jnp.minimum(cs[2][0], cs[3][0]))
        min_fy = jnp.minimum(jnp.minimum(cs[0][1], cs[1][1]),
                             jnp.minimum(cs[2][1], cs[3][1]))
        wx0_ = jnp.floor(min_fx).astype(jnp.int32) - 1
        wy0_ = jnp.floor(min_fy).astype(jnp.int32) - 1
        # Desired (unaligned) lane origin; the DMA origin ox is its
        # 128-aligned clipped floor. Wp % 128 == 0 (host pads), so even at
        # the right edge ux - ox <= WIN_W - SEL_W and the post-roll
        # [0, SEL_W) slice never wraps (tile taps live in [ux, ux + SEL_W)
        # by construction; WIN_W - SEL_W >= 128 in every bucket).
        ux_ = jnp.clip(wx0_ + PAD, 0, Wp - SEL_W)
        ox_ = jnp.clip(ux_, 0, Wp - WIN_W) // 128 * 128
        oy_ = jnp.clip(wy0_ + PAD, 0, Hp - WIN_H) // 8 * 8
        return oy_, ox_, ux_

    def dma_for(oy_, ox_, s_):
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(oy_, WIN_H), pl.ds(ox_, WIN_W)],
            win_ref.at[s_], sem.at[s_])

    # Double-buffered window pipeline: cell k waits on slot k%2 (issued by
    # cell k-1, or by itself when k==0) and prefetches cell k+1's window
    # into slot (k+1)%2 before computing — the window DMA (~221 KB,
    # latency ~1us) overlaps the current cell's masks+matmuls instead of
    # serializing with them.
    k = (bi * nti + ti) * ntj + tj
    total = nb * nti * ntj
    slot = jax.lax.rem(k, 2)
    oy, ox, ux = origins(bi, ti, tj)

    @pl.when(k == 0)
    def _():
        dma_for(oy, ox, 0).start()

    @pl.when(k + 1 < total)
    def _():
        k1 = k + 1
        nbi = k1 // (nti * ntj)
        rem = k1 - nbi * (nti * ntj)
        ni = rem // ntj
        nj = rem - ni * ntj
        noy, nox, _ = origins(nbi, ni, nj)
        dma_for(noy, nox, jax.lax.rem(k1, 2)).start()

    a = inv_ref[bi, 0]
    b = inv_ref[bi, 1]
    tx = inv_ref[bi, 2]
    c = inv_ref[bi, 3]
    d = inv_ref[bi, 4]
    ty = inv_ref[bi, 5]
    H = inv_ref[bi, 6]
    W = inv_ref[bi, 7]
    i0 = (ti * th).astype(jnp.float32)
    j0 = (tj * TW).astype(jnp.float32)
    lo_x = -jnp.float32(PAD - 2)
    hi_x = W + jnp.float32(PAD - 3)
    lo_y = -jnp.float32(PAD - 2)
    hi_y = H + jnp.float32(PAD - 3)

    # Coordinates of rows/lanes beyond the real output extent clamp to
    # the last valid position: their outputs are duplicates the caller
    # slices away, and the clamp keeps every sample inside the fetched
    # window (matching the clamped corner extents in origins()).
    ii = jnp.minimum(
        jax.lax.broadcasted_iota(jnp.int32, (th, TW), 0).astype(jnp.float32)
        + i0, jnp.float32(Ho - 1))
    jj = jnp.minimum(
        jax.lax.broadcasted_iota(jnp.int32, (th, TW), 1).astype(jnp.float32)
        + j0, jnp.float32(Wo - 1))
    fx = jnp.clip(a * jj + b * ii + tx, lo_x, hi_x).reshape(1, th * TW)
    fy = jnp.clip(c * jj + d * ii + ty, lo_y, hi_y).reshape(1, th * TW)
    x0f = jnp.floor(fx)
    y0f = jnp.floor(fy)
    ax = fx - x0f
    ay = fy - y0f
    xr = x0f - (ux - PAD).astype(jnp.float32)   # in [0, SEL_W - 2]
    yr = y0f - (oy - PAD).astype(jnp.float32)

    iota_x = jax.lax.broadcasted_iota(jnp.int32, (SEL_W, th * TW), 0).astype(
        jnp.float32)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (WIN_H, th * TW), 0).astype(
        jnp.float32)
    # Fractional y-weights folded into ONE weighted selection mask: the
    # four unweighted masked reductions this replaces were the kernel's
    # VPU bottleneck (4 x [WIN_H, th*TW] mul+sum passes; ~half the L0
    # descent time). Σ_y wy_w*cx is mathematically identical to the
    # 4-corner blend; f32 rounding differs by ulps (the bilinear blend
    # was never bitwise-unique across backends — cv2 parity is
    # tolerance-based).
    ay_b = ay  # [1, th*TW]
    wy_w = (jnp.where(iota_y == yr, 1.0, 0.0) * (1.0 - ay_b)
            + jnp.where(iota_y == yr + 1.0, 1.0, 0.0) * ay_b)

    dma_for(oy, ox, slot).wait()
    # Normalize the lane origin: roll the alignment remainder away and keep
    # only the SEL_W lanes the tile can touch.
    dlt = ux - ox
    win = pltpu.roll(win_ref[slot], shift=jnp.mod(WIN_W - dlt, WIN_W),
                     axis=1)
    dn = (((1,), (0,)), ((), ()))
    if matmul_dtype == "int8":
        # Centered-u8 int8 scheme: window - 128 in [-128, 127] is exact in
        # int8; selection columns each sum to exactly one (xr, xr+1 always
        # in range), so adding 128 back after the matmul is exact.
        sel0 = jnp.where(iota_x == xr, 1, 0).astype(jnp.int8)
        sel1 = jnp.where(iota_x == xr + 1.0, 1, 0).astype(jnp.int8)
        win_i8 = (win[:, :SEL_W] - 128.0).astype(jnp.int8)
        c0 = jax.lax.dot_general(win_i8, sel0, dn,
                                 preferred_element_type=jnp.int32
                                 ).astype(jnp.float32) + 128.0
        c1 = jax.lax.dot_general(win_i8, sel1, dn,
                                 preferred_element_type=jnp.int32
                                 ).astype(jnp.float32) + 128.0
    else:
        sel0 = jnp.where(iota_x == xr, 1.0, 0.0).astype(jnp.bfloat16)
        sel1 = jnp.where(iota_x == xr + 1.0, 1.0, 0.0).astype(jnp.bfloat16)
        win_bf = win[:, :SEL_W].astype(jnp.bfloat16)
        c0 = jax.lax.dot_general(win_bf, sel0, dn,
                                 preferred_element_type=jnp.float32)
        c1 = jax.lax.dot_general(win_bf, sel1, dn,
                                 preferred_element_type=jnp.float32)
    # cN[y, n] = row-y value at x0(+1). x-blend first ([WIN_H, th*TW],
    # one pass), then ONE weighted row-reduction with wy_w.
    cx = (1.0 - ax) * c0 + ax * c1
    out = jnp.sum(wy_w * cx, axis=0)
    out_ref[0] = out.reshape(th, TW)
