"""Fused normalized cross-correlation (TM_CCOEFF_NORMED) score maps.

Reference pipeline per rotated canvas: raw TM_CCORR (cv::matchTemplate or
the SIMD u8 dot path, MatchTool/MatchToolDlg.cpp:1275-1311) followed by
CCOEFF_Denominator (integral-image window stats + numeric guards,
MatchToolDlg.cpp:1329-1400).

TPU formulation (one fused op, batched over canvases):
  Let Sc = S - 128 and Tc = T - 128 (both in [-128, 127], exact in bf16 and
  int8), T_bar = mean(T). With T' = T - T_bar (zero-mean template):

      num   = sum_w S*T' = ccorr_c + (128 - T_bar) * s1c
      where ccorr_c = conv(Sc, Tc)  <- the single MXU matmul that matters
            s1c     = window sums of Sc (separable reduce_window, exact)
            s2c     = window sums of Sc^2
      diff2 = s2c - s1c^2/area      (= sum_w (S - S_bar)^2, shift-invariant)
      t     = sqrt(diff2) * templNorm, with the reference's rounding-error
              cutoff and the 1.125 clamp band (MatchToolDlg.cpp:1384-1395).

This centering keeps every MXU input integer-valued (exact in bf16; int8
eligible when area*128*128 < 2^31) and makes the numerator numerically
benign — no large-magnitude cancellation like raw CCORR - mean*sum.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

FLT_EPSILON = np.float32(1.1920929e-07)


def window_sums(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Valid-mode sliding-window sums over the last two dims via two
    separable reduce_windows: [..., H, W] -> [..., H-h+1, W-w+1]."""
    h, w = hw
    nb = x.ndim - 2
    dims_h = (1,) * nb + (h, 1)
    dims_w = (1,) * nb + (1, w)
    strides = (1,) * x.ndim
    y = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims_h, strides, "VALID")
    return jax.lax.reduce_window(y, 0.0, jax.lax.add, dims_w, strides, "VALID")


def ccorr_conv(
    canvases_c: jnp.ndarray,   # [B, H, W] f32, already centered (S - 128)
    templ_c: jnp.ndarray,      # [h, w] f32, centered (T - 128)
    compute_dtype: str = "bf16",
) -> jnp.ndarray:
    """Raw centered cross-correlation conv(Sc, Tc) -> [B, Ho, Wo] f32."""
    h, w = templ_c.shape
    if compute_dtype == "int8" and h * w * 128 * 128 < 2**31:
        lhs = canvases_c.astype(jnp.int8)[:, None]
        rhs = templ_c.astype(jnp.int8)[None, None]
        acc = jnp.int32
    elif compute_dtype in ("bf16", "int8"):
        # "int8" past the accumulator bound falls back to bf16 (exact).
        lhs = canvases_c.astype(jnp.bfloat16)[:, None]
        rhs = templ_c.astype(jnp.bfloat16)[None, None]
        acc = jnp.float32
    else:
        lhs = canvases_c[:, None]
        rhs = templ_c[None, None]
        acc = jnp.float32
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=acc,
    )[:, 0]
    return out.astype(jnp.float32)


def ccorr_shiftmm(
    canvases_c: jnp.ndarray,   # [B, H, W] f32, centered
    templ_c: jnp.ndarray,      # [h, w] f32, centered
    compute_dtype: str = "bf16",
) -> jnp.ndarray:
    """Centered cross-correlation for SMALL output grids as ONE dense MXU
    matmul: score[b, s] = <roi[b], template shifted by s>.

    XLA lowers a valid conv whose kernel nearly fills the input to a
    matmul with a single output column (1/128 MXU utilization — measured
    16 ms for a [24, 533, 774] x [521, 762] refinement correlation that is
    1.6e9 MACs). Materializing all Ho*Wo shifted copies of the template
    instead gives the matmul Ho*Wo output columns and full utilization at
    the same MAC count (~0.1 ms). Shifted copies are exact; bf16 on
    u8-centered values with f32 accumulation is exact (see module doc).
    """
    B, H, W = canvases_c.shape
    h, w = templ_c.shape
    Ho, Wo = H - h + 1, W - w + 1
    # int8 (2x MXU rate) requires integer-valued inputs (caller opts in
    # via compute_dtype="int8") and an overflow-free int32 accumulator:
    # the contraction runs over the full H*W ROI but the shifted copies
    # are zero outside the h*w template support, so only h*w products are
    # nonzero — the tight accumulator bound is h*w * 128 * 128 (matching
    # ccorr_banded; keeps the 2x int8 rate on large refinement ROIs).
    if compute_dtype == "int8" and h * w * 128 * 128 < 2**31:
        tc = templ_c.astype(jnp.int8)
        rc = canvases_c.astype(jnp.int8)
        acc = jnp.int32
    elif compute_dtype in ("bf16", "int8"):
        tc = templ_c.astype(jnp.bfloat16)
        rc = canvases_c.astype(jnp.bfloat16)
        acc = jnp.float32
    else:
        tc = templ_c
        rc = canvases_c
        acc = jnp.float32
    shifts = [jnp.pad(tc, ((dy, Ho - 1 - dy), (dx, Wo - 1 - dx)))
              for dy in range(Ho) for dx in range(Wo)]
    tsh = jnp.stack(shifts)  # [Ho*Wo, H, W]
    out = jax.lax.dot_general(
        rc, tsh, (((1, 2), (1, 2)), ((), ())),
        preferred_element_type=acc)  # [B, Ho*Wo]
    return out.astype(jnp.float32).reshape(B, Ho, Wo)


def ccorr_banded(
    canvases_c: jnp.ndarray,   # [B, H, W] f32, centered
    templ_c: jnp.ndarray,      # [h, w] f32, centered
    compute_dtype: str = "bf16",
) -> jnp.ndarray:
    """Centered cross-correlation for SMALL templates over LARGE maps as a
    scan of banded (Toeplitz) MXU matmuls — the regime where XLA lowers a
    single-input-channel conv catastrophically (measured 4.8 GMAC/s for a
    [1, 1824, 1824] x [27, 27] conv vs ~34 TMAC/s for this form; the
    reference hits the same regime in its BlockMax many-target tests,
    README.md:23-29).

    corr = sum_dy  canvas[dy:dy+Ho, :] @ Band_dy,  Band_dy[x, v] = T[dy, x-v]
    Band matrices are built once per call by diagonal accumulation (exact;
    the largest transient is one [W, Wo] mask, not a [w, W, Wo] one-hot);
    bf16 on u8-centered values with f32 accumulation is exact (see module
    doc). Band memory: h*W*Wo*2 bytes — the caller gates eligibility.
    """
    B, H, W = canvases_c.shape
    h, w = templ_c.shape
    Ho, Wo = H - h + 1, W - w + 1
    # int8 (2x MXU rate; caller opts in, guaranteeing integer inputs):
    # each band row holds w nonzero template values, so the full
    # correlation magnitude is bounded by h*w*128*128 — accumulate the
    # scan in int32 (exact far beyond the f32 path's 2^24 mantissa).
    use_i8 = compute_dtype == "int8" and h * w * 128 * 128 < 2**31
    dt = (jnp.int8 if use_i8
          else jnp.bfloat16 if compute_dtype in ("bf16", "int8")
          else jnp.float32)
    accdt = jnp.int32 if use_i8 else jnp.float32
    x_i = jax.lax.broadcasted_iota(jnp.int32, (W, Wo), 0)
    v_i = jax.lax.broadcasted_iota(jnp.int32, (W, Wo), 1)
    diff = x_i - v_i
    tc = templ_c.astype(dt)
    band = jnp.zeros((h, W, Wo), dt)
    for j in range(w):
        if use_i8:
            band = band + jnp.where(diff == j, tc[:, j][:, None, None],
                                    jnp.int8(0))
        else:
            band = band + tc[:, j][:, None, None] * (diff == j).astype(dt)
    cb = canvases_c.astype(dt)

    def step(acc, dy):
        xs = jax.lax.dynamic_slice_in_dim(cb, dy, Ho, axis=1)  # [B, Ho, W]
        bd = jax.lax.dynamic_index_in_dim(band, dy, 0, keepdims=False)
        return acc + jax.lax.dot_general(
            xs, bd, (((2,), (0,)), ((), ())),
            preferred_element_type=accdt), 0.0

    acc0 = jnp.zeros((B, Ho, Wo), accdt)
    out, _ = jax.lax.scan(step, acc0, jnp.arange(h))
    return out.astype(jnp.float32)


# Band-matrix HBM budget for ccorr_banded eligibility (h*W*Wo bf16 elems).
_BANDED_BUDGET_ELEMS = 512 * 1024 * 1024


def ccorr_fft(
    canvases_c: jnp.ndarray,   # [B, H, W] f32, centered
    templ_c: jnp.ndarray,      # [h, w] f32, centered
) -> jnp.ndarray:
    """Raw centered cross-correlation via FFT -> [B, Ho, Wo] f32.

    Valid-mode correlation falls out of a circular FFT of the *source*
    size: wraparound only contaminates outputs beyond (H-h+1, W-w+1),
    which are sliced away. Preferable to the conv path when
    Ho*Wo*h*w >> H*W*log(H*W) (large template AND large search area —
    the no-pyramid TM_CCOEFF_NORMED regime; the pyramid path's top layer
    is small enough that the MXU conv wins).
    """
    B, H, W = canvases_c.shape
    h, w = templ_c.shape
    fs = jnp.fft.rfft2(canvases_c, s=(H, W))
    ft = jnp.fft.rfft2(templ_c, s=(H, W))
    corr = jnp.fft.irfft2(fs * jnp.conj(ft)[None], s=(H, W))
    return corr[:, : H - h + 1, : W - w + 1].astype(jnp.float32)


def ncc_score_map(
    canvases: jnp.ndarray,      # [B, H, W] f32 (u8-valued)
    templ: jnp.ndarray,         # [h, w] f32 (u8-valued)
    templ_mean: float,          # host-precomputed f64 scalar (meanStdDev)
    templ_norm: float,          # sigma * sqrt(area)
    inv_area: float,
    result_equal1: bool,
    compute_dtype: str = "bf16",
    method: str = "auto",
) -> jnp.ndarray:
    """Fused TM_CCORR + CCOEFF_Denominator -> [B, Ho, Wo] f32 scores.

    Matches cv::matchTemplate(TM_CCOEFF_NORMED) semantics including the
    flat-template all-ones shortcut (MatchToolDlg.cpp:1331-1335) and the
    epsilon/1.125 guards (:1384-1395).

    method:
      "conv"    — lax.conv on the MXU (general default).
      "shiftmm" — one dense matmul against all Ho*Wo shifted template
                  copies; the pyramid-descent refinement regime (tiny
                  output grid over a big template), where XLA's conv
                  lowering idles 127/128 of the MXU.
      "banded"  — scan of banded-Toeplitz matmuls; the many-target regime
                  (small template over a huge map), where XLA's
                  single-channel conv lowering runs ~5 GMAC/s.
      "tiledband" — the Pallas column-tiled band kernel
                  (ops/pallas/corr_kernel.py): same regime as "banded"
                  but ~12x fewer issued MACs and one canvas read instead
                  of h; exact. TPU backends (interpret-mode elsewhere).
      "fft"     — frequency-domain correlation (large template x large
                  search area; not bit-exact, ~1e-7 relative).
      "auto"    — shiftmm when Ho*Wo<=512 and h*w>4096; else
                  tiledband/banded when the map is big (Ho*Wo>65536);
                  else fft/conv by operation-count estimate.
    """
    h, w = templ.shape
    B, H, W = canvases.shape
    if result_equal1:
        return jnp.ones((B, H - h + 1, W - w + 1), dtype=jnp.float32)

    area = float(h * w)
    sc = canvases - 128.0
    tc = templ - 128.0

    if method == "auto":
        import math as _math
        Ho, Wo = H - h + 1, W - w + 1
        if Ho * Wo <= 512:
            # Small search window (the pyramid-descent refinement regime):
            # shifted-template matmul. Even for small templates this beats
            # XLA's single-input-channel conv lowering (1/128 MXU columns;
            # flagship L4 descent measured ~6 ms on conv vs <1 ms here) at
            # a modest Ho*Wo/(h*w) MAC redundancy.
            method = "shiftmm"
        else:
            # MXU MACs are ~2 orders cheaper than FFT butterflies on TPU.
            conv_cost = Ho * Wo * h * w
            fft_cost = 4000.0 * H * W * _math.log2(max(H * W, 2))
            banded_cost = float(h) * Ho * W * Wo  # full-MXU-rate MACs
            banded_ok = h * W * Wo <= _BANDED_BUDGET_ELEMS
            if Ho * Wo > 65536:
                import os as _os
                from .pallas.corr_kernel import eligible as _tb_ok
                on_tpu = jax.default_backend() in ("tpu", "axon")
                # Round 5: the v2 ping-pong kernel beats banded on every
                # measured eligible shape INCLUDING short templates (h=5:
                # 0.59 vs 0.65 ms B16; h=8: 0.84 vs 1.13 ms B16, 0.55 vs
                # 3.0 ms B1 — /tmp jobs 001/002, AUTOTUNE_r05), so the
                # round-4 h>=12 crossover gate is gone: every eligible
                # shape routes to the kernel on TPU.
                if (on_tpu and _tb_ok(h, w)
                        and _os.environ.get("FIPM_TILEDBAND", "1") != "0"):
                    # Big score map, small template: the Pallas tiled-band
                    # kernel (one canvas read, ~6x MAC expansion vs the
                    # full-width band's ~70x). On-chip A/B: see
                    # ROOFLINE_r04.json.
                    method = "tiledband"
                elif banded_ok and banded_cost < fft_cost:
                    # Fallback (CPU tests / oversize templates): XLA's
                    # single-channel conv is hopeless (~5 GMAC/s
                    # measured); the banded-matmul form is exact and runs
                    # at MXU rate.
                    method = "banded"
                else:
                    method = "fft" if conv_cost > fft_cost else "conv"
            else:
                method = "fft" if conv_cost > fft_cost else "conv"
    if method == "fft":
        ccorr_c = ccorr_fft(sc, tc)
    elif method == "shiftmm":
        ccorr_c = ccorr_shiftmm(sc, tc, compute_dtype)
    elif method == "banded":
        ccorr_c = ccorr_banded(sc, tc, compute_dtype)
    elif method == "tiledband":
        from .pallas.corr_kernel import ccorr_tiledband_pallas
        on_tpu = jax.default_backend() in ("tpu", "axon")
        ccorr_c = ccorr_tiledband_pallas(sc, tc, compute_dtype,
                                         interpret=not on_tpu)
    elif method == "conv":
        ccorr_c = ccorr_conv(sc, tc, compute_dtype)
    else:
        # A typo must fail loudly, not silently take the conv path.
        raise ValueError(f"unknown correlation method {method!r} "
                         "(expected auto|conv|shiftmm|banded|tiledband|fft)")
    s1c = window_sums(sc, (h, w))
    s2c = window_sums(sc * sc, (h, w))

    num = ccorr_c + jnp.float32(128.0 - templ_mean) * s1c
    wnd_sum2 = s2c + 256.0 * s1c + 16384.0 * area
    diff2 = jnp.maximum(s2c - s1c * s1c * jnp.float32(inv_area), 0.0)

    cutoff = jnp.minimum(jnp.float32(0.5), 10.0 * FLT_EPSILON * wnd_sum2)
    t = jnp.where(diff2 <= cutoff, 0.0, jnp.sqrt(diff2) * jnp.float32(templ_norm))

    num_abs = jnp.abs(num)
    safe_t = jnp.maximum(t, jnp.float32(1e-30))
    score = jnp.where(
        num_abs < t, num / safe_t,
        jnp.where(num_abs < t * 1.125, jnp.sign(num), 0.0))
    return score.astype(jnp.float32)
