"""GetNextMaxLoc parity (MatchTool/MatchToolDlg.cpp:1558-1596): greedy
masked peak extraction vs a direct numpy emulation of the reference."""

import numpy as np
import jax.numpy as jnp

from fastest_image_pattern_matching_tpu.ops.peaks import extract_peaks


def _reference_peaks(score, k, tw, th, overlap):
    """Direct emulation of minMaxLoc + rectangle(-1 fill) iteration."""
    m = score.copy()
    out = []
    sw = int(2 * tw * (1 - overlap))
    sh = int(2 * th * (1 - overlap))
    for _ in range(k):
        idx = np.argmax(m)  # row-major first max, like cv::minMaxLoc
        y, x = np.unravel_index(idx, m.shape)
        out.append((m[y, x], x, y))
        x0 = int(x - tw * (1 - overlap))
        y0 = int(y - th * (1 - overlap))
        xa, ya = max(x0, 0), max(y0, 0)
        xb = min(x0 + sw - 1, m.shape[1] - 1)
        yb = min(y0 + sh - 1, m.shape[0] - 1)
        if xb >= xa and yb >= ya:
            m[ya:yb + 1, xa:xb + 1] = -1.0
    return out


def test_extract_peaks_matches_reference(rng):
    score = rng.random((57, 83)).astype(np.float32)
    k, tw, th, ov = 8, 12, 9, 0.3
    vals, locs = extract_peaks(jnp.asarray(score)[None], k, (tw, th), ov)
    ref = _reference_peaks(score, k, tw, th, ov)
    for i, (v, x, y) in enumerate(ref):
        assert abs(float(vals[0, i]) - v) < 1e-6
        assert (int(locs[0, i, 0]), int(locs[0, i, 1])) == (x, y)


def test_extract_peaks_tiled_matches_reference(rng):
    """The single-angle large-map route (tiled BlockMax) must agree with
    the direct reference emulation, including across tile boundaries."""
    score = rng.random((300, 400)).astype(np.float32)
    k, tw, th, ov = 30, 20, 14, 0.2
    vals, locs = extract_peaks(jnp.asarray(score)[None], k, (tw, th), ov)
    ref = _reference_peaks(score, k, tw, th, ov)
    for i, (v, x, y) in enumerate(ref):
        assert abs(float(vals[0, i]) - v) < 1e-6, i
        assert (int(locs[0, i, 0]), int(locs[0, i, 1])) == (x, y), i


def test_extract_peaks_tiled_exact_ties(rng):
    """Row-major first-max tie-break under exact value ties (the many-target
    regime produces exact 1.0 ties for identical planted targets)."""
    score = np.full((280, 500), -0.5, np.float32)
    # 12 planted exact-tie peaks at 1.0 plus quantized background ties.
    score[:] = (rng.integers(0, 4, score.shape) / 8.0 - 0.5).astype(np.float32)
    pts = [(17, 23), (17, 481), (140, 250), (263, 23), (263, 481),
           (70, 128), (70, 384), (210, 128), (210, 384), (140, 23),
           (5, 250), (274, 250)]
    for (y, x) in pts:
        score[y, x] = 1.0
    k, tw, th, ov = 20, 27, 27, 0.0
    vals, locs = extract_peaks(jnp.asarray(score)[None], k, (tw, th), ov)
    ref = _reference_peaks(score, k, tw, th, ov)
    for i, (v, x, y) in enumerate(ref):
        assert abs(float(vals[0, i]) - v) < 1e-6, i
        assert (int(locs[0, i, 0]), int(locs[0, i, 1])) == (x, y), i


def test_extract_peaks_batched(rng):
    score = rng.random((3, 40, 40)).astype(np.float32)
    vals, locs = extract_peaks(jnp.asarray(score), 4, (8, 8), 0.0)
    for b in range(3):
        ref = _reference_peaks(score[b], 4, 8, 8, 0.0)
        for i, (v, x, y) in enumerate(ref):
            assert abs(float(vals[b, i]) - v) < 1e-6
            assert (int(locs[b, i, 0]), int(locs[b, i, 1])) == (x, y)
