"""Multi-target peak extraction (GetNextMaxLoc semantics, batched).

The reference iteratively takes the global max of a score map, then paints a
suppression rectangle of size 2W(1-overlap) x 2H(1-overlap) centred on it
with -1 and repeats (MatchTool/MatchToolDlg.cpp:1558-1582), optionally
accelerated with the s_BlockMax block cache (:1583-1596, MatchToolDlg.h:89-214).

On TPU the block cache is unnecessary: a full argmax IS a parallel tree
reduction, and the whole extraction vectorizes over the angle batch — each
fori_loop round does one [A, H*W] argmax plus a masked store. Results are
identical to the reference's greedy order (row-major first-max tie-break,
matching cv::minMaxLoc).

The reference stops extracting once a peak drops below the layer threshold;
we extract a fixed K peaks and mark the below-threshold tail invalid, which
yields the same valid set (everything after the break would be below
threshold as well).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def extract_peaks(
    scores: jnp.ndarray,        # [A, Hs, Ws] f32 (invalid regions pre-masked to -1)
    k: int,                     # peaks per map = max_pos + MATCH_CANDIDATE_NUM
    templ_wh: Tuple[int, int],  # template (w, h) at this layer
    max_overlap: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy masked top-K per score map.

    Returns (vals [A, k] f32, locs [A, k, 2] i32 as (x, y)).
    Threshold filtering is left to the caller (vals keep raw peak scores).
    """
    A, Hs, Ws = scores.shape
    tw, th = templ_wh
    # Suppression rect: x in [x0, x0 + ws - 1], cv::rectangle(Rect) fills the
    # inclusive pixel range; int casts truncate toward zero like C.
    sw = int(2 * tw * (1 - max_overlap))
    sh = int(2 * th * (1 - max_overlap))
    off_x = tw * (1.0 - max_overlap)
    off_y = th * (1.0 - max_overlap)

    xs = jax.lax.broadcasted_iota(jnp.int32, (Hs, Ws), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (Hs, Ws), 0)

    def body(i, carry):
        maps, vals, locs = carry
        flat_idx = jnp.argmax(maps.reshape(A, Hs * Ws), axis=1)  # first max wins
        y = (flat_idx // Ws).astype(jnp.int32)
        x = (flat_idx % Ws).astype(jnp.int32)
        v = maps.reshape(A, Hs * Ws)[jnp.arange(A), flat_idx]
        vals = vals.at[:, i].set(v)
        locs = locs.at[:, i, 0].set(x)
        locs = locs.at[:, i, 1].set(y)
        x0 = jnp.trunc(x.astype(jnp.float32) - off_x).astype(jnp.int32)
        y0 = jnp.trunc(y.astype(jnp.float32) - off_y).astype(jnp.int32)
        in_rect = ((xs[None] >= x0[:, None, None])
                   & (xs[None] <= (x0 + sw - 1)[:, None, None])
                   & (ys[None] >= y0[:, None, None])
                   & (ys[None] <= (y0 + sh - 1)[:, None, None]))
        maps = jnp.where(in_rect, jnp.float32(-1.0), maps)
        return maps, vals, locs

    vals0 = jnp.full((A, k), -1.0, dtype=jnp.float32)
    locs0 = jnp.zeros((A, k, 2), dtype=jnp.int32)
    _, vals, locs = jax.lax.fori_loop(0, k, body, (scores, vals0, locs0))
    return vals, locs
