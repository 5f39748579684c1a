"""Rotated-rectangle overlap filtering (NMS) on device.

Reference: FilterWithRotatedRect (MatchTool/MatchToolDlg.cpp:1498-1557)
walks score-sorted candidates pairwise, computes the rotated-rect
intersection polygon (cv::rotatedRectangleIntersection + SortPtWithCenter +
contourArea) and deletes the lower-scored one when fully contained or when
intersection_area / template_area > max_overlap.

TPU formulation: all O(C^2) pair intersection areas are computed at once
with a vmapped fixed-size Sutherland–Hodgman clip (convex quad vs convex
quad -> at most 8 vertices), then a sequential fori_loop applies the greedy
suppression order. C is small (<= a few hundred), so this is negligible
next to the correlation work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MAXV = 12  # >= 8 possible vertices of quad-quad intersection, padded


def _clip_halfplane(pts, cnt, a, b):
    """Clip polygon (pts [N,2], cnt valid) by the half-plane left of a->b
    (cross((b-a), (p-a)) >= 0). Returns (pts', cnt')."""
    n = pts.shape[0]
    idx = jnp.arange(n)
    nxt_idx = jnp.where(idx + 1 >= cnt, 0, idx + 1)
    cur = pts
    nxt = pts[nxt_idx]

    ex, ey = b[0] - a[0], b[1] - a[1]

    def side(p):
        # cross(b-a, p-a); >= 0 is inside for LT,RT,RB,LB winding in
        # image coords (y down).
        return ex * (p[..., 1] - a[1]) - ey * (p[..., 0] - a[0])

    s_cur = side(cur)
    s_nxt = side(nxt)
    in_cur = s_cur >= 0
    in_nxt = s_nxt >= 0
    crosses = in_cur != in_nxt

    denom = s_cur - s_nxt
    safe_denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    tparam = jnp.where(jnp.abs(denom) > 1e-12, s_cur / safe_denom, 0.0)
    inter = cur + tparam[:, None] * (nxt - cur)

    valid = idx < cnt
    emit_cur = in_cur & valid
    emit_int = crosses & valid

    counts = emit_cur.astype(jnp.int32) + emit_int.astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts  # exclusive
    # Compact via scatter; invalid entries write zeros to the sentinel slot
    # n-1, which legit vertices never occupy (<= 8 of 12 slots used).
    out = jnp.zeros_like(pts)
    pos_cur = jnp.where(emit_cur, offsets, n - 1)
    out = out.at[pos_cur].set(jnp.where(emit_cur[:, None], cur, 0.0))
    pos_int = jnp.where(emit_int, offsets + emit_cur.astype(jnp.int32), n - 1)
    out = out.at[pos_int].set(jnp.where(emit_int[:, None], inter, 0.0))
    new_cnt = jnp.sum(counts)
    return out, new_cnt


def quad_intersection_area(quad_a: jnp.ndarray, quad_b: jnp.ndarray):
    """Intersection area of two convex quads given as [4,2] vertex lists in
    consistent winding (LT, RT, RB, LB in image coords)."""
    pts = jnp.zeros((_MAXV, 2), dtype=jnp.float32).at[:4].set(quad_a)
    cnt = jnp.int32(4)
    for k in range(4):
        a = quad_b[k]
        b = quad_b[(k + 1) % 4]
        pts, cnt = _clip_halfplane(pts, cnt, a, b)
    # Shoelace over the valid prefix.
    n = pts.shape[0]
    idx = jnp.arange(n)
    nxt_idx = jnp.where(idx + 1 >= cnt, 0, idx + 1)
    nxt = pts[nxt_idx]
    cross = pts[:, 0] * nxt[:, 1] - nxt[:, 0] * pts[:, 1]
    cross = jnp.where(idx < cnt, cross, 0.0)
    area = 0.5 * jnp.abs(jnp.sum(cross))
    return jnp.where(cnt >= 3, area, 0.0)


def rotated_rect_corners(pt_lt: jnp.ndarray, angle_deg: jnp.ndarray,
                         w: float, h: float) -> jnp.ndarray:
    """Corners [..., 4, 2] (LT, RT, RB, LB) of the matched rect, exactly the
    reference construction (MatchToolDlg.cpp:1058-1063): rotate by
    dRAngle = -angle about LT in image coords."""
    ra = -angle_deg * (jnp.pi / 180.0)
    cosr, sinr = jnp.cos(ra), jnp.sin(ra)
    lt = pt_lt
    rt = jnp.stack([lt[..., 0] + w * cosr, lt[..., 1] - w * sinr], axis=-1)
    lb = jnp.stack([lt[..., 0] + h * sinr, lt[..., 1] + h * cosr], axis=-1)
    rb = jnp.stack([rt[..., 0] + h * sinr, rt[..., 1] + h * cosr], axis=-1)
    return jnp.stack([lt, rt, rb, lb], axis=-2)


def filter_overlaps(
    quads: jnp.ndarray,     # [C, 4, 2] score-sorted (desc) candidate rects
    valid: jnp.ndarray,     # [C] bool
    templ_area: float,
    max_overlap: float,
) -> jnp.ndarray:
    """Greedy suppression; returns the surviving-candidate mask.

    Matches FilterWithRotatedRect: for each surviving i (in score order),
    delete every later j whose intersection with i is full containment or
    has area ratio (vs template area) > max_overlap. 1-2 intersection
    points (zero area) keep both (MatchToolDlg.cpp:1527).
    """
    C = quads.shape[0]
    pair_area = jax.vmap(
        lambda qa: jax.vmap(lambda qb: quad_intersection_area(qa, qb))(quads)
    )(quads)  # [C, C]
    contain = pair_area >= templ_area * (1.0 - 1e-6)
    conflict = contain | (pair_area / templ_area > max_overlap)

    idx = jnp.arange(C)

    def body(i, alive):
        kill = conflict[i] & (idx > i) & alive[i] & alive
        return alive & ~kill

    return jax.lax.fori_loop(0, C, body, valid)
