"""Sharded batch matching over a ('data', 'angle') mesh.

Composition of the same stage functions as the single-chip program
(models.template_matcher.build_stages), re-wired with collectives:

  per device: sweep_maps over its LOCAL angle shard for its LOCAL images
      -> all_gather(peaks) over the 'angle' axis          (tiny: [A, K] * 3)
  per device: select_candidates + full descent + NMS for its LOCAL images
      -> results sharded over 'data'

The template pyramid and per-angle constants are replicated; the only
cross-device traffic is the peak lists (K floats per angle), which rides
ICI. This mirrors the BASELINE.json north star: images and candidate
angles sharded data-parallel, psum/all_gather top-K merge.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MatchConfig
from ..types import LearnedPattern
from ..models.template_matcher import (_Plan, _make_plan, _top_sweep_arrays,
                                       build_stages)
from .mesh import ANGLE_AXIS, DATA_AXIS


def _pad_to(x: np.ndarray, n: int, fill=0):
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad, constant_values=fill)


def build_sharded_match(plan: _Plan, stats, mesh: Mesh):
    """Returns fn(srcs [B,H,W], templs, inv_mats [A,2,3], trans, valid_wh,
    angles_arr) -> per-image result dict, sharded over 'data'."""
    st = build_stages(plan, stats)
    top = plan.top

    from ..ops.pyramid import build_pyramid

    def per_device(srcs_l, templs, inv_l, trans, valid_l, angles_arr):
        # srcs_l: [Bl, H, W]; inv_l/valid_l: local angle shard.
        def one_image_sweep(src):
            if plan.cfg.bitwise_not:
                src = 255.0 - src
            pyr = build_pyramid(src, top)
            vals, locs = st.sweep_maps(pyr[top], templs[top], inv_l, valid_l)
            return vals, locs, pyr

        # lax.map (not vmap): the Pallas warp kernel takes its source as a
        # whole-array HBM operand, which cannot carry a vmap batch dim;
        # map keeps per-image bodies unbatched (images per device are few).
        vals, locs, pyr = jax.lax.map(one_image_sweep, srcs_l)
        # Merge peak lists across the angle axis (ICI all_gather; axis 1 is
        # the angle dim of [Bl, a_local, K]).
        vals_g = jax.lax.all_gather(vals, ANGLE_AXIS, axis=1, tiled=True)
        locs_g = jax.lax.all_gather(locs, ANGLE_AXIS, axis=1, tiled=True)

        def one_image_rest(vals_i, locs_i, pyr_i):
            pt, ang, score, alive = st.select_candidates(
                vals_i, locs_i, trans, angles_arr)
            fpt, fang, score, alive = st.descend(pyr_i, templs, pt, ang,
                                                 score, alive)
            return st.finalize(fpt, fang, score, alive)

        return jax.lax.map(lambda t: one_image_rest(*t),
                           (vals_g, locs_g, pyr))

    fn = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(), P(ANGLE_AXIS), P(), P(ANGLE_AXIS), P()),
        out_specs=P(DATA_AXIS),
        check_vma=False)
    return jax.jit(fn)


@functools.lru_cache(maxsize=16)
def _compiled_sharded(plan: _Plan, stats, mesh: Mesh):
    return build_sharded_match(plan, stats, mesh)


def match_batch_sharded(
    srcs: np.ndarray,                  # [B, H, W] u8
    pattern: LearnedPattern,
    cfg: Optional[MatchConfig] = None,
    mesh: Optional[Mesh] = None,
) -> Dict[str, np.ndarray]:
    """Match one template against a batch of images, sharded over the mesh.

    B must be padded to a multiple of the 'data' axis; the angle list is
    padded to a multiple of the 'angle' axis (padded angles are fully
    masked and produce no candidates). Returns stacked result arrays
    [B, max_pos, ...].
    """
    from .mesh import make_mesh
    cfg = cfg or MatchConfig()
    mesh = mesh or make_mesh()
    srcs = np.asarray(srcs)
    if srcs.ndim == 4:
        from ..utils.imageio import ensure_gray
        srcs = ensure_gray(srcs)
    B = srcs.shape[0]
    nd, na = mesh.devices.shape

    plan = _make_plan(srcs.shape[1:], pattern, cfg)
    inv_mats, trans, valid_wh, angles_arr = _top_sweep_arrays(plan)
    A = inv_mats.shape[0]
    a_pad = (A + na - 1) // na * na
    # Pad angles with fully-masked entries (valid_wh 0 -> all scores -1).
    inv_p = _pad_to(inv_mats, a_pad)
    valid_p = _pad_to(valid_wh, a_pad)
    # angles/trans stay full-length A? They are replicated and indexed by
    # flat peak index — pad them to a_pad for consistent indexing.
    trans_p = _pad_to(trans, a_pad)
    angles_p = _pad_to(angles_arr, a_pad)

    b_pad = (B + nd - 1) // nd * nd
    srcs_p = _pad_to(srcs.astype(np.float32), b_pad)

    stats = tuple((lv.mean, lv.norm, lv.inv_area, lv.result_equal1)
                  for lv in pattern.levels)
    fn = _compiled_sharded(plan, stats, mesh)
    templs = tuple(jnp.asarray(lv.templ) for lv in pattern.levels)

    out = fn(jnp.asarray(srcs_p), templs, jnp.asarray(inv_p),
             jnp.asarray(trans_p), jnp.asarray(valid_p),
             jnp.asarray(angles_p))
    return {k: np.asarray(v)[:B] for k, v in out.items()}
