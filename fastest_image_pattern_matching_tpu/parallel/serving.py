"""Data-parallel sharded serving paths beyond the NCC matcher.

parallel.matcher shards the flagship NCC pipeline over a
('data', 'angle') mesh; the remaining serving entry points are
embarrassingly data-parallel and shard over a 1-D 'data' mesh here
(VERDICT r4 item 6):

  * orb_match_many_sharded — B sources vs one ORB template, template
    features computed per device (replicated, cheap — one detect), each
    device matching its B/n shard (reference analogue: repeated
    interactive runs, ORBMatch/ORBFeatureMatcher.cpp:21).
  * match_patterns_sharded — G same-shaped glyph patterns vs one source
    (the OCR demo loop, MatchTool/MatchToolDlg.cpp:714-771), glyph axis
    sharded, source pyramid computed per device.

Exactness: every per-item computation is the identical single-chip
program body; the partition cannot change any item's result, so outputs
equal the unsharded orb_match_many / match_patterns element-wise.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import MatchConfig
from ..types import LearnedPattern
from .mesh import DATA_AXIS


def make_data_mesh(devices=None) -> Mesh:
    """1-D 'data' mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (DATA_AXIS,))


# ---------------------------------------------------------------------------
# ORB serving, sharded over sources.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _orb_sharded(cfg, seed: int, mesh: Mesh):
    from ..models.orb import _match_against, detect_and_describe

    def per_device(sources_l, template):
        feats = detect_and_describe(template, cfg)
        return jax.lax.map(
            lambda s: _match_against(cfg, seed, s, feats), sources_l)

    fn = jax.shard_map(per_device, mesh=mesh,
                       in_specs=(P(DATA_AXIS), P()),
                       out_specs=P(DATA_AXIS), check_vma=False)
    return jax.jit(fn)


def orb_match_many_sharded(sources, template: np.ndarray,
                           cfg=None, seed: int = 0,
                           physics_shift_mm: float = 8.0,
                           mesh: Optional[Mesh] = None):
    """orb_match_many sharded over the data axis: B padded to a multiple
    of the mesh size, each device matches its shard against the
    (replicated) template features. Returns a list of B ORBResult equal
    to the unsharded path's."""
    from ..models.orb import ORBConfig, _result_from_packed
    from ..utils.imageio import ensure_gray
    cfg = cfg or ORBConfig()
    mesh = mesh or make_data_mesh()
    sources = np.asarray(sources)
    if sources.ndim == 4:
        sources = ensure_gray(sources)
    template = np.asarray(template)
    if template.ndim == 3:
        template = ensure_gray(template)
    if sources.ndim != 3:
        raise ValueError(f"sources must be [B, H, W], got {sources.shape}")
    B = sources.shape[0]
    nd = mesh.devices.size
    b_pad = (B + nd - 1) // nd * nd
    srcs = sources.astype(np.float32)
    if b_pad > B:
        srcs = np.pad(srcs, ((0, b_pad - B), (0, 0), (0, 0)))
    packed = np.asarray(_orb_sharded(cfg, seed, mesh)(
        jnp.asarray(srcs), jnp.asarray(template, jnp.float32)))[:B]
    return [_result_from_packed(packed[b], template.shape, physics_shift_mm)
            for b in range(B)]


# ---------------------------------------------------------------------------
# Glyph-set (multi-template) matching, sharded over patterns.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _glyphs_sharded(plan, equal1_key, mesh: Mesh):
    from ..models.template_matcher import _pack_result, build_stages
    from ..ops.pyramid import build_pyramid
    n_levels = len(equal1_key)

    def per_device(templs_stk_l, stats_stk_l, src, inv_mats, trans,
                   valid_wh, angles_arr, thr):
        stats0 = tuple((stats_stk_l[0, l, 0], stats_stk_l[0, l, 1],
                        stats_stk_l[0, l, 2], equal1_key[l])
                       for l in range(n_levels))
        st0 = build_stages(plan, stats0, thr)
        pyr = build_pyramid(st0.prep_src(src), plan.top)

        def body(args):
            templs_g, st_g = args
            stats = tuple((st_g[l, 0], st_g[l, 1], st_g[l, 2],
                           equal1_key[l]) for l in range(n_levels))
            st = build_stages(plan, stats, thr)
            out = st.match_from_pyr(pyr, templs_g, inv_mats, trans,
                                    valid_wh, angles_arr)
            return _pack_result(out, plan.cfg.max_pos)

        return jax.lax.map(body, (templs_stk_l, stats_stk_l))

    fn = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P(), P(), P(), P(), P()),
        out_specs=P(DATA_AXIS), check_vma=False)
    return jax.jit(fn)


def match_patterns_sharded(src, patterns: Sequence[LearnedPattern],
                           cfg: Optional[MatchConfig] = None,
                           mesh: Optional[Mesh] = None
                           ) -> List[Dict[str, np.ndarray]]:
    """match_patterns with each shape group's glyph axis sharded over the
    mesh: G padded (repeating the first glyph; padding results are
    discarded), each device matches G/n glyphs against its own copy of
    the source pyramid. Result dicts equal the unsharded path's."""
    from ..models.template_matcher import (_make_plan, _plan_device_arrays,
                                           _shared_plan, _stats_key,
                                           _thr_dev, _unpack_result,
                                           match_arrays)
    cfg = cfg or MatchConfig()
    mesh = mesh or make_data_mesh()
    nd = mesh.devices.size

    groups: Dict[tuple, List[int]] = {}
    for i, p in enumerate(patterns):
        stats = tuple((lv.mean, lv.norm, lv.inv_area, lv.result_equal1)
                      for lv in p.levels)
        key = (tuple(p.shapes), _stats_key(stats), p.border_color)
        groups.setdefault(key, []).append(i)

    results: List[Optional[Dict[str, np.ndarray]]] = [None] * len(patterns)
    src_dev = src if isinstance(src, jnp.ndarray) else jnp.asarray(
        np.asarray(src), jnp.float32)
    if src_dev.ndim == 3:
        from ..utils.imageio import ensure_gray
        src_dev = ensure_gray(src_dev)
    if src_dev.dtype != jnp.float32:
        src_dev = src_dev.astype(jnp.float32)

    for (shapes, ekey, border), idxs in groups.items():
        rep = patterns[idxs[0]]
        plan = _make_plan(src_dev.shape, rep, cfg)
        n_levels = len(rep.levels)
        g_pad = (len(idxs) + nd - 1) // nd * nd
        pad_idxs = idxs + [idxs[0]] * (g_pad - len(idxs))
        templs_stk = tuple(
            jnp.stack([jnp.asarray(patterns[i].levels[l].templ)
                       for i in pad_idxs])
            for l in range(n_levels))
        stats_stk = jnp.asarray(
            [[[lv.mean, lv.norm, lv.inv_area]
              for lv in patterns[i].levels] for i in pad_idxs], jnp.float32)
        fn = _glyphs_sharded(_shared_plan(plan), ekey, mesh)
        packed = np.asarray(fn(templs_stk, stats_stk, src_dev,
                               *_plan_device_arrays(plan),
                               _thr_dev(plan.layer_scores)))
        for k, i in enumerate(idxs):
            out = _unpack_result(packed[k])
            if out.pop("nms_overflow", False) and plan.nms_cap < plan.c_max:
                out = match_arrays(np.asarray(src_dev), patterns[i], cfg)
                out.pop("nms_overflow", None)
            results[i] = out
    return results
