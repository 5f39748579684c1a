"""Scaling-efficiency measurement: sharded corpus throughput vs mesh size.

NOTE: virtual CPU "devices" share the same physical cores, so efficiency
numbers there only validate the mechanism; meaningful efficiency requires
real chips (one process per host + init_distributed on a pod slice).

BASELINE.json asks for >=85% scaling efficiency 1 host -> N hosts. Real
multi-chip hardware is unavailable in this environment (one v5e behind a
tunnel); this harness measures the sharded pipeline on whatever devices
exist (e.g. a forced 8-device CPU mesh: JAX_PLATFORMS=cpu XLA_FLAGS=
--xla_force_host_platform_device_count=8 python tools/scaling_bench.py)
and prints throughput per mesh size. On a real pod slice the same script
measures true scaling (run one process per host with init_distributed).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import os
    import jax
    # sitecustomize pre-imports jax with the axon TPU platform; env vars
    # are read too early — re-apply the requested platform via config.
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)
    import cv2
    import fastest_image_pattern_matching_tpu as fipm
    from fastest_image_pattern_matching_tpu.parallel.matcher import (
        match_batch_sharded)
    from fastest_image_pattern_matching_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    t = np.full((48, 64), 30, np.uint8)
    cv2.rectangle(t, (4, 4), (59, 43), 210, 2)
    cv2.line(t, (8, 8), (56, 40), 255, 3)
    B = 16
    scenes = []
    for _ in range(B):
        s = rng.integers(0, 30, (480, 640), np.uint8)
        y, x = rng.integers(0, 432), rng.integers(0, 576)
        s[y:y + 48, x:x + 64] = t
        scenes.append(s)
    scenes = np.stack(scenes)
    pattern = fipm.learn_pattern(t, 256)
    cfg = fipm.MatchConfig(max_pos=2, score=0.7, tolerance_angle=180.0)

    n = len(jax.devices())
    results = {}
    sizes = [s for s in (1, 2, 4, 8, 16) if s <= n]
    for nd in sizes:
        # Corpus throughput shards the data (image) axis.
        mesh = make_mesh((nd, 1), devices=jax.devices()[:nd])
        out = match_batch_sharded(scenes, pattern, cfg, mesh)  # compile
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            out = match_batch_sharded(scenes, pattern, cfg, mesh)
        dt = (time.perf_counter() - t0) / iters
        results[nd] = B / dt
        print(f"mesh data={nd}: {B / dt:.2f} img/s", flush=True)

    base = results[sizes[0]]
    effs = {nd: results[nd] / (base * nd / sizes[0]) for nd in sizes}

    # Per-device compute vs angle-axis size: XLA cost analysis of the
    # compiled SPMD module. With the sweep AND descent sharded over
    # 'angle' (round 4), per-device FLOPs must fall ~1/na; before, the
    # descent was replicated and the curve flattened at the sweep
    # fraction. This is the op-count evidence SCALING asks for (virtual
    # CPU devices share cores, so wall-clock cannot show it).
    from fastest_image_pattern_matching_tpu.models.template_matcher import (
        _shared_plan)
    from fastest_image_pattern_matching_tpu.parallel.matcher import (
        _compiled_sharded, _prep_sharded_args)
    flops_by_na = {}
    for na in [s for s in (1, 2, 4, 8) if s <= n]:
        mesh = make_mesh((1, na), devices=jax.devices()[:na])
        plan, ekey, _spans, call_args, _b = _prep_sharded_args(
            scenes[:1], pattern, cfg, mesh)
        comp = _compiled_sharded(_shared_plan(plan), ekey, mesh).lower(
            *call_args[1:]).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops_by_na[na] = float(ca["flops"])
        print(f"angle axis na={na}: per-device GFLOP "
              f"{flops_by_na[na] / 1e9:.3f}", flush=True)
    f1 = flops_by_na.get(1)
    flops_frac = {str(k): round(v / f1, 4) for k, v in flops_by_na.items()} \
        if f1 else {}

    # Descent-specific per-device work: each angle-axis device descends
    # ceil(C/na) of the C candidates (parallel/matcher.py shard_c). Lower
    # st.descend at exactly that candidate count and read XLA's flop
    # count — the direct "per-device descent work ∝ 1/na" evidence.
    # (The total-flops table above includes a replicated floor that is
    # deliberate MXU overprovisioning — the banded pyr_down matmuls and
    # the one-hot NMS clips are flop-heavy but wall-cheap.)
    import jax.numpy as jnp
    from fastest_image_pattern_matching_tpu.models.template_matcher import (
        _make_plan, _top_sweep_arrays, build_stages)
    from fastest_image_pattern_matching_tpu.ops.pyramid import build_pyramid
    plan = _make_plan(scenes.shape[1:], pattern, cfg)
    stats = tuple((lv.mean, lv.norm, lv.inv_area, lv.result_equal1)
                  for lv in pattern.levels)
    st = build_stages(plan, stats)
    inv, trans, vwh, angs = _top_sweep_arrays(plan)
    templs = tuple(jnp.asarray(lv.templ) for lv in pattern.levels)
    pyr = [jnp.asarray(p) for p in jax.jit(build_pyramid, static_argnums=1)(
        jnp.asarray(scenes[0], jnp.float32), plan.top)]
    vals, locs = jax.jit(st.sweep_maps)(pyr[plan.top], templs[plan.top],
                                        jnp.asarray(inv), jnp.asarray(vwh))
    pt, ang, score, alive = jax.jit(st.select_candidates)(
        vals, locs, jnp.asarray(trans), jnp.asarray(angs))
    C = pt.shape[0]
    descent_flops = {}
    # Lower with one full-size candidate chunk: XLA's cost analysis counts
    # a while-loop body once regardless of trip count, so the production
    # chunked pipeline hides the candidate-count scaling from the metric
    # (at runtime the loop trips scale with alive candidates instead).
    from fastest_image_pattern_matching_tpu.models import (
        template_matcher as tm)
    saved_budget = tm._CHUNK_BUDGET_ELEMS
    saved_chunk = tm._descend_chunk
    tm._CHUNK_BUDGET_ELEMS = 1 << 62
    tm._descend_chunk = lambda roi_hw, templ_px, k_ang: 1 << 30
    try:
        st_big = build_stages(plan, stats)
        for na in [s for s in (1, 2, 4, 8) if s <= n]:
            cl = -(-C // na)
            comp = jax.jit(lambda *a: st_big.descend(*a)).lower(
                pyr, templs, pt[:cl], ang[:cl], score[:cl],
                alive[:cl]).compile()
            ca = comp.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            descent_flops[na] = float(ca["flops"])
            print(f"descent per-device (na={na}, {cl}/{C} candidates): "
                  f"{descent_flops[na] / 1e6:.1f} MFLOP", flush=True)
    finally:
        tm._CHUNK_BUDGET_ELEMS = saved_budget
        tm._descend_chunk = saved_chunk
    d1 = descent_flops.get(1)
    descent_frac = {str(k): round(v / d1, 4)
                    for k, v in descent_flops.items()} if d1 else {}

    print(json.dumps({
        "throughput_img_s": results,
        "scaling_efficiency": {str(k): round(v, 3) for k, v in effs.items()},
        "per_device_flops_vs_angle_axis": flops_by_na,
        "per_device_flops_fraction_of_na1": flops_frac,
        "descent_per_device_flops": descent_flops,
        "descent_per_device_fraction_of_na1": descent_frac,
        "note": ("virtual CPU devices share physical cores: throughput "
                 "validates mechanism only; the flops tables are the "
                 "per-device work evidence (sweep+descent shard over "
                 "'angle'; the total includes a replicated floor from "
                 "deliberately MXU-overprovisioned pyr_down/NMS one-hot "
                 "matmuls, flop-heavy but wall-cheap)"),
    }))


if __name__ == "__main__":
    main()
