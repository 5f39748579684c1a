"""Stage-by-stage device timing of the flagship match on the current
platform. Usage: python tools/profile_stages.py [small|flagship]"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n * 1000, out


def main():
    from bench import _build_src7_like
    import fastest_image_pattern_matching_tpu as fipm
    from fastest_image_pattern_matching_tpu.models.template_matcher import (
        _make_plan, _top_sweep_arrays, build_stages)
    from fastest_image_pattern_matching_tpu.ops.pyramid import build_pyramid
    from fastest_image_pattern_matching_tpu.ops.ncc import ncc_score_map
    from fastest_image_pattern_matching_tpu.ops.warp import warp_affine_batch

    mode = sys.argv[1] if len(sys.argv) > 1 else "flagship"
    if mode == "flagship":
        scene, templ = _build_src7_like()
    else:
        rng = np.random.default_rng(0)
        scene = rng.integers(0, 255, (1236, 1628), np.uint8)
        templ = rng.integers(0, 255, (102, 140), np.uint8)

    pattern = fipm.learn_pattern(templ, 256)
    cfg = fipm.MatchConfig(max_pos=3, score=0.7, tolerance_angle=180.0,
                           max_overlap=0.1)
    plan = _make_plan(scene.shape, pattern, cfg)
    inv_mats, trans, valid_wh, angles_arr = _top_sweep_arrays(plan)
    stats = tuple((lv.mean, lv.norm, lv.inv_area, lv.result_equal1)
                  for lv in pattern.levels)
    st = build_stages(plan, stats)
    templs = tuple(jnp.asarray(lv.templ) for lv in pattern.levels)
    src = jnp.asarray(scene, jnp.float32)
    inv_j = jnp.asarray(inv_mats)
    trans_j = jnp.asarray(trans)
    vwh_j = jnp.asarray(valid_wh)
    ang_j = jnp.asarray(angles_arr)

    print(f"plan: top={plan.top} angles={len(plan.angles)} "
          f"canvas={plan.canvas_hw} C={plan.c_max} K={plan.k_peaks} "
          f"templ_shapes={plan.templ_shapes}")

    f_pyr = jax.jit(lambda s: build_pyramid(s, plan.top))
    ms, pyr = timeit(f_pyr, src)
    print(f"pyramid: {ms:.1f} ms")

    f_sweep = jax.jit(lambda s, im, vw: st.sweep_maps(s, templs[plan.top], im, vw))
    ms, (vals, locs) = timeit(f_sweep, pyr[plan.top], inv_j, vwh_j)
    print(f"top sweep (warp+ncc+peaks, A={len(plan.angles)}): {ms:.1f} ms")

    f_sel = jax.jit(lambda v, l: st.select_candidates(v, l, trans_j, ang_j))
    ms, cand = timeit(f_sel, vals, locs)
    print(f"select: {ms:.1f} ms")

    f_desc = jax.jit(lambda pyr_, c: st.descend(pyr_, templs, *c))
    ms, fin = timeit(f_desc, pyr, cand)
    print(f"descend (all layers): {ms:.1f} ms")

    f_finl = jax.jit(lambda f: st.finalize(*f))
    ms, out = timeit(f_finl, fin)
    print(f"finalize: {ms:.1f} ms")

    f_all = jax.jit(st.match_fn)
    ms, _ = timeit(f_all, src, templs, inv_j, trans_j, vwh_j, ang_j)
    print(f"end-to-end: {ms:.1f} ms")

    # Descent per-layer breakdown: time a single-layer warp+ncc on C*3 ROIs.
    for l in range(plan.top - 1, -1, -1):
        th_l, tw_l = plan.templ_shapes[l]
        B = plan.c_max * plan.k_ang
        invm = jnp.tile(jnp.asarray(np.array(
            [[[1.0, 0, 10], [0, 1.0, 10]]], np.float32)), (B, 1, 1))
        f_w = jax.jit(lambda s, m: warp_affine_batch(
            s, m, (th_l + 6, tw_l + 6), 0.0))
        ms_w, roi = timeit(f_w, pyr[l], invm)
        lv = pattern.levels[l]
        f_n = jax.jit(lambda r: ncc_score_map(
            r, templs[l], lv.mean, lv.norm, lv.inv_area, lv.result_equal1,
            cfg.compute_dtype))
        ms_n, _ = timeit(f_n, roi)
        print(f"  layer {l}: roi warp[{B}x{th_l+6}x{tw_l+6}] {ms_w:.1f} ms, "
              f"ncc {ms_n:.1f} ms")


if __name__ == "__main__":
    main()
