"""Stage-by-stage device timing of a match config on the current platform.

Times the REAL code paths: stages come from build_stages with the default
warp dispatch (Pallas kernel on TPU backends — NOT the gather fallback),
per-layer descent goes through descend_range (including the alive-first
sort and chunk skipping). Completion is forced by reading back a scalar
sum over every output leaf (jax.block_until_ready does not reliably block
through the axon tunnel), and inputs are varied per iteration by additive
offsets (the tunnel can serve repeated identical executions from a cache).
Every stage time therefore includes one dispatch+readback round-trip; the
"rt floor" line is the cost of a trivial op — subtract it mentally.

Usage: python tools/profile_stages.py [flagship|test1|test4|test5|test6|test7]
(or call profile_case(name, log) from a tpu_job_server job).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

IMG_DIR = "/root/reference/Test Images"


def _load_case(name):
    import cv2
    import fastest_image_pattern_matching_tpu as fipm

    if name == "flagship":
        from bench import _build_src7_like
        scene, templ = _build_src7_like()
        cfg = fipm.MatchConfig(max_pos=3, score=0.7, tolerance_angle=180.0,
                               max_overlap=0.1)
    elif name == "test1":
        scene = cv2.imread(f"{IMG_DIR}/Src9.bmp", cv2.IMREAD_GRAYSCALE)
        templ = cv2.imread(f"{IMG_DIR}/Dst9.bmp", cv2.IMREAD_GRAYSCALE)
        cfg = fipm.MatchConfig(max_pos=5, max_overlap=0.8, score=0.7,
                               tolerance_angle=180.0)
    elif name == "test4":
        scene = cv2.imread(f"{IMG_DIR}/Src3.bmp", cv2.IMREAD_GRAYSCALE)
        templ = cv2.imread(f"{IMG_DIR}/Dst3.bmp", cv2.IMREAD_GRAYSCALE)
        cfg = fipm.MatchConfig(max_pos=38, score=0.8, tolerance_angle=0.0,
                               min_reduce_area=256)
    elif name == "test5":
        scene = cv2.imread(f"{IMG_DIR}/Src4.bmp", cv2.IMREAD_GRAYSCALE)
        templ = cv2.imread(f"{IMG_DIR}/Dst4.bmp", cv2.IMREAD_GRAYSCALE)
        cfg = fipm.MatchConfig(max_pos=38, score=0.8, tolerance_angle=180.0,
                               min_reduce_area=256)
    elif name == "test6":
        scene = cv2.imread(f"{IMG_DIR}/Src6.jpg", cv2.IMREAD_GRAYSCALE)
        templ = cv2.imread(f"{IMG_DIR}/Dst6.bmp", cv2.IMREAD_GRAYSCALE)
        cfg = fipm.MatchConfig(max_pos=15, score=0.8, tolerance_angle=180.0,
                               min_reduce_area=256)
    elif name == "test7":
        from suite_bench import _synthetic_src10
        templ = cv2.imread(f"{IMG_DIR}/Dst10.jpg", cv2.IMREAD_GRAYSCALE)
        scene = _synthetic_src10(templ)
        cfg = fipm.MatchConfig(max_pos=100, score=0.5, tolerance_angle=0.0,
                               max_overlap=0.5, min_reduce_area=1024)
    else:
        raise SystemExit(f"unknown case {name}")
    return scene, templ, cfg


def profile_case(name="flagship", log=print, iters=3):
    import jax
    import jax.numpy as jnp
    import fastest_image_pattern_matching_tpu as fipm
    from fastest_image_pattern_matching_tpu.models.template_matcher import (
        _make_plan, _top_sweep_arrays, build_stages)
    from fastest_image_pattern_matching_tpu.ops.pyramid import build_pyramid

    def tree_sum(out):
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    def vary(args, i):
        # Offset every float leaf additively — enough to defeat result
        # caching without changing shapes/programs.
        return jax.tree_util.tree_map(
            lambda x: x + np.float32(i)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, args)

    def timeit(label, fn, *args):
        timed = jax.jit(lambda *a: tree_sum(fn(*a)))
        real = jax.jit(fn)
        out = real(*args)           # compile + real outputs for chaining
        float(tree_sum(out))        # force
        float(timed(*args))         # compile timed variant
        ts = []
        for i in range(1, iters + 1):
            a = vary(args, i)
            t0 = time.perf_counter()
            float(timed(*a))
            ts.append((time.perf_counter() - t0) * 1000)
        log(f"  {label}: {sorted(ts)[len(ts)//2]:.1f} ms")
        return out

    scene, templ, cfg = _load_case(name)
    pattern = fipm.learn_pattern(templ, cfg.min_reduce_area)
    plan = _make_plan(scene.shape, pattern, cfg)
    inv_mats, trans, valid_wh, angles_arr = _top_sweep_arrays(plan)
    stats = tuple((lv.mean, lv.norm, lv.inv_area, lv.result_equal1)
                  for lv in pattern.levels)
    st = build_stages(plan, stats)
    templs = tuple(jnp.asarray(lv.templ) for lv in pattern.levels)
    src = jnp.asarray(scene, jnp.float32)
    inv_j, trans_j = jnp.asarray(inv_mats), jnp.asarray(trans)
    vwh_j, ang_j = jnp.asarray(valid_wh), jnp.asarray(angles_arr)

    log(f"{name}: plan top={plan.top} stop={plan.stop} A={len(plan.angles)} "
        f"canvas={plan.canvas_hw} C={plan.c_max} K={plan.k_peaks} "
        f"k_ang={plan.k_ang} templ={plan.templ_shapes}")

    timeit("rt floor (trivial op)", lambda s: jnp.sum(s[:8, :8]), src)
    pyr = timeit("pyramid", lambda s: tuple(build_pyramid(s, plan.top)), src)
    vals, locs = timeit(
        "sweep (warp+ncc+peaks)",
        lambda s, im, vw: st.sweep_maps(s, templs[plan.top], im, vw),
        pyr[plan.top], inv_j, vwh_j)
    cand = timeit("select",
                  lambda v, l: st.select_candidates(v, l, trans_j, ang_j),
                  vals, locs)
    state = timeit("unrotate",
                   lambda c: (st.unrotate(c[0], c[1]),) + c[1:], cand)
    for l in range(plan.top - 1, plan.stop - 1, -1):
        state = timeit(
            f"descend layer {l} (templ {plan.templ_shapes[l]})",
            lambda p, s, ll=l: st.descend_range(p, templs, *s, ll, ll),
            tuple(pyr), state)
    scale = 1.0 if plan.stop == 0 else 2.0
    timeit("finalize (score sort + NMS)",
           lambda s: st.finalize(s[0] * scale, s[1], s[2], s[3]), state)
    timeit("end-to-end (single program)",
           lambda s: st.match_fn(s, templs, inv_j, trans_j, vwh_j, ang_j),
           src)


def main():
    for name in (sys.argv[1:] or ["flagship"]):
        profile_case(name)


if __name__ == "__main__":
    main()
