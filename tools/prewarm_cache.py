"""Pre-warm the persistent XLA compile cache for a deployment's configs.

Cold compile is the TPU tax a library user pays on first call
(COLD artifacts: 10-80 s per (shape, config) truly cold, seconds with a
warm disk cache). This tool compiles every config you list — the suite's
by default — into .jax_cache ahead of time, so a fresh process's first
match pays only cache deserialization (the COLD_r03 "warm" number).

Works on any backend (CPU prewarm is useless for the TPU — the cache key
includes the platform — so run this ON the deployment machine, e.g. via
tpu_job_server). Usage:
    python tools/prewarm_cache.py            # suite configs
    prewarm(shapes_and_cfgs, log)            # from a job
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _enable_cache():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


PACK_DIR = "/root/repo/.aot_packs"


def prewarm_suite(batch: int = 8, log=print, export_packs: bool = False):
    """Compile the full Test1-7 suite's single-frame AND batched programs
    (plus the flagship's) into the persistent cache.

    export_packs=True additionally writes an AOT pack per config into
    PACK_DIR (fipm.export_match_pack) and runs each pack's programs once
    so their (differently-keyed) executables are also cache-resident —
    the full deployment prewarm."""
    _enable_cache()
    import os
    import cv2
    import jax.numpy as jnp
    import fastest_image_pattern_matching_tpu as fipm
    from suite_bench import IMG_DIR, TESTS, _load_scene

    if export_packs:
        os.makedirs(PACK_DIR, exist_ok=True)
    done = []
    for name, s, d, kw, _refs, _expect, _note in TESTS:
        tpl = cv2.imread(f"{IMG_DIR}/{d}", cv2.IMREAD_GRAYSCALE)
        src = _load_scene(s, tpl) if tpl is not None else None
        if src is None or tpl is None:
            continue
        cfg = fipm.MatchConfig(**kw)
        pattern = fipm.learn_pattern(tpl, cfg.min_reduce_area)
        src_dev = jnp.asarray(src, jnp.float32)
        t0 = time.perf_counter()
        fipm.match(src_dev, pattern, cfg)
        t1 = time.perf_counter()
        stack = jnp.stack([src_dev] * batch)
        fipm.match_many(stack, pattern, cfg, batch_bucket=batch)
        t2 = time.perf_counter()
        msg = f"{name}: single {t1 - t0:.1f}s, batched {t2 - t1:.1f}s"
        if export_packs:
            path = os.path.join(PACK_DIR, f"{name}.npz")
            fipm.export_match_pack(path, pattern, cfg, src.shape,
                                   batch_sizes=(batch,),
                                   include_executables=True)
            m = fipm.AotMatcher.load(path)
            m.match(src_dev)          # compile the pack's programs into
            m.match_many(stack)       # the persistent cache
            t3 = time.perf_counter()
            msg += f", aot pack+warm {t3 - t2:.1f}s"
        log(msg)
        done.append(name)

    # The flagship bench config (bench.py — the driver's headline run).
    sys.path.insert(0, "/root/repo")
    from bench import REFERENCE_MS, _build_src7_like  # noqa: F401
    scene, templ = _build_src7_like()
    pattern = fipm.learn_pattern(templ, 256)
    cfg = fipm.MatchConfig(max_pos=3, score=0.7, tolerance_angle=180.0,
                           max_overlap=0.1, use_subpixel=True)
    scene_dev = jnp.asarray(scene, jnp.float32)
    t0 = time.perf_counter()
    fipm.match(scene_dev, pattern, cfg)
    fipm.match_many(jnp.stack([scene_dev] * 8), pattern, cfg,
                    batch_bucket=8)
    log(f"flagship: single+batched {time.perf_counter() - t0:.1f}s")
    done.append("flagship")
    return done


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo/tools")
    prewarm_suite()
