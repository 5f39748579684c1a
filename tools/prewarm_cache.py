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


def prewarm_suite(batch: int = 4, log=print):
    """Compile the full Test1-7 suite's single-frame AND batched programs
    (plus the flagship's) into the persistent cache."""
    _enable_cache()
    import cv2
    import jax.numpy as jnp
    import fastest_image_pattern_matching_tpu as fipm
    from suite_bench import IMG_DIR, TESTS, _load_scene

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
        log(f"{name}: single {t1 - t0:.1f}s, batched {t2 - t1:.1f}s")
        done.append(name)
    return done


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo/tools")
    prewarm_suite()
