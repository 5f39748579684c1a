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
    import jax
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
    print(json.dumps({
        "throughput_img_s": results,
        "scaling_efficiency": {str(k): round(v, 3) for k, v in effs.items()},
    }))


if __name__ == "__main__":
    main()
