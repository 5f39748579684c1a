"""One-shot pallas-warp validation + bench on the real chip.

Waits for a verified-healthy device window, then runs strictly sequential
steps, each forced via host readback and validated semantically (the
tunnel can return garbage buffers mid-wedge). If every step passes it
finishes with a FIPM_WARP_IMPL=pallas bench run.

Usage: timeout 1800 python tools/tpu_pallas_experiment.py
"""

import os
import sys
import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache")
                       if "tools" not in __file__ else
                       _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
import time

import numpy as np

sys.path.insert(0, ".")

from fastest_image_pattern_matching_tpu.utils.health import wait_for_device


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    log("waiting for healthy device window...")
    if not wait_for_device(max_wait_s=1500.0, retry_gap_s=90.0):
        log("GIVING UP: device unresponsive")
        return 1
    log("device healthy")

    import jax
    import jax.numpy as jnp
    from fastest_image_pattern_matching_tpu.ops.pallas.warp_kernel import (
        warp_affine_pallas)
    from fastest_image_pattern_matching_tpu.ops.warp import warp_affine_batch
    from fastest_image_pattern_matching_tpu.ops.ncc import ncc_score_map
    from fastest_image_pattern_matching_tpu.utils import geometry

    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (3036, 4024)).astype(np.float32)
    srcj = jnp.asarray(src)
    out_hw = (527, 768)
    center = (2011.5, 1517.5)

    def make_inv(seed, B):
        r = np.random.default_rng(seed)
        mats = []
        for _ in range(B):
            m = geometry.rotation_matrix(center, r.uniform(-180, 180))
            m[0, 2] += r.uniform(-500, 500)
            m[1, 2] += r.uniform(-500, 500)
            mats.append(geometry.invert_affine(m))
        return jnp.asarray(np.array(mats), jnp.float32)

    # Reference result from the gather path for semantic validation.
    log("gather reference (B=2)")
    t0 = time.time()
    ref = np.asarray(warp_affine_batch(srcj, make_inv(0, 2), out_hw, 0.0))
    log(f"  gather B=2: {time.time()-t0:.2f}s mean={ref.mean():.3f}")

    for B in (2, 8, 32, 96):
        log(f"pallas B={B} compile+run")
        t0 = time.time()
        out = np.asarray(warp_affine_pallas(srcj, make_inv(0, B), out_hw,
                                            0.0))
        dt = time.time() - t0
        if B == 2:
            d = np.abs(out - ref)
            ok = d.max() <= 1.0 and (d > 0).mean() < 0.2
            log(f"  B=2 parity vs gather: max={d.max()} ok={ok}")
            if not ok:
                log("ABORT: parity failed (garbage outputs?)")
                return 1
        log(f"  done {dt:.2f}s mean={out.mean():.3f}")
        t0 = time.time()
        out = np.asarray(warp_affine_pallas(srcj, make_inv(1, B), out_hw,
                                            0.0))
        log(f"  steady: {time.time()-t0:.2f}s")

    log("fused pallas warp + ncc (24 maps, layer-0 shapes)")
    templ = rng.integers(0, 256, (521, 762)).astype(np.float32)
    mean = float(templ.mean())
    var = float(((templ - mean) ** 2).mean())
    norm = float(np.sqrt(var) * np.sqrt(templ.size))

    @jax.jit
    def fused(s, m, t):
        roi = warp_affine_pallas(s, m, out_hw, 0.0)
        return ncc_score_map(roi, t, mean, norm, 1.0 / t.size,
                             False, "bf16", method="conv")

    t0 = time.time()
    sm = np.asarray(fused(srcj, make_inv(2, 24), jnp.asarray(templ)))
    log(f"  fused done {time.time()-t0:.2f}s shape={sm.shape} "
        f"absmax={np.abs(sm).max():.3f}")
    t0 = time.time()
    sm = np.asarray(fused(srcj, make_inv(3, 24), jnp.asarray(templ)))
    log(f"  fused steady: {time.time()-t0:.2f}s")

    log("pallas validated — running bench with FIPM_WARP_IMPL=pallas")
    os.environ["FIPM_WARP_IMPL"] = "pallas"
    import runpy
    runpy.run_path("bench.py", run_name="__main__")
    return 0


if __name__ == "__main__":
    sys.exit(main())
