"""NCC correlation kernel roofline measurement (BASELINE: >=70% of MXU
roofline per chip).

Measures achieved MAC/s of the ccorr_conv MXU path on representative
shapes, against v5e peaks (~197 TFLOP/s bf16, ~394 TOP/s int8). Outputs
are forced via host readback with varied inputs (the tunnel fakes
block_until_ready and caches identical executions).

Usage: timeout 900 python tools/roofline_bench.py
"""

import json
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

V5E_PEAK = {"bf16": 197e12, "f32": 49e12, "int8": 394e12}


def main():
    from fastest_image_pattern_matching_tpu.utils.health import wait_for_device
    if not wait_for_device(max_wait_s=900.0, retry_gap_s=60.0):
        print(json.dumps({"error": "device unresponsive"}))
        return 1

    import jax
    import jax.numpy as jnp
    from fastest_image_pattern_matching_tpu.ops.ncc import ccorr_conv

    rng = np.random.default_rng(0)
    cases = [
        # (name, B, H, W, h, w) — top-sweep-like and refinement-like.
        ("top_sweep_small", 64, 128, 128, 16, 16),
        ("top_sweep_wide", 41, 256, 256, 32, 40),
        ("refine_large", 24, 527, 768, 521, 762),
        ("plain_medium", 8, 1024, 1024, 128, 128),
    ]
    out = {}
    for (name, B, H, W, h, w) in cases:
        templ = jnp.asarray(
            rng.integers(-128, 128, (h, w)).astype(np.float32))
        f = jax.jit(lambda s, t, d: jnp.sum(ccorr_conv(s, t, d)),
                    static_argnames="d")
        for dtype in ("bf16", "int8", "f32"):
            srcs = [jnp.asarray(rng.integers(-128, 128, (B, H, W))
                                .astype(np.float32)) for _ in range(4)]
            try:
                float(f(srcs[0], templ, dtype))  # compile
            except Exception as e:
                out[f"{name}/{dtype}"] = f"error: {str(e)[:60]}"
                continue
            t0 = time.perf_counter()
            for s in srcs[1:]:
                float(f(s, templ, dtype))
            dt = (time.perf_counter() - t0) / 3
            macs = B * (H - h + 1) * (W - w + 1) * h * w
            eff = macs * 2 / dt / V5E_PEAK.get(dtype, 197e12)
            out[f"{name}/{dtype}"] = {
                "ms": round(dt * 1000, 2),
                "tflops": round(macs * 2 / dt / 1e12, 2),
                "roofline_frac": round(eff, 3),
            }
            print(name, dtype, out[f"{name}/{dtype}"], flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    main()
