"""NCC correlation kernel roofline measurement (BASELINE: >=70% of MXU
roofline per chip).

Measures the correlation backends on the shapes each one actually covers
in the match pipeline (ops/ncc.py auto-dispatch):
  * shiftmm — pyramid-descent refinement (tiny output grid, big template)
  * banded  — many-target regime (small template over a huge map)
  * conv    — top-layer sweep shapes

Two rates are reported per case:
  * mxu_util     — issued MACs / time / peak (how busy the MXU is)
  * effective    — naive Ho*Wo*h*w MACs / time / peak (algorithmic rate;
                   banded/shiftmm trade redundant MACs for MXU-friendly
                   shapes, so effective < util by the redundancy factor)

Timing protocol (axon tunnel): R executions of the kernel over R distinct
inputs run inside ONE jitted scan with a single scalar readback, so the
~25 ms round-trip floor is amortized to R-th; the floor itself is measured
and subtracted. Usage: timeout 900 python tools/roofline_bench.py, or
run_roofline(log) from a tpu_job_server job.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

V5E_PEAK = {"bf16": 197e12, "f32": 49e12, "int8": 394e12}
R = 8  # in-program repetitions per measurement


def run_roofline(log=print):
    import jax
    import jax.numpy as jnp
    from fastest_image_pattern_matching_tpu.ops.ncc import (
        ccorr_banded, ccorr_conv, ccorr_shiftmm)

    rng = np.random.default_rng(0)

    kernels = {"conv": ccorr_conv, "banded": ccorr_banded,
               "shiftmm": ccorr_shiftmm}

    # (name, method, B, H, W, h, w, issued-MACs formula)
    def issued(method, B, H, W, h, w):
        Ho, Wo = H - h + 1, W - w + 1
        if method == "shiftmm":
            return B * H * W * Ho * Wo
        if method == "banded":
            return h * B * Ho * W * Wo
        return B * Ho * Wo * h * w

    cases = [
        ("refine_L0_flagship", "shiftmm", 24, 533, 774, 521, 762),
        ("refine_L1_flagship", "shiftmm", 24, 273, 393, 261, 381),
        ("many_target_sweep", "banded", 1, 1824, 1824, 27, 27),
        # Batch-scaling curve (round 3): the serving shape — B frames of
        # the many-target sweep in one contraction (match_many feeds the
        # banded backend [B, Ho, W] @ [W, Wo] with M = B*Ho). This is
        # where the MXU-target question is settled: either a row reaches
        # >=70%, or the curve documents the measured ceiling.
        ("many_target_sweep_B2", "banded", 2, 1824, 1824, 27, 27),
        ("many_target_sweep_B4", "banded", 4, 1824, 1824, 27, 27),
        ("many_target_sweep_B8", "banded", 8, 1824, 1824, 27, 27),
        ("many_target_sweep_B16", "banded", 16, 1824, 1824, 27, 27),
        ("test4_sweep", "banded", 1, 309, 407, 26, 35),
        ("test4_sweep_B16", "banded", 16, 309, 407, 26, 35),
        ("top_sweep_conv", "conv", 41, 128, 128, 16, 16),
        ("medium_conv", "conv", 8, 512, 512, 64, 64),
    ]

    def timed_scan(fn, stack, templ):
        def step(acc, s):
            return acc + jnp.sum(fn(s)), 0.0
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), stack)
        return acc

    # Round-trip floor.
    trivial = jax.jit(lambda x: jnp.sum(x[:8]))
    z = jnp.arange(1024, dtype=jnp.float32)
    float(trivial(z))
    floors = []
    for i in range(3):
        t0 = time.perf_counter()
        float(trivial(z + np.float32(i)))
        floors.append(time.perf_counter() - t0)
    floor = sorted(floors)[1]
    log(f"rt floor: {floor*1000:.1f} ms")

    out = {"floor_ms": round(floor * 1000, 2), "reps": R}
    for (name, method, B, H, W, h, w) in cases:
        templ = jnp.asarray(rng.integers(-128, 128, (h, w))
                            .astype(np.float32))
        # Big batches: fewer in-scan reps to bound the input stack's HBM
        # footprint (R*B*H*W f32).
        reps = R if B * H * W <= 32 * 1024 * 1024 else 4
        for dtype in ("bf16", "int8", "f32"):
            # int8 is real for every backend now (centered-u8 exact
            # scheme, int32 accumulation); skip only where the
            # accumulator gate would silently fall back to bf16.
            if dtype == "int8" and h * w * 128 * 128 >= 2**31:
                continue
            kern = kernels[method]
            f = jax.jit(lambda st, t, d: timed_scan(
                lambda s: kern(s, t, d), st, t), static_argnames="d")
            key = f"{name}/{method}/{dtype}"
            try:
                stack = jnp.asarray(rng.integers(-128, 128, (reps, B, H, W))
                                    .astype(np.float32))
                float(f(stack, templ, dtype))  # compile + warm
                ts = []
                for i in range(1, 4):
                    t0 = time.perf_counter()
                    float(f(stack + np.float32(i), templ, dtype))
                    ts.append(time.perf_counter() - t0)
                dt = max((sorted(ts)[1] - floor) / reps, 1e-6)
            except Exception as e:
                out[key] = f"error: {str(e)[:80]}"
                log(f"{key}: {out[key]}")
                continue
            Ho, Wo = H - h + 1, W - w + 1
            naive = B * Ho * Wo * h * w
            iss = issued(method, B, H, W, h, w)
            # Utilization against the peak of the dtype actually running
            # on the MXU (int8 cases are held to the 394-TOPS peak).
            peak = V5E_PEAK[dtype]
            out[key] = {
                "ms": round(dt * 1000, 3),
                "issued_tmacs": round(iss / 1e12, 4),
                # peak is FLOP/s; 1 MAC = 2 FLOPs.
                "mxu_util": round(iss * 2 / dt / peak, 3),
                "effective_frac": round(naive * 2 / dt / peak, 4),
            }
            log(f"{key}: {out[key]}")
    return out


def main():
    out = run_roofline()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    main()
