"""One-shot pallas-warp validation on the real chip.

Run when the axon terminal is healthy. Strictly sequential steps, each
printed before it runs, each forced via host readback (block_until_ready
is unreliable through the tunnel). If a step hangs, the log shows exactly
which. Usage: timeout 560 python tools/tpu_pallas_experiment.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fastest_image_pattern_matching_tpu.ops.pallas.warp_kernel import (
    warp_affine_pallas)
from fastest_image_pattern_matching_tpu.ops.ncc import ncc_score_map
from fastest_image_pattern_matching_tpu.utils import geometry


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def make_inv(seed, B, center):
    r = np.random.default_rng(seed)
    mats = []
    for _ in range(B):
        m = geometry.rotation_matrix(center, r.uniform(-180, 180))
        m[0, 2] += r.uniform(-500, 500)
        m[1, 2] += r.uniform(-500, 500)
        mats.append(geometry.invert_affine(m))
    return jnp.asarray(np.array(mats), jnp.float32)


def main():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (3036, 4024)).astype(np.float32)
    srcj = jnp.asarray(src)
    out_hw = (527, 768)
    center = (2011.5, 1517.5)

    log("step 0: trivial op")
    print(float(jnp.ones((64, 64)).sum()), flush=True)

    for B in (2, 8, 32, 96):
        log(f"step warp B={B}: compile+run (np.asarray forced)")
        t0 = time.time()
        out = np.asarray(warp_affine_pallas(srcj, make_inv(0, B, center), out_hw, 0.0))
        log(f"  done in {time.time()-t0:.2f}s mean={out.mean():.3f}")
        t0 = time.time()
        out = np.asarray(warp_affine_pallas(srcj, make_inv(1, B, center), out_hw, 0.0))
        log(f"  second (cached compile): {time.time()-t0:.2f}s")

    log("step fused: pallas warp + ncc inside one jit (layer-0 shapes)")
    templ = rng.integers(0, 256, (521, 762)).astype(np.float32)
    mean = float(templ.mean())
    var = float(((templ - mean) ** 2).mean())
    norm = float(np.sqrt(var) * np.sqrt(templ.size))

    @jax.jit
    def fused(s, m, t):
        roi = warp_affine_pallas(s, m, out_hw, 0.0)
        return ncc_score_map(t_canv := roi, t, mean, norm, 1.0 / t.size,
                             False, "bf16", method="conv")

    t0 = time.time()
    sm = np.asarray(fused(srcj, make_inv(2, 24, center), jnp.asarray(templ)))
    log(f"  fused 24 maps done in {time.time()-t0:.2f}s shape={sm.shape} "
        f"max={sm.max():.3f}")
    t0 = time.time()
    sm = np.asarray(fused(srcj, make_inv(3, 24, center), jnp.asarray(templ)))
    log(f"  fused second: {time.time()-t0:.2f}s")
    log("ALL OK — safe to enable FIPM_WARP_IMPL=pallas")


if __name__ == "__main__":
    main()
