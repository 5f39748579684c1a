"""ORB path timing on the TPU — the analogue of the reference's per-stage
ms printout (ORBFeatureMatcher.cpp:46-47 detect, :62-64 match, :111-113
RANSAC, :152-154 inliers).

Stage timing protocol (CLAUDE.md): the tunnel charges a ~24 ms round trip
per dispatch and block_until_ready is unreliable, so stages are measured
as PIPELINE PREFIXES — each prefix jitted as one program over varied
inputs, timed by host readback, consecutive prefixes subtracted. The
end-to-end number is what a deployment pays; prefix deltas attribute it.

Output: one JSON object (committed as ORB_r03.json by the round harness).
Usage: timeout 1200 python tools/orb_bench.py  (or via tpu_job_server)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def run_orb_bench(log=print):
    import cv2
    import jax
    import jax.numpy as jnp
    from fastest_image_pattern_matching_tpu.models.orb import (
        ORBConfig, detect_and_describe, hamming_match, orb_match,
        ransac_homography)

    TI = "/root/reference/Test Images"
    src_full = cv2.imread(f"{TI}/Src8.bmp", cv2.IMREAD_GRAYSCALE)
    tpl = cv2.imread(f"{TI}/Dst8.bmp", cv2.IMREAD_GRAYSCALE)
    crop = src_full[215:480, 0:334]   # single-instance region (see
    # tests/test_orb_cv2_parity.py) — the well-posed one-homography case
    cfg = ORBConfig()

    # End-to-end (host orchestration incl. several dispatches).
    res = orb_match(crop, tpl, cfg)
    e2e = []
    for i in range(3):
        c_var = np.clip(crop.astype(np.int32) + i, 0, 255).astype(np.uint8)
        t0 = time.perf_counter()
        r = orb_match(c_var, tpl, cfg)
        e2e.append((time.perf_counter() - t0) * 1000)
    e2e_ms = sorted(e2e)[1]

    # Pipeline prefixes, each as one jitted program over the source image
    # (the template side is constant — folded in where needed).
    pt, dt_desc, vt = detect_and_describe(tpl, cfg)

    def p1_detect(img):
        ps, ds, vs = detect_and_describe(img, cfg)
        return jnp.sum(ps) + jnp.sum(ds)

    def p2_match(img):
        ps, ds, vs = detect_and_describe(img, cfg)
        ti, dist = hamming_match(ds, vs, dt_desc, vt)
        return jnp.sum(ti) + jnp.sum(jnp.where(jnp.isfinite(dist), dist, 0))

    def p3_ransac(img):
        ps, ds, vs = detect_and_describe(img, cfg)
        ti, dist = hamming_match(ds, vs, dt_desc, vt)
        N = min(cfg.max_good_matches, dist.shape[0])
        neg = jnp.where(jnp.isfinite(dist), -dist, -jnp.inf)
        _, order = jax.lax.top_k(neg, N)
        H, mask = ransac_homography(ps[order], pt[ti[order]],
                                    jnp.isfinite(dist[order]),
                                    cfg.ransac_threshold, cfg.ransac_iters)
        return jnp.sum(H) + jnp.sum(mask)

    # detect_and_describe builds the image pyramid in python over jax ops —
    # jit the whole prefix so each is ONE program.
    prefixes = {"detect": p1_detect, "match": p2_match, "ransac": p3_ransac}
    ms = {}
    for name, fn in prefixes.items():
        jf = jax.jit(fn)
        img0 = jnp.asarray(crop, jnp.float32)
        float(jf(img0))  # compile + warm
        ts = []
        for i in range(1, 4):
            v = img0 + np.float32(i)  # descriptors shift-invariant enough
            float(v[0, 0])
            t0 = time.perf_counter()
            float(jf(v))
            ts.append((time.perf_counter() - t0) * 1000)
        ms[name] = sorted(ts)[1]
        log(f"prefix {name}: {ms[name]:.1f} ms")

    out = {
        "metric": "orb_stage_timing",
        "image_hw": list(crop.shape),
        "template_hw": list(tpl.shape),
        "e2e_ms": round(e2e_ms, 1),
        "prefix_ms": {k: round(v, 1) for k, v in ms.items()},
        "stage_ms": {
            "detect_describe_both": round(ms["detect"], 1),
            "hamming_match": round(ms["match"] - ms["detect"], 1),
            "ransac_lo": round(ms["ransac"] - ms["match"], 1),
        },
        "is_matched": bool(res.is_matched),
        "num_inliers": int(res.num_inliers),
        "reference_note": "reference prints detect/match/RANSAC/inlier ms "
                          "to stdout (ORBFeatureMatcher.cpp:46-64,111-113); "
                          "no absolute numbers published to compare against",
    }
    return out


def main():
    out = run_orb_bench()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
