"""Test1-7 suite benchmark — e2e ms per README performance test vs the
reference's published i7-10700 numbers (README.md:59-71; BASELINE.md).

Test -> image mapping recovered from the README's Result-image links
(Test1->Result8.jpg, Test4->Result3.jpg, Test5->Result4.jpg,
Test6->Result6.jpg, Test7->Result9.jpg) and confirmed by inspecting the
screenshots against the surviving sources:
  Result8 = Src9 scene (e-clips + star washers, 4 matches) -> Test1=Src9/Dst9
  Result3 = Src3 scene (SMD LED strip, 36 matches)         -> Test4=Src3/Dst3
  Result4 = Src4 scene (bearing, ~24 rotated targets)      -> Test5=Src4/Dst4
  Result6 = Src6 scene (metal parts grid, 15 matches)      -> Test6=Src6/Dst6
  Result9 = Src10 scene (~100 round washers)               -> Test7=Src10/Dst10
Src1/2/5/7/10 are stripped blobs (.MISSING_LARGE_BLOBS): Test2/Test3 are
skipped (their scenes are unavailable), the Src7 flagship runs in bench.py
on an exact-shape synthetic reconstruction, and Test7 runs here on a
synthetic 3648x3648 scene with 100 planted real-Dst10 instances (the
BlockMax many-target regime, BASELINE config 4).

Parameters are the README's where stated. Test5 has none published; the
Result4 screenshot shows rotated matches, so tolerance 180 with Test4's
other parameters is assumed (noted in the output).

Timing protocol (axon tunnel): inputs varied per iteration by an integer
additive offset — NCC is invariant to additive constants (numerator and
denominator both mean-subtract), and round(bilinear(x)+i) == round(
bilinear(x))+i for integer i, so scores are bit-identical while every
iteration is a genuinely distinct execution (no tunnel result caching).
Completion forced by host readback.

Usage: timeout 1800 python tools/suite_bench.py   (or via tpu_job_server)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

TESTS = [
    # name, src, dst, cfg-kwargs, reference ms (plain, simd)
    ("Test1", "Src9.bmp", "Dst9.bmp",
     dict(max_pos=5, max_overlap=0.8, score=0.7, tolerance_angle=180.0),
     (164.0, 80.0), "caption says Score=0.8 but its own screenshot shows 4 "
     "matches at 0.70-0.76 (and the cv2 oracle agrees) -> UI-default 0.7"),
    ("Test4", "Src3.bmp", "Dst3.bmp",
     dict(max_pos=38, score=0.8, tolerance_angle=0.0, min_reduce_area=256),
     (21.0, None), ""),
    ("Test5", "Src4.bmp", "Dst4.bmp",
     dict(max_pos=38, score=0.8, tolerance_angle=180.0, min_reduce_area=256),
     (27.0, None), "params unpublished; tol=180 (Result4 shows rotations)"),
    ("Test6", "Src6.jpg", "Dst6.bmp",
     dict(max_pos=15, score=0.8, tolerance_angle=180.0, min_reduce_area=256),
     (1157.0, 657.0), ""),
    ("Test7", "@synthetic_src10", "Dst10.jpg",
     dict(max_pos=100, score=0.5, tolerance_angle=0.0, max_overlap=0.5,
          min_reduce_area=1024),
     (18.0, None), "Src10 stripped; synthetic 3648x3648 scene, "
     "100 planted real-Dst10 instances"),
]

IMG_DIR = "/root/reference/Test Images"


def _synthetic_src10(tpl):
    """3648x3648 scene with 100 planted Dst10 instances on a bright
    background (Result9.jpg regime: round washers on white)."""
    rng = np.random.default_rng(7)
    H = W = 3648
    scene = np.full((H, W), 235, np.uint8)
    scene = (scene - rng.integers(0, 12, (H, W), dtype=np.uint8))
    th, tw = tpl.shape
    n = 0
    attempts = 0
    placed = []
    while n < 100 and attempts < 10000:
        attempts += 1
        y = int(rng.integers(40, H - th - 40))
        x = int(rng.integers(40, W - tw - 40))
        if any(abs(y - py) < th + 6 and abs(x - px) < tw + 6
               for py, px in placed):
            continue
        scene[y:y + th, x:x + tw] = tpl
        placed.append((y, x))
        n += 1
    return scene


def run_suite(iters=5, log=print):
    import cv2
    import jax.numpy as jnp
    import fastest_image_pattern_matching_tpu as fipm

    rows = []
    for name, s, d, kw, (ref_ms, ref_simd_ms), note in TESTS:
        tpl = cv2.imread(f"{IMG_DIR}/{d}", cv2.IMREAD_GRAYSCALE)
        if s == "@synthetic_src10":
            src = _synthetic_src10(tpl) if tpl is not None else None
        else:
            src = cv2.imread(f"{IMG_DIR}/{s}", cv2.IMREAD_GRAYSCALE)
        if src is None or tpl is None:
            log(f"{name}: SKIP (missing {s}/{d})")
            continue
        cfg = fipm.MatchConfig(**kw)
        pattern = fipm.learn_pattern(tpl, cfg.min_reduce_area)
        src_dev = jnp.asarray(src, jnp.float32)

        t0 = time.perf_counter()
        res = fipm.match(src_dev, pattern, cfg)  # compile + warmup
        cold = (time.perf_counter() - t0) * 1000

        # Varied inputs materialized before the timed region (forced by a
        # scalar readback): input prep for the tunnel's cache-busting
        # protocol, not match work.
        variants = [src_dev + np.float32(i) for i in range(1, iters + 1)]
        for v in variants:
            float(v[0, 0])
        times = []
        for v in variants:
            ti = time.perf_counter()
            r2 = fipm.match(v, pattern, cfg)
            times.append((time.perf_counter() - ti) * 1000)
        ms = sorted(times)[len(times) // 2]
        assert len(r2) == len(res), "additive-offset invariance violated"

        row = {
            "test": name, "src": s, "dst": d,
            "src_hw": list(src.shape), "dst_hw": list(tpl.shape),
            "found": len(res),
            "top_scores": [round(r.score, 3) for r in res[:5]],
            "ms": round(ms, 1), "cold_ms": round(cold, 1),
            "ref_ms": ref_ms, "ref_simd_ms": ref_simd_ms,
            "vs_ref": round(ref_ms / ms, 2),
            "vs_ref_simd": (round(ref_simd_ms / ms, 2)
                            if ref_simd_ms else None),
            "note": note,
        }
        rows.append(row)
        log(f"{name} [{s} {src.shape} / {d} {tpl.shape}]: {ms:.1f} ms "
            f"(ref {ref_ms:.0f} / simd {ref_simd_ms or '-'}) "
            f"found={len(res)} {note}")
    return rows


def main():
    rows = run_suite()
    print(json.dumps({"suite": rows}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
