"""One process of a multi-host (jax.distributed) sharded-match check.

Spawned N times by tests/test_multihost.py (and usable standalone on a
real pod slice, one invocation per host):

    python tools/multihost_worker.py --coordinator 127.0.0.1:PORT \
        --num-processes 2 --process-id K --out /tmp/verdict.json

Each process contributes its local CPU devices (forced to 4 via
XLA_FLAGS) to a global 8-device ('data', 'angle') mesh, runs the public
match_batch_sharded over it, and process 0 asserts the globally-merged
match list equals the single-chip match_arrays result — SURVEY §4's
"multi-host tests that a sharded run merges to the identical match
list", exercising init_distributed (parallel/mesh.py) for real.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_problem():
    import cv2
    import numpy as np
    rng = np.random.default_rng(11)
    t = np.full((40, 56), 30, np.uint8)
    cv2.rectangle(t, (4, 4), (51, 35), 200, 2)
    cv2.line(t, (8, 8), (48, 30), 255, 3)
    cv2.circle(t, (18, 26), 6, 120, -1)

    def scene(poses, hw=(300, 380)):
        s = rng.integers(0, 30, size=hw, dtype=np.uint8)
        for (y, x) in poses:
            s[y:y + 40, x:x + 56] = t
        return s

    scenes = np.stack([
        scene([(40, 60), (180, 200)]),
        scene([(100, 150)]),
        scene([(20, 30), (150, 80), (200, 280)]),
    ])
    return t, scenes


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--local-devices", type=int, default=4)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from fastest_image_pattern_matching_tpu.parallel.mesh import (
        init_distributed, make_mesh)
    init_distributed(args.coordinator, args.num_processes, args.process_id)
    assert jax.process_count() == args.num_processes, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == args.num_processes * args.local_devices, n_global

    import numpy as np
    from fastest_image_pattern_matching_tpu import (MatchConfig,
                                                    learn_pattern,
                                                    match_arrays)
    from fastest_image_pattern_matching_tpu.parallel.matcher import (
        match_batch_sharded)

    t, scenes = build_problem()
    pat = learn_pattern(t, 256)
    cfg = MatchConfig(max_pos=4, score=0.7, tolerance_angle=180.0,
                      max_overlap=0.2)
    mesh = make_mesh((2, n_global // 2))
    out = match_batch_sharded(scenes, pat, cfg, mesh)

    verdict = {"ok": True, "process_id": args.process_id,
               "num_processes": jax.process_count(),
               "global_devices": n_global,
               "mesh": list(mesh.devices.shape),
               "matches_per_image": [int(v.sum()) for v in out["valid"]]}
    try:
        for b in range(scenes.shape[0]):
            ref = match_arrays(scenes[b], pat, cfg)
            np.testing.assert_array_equal(out["valid"][b], ref["valid"])
            nv = int(ref["valid"].sum())
            np.testing.assert_allclose(out["score"][b][:nv],
                                       ref["score"][:nv], atol=1e-5)
            np.testing.assert_allclose(out["center"][b][:nv],
                                       ref["center"][:nv], atol=1e-3)
            np.testing.assert_allclose(out["angle"][b][:nv],
                                       ref["angle"][:nv], atol=1e-3)
    except AssertionError as e:
        verdict["ok"] = False
        verdict["error"] = str(e)

    if args.out and args.process_id == 0:
        with open(args.out, "w") as f:
            json.dump(verdict, f)
    print(f"[proc {args.process_id}] {verdict}")
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
