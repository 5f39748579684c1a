"""Real 2-process jax.distributed matching (SURVEY §4: multi-host tests
that a sharded run merges to the identical match list as single-chip).

Spawns two fresh interpreter processes, each contributing 4 forced CPU
devices to one global 8-device mesh through init_distributed +
make_mesh + match_batch_sharded (the exact path a pod slice uses);
process 0 writes a verdict after asserting the merged result equals
match_arrays."""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_worker.py")


def test_two_process_distributed_match(tmp_path):
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    out_file = tmp_path / "verdict.json"

    env = dict(os.environ)
    # The workers set their own forced-device-count; drop the suite's.
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER,
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--out", str(out_file)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outputs = []
    try:
        rcs = [p.wait(timeout=360) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
            outputs.append(p.stdout.read().decode())
    assert rcs == [0, 0], "\n".join(outputs)

    verdict = json.loads(out_file.read_text())
    assert verdict["ok"], verdict
    assert verdict["num_processes"] == 2
    assert verdict["global_devices"] == 8
    assert verdict["matches_per_image"] == [2, 1, 3]
