"""Long-lived TPU job server.

The tunnelled terminal charges each new process a long device-claim
penalty; this server claims once and then executes submitted job files
in-process, indefinitely.

Protocol: drop `NNN_name.py` files into /tmp/tpu_jobs/ — each is executed
(exec) in a fresh namespace with helpers {jax, jnp, np, log} provided;
stdout goes to `NNN_name.out`, and `NNN_name.done` (or .err) marks
completion. Jobs run in submission order. A file named STOP shuts the
server down.

Usage: nohup python tools/tpu_job_server.py > /tmp/tpu_server.log 2>&1 &
"""

import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)


def main():
    print(f"[{time.strftime('%H:%M:%S')}] server: importing jax + claiming "
          "device (may take a long time)...", flush=True)
    import jax
    # sitecustomize pre-imports jax, so the env vars above are too late;
    # config.update works post-import (same pattern as bench.py).
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    import numpy as np
    t0 = time.time()
    v = float((jnp.arange(1024, dtype=jnp.float32) * 2).sum())
    assert abs(v - 1047552.0) < 1, v
    print(f"[{time.strftime('%H:%M:%S')}] server: device claimed+verified "
          f"({time.time()-t0:.1f}s); polling {JOBS}", flush=True)

    seen = set()
    while True:
        if os.path.exists(os.path.join(JOBS, "STOP")):
            print("server: STOP", flush=True)
            return
        jobs = sorted(f for f in os.listdir(JOBS)
                      if f.endswith(".py") and f not in seen)
        if not jobs:
            time.sleep(2.0)
            continue
        for j in jobs:
            seen.add(j)
            path = os.path.join(JOBS, j)
            out_path = path[:-3] + ".out"
            print(f"[{time.strftime('%H:%M:%S')}] server: running {j}",
                  flush=True)
            import contextlib

            class _Tee:
                """Line-buffered tee to the .out file — long jobs stream
                their progress instead of dumping output at the end."""
                def __init__(self, f):
                    self.f = f

                def write(self, s):
                    self.f.write(s)
                    self.f.flush()
                    return len(s)

                def flush(self):
                    self.f.flush()

            outf = open(out_path, "w")
            tee = _Tee(outf)

            def log(m):
                line = f"[{time.strftime('%H:%M:%S')}] {m}"
                tee.write(line + "\n")
                print(line, flush=True)

            ns = {"jax": jax, "jnp": jnp, "np": np, "log": log,
                  "__name__": "__tpu_job__"}
            try:
                with contextlib.redirect_stdout(tee):
                    exec(compile(open(path).read(), path, "exec"), ns)
                outf.close()
                open(path[:-3] + ".done", "w").write("ok")
            except BaseException:  # incl. SystemExit from jobs' sys.exit()
                tee.write(traceback.format_exc())
                outf.close()
                open(path[:-3] + ".err", "w").write("err")
            print(f"[{time.strftime('%H:%M:%S')}] server: finished {j}",
                  flush=True)


if __name__ == "__main__":
    main()
