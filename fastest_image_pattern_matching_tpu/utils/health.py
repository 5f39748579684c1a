"""Device health checking (failure detection, SURVEY.md §5).

The reference has no failure detection; this environment does need it:
the tunnelled TPU terminal can wedge (ops hang) or, worse, return
zero-filled buffers mid-wedge. check_device() runs a small known-answer
computation and verifies the VALUE, not just completion.
"""

from __future__ import annotations

import multiprocessing
import time


def _probe(q, platform):
    try:
        import jax
        if platform:
            jax.config.update("jax_platforms", platform)
        import jax.numpy as jnp
        v = float((jnp.arange(1024, dtype=jnp.float32) * 2).sum())
        q.put(abs(v - 1047552.0) < 1.0)
    except Exception:
        q.put(False)


def check_device(timeout_s: float = 90.0, platform: str = None) -> bool:
    """True iff a known-answer op completes with the right value in time.
    Runs in a subprocess so a wedged device cannot hang the caller."""
    ctx = multiprocessing.get_context("spawn")
    q = ctx.Queue()
    p = ctx.Process(target=_probe, args=(q, platform))
    p.start()
    p.join(timeout_s)
    if p.is_alive():
        p.terminate()
        p.join(5)
        return False
    try:
        return bool(q.get_nowait())
    except Exception:
        return False


def wait_for_device(max_wait_s: float = 1200.0, probe_timeout_s: float = 90.0,
                    retry_gap_s: float = 120.0, verbose: bool = True) -> bool:
    """Poll until the device passes the known-answer check (or give up)."""
    t0 = time.time()
    while True:
        if check_device(probe_timeout_s):
            return True
        if time.time() - t0 + retry_gap_s > max_wait_s:
            return False
        if verbose:
            import sys
            print(f"[health] device unresponsive; retrying in "
                  f"{retry_gap_s:.0f}s", file=sys.stderr, flush=True)
        time.sleep(retry_gap_s)
