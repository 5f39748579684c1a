"""Stage timers / tracing helpers."""

import jax.numpy as jnp

from fastest_image_pattern_matching_tpu.utils.profiling import (
    StageTimer, device_trace)


def test_stage_timer(tmp_path):
    t = StageTimer()
    with t.stage("a"):
        pass
    x = jnp.ones((8, 8)).sum()
    with t.stage("b", sync=x):
        pass
    s = t.summary()
    assert set(s) == {"a", "b"}
    assert all(v >= 0 for v in s.values())
    t.dump(str(tmp_path / "t.json"))
    assert (tmp_path / "t.json").exists()


def test_device_trace_noop():
    with device_trace(None):
        pass
