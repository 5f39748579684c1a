"""Device health probe (runs on CPU in tests — must pass)."""

from fastest_image_pattern_matching_tpu.utils.health import check_device


def test_check_device_cpu():
    assert check_device(timeout_s=120.0, platform="cpu")


def test_claim_healthy_window_healthy():
    from fastest_image_pattern_matching_tpu.utils.health import (
        claim_healthy_window)
    out = claim_healthy_window(max_wait_s=30.0, floor_threshold_ms=1e4)
    assert out["healthy"] and out["attempts"] == 1
    assert out["floor_ms"] is not None and out["floor_ms"] >= 0.0


def test_claim_healthy_window_floor_deadline():
    """An impossible floor threshold must time out with healthy=False
    (bench callers then record the degraded window instead of hanging)."""
    from fastest_image_pattern_matching_tpu.utils.health import (
        claim_healthy_window)
    out = claim_healthy_window(max_wait_s=1.0, floor_threshold_ms=-1.0,
                               retry_gap_s=0.5)
    assert not out["healthy"]
    assert out["floor_ms"] is not None
