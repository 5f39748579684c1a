"""Device health probe (runs on CPU in tests — must pass)."""

from fastest_image_pattern_matching_tpu.utils.health import check_device


def test_check_device_cpu():
    assert check_device(timeout_s=120.0, platform="cpu")
