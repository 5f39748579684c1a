"""Camera control surface (C14 closure, VERDICT r4 item 5): the
exposure/gain/trigger/scan control set of the reference's
CameraPreviewDialog (src/CameraPreviewDialog.cpp:310-661) on
VideoCaptureSource, exercised against a fake capture object."""

import numpy as np
import pytest

from fastest_image_pattern_matching_tpu.utils.sources import (
    VideoCaptureSource)

# cv2 only provides the CAP_PROP_* constants for the passthrough.
cv2 = pytest.importorskip("cv2")


class FakeCap:
    """Stands in for cv2.VideoCapture: records property sets, serves
    numbered frames."""

    def __init__(self, source, n_frames=100, openable=True):
        self.source = source
        self.props = {}
        self.n_frames = n_frames
        self.reads = 0
        self.released = False
        self._openable = openable

    def isOpened(self):
        return self._openable

    def set(self, prop, value):
        self.props[prop] = value
        return True

    def get(self, prop):
        return self.props.get(prop, 0.0)

    def read(self):
        if self.reads >= self.n_frames:
            return False, None
        self.reads += 1
        return True, np.full((24, 32), self.reads % 256, np.uint8)

    def release(self):
        self.released = True


def test_exposure_gain_applied_on_open():
    caps = []

    def factory(src):
        cap = FakeCap(src)
        caps.append(cap)
        return cap

    with VideoCaptureSource(0, exposure=8000.0, gain=2.5,
                            cap_factory=factory) as cam:
        assert caps[0].props[cv2.CAP_PROP_EXPOSURE] == 8000.0
        assert caps[0].props[cv2.CAP_PROP_GAIN] == 2.5
        assert cam.get_exposure() == 8000.0
        assert cam.get_gain() == 2.5
        assert cam.set_exposure(4000.0)
        assert cam.get_exposure() == 4000.0
    assert caps[0].released


def test_controls_require_open():
    cam = VideoCaptureSource(0, cap_factory=FakeCap)
    with pytest.raises(RuntimeError, match="not open"):
        cam.set_exposure(1.0)
    with pytest.raises(RuntimeError, match="not open"):
        cam.set_trigger(True)


def test_software_trigger_capture_on_demand():
    with VideoCaptureSource(0, cap_factory=FakeCap) as cam:
        # Fire without arming: guarded like the reference (:654).
        with pytest.raises(RuntimeError, match="not armed"):
            cam.trigger_fire()
        cam.set_trigger(True)
        assert cam.trigger_enabled
        f1 = cam.trigger_fire()
        f2 = cam.trigger_fire()
        assert f1.shape == (24, 32) and f2[0, 0] == 2
        assert cam.frame_count == 2
        # frames() must refuse to free-run while the trigger is armed.
        with pytest.raises(RuntimeError, match="trigger is armed"):
            next(cam.frames())
        cam.set_trigger(False)
        assert not cam.trigger_enabled


def test_trigger_fire_stream_end():
    with VideoCaptureSource(0, cap_factory=lambda s: FakeCap(s, n_frames=1)
                            ) as cam:
        cam.set_trigger(True)
        cam.trigger_fire()
        with pytest.raises(RuntimeError, match="no frame"):
            cam.trigger_fire()


def test_scan_enumerates_openable_devices():
    def factory(i):
        return FakeCap(i, openable=(i in (0, 2)))

    assert VideoCaptureSource.scan(max_devices=4, cap_factory=factory) \
        == [0, 2]


def test_every_frame_counts_frames():
    src = VideoCaptureSource(0, max_frames=3, latest_only=False,
                             cap_factory=FakeCap)
    frames = list(src.frames())
    assert len(frames) == 3
    assert src.frame_count == 3


def test_watch_camera_trigger_mode(tmp_path, monkeypatch):
    """CLI watch --camera --trigger: one fire per match loop."""
    import contextlib
    import io
    import json
    from fastest_image_pattern_matching_tpu import cli
    from fastest_image_pattern_matching_tpu.utils import sources

    rng = np.random.default_rng(4)
    tpl = rng.integers(0, 255, (20, 24), np.uint8)

    class SceneCap(FakeCap):
        def read(self):
            self.reads += 1
            if self.reads > 5:
                return False, None
            f = rng.integers(0, 40, (120, 160), np.uint8)
            f[30:50, 60:84] = tpl
            return True, f

    monkeypatch.setattr(sources, "VideoCaptureSource",
                        lambda *a, **kw: VideoCaptureSource(
                            *a, **{**kw, "cap_factory": SceneCap}))
    monkeypatch.setenv("FIPM_TPU_SETTINGS", str(tmp_path / "settings.json"))
    tp = str(tmp_path / "t.png")
    cv2.imwrite(tp, tpl)
    out_jsonl = str(tmp_path / "res.jsonl")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(["watch", "-t", tp, "-c", "0", "--trigger",
                       "--max-frames", "3", "--tolerance-angle", "0",
                       "--score", "0.5", "--max-pos", "2",
                       "--exposure", "5000", "--out", out_jsonl])
    assert rc == 0
    recs = [json.loads(l) for l in open(out_jsonl)]
    assert len(recs) == 3
    assert all(len(r["matches"]) == 1 for r in recs)
    # Camera settings persisted (saveCameraSettings analogue).
    saved = json.load(open(tmp_path / "settings.json"))
    assert saved["last_camera"] == "0"
    assert saved["camera_exposure"] == 5000.0
