"""FrameSource abstraction + multi-template (glyph) matching."""

import numpy as np
import cv2
import pytest

from fastest_image_pattern_matching_tpu import MatchConfig
from fastest_image_pattern_matching_tpu.models.multi_template import (
    MultiTemplateMatcher)
from fastest_image_pattern_matching_tpu.utils.sources import (
    FileSource, FolderSource, SyntheticSource)


def _glyph(ch, h=40, w=32):
    g = np.full((h, w), 20, np.uint8)
    cv2.putText(g, ch, (4, h - 8), cv2.FONT_HERSHEY_SIMPLEX, 1.1, 230, 3)
    return g


def test_file_and_folder_source(tmp_path, rng):
    from fastest_image_pattern_matching_tpu.utils.imageio import save_gray
    imgs = []
    for i in range(4):
        img = rng.integers(0, 255, size=(16, 20), dtype=np.uint8)
        save_gray(str(tmp_path / f"f{i}.bmp"), img)
        imgs.append(img)
    fs = FolderSource(str(tmp_path))
    got = list(fs)
    assert len(got) == 4
    for a, b in zip(got, imgs):
        np.testing.assert_array_equal(a, b)

    fs2 = FileSource([str(tmp_path / "f1.bmp")])
    np.testing.assert_array_equal(next(iter(fs2)), imgs[1])


def test_synthetic_source():
    t = np.full((10, 12), 200, np.uint8)
    s = SyntheticSource((64, 80), 3, seed=1, template=t)
    frames = list(s)
    assert len(frames) == 3
    assert all(f.shape == (64, 80) for f in frames)
    assert frames[0].max() == 200  # template pasted


def test_multi_template_glyphs(rng):
    scene = rng.integers(0, 25, size=(200, 300), dtype=np.uint8)
    ga, gb = _glyph("A"), _glyph("B")
    scene[30:70, 40:72] = ga
    scene[100:140, 150:182] = gb
    scene[30:70, 200:232] = gb

    m = MultiTemplateMatcher(MatchConfig(max_pos=5, score=0.8,
                                         tolerance_angle=0.0))
    m.learn("A", ga)
    m.learn("B", gb)
    out = m.match_all(scene)
    labels = sorted((lm.label, round(lm.result.center[0]))
                    for lm in out if lm.result.score > 0.9)
    assert ("A", 40 + 15) in [(l, x) for l, x in labels] or \
           ("A", 40 + 16) in [(l, x) for l, x in labels]
    assert sum(1 for l, _ in labels if l == "B") == 2


def test_multi_template_glyph_dir(tmp_path, rng):
    from fastest_image_pattern_matching_tpu.utils.imageio import save_gray
    ga, gb = _glyph("X"), _glyph("Y")
    save_gray(str(tmp_path / "X.bmp"), ga)
    save_gray(str(tmp_path / "Y.bmp"), gb)
    scene = rng.integers(0, 25, size=(150, 150), dtype=np.uint8)
    scene[20:60, 30:62] = ga
    m = MultiTemplateMatcher(MatchConfig(max_pos=3, score=0.85,
                                         tolerance_angle=0.0))
    m.learn_glyph_dir(str(tmp_path))
    assert set(m.patterns) == {"X", "Y"}
    out = m.match_all(scene, cross_nms=True)
    assert out and out[0].label == "X"


def test_m12_real_glyphs():
    """The reference's OCR demo assets (Test Images/M12, the disabled
    36-glyph loop MatchToolDlg.cpp:714-771): learn real glyph templates and
    read back a composed text line."""
    import os
    m12 = "/root/reference/Test Images/M12"
    if not os.path.isdir(m12):
        pytest.skip("M12 assets unavailable")
    from fastest_image_pattern_matching_tpu.utils.imageio import load_gray
    glyphs = {}
    for ch in ["0", "3", "7", "A", "M"]:
        glyphs[ch] = load_gray(f"{m12}/{ch}.jpg")
    rng2 = np.random.default_rng(2)
    scene = rng2.integers(200, 255, size=(120, 400), dtype=np.uint8)
    text = ["M", "3", "7", "A", "0"]
    for i, ch in enumerate(text):
        g = glyphs[ch]
        scene[40:40 + g.shape[0], 30 + i * 70:30 + i * 70 + g.shape[1]] = g

    m = MultiTemplateMatcher(MatchConfig(max_pos=6, score=0.85,
                                         tolerance_angle=0.0,
                                         min_reduce_area=64))
    for ch, g in glyphs.items():
        m.learn(ch, g)
    out = m.match_all(scene)
    best = {}
    for lm in out:
        x = round(lm.result.center[0] / 70)
        if x not in best or lm.result.score > best[x][1]:
            best[x] = (lm.label, lm.result.score)
    read = [best[k][0] for k in sorted(best)]
    assert read == text, (read, [(k, v) for k, v in sorted(best.items())])


def test_video_capture_source_file_mode(tmp_path, rng):
    """VideoCaptureSource in every-frame (file) mode over a real encoded
    clip — the concrete grabber implementation (C14) behind FrameSource."""
    from fastest_image_pattern_matching_tpu.utils.sources import (
        VideoCaptureSource)
    path = str(tmp_path / "clip.avi")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                         (64, 48))
    if not wr.isOpened():
        pytest.skip("no MJPG encoder available")
    frames = []
    for i in range(6):
        f = np.full((48, 64), 30 + i * 20, np.uint8)
        f[10:20, 10 + i * 5:20 + i * 5] = 250
        frames.append(f)
        wr.write(cv2.cvtColor(f, cv2.COLOR_GRAY2BGR))
    wr.release()

    got = list(VideoCaptureSource(path, latest_only=False).frames())
    assert len(got) == 6
    for a, b in zip(got, frames):
        assert a.shape == (48, 64)
        assert np.abs(a.astype(int) - b.astype(int)).mean() < 12  # MJPG loss

    got2 = list(VideoCaptureSource(path, max_frames=3,
                                   latest_only=False).frames())
    assert len(got2) == 3


def test_video_capture_source_latest_only(tmp_path):
    """Threaded latest-frame mailbox mode: frames arrive, stream end stops
    iteration, close() is idempotent."""
    from fastest_image_pattern_matching_tpu.utils.sources import (
        VideoCaptureSource)
    path = str(tmp_path / "clip2.avi")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30.0,
                         (32, 32))
    if not wr.isOpened():
        pytest.skip("no MJPG encoder available")
    for i in range(30):
        wr.write(np.full((32, 32, 3), i * 8 % 255, np.uint8))
    wr.release()

    with VideoCaptureSource(path, timeout_s=2.0) as cam:
        got = list(cam.frames())
    assert 1 <= len(got) <= 30           # mailbox may drop frames
    assert all(f.shape == (32, 32) for f in got)

    src = VideoCaptureSource("/nonexistent/video.avi")
    with pytest.raises(RuntimeError):
        src.open()
