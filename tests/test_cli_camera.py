"""CLI `watch --camera`: the reference's -c/--camera live mode
(src/main.cpp:29-49 + CameraPreviewDialog grabber) as a headless
stream-match loop over cv2.VideoCapture."""

import contextlib
import io
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from fastest_image_pattern_matching_tpu import cli


def test_watch_camera_video_stream(tmp_path):
    rng = np.random.default_rng(1)
    tpl = rng.integers(0, 255, (40, 48), np.uint8)
    vp = str(tmp_path / "clip.avi")
    vw = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*"MJPG"), 30.0,
                         (320, 240), isColor=False)
    assert vw.isOpened()
    for _ in range(10):
        f = rng.integers(0, 40, (240, 320), np.uint8)
        f[60:100, 100:148] = tpl
        vw.write(f)
    vw.release()
    tp = str(tmp_path / "t.png")
    cv2.imwrite(tp, tpl)
    out_jsonl = str(tmp_path / "res.jsonl")

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(["watch", "-t", tp, "-c", vp, "--every-frame",
                       "--max-frames", "4", "--tolerance-angle", "0",
                       "--score", "0.5", "--max-pos", "2",
                       "--out", out_jsonl])
    assert rc == 0
    assert buf.getvalue().count("1 matches") == 4
    recs = [json.loads(l) for l in open(out_jsonl)]
    assert len(recs) == 4
    # MJPG is lossy; the planted target center must still be recovered.
    m = recs[0]["matches"][0]
    assert abs(m["pos_x"] - 123.5) < 2 and abs(m["pos_y"] - 79.5) < 2


def test_watch_requires_directory_or_camera(tmp_path):
    tp = str(tmp_path / "t.png")
    cv2.imwrite(tp, np.zeros((16, 16), np.uint8))
    with pytest.raises(SystemExit):
        cli.build_parser().parse_args(["watch", "-t", tp])
