"""CLI `ocr` subcommand: read the M12 glyph string from the bench scene
(the reference's disabled OCR demo, MatchToolDlg.cpp:714-771)."""

import glob
import io
import json
import os
import sys
from contextlib import redirect_stdout

import cv2
import numpy as np
import pytest

from fastest_image_pattern_matching_tpu.cli import main
from fastest_image_pattern_matching_tpu.utils.imageio import save_gray

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
M12 = "/root/reference/Test Images/M12"

sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.fixture(scope="module")
def scene_path(tmp_path_factory):
    if not os.path.isdir(M12):
        pytest.skip("M12 glyph directory unavailable")
    from ocr_bench import build_scene
    glyphs = {}
    for p in sorted(glob.glob(os.path.join(M12, "*.jpg"))):
        glyphs[os.path.splitext(os.path.basename(p))[0]] = cv2.imread(
            p, cv2.IMREAD_GRAYSCALE)
    scene, _ = build_scene(glyphs)
    path = str(tmp_path_factory.mktemp("ocr") / "scene.bmp")
    save_gray(path, scene)
    return path


def test_cli_ocr_reads_m12(scene_path):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["ocr", "--glyphs-dir", M12, "-s", scene_path])
    out = buf.getvalue()
    assert rc == 0
    assert "Read: M12X05" in out
    assert "Label" in out and "Score" in out


def test_cli_ocr_json(scene_path):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["ocr", "--glyphs-dir", M12, "-s", scene_path, "--json"])
    assert rc == 0
    data = json.loads(buf.getvalue())
    assert data["text"] == "M12X05"
    assert data["glyphs"] >= 36  # 0-9 A-Z (+ extra variants in the dir)
    labels = {m["label"] for m in data["matches"]
              if m["score"] >= 0.85}
    assert {"M", "1", "2", "X", "0", "5"} <= labels


def test_cli_ocr_empty_dir(tmp_path, scene_path):
    rc = main(["ocr", "--glyphs-dir", str(tmp_path), "-s", scene_path])
    assert rc == 2


def test_cli_ocr_per_glyph_and_cross_nms(scene_path):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["ocr", "--glyphs-dir", M12, "-s", scene_path,
                   "--per-glyph", "--cross-nms", "--json"])
    assert rc == 0
    data = json.loads(buf.getvalue())
    assert data["text"] == "M12X05"
