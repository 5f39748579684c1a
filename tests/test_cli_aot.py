"""CLI aot-export / aot-match roundtrip (the deployment install step +
serving entry as commands)."""

import io
import json
import os
from contextlib import redirect_stdout

import cv2
import numpy as np
import pytest

from fastest_image_pattern_matching_tpu.cli import main
from fastest_image_pattern_matching_tpu.utils.imageio import save_gray


@pytest.fixture(scope="module")
def scene_and_tpl(tmp_path_factory):
    rng = np.random.default_rng(9)
    t = np.full((40, 56), 30, np.uint8)
    cv2.rectangle(t, (4, 4), (51, 35), 200, 2)
    cv2.line(t, (8, 8), (48, 30), 255, 3)
    src = rng.integers(0, 30, (200, 240), np.uint8)
    src[40:80, 60:116] = t
    d = tmp_path_factory.mktemp("cliaot")
    sp, tp = str(d / "scene.bmp"), str(d / "tpl.bmp")
    save_gray(sp, src)
    save_gray(tp, t)
    return sp, tp, str(d / "pack.npz")


def test_cli_aot_export_and_match(scene_and_tpl):
    scene, tpl, pack = scene_and_tpl
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["aot-export", "-t", tpl, "-o", pack,
                   "--source-shape", "200", "240",
                   "--max-pos", "3", "--score", "0.8",
                   "--tolerance-angle", "0",
                   "--include-executables"])
    assert rc == 0 and os.path.exists(pack), buf.getvalue()

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["aot-match", "-p", pack, "-s", scene, "--json"])
    assert rc == 0
    data = json.loads(buf.getvalue())
    assert data["count"] == 1
    assert abs(data["matches"][0]["score"] - 1.0) < 1e-3
