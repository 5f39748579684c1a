"""Corpus pipeline + serialization round-trips."""

import json

import cv2
import numpy as np

from fastest_image_pattern_matching_tpu import MatchConfig, learn_pattern, match
from fastest_image_pattern_matching_tpu.models.corpus import inspect_corpus
from fastest_image_pattern_matching_tpu.parallel.mesh import make_mesh
from fastest_image_pattern_matching_tpu.utils.serialization import (
    load_match_results, save_match_results, save_roi_dumps)
from fastest_image_pattern_matching_tpu.utils.sources import SyntheticSource


def _template():
    t = np.full((32, 44), 30, np.uint8)
    cv2.rectangle(t, (3, 3), (40, 28), 210, 2)
    cv2.line(t, (6, 6), (38, 26), 255, 2)
    return t


def test_inspect_corpus_single(rng):
    t = _template()
    src = SyntheticSource((120, 160), 4, seed=3, template=t)
    pat = learn_pattern(t, 256)
    cfg = MatchConfig(max_pos=2, score=0.8, tolerance_angle=0.0)
    reports = list(inspect_corpus(src, pat, cfg))
    assert len(reports) == 4
    assert [r.index for r in reports] == [0, 1, 2, 3]
    assert all(len(r.results) >= 1 for r in reports)


def test_inspect_corpus_sharded_matches_single(rng):
    t = _template()
    frames = list(SyntheticSource((120, 160), 5, seed=4, template=t))
    pat = learn_pattern(t, 256)
    cfg = MatchConfig(max_pos=2, score=0.8, tolerance_angle=0.0)
    mesh = make_mesh((2, 4))
    sharded = list(inspect_corpus(iter(frames), pat, cfg, mesh=mesh,
                                  batch_size=4))
    assert [r.index for r in sharded] == [0, 1, 2, 3, 4]
    for rep, frame in zip(sharded, frames):
        single = match(frame, pat, cfg)
        assert len(rep.results) == len(single)
        for a, b in zip(rep.results, single):
            assert abs(a.score - b.score) < 1e-5
            assert abs(a.center[0] - b.center[0]) < 1e-3


def test_serialization_roundtrip(tmp_path, rng):
    t = _template()
    scene = rng.integers(0, 30, size=(100, 140), dtype=np.uint8)
    scene[20:52, 30:74] = t
    pat = learn_pattern(t, 256)
    res = match(scene, pat, MatchConfig(max_pos=2, score=0.8,
                                        tolerance_angle=0.0))
    p = str(tmp_path / "matches.json")
    save_match_results(p, res, execution_ms=12.5)
    back = load_match_results(p)
    assert len(back) == len(res)
    assert abs(back[0].score - res[0].score) < 1e-9
    assert back[0].center == (res[0].pos_x, res[0].pos_y)

    rois = save_roi_dumps(str(tmp_path / "rois"), scene, res)
    assert len(rois) == len(res)
    from fastest_image_pattern_matching_tpu.utils.imageio import load_gray
    roi = load_gray(rois[0])
    assert roi.shape[0] >= 30 and roi.shape[1] >= 42


def test_read_string_anchor_does_not_chain():
    """x_merge de-dup must anchor on the accepted glyph, not chain off
    each merged duplicate: glyphs spaced just over x_merge apart are all
    kept, and a better-scoring duplicate replacing the kept one must not
    extend the merge window."""
    from fastest_image_pattern_matching_tpu.models.multi_template import (
        LabeledMatch, read_string)
    from fastest_image_pattern_matching_tpu.types import MatchResult

    def m(label, x, score):
        r = MatchResult(score=score, angle=0.0, center=(x, 10.0),
                        lt=(x - 5, 5), rt=(x + 5, 5), rb=(x + 5, 15),
                        lb=(x - 5, 15))
        return LabeledMatch(label, r)

    # Distinct glyphs at pitch 13 (> x_merge 12): none may merge.
    ms = [m("A", 0.0, 0.9), m("B", 13.0, 0.9), m("C", 26.0, 0.9),
          m("D", 39.0, 0.9)]
    assert read_string(ms, 0.5, x_merge=12.0) == "ABCD"
    # A better-scoring duplicate at +10 replaces 'A' but must NOT pull
    # the window over 'B' at 13.
    ms2 = [m("A", 0.0, 0.8), m("a", 10.0, 0.95), m("B", 13.0, 0.9)]
    assert read_string(ms2, 0.5, x_merge=12.0) == "aB"
