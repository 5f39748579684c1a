"""Match-result artifacts.

The reference persists almost nothing (SURVEY.md §5): QSettings UI params,
an optional ORB yaml (ORBFeatureMatcher.cpp:420-441), and matched-ROI bmp
dumps (OutputRoi, MatchToolDlg.cpp:1223-1236). The TPU build makes records
first-class: JSON/JSONL writers for match lists and ORB results, plus ROI
dumps via the native BMP encoder.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Iterable, List, Optional

import numpy as np

from ..types import MatchResult


def match_results_to_dict(results: List[MatchResult],
                          execution_ms: Optional[float] = None) -> dict:
    return {
        "execution_ms": execution_ms,
        "count": len(results),
        "matches": [{
            "index": i, "score": r.score, "angle": r.angle,
            "pos_x": r.pos_x, "pos_y": r.pos_y,
            "corners": [list(r.lt), list(r.rt), list(r.rb), list(r.lb)],
        } for i, r in enumerate(results)],
    }


def save_match_results(path: str, results: List[MatchResult],
                       execution_ms: Optional[float] = None) -> None:
    with open(path, "w") as f:
        json.dump(match_results_to_dict(results, execution_ms), f, indent=1)


def load_match_results(path: str) -> List[MatchResult]:
    with open(path) as f:
        data = json.load(f)
    out = []
    for m in data["matches"]:
        c = m["corners"]
        out.append(MatchResult(
            score=m["score"], angle=m["angle"],
            center=(m["pos_x"], m["pos_y"]),
            lt=tuple(c[0]), rt=tuple(c[1]), rb=tuple(c[2]), lb=tuple(c[3])))
    return out


def append_jsonl(path: str, record: dict) -> None:
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")


def save_roi_dumps(directory: str, src: np.ndarray,
                   results: List[MatchResult]) -> List[str]:
    """OutputRoi equivalent: save each match's axis-aligned bounding crop
    as roiN.bmp (MatchToolDlg.cpp:1223-1236 used LT..RB; we use the full
    rotated-corner bbox so rotated matches are fully contained)."""
    import os
    from .imageio import save_gray
    os.makedirs(directory, exist_ok=True)
    paths = []
    for i, r in enumerate(results):
        xs = [r.lt[0], r.rt[0], r.rb[0], r.lb[0]]
        ys = [r.lt[1], r.rt[1], r.rb[1], r.lb[1]]
        x0, x1 = max(0, int(min(xs))), min(src.shape[1], int(max(xs)) + 1)
        y0, y1 = max(0, int(min(ys))), min(src.shape[0], int(max(ys)) + 1)
        if x1 <= x0 or y1 <= y0:
            continue
        p = os.path.join(directory, f"roi{i}.bmp")
        save_gray(p, src[y0:y1, x0:x1])
        paths.append(p)
    return paths
