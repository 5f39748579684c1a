"""Core data types: learned pattern, match results.

TPU mapping of the reference structs:
  - LearnedPattern  <- s_TemplData  (MatchTool/MatchToolDlg.h:14-42)
  - MatchResult     <- s_SingleTargetMatch (MatchToolDlg.h:83-88)
Per-level statistics are computed once at learn time in float64 on the host
(mirroring cv::meanStdDev in LearnPattern, MatchToolDlg.cpp:453-491) and are
baked into the compiled match program as scalars.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np


@dataclasses.dataclass
class LevelData:
    """Per-pyramid-level template data."""
    templ: np.ndarray          # [h, w] f32, u8-valued
    mean: float                # cv::meanStdDev mean (channel 0)
    norm: float                # sigma * sqrt(area)
    inv_area: float
    result_equal1: bool        # flat template -> all scores 1


@dataclasses.dataclass
class LearnedPattern:
    """Learned template pyramid + stats (s_TemplData equivalent).

    Serializable via save()/load() — the reference keeps this only in RAM;
    a persistent artifact is part of the TPU build's checkpointing story
    (SURVEY.md §5).
    """
    levels: List[LevelData]
    border_color: int          # 255 if template mean < 128 else 0
    min_reduce_area: int

    @property
    def top_layer(self) -> int:
        return len(self.levels) - 1

    @property
    def shapes(self) -> List[Tuple[int, int]]:
        return [lv.templ.shape for lv in self.levels]

    def save(self, path: str) -> None:
        arrs = {f"templ_{i}": lv.templ for i, lv in enumerate(self.levels)}
        meta = np.array([
            [lv.mean, lv.norm, lv.inv_area, float(lv.result_equal1)]
            for lv in self.levels], dtype=np.float64)
        np.savez(path, meta=meta, border_color=self.border_color,
                 min_reduce_area=self.min_reduce_area, **arrs)

    @classmethod
    def load(cls, path: str) -> "LearnedPattern":
        data = np.load(path)
        meta = data["meta"]
        levels = [
            LevelData(templ=data[f"templ_{i}"], mean=float(m[0]),
                      norm=float(m[1]), inv_area=float(m[2]),
                      result_equal1=bool(m[3]))
            for i, m in enumerate(meta)]
        return cls(levels=levels, border_color=int(data["border_color"]),
                   min_reduce_area=int(data["min_reduce_area"]))


@dataclasses.dataclass
class MatchResult:
    """One matched target (s_SingleTargetMatch equivalent)."""
    score: float
    angle: float               # degrees, wrapped to (-180, 180]
    center: Tuple[float, float]
    lt: Tuple[float, float]
    rt: Tuple[float, float]
    rb: Tuple[float, float]
    lb: Tuple[float, float]

    @property
    def pos_x(self) -> float:
        return self.center[0]

    @property
    def pos_y(self) -> float:
        return self.center[1]
