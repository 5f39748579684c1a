"""Corpus inspection pipeline: frame source -> (sharded) matcher -> records.

The production-serving shape of the framework: decode on native CPU
threads (the camera-grabber analogue), batch frames, run the compiled
match program (optionally sharded over a mesh), and stream match records
out. Equal-shaped frames are batched; odd-shaped frames fall back to
single-image matching (each distinct shape costs one compile).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Iterable, Iterator, List, Optional

import numpy as np

from ..config import MatchConfig
from ..types import LearnedPattern, MatchResult


@dataclasses.dataclass
class FrameReport:
    index: int
    results: List[MatchResult]
    execution_ms: float


def inspect_corpus(
    frames: Iterable[np.ndarray],
    pattern: LearnedPattern,
    cfg: Optional[MatchConfig] = None,
    mesh=None,
    batch_size: int = 8,
) -> Iterator[FrameReport]:
    """Yield a FrameReport per frame, in order.

    Equal-shaped frames are grouped into batches of batch_size and run
    through ONE compiled dispatch per batch — the sharded matcher when a
    mesh is given, the single-chip batched program (models.batch) when
    not. Each distinct frame shape costs one compile; odd-shaped stragglers
    simply form their own (smaller) batches.
    """
    cfg = cfg or MatchConfig()

    if mesh is not None:
        from ..parallel.matcher import match_batch_sharded

    from .batch import _next_bucket, match_many_arrays

    buf: List[np.ndarray] = []
    idx: List[int] = []

    def flush():
        nonlocal buf, idx
        if not buf:
            return
        t0 = time.perf_counter()
        if mesh is not None:
            out = match_batch_sharded(np.stack(buf), pattern, cfg, mesh)
        else:
            # Straggler batches compile for their own (smaller) bucket
            # instead of padding up to batch_size-worth of dead compute.
            out = match_many_arrays(
                np.stack(buf), pattern, cfg,
                batch_bucket=min(batch_size, _next_bucket(len(buf))))
        ms = (time.perf_counter() - t0) * 1000 / len(buf)
        for k, i in enumerate(idx):
            results = []
            for j in range(out["valid"].shape[1]):
                if not out["valid"][k][j]:
                    continue
                c = out["corners"][k][j]
                results.append(MatchResult(
                    score=float(out["score"][k][j]),
                    angle=float(out["angle"][k][j]),
                    center=tuple(out["center"][k][j].tolist()),
                    lt=tuple(c[0]), rt=tuple(c[1]),
                    rb=tuple(c[2]), lb=tuple(c[3])))
            yield FrameReport(i, results, ms)
        buf, idx = [], []

    cur_shape = None
    for i, frame in enumerate(frames):
        if cur_shape is not None and (frame.shape != cur_shape
                                      or len(buf) >= batch_size):
            yield from flush()
        cur_shape = frame.shape
        buf.append(frame)
        idx.append(i)
    yield from flush()
