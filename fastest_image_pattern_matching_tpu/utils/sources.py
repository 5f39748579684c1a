"""Image acquisition sources.

The reference's camera stack (C14: QImageAcquisition worker thread +
CameraPreviewDialog over the binary DVP vendor SDK,
src/CameraPreviewDialog.cpp:42-131, include/CameraPreviewDialog.h) is
vendor-binary-bound; the TPU build keeps the *abstraction*: a FrameSource
protocol that a real grabber can implement, plus file/folder/synthetic
sources used by the CLI and the corpus pipeline. The native threaded
BatchLoader plays the grabber-thread role (decode on CPU while the device
computes).
"""

from __future__ import annotations

import abc
import glob
import os
from typing import Iterator, List, Optional

import numpy as np


class FrameSource(abc.ABC):
    """Yields grayscale uint8 frames, like the camera's imageCaptured
    signal feeding the matcher (src/MatchToolDialog.cpp:1557)."""

    @abc.abstractmethod
    def frames(self) -> Iterator[np.ndarray]:
        ...

    def __iter__(self):
        return self.frames()


class FileSource(FrameSource):
    """A fixed list of image files, decoded by the native loader when
    possible (threads overlap decode with device compute)."""

    def __init__(self, paths: List[str], n_threads: int = 4):
        self.paths = list(paths)
        self._n_threads = n_threads

    def frames(self) -> Iterator[np.ndarray]:
        use_native = all(p.lower().endswith(".bmp") for p in self.paths)
        if use_native:
            try:
                from ..native.loader import BatchLoader
                with BatchLoader(self.paths, self._n_threads) as bl:
                    for i in range(len(self.paths)):
                        img = bl.take(i)
                        if img is None:
                            raise ValueError(f"decode failed: {self.paths[i]}")
                        yield img
                return
            except (RuntimeError, ImportError):
                pass
        from .imageio import load_gray
        for p in self.paths:
            yield load_gray(p)


class FolderSource(FileSource):
    """All images in a directory (sorted), like batch inspection runs."""

    def __init__(self, directory: str,
                 patterns=("*.bmp", "*.jpg", "*.png", "*.jpeg"),
                 n_threads: int = 4):
        paths: List[str] = []
        for pat in patterns:
            paths.extend(glob.glob(os.path.join(directory, pat)))
        super().__init__(sorted(paths), n_threads)


class SyntheticSource(FrameSource):
    """Deterministic synthetic frames for soak/perf testing (the 'camera'
    of the test rig)."""

    def __init__(self, hw, n_frames: int, seed: int = 0,
                 template: Optional[np.ndarray] = None):
        self.hw = hw
        self.n = n_frames
        self.seed = seed
        self.template = template

    def frames(self) -> Iterator[np.ndarray]:
        rng = np.random.default_rng(self.seed)
        for i in range(self.n):
            f = rng.integers(0, 40, size=self.hw, dtype=np.uint8)
            if self.template is not None:
                th, tw = self.template.shape
                y = int(rng.integers(0, self.hw[0] - th))
                x = int(rng.integers(0, self.hw[1] - tw))
                f[y:y + th, x:x + tw] = self.template
            yield f
