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


class VideoCaptureSource(FrameSource):
    """A real grabber over cv2.VideoCapture — V4L2 device index, video
    file, or GStreamer/RTSP URL. The concrete stand-in for the reference's
    DVP camera grabber (dvpOpenByName/dvpGetFrame + 30 ms QTimer loop,
    src/CameraPreviewDialog.cpp:386,84-131): frames are grabbed on a
    background thread into a 1-deep latest-frame slot (a lock-protected
    mailbox, the QMutex-guarded QPixmap analogue at :120) so the matcher
    always sees the freshest frame and slow matches drop frames instead of
    back-pressuring the camera.

    Usage:
        with VideoCaptureSource(0) as cam:          # /dev/video0
            for frame in cam.frames():
                ...
        VideoCaptureSource("clip.avi", latest_only=False)  # every frame
    """

    def __init__(self, source, max_frames: int = 0, latest_only: bool = True,
                 timeout_s: float = 3.0):
        self.source = source
        self.max_frames = max_frames
        self.latest_only = latest_only
        # Frame timeout mirrors the reference's 3 s dvpGetFrame timeout
        # (src/CameraPreviewDialog.cpp:87).
        self.timeout_s = timeout_s
        self._cap = None
        self._thread = None
        self._stop = None

    def open(self):
        import cv2
        if self._cap is None:
            self._cap = cv2.VideoCapture(self.source)
            if not self._cap.isOpened():
                self._cap = None
                raise RuntimeError(f"cannot open capture {self.source!r}")
        return self

    def close(self):
        if self._stop is not None:
            self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.timeout_s)
            self._thread = None
        if self._cap is not None:
            self._cap.release()
            self._cap = None

    def __enter__(self):
        return self.open()

    def __exit__(self, *exc):
        self.close()

    def _frames_latest(self):
        """Threaded grabber: latest-frame mailbox (live-camera mode)."""
        import threading
        import queue
        import cv2

        slot = queue.Queue(maxsize=1)
        self._stop = threading.Event()

        def grab():
            while not self._stop.is_set():
                ok, frame = self._cap.read()
                if not ok:
                    self._stop.set()
                    break
                try:                      # replace the stale frame, if any
                    slot.get_nowait()
                except queue.Empty:
                    pass
                slot.put(frame)

        self._thread = threading.Thread(target=grab, daemon=True)
        self._thread.start()
        n = 0
        while not (self.max_frames and n >= self.max_frames):
            try:
                frame = slot.get(timeout=self.timeout_s)
            except queue.Empty:
                break                     # grabber stalled or stream ended
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY) \
                if frame.ndim == 3 else frame
            n += 1
        self._stop.set()

    def frames(self) -> Iterator[np.ndarray]:
        import cv2
        if self._cap is None:
            self.open()
        try:
            if self.latest_only:
                yield from self._frames_latest()
            else:                         # file mode: every frame, in order
                n = 0
                while not (self.max_frames and n >= self.max_frames):
                    ok, frame = self._cap.read()
                    if not ok:
                        break
                    yield cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY) \
                        if frame.ndim == 3 else frame
                    n += 1
        finally:
            self.close()


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
