"""Image IO.

The reference loads BMP/JPG via OpenCV imread and converts to grayscale
(MatchTool file dialogs, MatchToolDlg.cpp:506-525; Qt drag-drop,
src/MatchToolDialog.cpp:716-737). We prefer the native C++ BMP decoder
(zero-dependency runtime path) and fall back to cv2/PIL for other formats.
"""

from __future__ import annotations

import os

import numpy as np


def load_gray(path: str) -> np.ndarray:
    """Load an image as 2D uint8 grayscale (BT.601 luma for color inputs,
    matching cv::cvtColor BGR2GRAY)."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    try:
        from ..native import bmp as native_bmp
        if path.lower().endswith(".bmp") and native_bmp.available():
            return native_bmp.load_gray(path)
    except ImportError:
        pass
    try:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise ValueError(f"cannot decode {path}")
        return img
    except ImportError:
        from PIL import Image
        return np.asarray(Image.open(path).convert("L"))


def save_gray(path: str, img: np.ndarray) -> None:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    try:
        from ..native import bmp as native_bmp
        if path.lower().endswith(".bmp") and native_bmp.available():
            native_bmp.save_gray(path, img)
            return
    except ImportError:
        pass
    try:
        import cv2
        cv2.imwrite(path, img)
    except ImportError:
        from PIL import Image
        Image.fromarray(img).save(path)
