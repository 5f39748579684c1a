"""Image IO.

The reference loads BMP/JPG via OpenCV imread and converts to grayscale
(MatchTool file dialogs, MatchToolDlg.cpp:506-525; Qt drag-drop,
src/MatchToolDialog.cpp:716-737). We prefer the native C++ BMP decoder
(zero-dependency runtime path) and fall back to cv2/PIL for other formats.
"""

from __future__ import annotations

import os

import numpy as np


def ensure_gray(img, channel_axis_only: bool = False):
    """Collapse a trailing channel axis of an in-memory image (or batch).

    Size-1 axes are squeezed; 3-channel (BGR, the cv2 load order the
    reference uses throughout, MatchToolDlg.cpp:506-525) is converted with
    BT.601 luma exactly like cv::cvtColor(BGR2GRAY): fixed-point for uint8
    inputs, float weights otherwise. Works on numpy and jax arrays; leaves
    channel-less 2D (H, W) input untouched. `channel_axis_only=True` raises
    instead of converting (callers that require pre-grayscaled input)."""
    if img.ndim < 2:
        raise ValueError(f"expected an image array, got ndim={img.ndim}")
    if img.ndim == 2:
        # Already grayscale — the trailing axis is width, not channels.
        return img
    ch = img.shape[-1]
    if ch == 1:
        return img[..., 0]
    if ch not in (3, 4):
        raise ValueError(f"expected 1/3/4 channels, got trailing axis {ch}")
    if channel_axis_only:
        raise ValueError("grayscale input required (H, W); convert color "
                         "frames with utils.imageio.ensure_gray first")
    img = img[..., :3]
    # One conversion for every path: cv2's fixed-point BGR2GRAY (15-bit
    # coefficients; verified bit-exact vs cv::cvtColor for uint8). Float
    # inputs are rounded to the u8-valued contract first, so numpy-uint8,
    # numpy-float and jax-array callers all produce IDENTICAL gray values
    # (the public APIs route color input through different array types —
    # a per-path formula would silently break their exactness parity).
    if isinstance(img, np.ndarray):
        b = np.round(img[..., 0]).astype(np.int64)
        g = np.round(img[..., 1]).astype(np.int64)
        r = np.round(img[..., 2]).astype(np.int64)
        v = (b * 3735 + g * 19235 + r * 9798 + 16384) >> 15
        return v.astype(np.uint8 if img.dtype == np.uint8 else img.dtype)
    import jax.numpy as jnp
    ii = jnp.round(img.astype(jnp.float32)).astype(jnp.int32)
    v = (ii[..., 0] * 3735 + ii[..., 1] * 19235 + ii[..., 2] * 9798
         + 16384) >> 15
    return v.astype(jnp.float32)


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
