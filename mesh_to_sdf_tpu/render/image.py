"""Image output helpers (PNG via PIL; raw fallback)."""
from __future__ import annotations

import numpy as np


def to_uint8(img) -> np.ndarray:
    arr = np.asarray(img)
    arr = np.clip(arr, 0.0, 1.0)
    return (arr * 255.0 + 0.5).astype(np.uint8)


def save_png(path, img) -> None:
    """Save an (H, W, 3) float [0,1] or uint8 image as PNG."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = to_uint8(arr)
    from PIL import Image

    Image.fromarray(arr, mode="RGB").save(str(path))
