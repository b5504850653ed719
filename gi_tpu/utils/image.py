"""Image IO: float framebuffer [H,W,3] (row 0 = bottom, reference R2Image
convention) <-> PNG/JPEG on disk."""

from __future__ import annotations

import numpy as np


def write_image(img: np.ndarray, path: str) -> None:
    """Write [H,W,3] float (0..1, row 0 at bottom) to PNG/JPEG."""
    from PIL import Image
    arr = np.clip(np.asarray(img, np.float64), 0.0, 1.0)
    arr8 = (arr * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(arr8[::-1]).save(path)


def read_image(path: str) -> np.ndarray:
    """Read image to [H,W,3] float (0..1, row 0 at bottom)."""
    from PIL import Image
    arr = np.asarray(Image.open(path).convert("RGB"), np.float64) / 255.0
    return arr[::-1]
