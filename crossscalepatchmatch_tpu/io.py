"""Image I/O: PNG read/write of views and uint8 disparity maps.

Replaces the reference's OpenCV imread/imwrite (main.cc:68-69,131-134).
OpenCV loads color images as BGR; PIL loads RGB, so loads are swapped to BGR
to keep the engine's channel convention identical to the reference (the
engine only consumes channel sums/diffs, but golden files stay comparable).
"""

from __future__ import annotations

import numpy as np

try:
    from PIL import Image
    _HAVE_PIL = True
except ImportError:  # pragma: no cover - PIL is in the base image
    _HAVE_PIL = False


def read_bgr(path: str) -> np.ndarray:
    """u8[H, W, 3] BGR image."""
    if not _HAVE_PIL:
        raise RuntimeError("PIL unavailable; cannot read images")
    img = np.asarray(Image.open(path).convert("RGB"))
    return img[..., ::-1].copy()


def write_gray(path: str, img_u8: np.ndarray) -> None:
    """Write a u8[H, W] (e.g. scaled disparity) map as 8-bit PNG."""
    if not _HAVE_PIL:
        raise RuntimeError("PIL unavailable; cannot write images")
    Image.fromarray(np.asarray(img_u8, np.uint8), mode="L").save(path)


def write_bgr(path: str, img_u8: np.ndarray) -> None:
    if not _HAVE_PIL:
        raise RuntimeError("PIL unavailable; cannot write images")
    Image.fromarray(np.asarray(img_u8, np.uint8)[..., ::-1], mode="RGB").save(path)
