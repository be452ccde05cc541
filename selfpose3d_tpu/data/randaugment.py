"""Photometric RandAugment + Cutout for the SSV input pipeline.

Re-implementation of the reference's AutoAugment-derived photometric policy
set (ref: lib/dataset/randaugment.py:476-518 and the RandomAugumnetCutOut
wrapper, JointsDatasetSSV.py:27-42): 7 color-only ops (no geometry — joint
coordinates must stay valid), random 2-op policies, and 2-16 random gray
cutout squares of 20-40 px.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

try:
    from PIL import Image, ImageEnhance, ImageOps

    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False


def _sharpness(img, mag):
    return ImageEnhance.Sharpness(img).enhance(mag)


def _autocontrast(img, _):
    return ImageOps.autocontrast(img)


def _posterize(img, mag):
    return ImageOps.posterize(img, int(np.clip(mag, 1, 8)))


def _equalize(img, _):
    return ImageOps.equalize(img)


def _contrast(img, mag):
    return ImageEnhance.Contrast(img).enhance(mag)


def _color(img, mag):
    return ImageEnhance.Color(img).enhance(mag)


def _brightness(img, mag):
    return ImageEnhance.Brightness(img).enhance(mag)


# (op, magnitude low, magnitude high) — photometric only
_OPS = [
    (_sharpness, 0.1, 1.9),
    (_autocontrast, 0.0, 1.0),
    (_posterize, 4.0, 8.0),
    (_equalize, 0.0, 1.0),
    (_contrast, 0.5, 1.5),
    (_color, 0.5, 1.5),
    (_brightness, 0.5, 1.5),
]


def rand_augment(image: np.ndarray, rs: np.random.RandomState, n_ops: int = 2) -> np.ndarray:
    """Apply ``n_ops`` random photometric ops (uint8 HWC in/out)."""
    if not _HAS_PIL:
        return image
    img = Image.fromarray(image)
    for _ in range(n_ops):
        op, lo, hi = _OPS[rs.randint(len(_OPS))]
        if rs.rand() < 0.8:  # per-op apply probability
            img = op(img, rs.uniform(lo, hi))
    return np.asarray(img)


def cutout(
    image: np.ndarray,
    rs: np.random.RandomState,
    min_holes: int = 2,
    max_holes: int = 16,
    min_size: int = 20,
    max_size: int = 40,
    fill: int = 127,
) -> np.ndarray:
    """Random gray squares (ref: randaugment.py:18-40, wrapper 27-42)."""
    out = image.copy()
    h, w = out.shape[:2]
    for _ in range(rs.randint(min_holes, max_holes + 1)):
        size = rs.randint(min_size, max_size + 1)
        y = rs.randint(0, max(1, h - size))
        x = rs.randint(0, max(1, w - size))
        out[y : y + size, x : x + size] = fill
    return out


class RandAugmentCutout:
    """Composite policy used by the SSV datasets."""

    def __init__(self, use_randaug: bool = True, use_cutout: bool = True):
        self.use_randaug = use_randaug
        self.use_cutout = use_cutout

    def __call__(self, image: np.ndarray, rs: np.random.RandomState) -> np.ndarray:
        if image.dtype != np.uint8:
            image = np.clip(image, 0, 255).astype(np.uint8)
        if self.use_randaug:
            image = rand_augment(image, rs)
        if self.use_cutout:
            image = cutout(image, rs)
        return image
