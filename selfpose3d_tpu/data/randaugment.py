"""Photometric RandAugment + Cutout for the input pipelines.

Reproduces the reference's UDA-derived policy exactly
(ref: lib/dataset/randaugment.py:18-67,355-531 and the RandomAugumnetCutOut
wrapper, JointsDatasetSSV.py:27-42):

  * policies are ordered pairs of ops drawn uniformly from
    7 photometric ops x magnitude indices 1..9, each op applied with
    probability 0.5 (``get_rand_policies``: the flat op list excludes
    magnitude index 0, and every (op1, op2) pair is equally likely — which
    is identical to sampling op1 and op2 independently);
  * enhance-style ops use strength 1 +- 0.1*idx with a random sign;
    posterize keeps round(linspace(8, 4, 10))[idx] bits;
  * cutout draws 2..15 patches of size 20..39, each centered uniformly over
    the image and clipped at the borders, filled with RGB (125, 122, 113).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

try:
    from PIL import Image, ImageEnhance, ImageOps

    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False

# fill color of reference Cutout patches (ref: randaugment.py:70)
_CUTOUT_FILL = (125, 122, 113)

# round(linspace(8, 4, 10)) (ref: randaugment.py:379)
_POSTERIZE_BITS = np.round(np.linspace(8, 4, 10)).astype(int)


def _signed(mag_idx: int, rs) -> float:
    return 1.0 + 0.1 * mag_idx * (1 if rs.rand() < 0.5 else -1)


def _sharpness(img, mag_idx, rs):
    return ImageEnhance.Sharpness(img).enhance(_signed(mag_idx, rs))


def _autocontrast(img, mag_idx, rs):
    return ImageOps.autocontrast(img)


def _posterize(img, mag_idx, rs):
    return ImageOps.posterize(img, int(_POSTERIZE_BITS[mag_idx]))


def _equalize(img, mag_idx, rs):
    return ImageOps.equalize(img)


def _contrast(img, mag_idx, rs):
    return ImageEnhance.Contrast(img).enhance(_signed(mag_idx, rs))


def _color(img, mag_idx, rs):
    return ImageEnhance.Color(img).enhance(_signed(mag_idx, rs))


def _brightness(img, mag_idx, rs):
    return ImageEnhance.Brightness(img).enhance(_signed(mag_idx, rs))


# reference trans_list order (ref: randaugment.py:480-489)
_OPS = [
    _sharpness,
    _autocontrast,
    _posterize,
    _equalize,
    _contrast,
    _color,
    _brightness,
]


def rand_augment(image: np.ndarray, rs: np.random.RandomState, n_ops: int = 2) -> np.ndarray:
    """Apply a random 2-op photometric policy (uint8 HWC in/out).

    Matches the reference distribution: each of ``n_ops`` ops is drawn
    uniformly from ops x magnitudes 1..9 and applied with probability 0.5
    (ref: randaugment.py:494-505,455-459).
    """
    if not _HAS_PIL:
        return image
    img = Image.fromarray(image)
    for _ in range(n_ops):
        op = _OPS[rs.randint(len(_OPS))]
        mag_idx = int(rs.randint(1, 10))
        if rs.rand() < 0.5:
            img = op(img, mag_idx, rs)
    return np.asarray(img)


def cutout_patch(image: np.ndarray, rs: np.random.RandomState, size: int) -> None:
    """One border-clipped cutout patch, in place (ref: randaugment.py:22-71)."""
    h, w = image.shape[:2]
    cy = rs.randint(0, h)
    cx = rs.randint(0, w)
    y0, x0 = max(0, cy - size // 2), max(0, cx - size // 2)
    y1, x1 = min(h, cy + size // 2), min(w, cx + size // 2)
    if y1 > y0 and x1 > x0:
        image[y0:y1, x0:x1] = np.array(
            _CUTOUT_FILL[: image.shape[2] if image.ndim == 3 else 1],
            dtype=image.dtype,
        )


def cutout(
    image: np.ndarray,
    rs: np.random.RandomState,
    min_holes: int = 2,
    max_holes: int = 16,
    min_size: int = 20,
    max_size: int = 40,
) -> np.ndarray:
    """2..15 gray patches of 20..39 px (ref: JointsDatasetSSV.py:36-42;
    bounds are numpy-randint half-open like the reference's)."""
    out = image.copy()
    for _ in range(rs.randint(min_holes, max_holes)):
        cutout_patch(out, rs, int(rs.randint(min_size, max_size)))
    return out


class RandAugmentCutout:
    """Composite policy used by the datasets (ref: JointsDatasetSSV.py:27-42)."""

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
