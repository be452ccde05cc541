"""Read images from ``archive.zip@inner/path`` URIs with a zipfile handle
cache (ref: lib/utils/zipreader.py)."""

from __future__ import annotations

import os
import threading
import zipfile
from typing import Dict

import numpy as np

_cache: Dict[str, zipfile.ZipFile] = {}
_lock = threading.Lock()


def split_zip_path(path: str):
    """'a/b.zip@img/x.jpg' -> ('a/b.zip', 'img/x.jpg')."""
    pos = path.index("@")
    return path[:pos], path[pos + 1:]


def is_zip_path(path: str) -> bool:
    return "@" in path


def read_bytes(path: str) -> bytes:
    zip_path, inner = split_zip_path(path)
    with _lock:
        zf = _cache.get(zip_path)
        if zf is None:
            zf = zipfile.ZipFile(zip_path, "r")
            _cache[zip_path] = zf
    return zf.read(inner)


def imread(path: str, flags=None):
    """cv2-compatible imread for zip URIs (ref: zipreader.py imread)."""
    import cv2

    data = np.frombuffer(read_bytes(path), np.uint8)
    return cv2.imdecode(data, flags if flags is not None else cv2.IMREAD_COLOR)


def imread_any(path: str, flags=None):
    """Dispatch between plain files and zip URIs.

    Returns None for unreadable inputs, matching cv2.imread semantics
    (the datasets treat None as a skippable record,
    ref: lib/dataset/JointsDataset.py:114-117).
    """
    import cv2

    if is_zip_path(path):
        try:
            return imread(path, flags)
        except (OSError, KeyError, zipfile.BadZipFile):
            return None
    return cv2.imread(path, flags if flags is not None else cv2.IMREAD_COLOR)
