"""Background-image sources for synthetic training data.

The reference indexes COCO via a captions-json ``images`` list and reads each
file with cv2 (``src/data.py:60-69``). Both that format and a plain directory
are supported; a procedural generator makes the pipeline self-contained when
no photo corpus is mounted (e.g. CI or this TPU sandbox).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np


class DirectoryImageSource:
    """All images under a directory (sorted for determinism)."""

    EXTS = (".jpg", ".jpeg", ".png", ".bmp")

    def __init__(self, path: str):
        self.paths: List[str] = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.lower().endswith(self.EXTS)
        )
        if not self.paths:
            raise ValueError(f"no images found under {path}")

    def __len__(self):
        return len(self.paths)

    def get(self, idx: int) -> np.ndarray:
        import cv2

        img = cv2.imread(self.paths[idx % len(self.paths)], cv2.IMREAD_COLOR)
        if img is None:
            raise IOError(f"unreadable image: {self.paths[idx]}")
        return img


class CocoJsonImageSource:
    """COCO captions-json index + images folder (reference format,
    ``data.py:60-69``: ``labels['images'][i]['file_name']``)."""

    def __init__(self, labels_json: str, images_folder: str):
        with open(labels_json) as f:
            self.entries = json.load(f)["images"]
        self.folder = images_folder

    def __len__(self):
        return len(self.entries)

    def get(self, idx: int) -> np.ndarray:
        import cv2

        name = self.entries[idx % len(self.entries)]["file_name"]
        img = cv2.imread(os.path.join(self.folder, name), cv2.IMREAD_COLOR)
        if img is None:
            raise IOError(f"unreadable image: {name}")
        return img


class ProceduralImageSource:
    """Random textured BGR backgrounds — gradients + blobs + noise. Keeps the
    synthesis pipeline runnable with no photo corpus; index is the seed so the
    stream is deterministic. Uses the native dcsynth core when built
    (~14× the numpy/cv2 path), else falls back to numpy."""

    def __init__(self, size_hw=(480, 640), n_virtual: int = 10000,
                 use_native: bool = True):
        self.size_hw = size_hw
        self.n = n_virtual
        self._native = None
        if use_native:
            try:
                from deepcharuco_tpu.data import native

                if native.available():
                    self._native = native
            except Exception:
                self._native = None

    def __len__(self):
        return self.n

    def get(self, idx: int) -> np.ndarray:
        if self._native is not None:
            return self._native.procedural_bg(idx, *self.size_hw)
        return self._get_numpy(idx)

    def _get_numpy(self, idx: int) -> np.ndarray:
        import cv2

        rng = np.random.default_rng(idx)
        h, w = self.size_hw
        # smooth color gradient base
        corners = rng.uniform(0, 255, (2, 2, 3)).astype(np.float32)
        img = cv2.resize(corners, (w, h), interpolation=cv2.INTER_LINEAR)
        # random soft blobs
        for _ in range(int(rng.integers(2, 8))):
            cx, cy = rng.integers(0, w), rng.integers(0, h)
            r = int(rng.integers(h // 8, h // 2))
            color = rng.uniform(0, 255, 3)
            overlay = img.copy()
            cv2.circle(overlay, (int(cx), int(cy)), r, color.tolist(), -1)
            alpha = rng.uniform(0.2, 0.7)
            img = img * (1 - alpha) + overlay * alpha
        # broadband noise
        img = img + rng.normal(0, rng.uniform(2, 12), img.shape)
        return np.clip(img, 0, 255).astype(np.uint8)


def open_image_source(labels: Optional[str] = None,
                      images_folder: Optional[str] = None,
                      size_hw=(480, 640)):
    """Resolve a source: COCO json + folder → directory → procedural."""
    if labels and images_folder and os.path.exists(labels):
        return CocoJsonImageSource(labels, images_folder)
    if images_folder and os.path.isdir(images_folder):
        return DirectoryImageSource(images_folder)
    return ProceduralImageSource(size_hw=size_hw)
