"""Datasets: synthesized detector samples and RefineNet patch samples.

Label semantics parity:
- Detector labels (``src/data.py:14-51``): (H/8, W/8) int maps; ``loc`` holds
  the in-cell pixel index (``offset_x + 8·offset_y``) or dustbin 64, ``ids``
  the corner id or dustbin ``n_ids``. Cell collisions resolve by a 50% random
  swap (at most 2 occupants).
- RefineNet samples (``src/data_refinenet.py:41-91``): render at 2×, crop a
  region around each corner, upscale ×4 (cubic), cornerSubPix-refine the true
  corner, random ±32 px translation, crop 192², resize to 24×24 (area), label
  = 64×64 σ=2 Gaussian heatmap at the corner position.

These are plain-python iterables (no torch DataLoader); batching/prefetch
lives in :mod:`deepcharuco_tpu.data.prefetch`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from deepcharuco_tpu.configs import Config
from deepcharuco_tpu.data.synth import BoardSynthesizer
from deepcharuco_tpu.data.sources import open_image_source
from deepcharuco_tpu.ops.heatmap import gaussian_heatmap


def create_label(shape_hw: Tuple[int, int], keypoints: np.ndarray,
                 kpt_ids: np.ndarray, is_negative: bool, dust_bin_ids: int,
                 rng: np.random.Generator):
    """Build (loc, ids) class-index maps — reference ``create_label``
    semantics (``data.py:14-51``) including the 50% collision swap."""
    hc, wc = shape_hw[0] // 8, shape_hw[1] // 8
    loc = np.full((hc, wc), 64, np.int32)
    ids = np.full((hc, wc), dust_bin_ids, np.int32)
    if is_negative:
        return loc, ids

    for (kx, ky), idx in zip(keypoints, kpt_ids):
        x = np.clip(int(kx / 8), 0, wc - 1)
        y = np.clip(int(ky / 8), 0, hc - 1)
        if ids[y, x] != dust_bin_ids and rng.random() > 0.5:
            continue  # collision: keep the incumbent half the time
        loc[y, x] = int(kx) % 8 + 8 * (int(ky) % 8)
        ids[y, x] = idx
    return loc, ids


def normalize_image_host(gray: np.ndarray) -> np.ndarray:
    """(g−128)/255 float32 (host-side variant of ops.image.normalize_gray)."""
    return ((gray.astype(np.float32) - 128.0) / 255.0)


class CharucoDataset:
    """Detector training stream (reference ``CharucoDataset``, ``data.py:54-101``).

    Yields dicts with ``image`` (H, W, 1) float32 normalized grayscale and
    ``loc``/``ids`` int maps. Validation streams are seeded (42) so the
    sample sequence is reproducible — the reference's only golden fixture.
    """

    def __init__(self, config: Config, labels: Optional[str] = None,
                 images_folder: Optional[str] = None, validation: bool = False,
                 negative_p: float = 0.05):
        import cv2  # host-side only

        self._cv2 = cv2
        self.config = config
        seed = 42 if validation else None
        self.synth = BoardSynthesizer(config, negative_p=negative_p, seed=seed)
        self.rng = np.random.default_rng(seed)
        self.source = open_image_source(labels or config.val_labels if validation
                                        else labels or config.train_labels,
                                        images_folder)

    def __len__(self):
        return len(self.source)

    def __getitem__(self, idx: int):
        photo = self.source.get(idx)
        s = self.synth(photo)
        loc, ids = create_label(s.image.shape[:2], s.keypoints, s.kpt_ids,
                                s.is_negative, self.config.n_ids, self.rng)
        gray = self._cv2.cvtColor(s.image, self._cv2.COLOR_BGR2GRAY)
        return {
            "image": normalize_image_host(gray)[..., None],
            "loc": loc,
            "ids": ids,
        }


# ---------------------------------------------------------------------------
# RefineNet sample generation
# ---------------------------------------------------------------------------

def _subpix_refine(gray: np.ndarray, point_xy: np.ndarray, region: int):
    """cv2.cornerSubPix wrapper with the reference's criteria
    (``model_utils.py:12-16``: 30 iters / 0.1 eps)."""
    import cv2

    term = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_COUNT, 30, 0.1)
    pts = point_xy.reshape(1, 1, 2).astype(np.float32)
    out = cv2.cornerSubPix(gray, pts, (region, region), (-1, -1), term)
    return out.reshape(2)


def create_refine_sample(image: np.ndarray, keypoint, up_factor: int,
                         rng: np.random.Generator):
    """One (patch, heatmap, corner) training triple — reference
    ``create_sample`` math (``data_refinenet.py:41-91``).

    image: (H, W, 3) uint8 rendered at ``s_factor``× resolution;
    up_factor = 8 // s_factor. Returns (None, None, None) when the corner sits
    too close to the border for a full crop (reference skips those too).
    """
    import cv2

    w_half = (192 + 64) // (2 * up_factor)
    cx, cy = int(keypoint[0]), int(keypoint[1])
    patch = image[cy - w_half:cy + w_half, cx - w_half:cx + w_half]
    if patch.shape != (2 * w_half, 2 * w_half, 3):
        return None, None, None

    patch_up = cv2.resize(patch, (256, 256), interpolation=cv2.INTER_CUBIC)
    gray_up = cv2.cvtColor(patch_up, cv2.COLOR_BGR2GRAY)
    center = np.array([128.0, 128.0], np.float32)
    ref = _subpix_refine(gray_up, center, up_factor)
    ref = np.round(ref).astype(int)
    corr_x, corr_y = int(ref[0]) - 128, int(ref[1]) - 128

    tl = 32
    # inclusive bounds — reference uses random.randint(a, b) which includes b
    off_x = int(rng.integers(-tl - corr_x, tl - corr_x))   # [−32−c, 31−c]
    off_y = int(rng.integers(-tl - corr_y, tl - corr_y))
    ncx, ncy = int(ref[0]) + off_x, int(ref[1]) + off_y
    crop = patch_up[ncy - 96:ncy + 96, ncx - 96:ncx + 96]
    if crop.shape[:2] != (192, 192):
        return None, None, None
    small = cv2.resize(crop, (24, 24), interpolation=cv2.INTER_AREA)

    corner_x = -off_x + tl - 1 - corr_x
    corner_y = -off_y + tl - 1 - corr_y
    if not (0 <= corner_x < 64 and 0 <= corner_y < 64):
        return None, None, None
    heat = gaussian_heatmap(corner_x, corner_y, size=64, sigma=2.0)
    return small, heat, (corner_x, corner_y)


class RefineNetDataset:
    """RefineNet patch stream (reference ``RefineDataset``,
    ``data_refinenet.py:94-175``): renders at 2× (640×480), emits ``total``
    (patch, heatmap) pairs per background image, padding short lists by
    duplication."""

    def __init__(self, config: Config, labels: Optional[str] = None,
                 images_folder: Optional[str] = None, validation: bool = False,
                 total: int = 8):
        import cv2
        import dataclasses as dc

        self._cv2 = cv2
        self.total = total
        self.s_factor = 2
        big = dc.replace(config, input_size=(config.input_size[0] * self.s_factor,
                                             config.input_size[1] * self.s_factor))
        self.config = big
        seed = 42 if validation else None
        self.synth = BoardSynthesizer(big, negative_p=0.0, refinenet=True, seed=seed)
        self.rng = np.random.default_rng(seed)
        self.source = open_image_source(labels, images_folder,
                                        size_hw=big.input_hw)

    def __len__(self):
        return len(self.source)

    def __getitem__(self, idx: int):
        s = self.synth(self.source.get(idx))
        up_factor = 8 // self.s_factor
        order = self.rng.permutation(len(s.keypoints))
        patches, heatmaps = [], []
        for i in order:
            patch, heat, _ = create_refine_sample(s.image, s.keypoints[i],
                                                  up_factor, self.rng)
            if patch is None:
                continue
            gray = self._cv2.cvtColor(patch, self._cv2.COLOR_BGR2GRAY)
            patches.append(normalize_image_host(gray)[..., None])
            heatmaps.append(heat[..., None])
            if len(patches) == self.total:
                break

        if not patches:  # degenerate frame: all corners at border
            patches = [np.zeros((24, 24, 1), np.float32)]
            heatmaps = [np.zeros((64, 64, 1), np.float32)]
        while len(patches) < self.total:  # pad by duplication (ref :163-170)
            j = int(self.rng.integers(0, len(patches)))
            patches.append(patches[j])
            heatmaps.append(heatmaps[j])

        return {
            "patches": np.stack(patches),    # (total, 24, 24, 1)
            "heatmaps": np.stack(heatmaps),  # (total, 64, 64, 1)
        }
