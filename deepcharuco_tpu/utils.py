"""Eval / video utilities — numpy analogues of reference ``src/utils.py``.

``compute_l2_distance`` / ``pixel_error`` operate on the reference's loose
``(x, y, id)`` keypoint-array format so eval scripts stay drop-in comparable;
``save_video`` wraps cv2's mp4 writer (``utils.py:55-69``).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def compute_l2_distance(keypoints, ids, target_keypoints, target_ids):
    """Per-unique-target-id max L2 distance between matching keypoints
    (semantics of reference ``utils.py:6-30``). Returns None when there are
    no target ids."""
    target_ids = np.asarray(target_ids)
    if target_ids.size == 0:
        return None
    distances = np.zeros(len(target_ids))
    for i, tid in enumerate(np.unique(target_ids)):
        m = np.asarray(ids) == tid
        tm = target_ids == tid
        if not m.any() or not tm.any():
            continue
        d = np.linalg.norm(
            np.asarray(keypoints)[m][:, None, :] - np.asarray(target_keypoints)[tm][None, :, :],
            axis=-1,
        )
        distances[i] = d.max()
    return distances


def pixel_error(kpts_raw, kpts_ref, kpts_target,
                verbose: bool = True) -> Tuple[Optional[float], Optional[float]]:
    """Raw-vs-refined-vs-target error report (reference ``utils.py:33-52``):
    rows are (x, y, id). Returns (mean raw error, mean refined error)."""
    if not set(kpts_raw[:, 2]).issubset(set(kpts_target[:, 2])):
        return None, None
    d = compute_l2_distance(kpts_raw[:, :2], kpts_raw[:, 2],
                            kpts_target[:, :2], kpts_target[:, 2])
    d_ref = compute_l2_distance(kpts_ref[:, :2], kpts_ref[:, 2],
                                kpts_target[:, :2], kpts_target[:, 2])
    if d is None or d_ref is None:
        return None, None
    if verbose:
        found = np.unique(kpts_raw[:, 2])
        print(f"Errors in pixels of the {len(found)}/{len(kpts_target)} kpts found:")
        print(f"Mean error raw: {d.mean():.3f}  max: {d.max():.3f}")
        print(f"Mean error ref: {d_ref.mean():.3f}  max: {d_ref.max():.3f}")
    return float(d.mean()), float(d_ref.mean())


def corner_sub_pix(img_gray: np.ndarray, corners: np.ndarray,
                   region=(8, 8)) -> np.ndarray:
    """cv2.cornerSubPix with the reference's termination criteria
    (``src/models/model_utils.py:12-16``: 30 iterations / 0.1 eps).
    corners: (N, 2) float pixel positions; returns refined (N, 2)."""
    import cv2

    term = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_COUNT, 30, 0.1)
    pts = np.expand_dims(np.asarray(corners), axis=1).astype(np.float32)
    return cv2.cornerSubPix(img_gray, pts, region, (-1, -1), term).squeeze(1)


def pred_sub_pix(img_gray: np.ndarray, kpts: np.ndarray, ids=None,
                 region=(8, 8)) -> np.ndarray:
    """Classical sub-pixel refinement of predicted keypoints (reference
    ``pred_sub_pix``, ``model_utils.py:8-9``) — an alternative to RefineNet."""
    return corner_sub_pix(img_gray, kpts, region=region)


def save_video(frames, output_path: str, fps: int = 30):
    """Write BGR frames to an mp4 (reference ``utils.py:55-69``)."""
    import cv2

    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(output_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    for frame in frames:
        writer.write(frame)
    writer.release()
    print(f"Saved video to {os.path.abspath(output_path)}")
