"""Tests for eval utils (pixel_error / compute_l2_distance, ref src/utils.py)
and the host augmentation primitives."""

import numpy as np
import pytest

from deepcharuco_tpu.utils import compute_l2_distance, pixel_error
from deepcharuco_tpu.data import augment as A


def test_compute_l2_distance_per_id_max():
    kpts = np.array([[0.0, 0.0], [10.0, 10.0]])
    ids = np.array([1, 2])
    tgt = np.array([[3.0, 4.0], [10.0, 10.0]])
    tgt_ids = np.array([1, 2])
    d = compute_l2_distance(kpts, ids, tgt, tgt_ids)
    np.testing.assert_allclose(d, [5.0, 0.0])


def test_compute_l2_distance_empty_target():
    assert compute_l2_distance(np.zeros((1, 2)), np.array([0]),
                               np.zeros((0, 2)), np.array([])) is None


def test_pixel_error_report():
    raw = np.array([[1.0, 1.0, 0], [5.0, 5.0, 1]])
    ref = np.array([[0.5, 0.5, 0], [5.2, 5.0, 1]])
    tgt = np.array([[0.0, 0.0, 0], [5.0, 5.0, 1]])
    d_raw, d_ref = pixel_error(raw, ref, tgt, verbose=False)
    np.testing.assert_allclose(d_raw, (np.hypot(1, 1) + 0.0) / 2)
    np.testing.assert_allclose(d_ref, (np.hypot(0.5, 0.5) + 0.2) / 2, rtol=1e-6)


def test_pixel_error_id_mismatch_returns_none():
    raw = np.array([[1.0, 1.0, 7]])
    tgt = np.array([[0.0, 0.0, 0]])
    assert pixel_error(raw, raw, tgt, verbose=False) == (None, None)


def test_match_histograms_matches_cdf(rng):
    img = rng.integers(0, 100, (64, 64, 3)).astype(np.uint8)
    ref = rng.integers(100, 255, (64, 64, 3)).astype(np.uint8)
    out = A.match_histograms(img, ref)
    # matched image statistics move toward the reference's
    assert abs(float(out.mean()) - float(ref.mean())) < 10
    assert out.shape == img.shape and out.dtype == img.dtype


def test_affine_keypoint_consistency(rng):
    """Warping an image and its keypoints with the same matrix keeps marked
    pixels under the transformed keypoints."""
    cv2 = pytest.importorskip("cv2")
    img = np.zeros((100, 100), np.uint8)
    kpts = np.array([[30.0, 40.0], [70.0, 20.0]])
    for x, y in kpts.astype(int):
        img[y, x] = 255
    M = A.affine_matrix(rng, (100, 100), scale_range=(0.8, 1.2),
                        rotate_deg=(-30, 30), shear_deg=(-10, 10),
                        translate_frac=(-0.1, 0.1))
    warped = A.warp_affine(img, M, (100, 100))
    tk = A.transform_keypoints(kpts, M)
    vis = A.keypoints_in_bounds(tk, (100, 100))
    for (x, y), v in zip(tk, vis):
        if v:
            patch = warped[max(0, int(y) - 2):int(y) + 3,
                           max(0, int(x) - 2):int(x) + 3]
            assert patch.max() > 50  # the marked pixel landed nearby


def test_coarse_dropout_drops_keypoints(rng):
    img = np.full((100, 100, 3), 200, np.uint8)
    mask = np.full((100, 100), 255, np.uint8)
    kpts = np.array([[50.0, 50.0]])
    kept_any = removed_any = False
    for seed in range(20):
        r = np.random.default_rng(seed)
        _, _, kp_mask = A.coarse_dropout(r, img, mask, kpts, np.array([True]),
                                         max_holes=6, hole_range=(30, 64))
        kept_any |= bool(kp_mask[0])
        removed_any |= not bool(kp_mask[0])
    assert kept_any and removed_any  # both outcomes occur across seeds
