"""Board geometry unit tests — hand-computed grids (ref src/aruco_utils.py:83-132,
src/inference.py:19-23)."""

import numpy as np
import pytest

from deepcharuco_tpu import board as B
from deepcharuco_tpu.configs import default_config


def test_object_points_5x5_board():
    pts = B.inner_corner_object_points(5, 5, 0.01)
    assert pts.shape == (16, 3)
    assert pts.dtype == np.float32
    # Reference layout: meshgrid(1..4, 1..4).reshape(2,-1).T * square_len.
    # First block iterates x=1..4 at y=1.
    np.testing.assert_allclose(pts[0], [0.01, 0.01, 0.0], rtol=1e-6)
    np.testing.assert_allclose(pts[1], [0.02, 0.01, 0.0], rtol=1e-6)
    np.testing.assert_allclose(pts[4], [0.01, 0.02, 0.0], rtol=1e-6)
    np.testing.assert_allclose(pts[15], [0.04, 0.04, 0.0], rtol=1e-6)
    assert np.all(pts[:, 2] == 0)


def test_inner_corner_pixels_matches_hand_grid():
    # 240x240 render of a 5x5 board → pixel offset 48 in both axes.
    corners = B.inner_corner_pixels((240, 240), 5, 5)
    assert corners.shape == (16, 2)
    np.testing.assert_array_equal(corners[0], [48, 48])
    np.testing.assert_array_equal(corners[1], [96, 48])
    np.testing.assert_array_equal(corners[4], [48, 96])
    np.testing.assert_array_equal(corners[15], [192, 192])


def test_inner_corner_pixels_int_cast_truncates():
    # Non-divisible resolution: reference casts to int (truncation).
    corners = B.inner_corner_pixels((250, 250), 5, 5)
    assert corners.dtype in (np.int64, np.int32)
    np.testing.assert_array_equal(corners[0], [50, 50])


def test_n_inner_corners():
    assert B.n_inner_corners(5, 5) == 16
    assert B.n_inner_corners(3, 4) == 6


@pytest.mark.filterwarnings("ignore")
def test_board_render_cv2():
    cv2 = pytest.importorskip("cv2")
    cfg = default_config()
    brd = B.get_board(cfg)
    img, corners = B.board_image(brd, (240, 240), cfg.row_count, cfg.col_count)
    assert img.shape == (240, 240, 3)
    assert corners.shape == (16, 2)
    # Board pixels are black/white dominated
    assert img.max() == 255

    # Parity against the reference's bundled render of the same config
    import os

    ref = "/root/reference/src/reference/board_image_240x240.jpg"
    if os.path.exists(ref):
        ref_img = cv2.imread(ref)
        # JPEG artifacts → compare loosely
        agree = np.mean(np.abs(ref_img.astype(int) - img.astype(int)) < 40)
        assert agree > 0.95


def test_object_points_match_reference_pnp_grid():
    """The object grid must equal the one reference solve_pnp builds inline."""
    row_count = col_count = 5
    square_len = 0.01
    inn_rc = np.arange(1, row_count)
    inn_cc = np.arange(1, col_count)
    ref = np.zeros(((col_count - 1) * (row_count - 1), 3), np.float32)
    ref[:, :2] = np.array(np.meshgrid(inn_rc, inn_cc)).reshape((2, -1)).T * square_len
    ours = B.inner_corner_object_points(row_count, col_count, square_len)
    np.testing.assert_array_equal(ref, ours)
