"""ChArUco board geometry and host-side rendering.

Capability parity with reference ``src/aruco_utils.py`` (board construction,
rendering, inner-corner layout, classical-aruco comparison baseline, drawing).
Everything here is *setup-time host code*: the board is rendered once per
dataset / app start (ref ``src/transformations.py:77-78``), so cv2 is fine.
The geometry that feeds the on-device PnP solver (:func:`inner_corner_object_points`)
is pure numpy and is the single source of truth for the model-path math.

cv2 is imported lazily so the pure-geometry functions work in cv2-less
environments (e.g. TPU pods without OpenCV wheels).
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# Pure geometry (no cv2) — used by the on-device pose path
# ---------------------------------------------------------------------------

def inner_corner_object_points(row_count: int, col_count: int, square_len: float) -> np.ndarray:
    """3-D object points of the board's inner corners, indexed by corner id.

    Matches the grid built inline in the reference PnP tail
    (``src/inference.py:19-23``): ``meshgrid(1..row-1, 1..col-1)·square_len``
    with z=0, so ``object_points[id]`` corresponds to the detector's corner
    ``id`` ordering.

    Returns (n_ids, 3) float32.
    """
    inn_rc = np.arange(1, row_count)
    inn_cc = np.arange(1, col_count)
    pts = np.zeros(((col_count - 1) * (row_count - 1), 3), np.float32)
    pts[:, :2] = np.array(np.meshgrid(inn_rc, inn_cc)).reshape((2, -1)).T * square_len
    return pts


def inner_corner_pixels(resolution_wh: tuple[int, int], row_count: int, col_count: int) -> np.ndarray:
    """Pixel positions of the inner corners in a rendered board image.

    Same layout + int cast as reference ``src/aruco_utils.py:126-132``:
    ``meshgrid(1..row-1, 1..col-1) * (W/cols, H/rows)`` cast to int.
    Returns (n_ids, 2) int array in (x, y).
    """
    pixel_offset = np.array([resolution_wh[0] / col_count, resolution_wh[1] / row_count])
    inn_rc = np.arange(1, row_count)
    inn_cc = np.arange(1, col_count)
    corners = np.array(np.meshgrid(inn_rc, inn_cc)).reshape((2, -1)).T * pixel_offset
    return corners.astype(int)


def n_inner_corners(row_count: int, col_count: int) -> int:
    return (row_count - 1) * (col_count - 1)


# ---------------------------------------------------------------------------
# cv2-backed board construction / rendering (host, setup-time only)
# ---------------------------------------------------------------------------

def _cv2():
    import cv2

    return cv2


def get_aruco_dict(board_name: str):
    """Predefined aruco dictionary by name, across cv2 API generations
    (ref ``src/aruco_utils.py:76-80``)."""
    cv2 = _cv2()
    dict_id = getattr(cv2.aruco, board_name)
    if hasattr(cv2.aruco, "getPredefinedDictionary"):
        return cv2.aruco.getPredefinedDictionary(dict_id)
    return cv2.aruco.Dictionary_get(dict_id)


def get_board(config):
    """Construct the cv2 CharucoBoard across API generations
    (ref ``src/aruco_utils.py:53-73``)."""
    cv2 = _cv2()
    dictionary = get_aruco_dict(config.board_name)
    if hasattr(cv2.aruco, "CharucoBoard"):
        try:
            return cv2.aruco.CharucoBoard(
                (config.col_count, config.row_count),
                config.square_len,
                config.marker_len,
                dictionary,
            )
        except TypeError:
            pass
    return cv2.aruco.CharucoBoard_create(
        squaresX=config.col_count,
        squaresY=config.row_count,
        squareLength=config.square_len,
        markerLength=config.marker_len,
        dictionary=dictionary,
    )


def board_image(board, resolution_wh: tuple[int, int], row_count: int, col_count: int):
    """Render the board and return (BGR image, inner-corner int pixel coords).

    Semantics of reference ``src/aruco_utils.py:83-132``.
    """
    cv2 = _cv2()
    if hasattr(board, "generateImage"):
        gray = board.generateImage(resolution_wh)
    else:
        gray = board.draw(outSize=resolution_wh)
    img = cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR)
    corners = inner_corner_pixels(resolution_wh, row_count, col_count)
    return img, corners


def create_detector_parameters():
    """cv2 aruco detector params across API generations (ref ``src/aruco_utils.py:6-9``)."""
    cv2 = _cv2()
    if hasattr(cv2.aruco, "DetectorParameters"):
        return cv2.aruco.DetectorParameters()
    return cv2.aruco.DetectorParameters_create()


def get_board_object_points(board) -> np.ndarray:
    """Marker object points from the cv2 board object (ref ``src/aruco_utils.py:19-22``)."""
    if hasattr(board, "getObjPoints"):
        return np.array(board.getObjPoints(), dtype=np.float32)
    return np.array(board.objPoints, dtype=np.float32)


def _detect_markers(gray, dictionary, parameters):
    """Raw classical marker detection, across cv2 API generations (4.7+
    object API vs the older module function). Returns (corners, ids,
    rejected) exactly as cv2 hands them out."""
    cv2 = _cv2()
    if hasattr(cv2.aruco, "ArucoDetector"):
        return cv2.aruco.ArucoDetector(dictionary, parameters).detectMarkers(gray)
    return cv2.aruco.detectMarkers(gray, dictionary, parameters=parameters)


def cv2_aruco_detect(image, dictionary, board, parameters):
    """Classical-aruco comparison baseline: marker detection, board-aware
    refinement, annotation — three independent stages (functional
    counterpart of the reference's baseline path, ``src/aruco_utils.py:25-50``).
    Returns (annotated BGR image, marker corners, marker ids).
    """
    cv2 = _cv2()
    gray = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
    corners, ids, rejected = _detect_markers(gray, dictionary, parameters)

    refine = getattr(cv2.aruco, "refineDetectedMarkers", None)
    if refine is not None and ids is not None:
        # some cv2 builds reject a None/odd-shaped rejected list — hand it a
        # well-formed empty array instead of branching on the exception
        if rejected is None or len(rejected) == 0:
            rejected = np.empty((0, 1, 4, 2), np.float32)
        try:
            corners, ids, rejected, _ = refine(image, board, corners, ids,
                                               rejected)
        except (TypeError, cv2.error):
            # builds that choke on the tuple-of-arrays rejected format:
            # retry without rejected candidates rather than lose the frame
            corners, ids, rejected, _ = refine(
                image, board, corners, ids, np.empty((0, 1, 4, 2), np.float32))

    annotated = image
    if ids is not None and len(corners) > 0:
        pts = np.concatenate([np.asarray(c, np.float32).reshape(-1, 2)
                              for c in corners])
        annotated = draw_inner_corners(image, pts, np.arange(len(pts)))
    return annotated, corners, ids


# ---------------------------------------------------------------------------
# Drawing (host-side visualization; fills the role of the reference's
# draw_inner_corners/draw_circle_pred, src/aruco_utils.py:135-256)
# ---------------------------------------------------------------------------

def draw_inner_corners(img, corners, ids, draw_ids: bool = False, radius: int = 2,
                       color=(0, 0, 255)):
    """Draw corner markers (+ optional green id labels) on a BGR image.

    Points are rounded and mask-filtered up front (points past the
    bottom/right image edge are dropped, matching the reference renderer's
    skip rule); only the cv2 draw calls themselves loop.
    """
    cv2 = _cv2()
    assert img.ndim == 3 and img.shape[-1] == 3
    canvas = img.copy()
    pts = np.round(np.asarray(corners, np.float64)[:, :2]).astype(int)
    labels = np.asarray(ids)
    keep = (pts[:, 0] <= img.shape[1]) & (pts[:, 1] <= img.shape[0])
    for x, y in pts[keep]:
        cv2.circle(canvas, (int(x), int(y)), radius=radius, color=color,
                   thickness=1)
    if draw_ids:
        font = cv2.FONT_HERSHEY_COMPLEX_SMALL
        for (x, y), idx in zip(pts[keep], labels[keep]):
            text = str(idx)
            (tw, th), _ = cv2.getTextSize(text, font, 0.5, 1)
            cv2.putText(canvas, text, (int(x) - tw // 2 - 7, int(y) + th // 2 - 3),
                        font, 0.45, (0, 255, 0), 1)
    return canvas


def draw_keypoints_with_validity(img, keypoints, valid, draw_ids: bool = False,
                                 radius: int = 2, color=(0, 255, 255)):
    """Draw the fixed-capacity (n_ids, 2) keypoint array produced by the TPU
    decode ops, honouring the validity mask. Functional analogue of reference
    ``draw_circle_pred`` (``src/aruco_utils.py:195-256``), which draws decoded
    label maps; here decode already happened on device."""
    kpts = np.asarray(keypoints)
    valid = np.asarray(valid)
    ids = np.arange(kpts.shape[0])
    return draw_inner_corners(img, kpts[valid], ids[valid], draw_ids=draw_ids,
                              radius=radius, color=color)
