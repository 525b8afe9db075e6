"""Camera-intrinsics calibration CLI — replacement for reference
``src/calib_intrinsics.py``.

Classic chessboard calibration is offline host tooling (cv2's C++ solvers are
the right tool); the output ``camera_params.npz`` feeds the on-device PnP via
:class:`deepcharuco_tpu.pipeline.Camera`. Flags replace the reference's
hardcoded paths/constants (``calib_intrinsics.py:7-16``).
"""

from __future__ import annotations

import argparse
import glob
import os


def build_argparser():
    p = argparse.ArgumentParser(description="Chessboard camera calibration")
    p.add_argument("image_dir", help="directory with calibration *.png frames")
    p.add_argument("--pattern", default="9x6",
                   help="inner-corner grid, e.g. 9x6")
    p.add_argument("--stride", type=int, default=5,
                   help="use every Nth frame")
    p.add_argument("--out", default=None,
                   help="output npz (default <dir>/camera_params.npz)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import cv2
    import numpy as np

    cols, rows = (int(v) for v in args.pattern.split("x"))
    size = (cols, rows)
    term = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 0.001)

    paths = sorted(glob.glob(os.path.join(args.image_dir, "*.png")))
    if not paths:
        raise SystemExit(f"no *.png frames under {args.image_dir}")

    objp = np.zeros((cols * rows, 3), np.float32)
    objp[:, :2] = np.mgrid[0:cols, 0:rows].T.reshape(-1, 2)

    obj_points, img_points = [], []
    shape = None
    for path in paths[::args.stride]:
        img = cv2.imread(path)
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        shape = gray.shape[::-1]
        found, corners = cv2.findChessboardCorners(
            gray, size,
            cv2.CALIB_CB_ADAPTIVE_THRESH | cv2.CALIB_CB_FAST_CHECK
            | cv2.CALIB_CB_NORMALIZE_IMAGE,
        )
        if found:
            refined = cv2.cornerSubPix(gray, corners, (11, 11), (-1, -1), term)
            obj_points.append(objp)
            img_points.append(refined)

    if len(obj_points) < 3:
        raise SystemExit(f"only {len(obj_points)} usable frames; need >= 3")

    print(f"calibrating on {len(obj_points)} frames...")
    ret, K, dist, rvecs, tvecs = cv2.calibrateCamera(
        obj_points, img_points, shape, None, None
    )

    err = 0.0
    for i in range(len(obj_points)):
        proj, _ = cv2.projectPoints(obj_points[i], rvecs[i], tvecs[i], K, dist)
        diff = img_points[i].reshape(-1, 2).astype(np.float64) - proj.reshape(-1, 2)
        err += float(np.linalg.norm(diff)) / len(proj)
    print(f"mean reprojection error: {err / len(obj_points):.4f} px")

    out = args.out or os.path.join(args.image_dir, "camera_params.npz")
    np.savez(out, camera_matrix=K, distortion_coeffs=dist)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
