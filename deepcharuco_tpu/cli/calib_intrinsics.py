"""Camera-intrinsics calibration CLI — replacement for reference
``src/calib_intrinsics.py``.

Classic chessboard calibration is offline host tooling (cv2's C++ solvers are
the right tool); the output ``camera_params.npz`` feeds the on-device PnP via
:class:`deepcharuco_tpu.pipeline.Camera`. Flags replace the reference's
hardcoded paths/constants (``calib_intrinsics.py:7-16``).

Beyond the reference, ``--charuco`` calibrates from views of the ChArUco
board itself using the framework's own two-stage pipeline for the
correspondences — the same board used for pose tracking calibrates the
camera, including in low light where classical chessboard detection fails
(the regime the Deep ChArUco paper targets). Only measured detections feed
the solver; homography fills are never enabled here (same principle as the
pose path: synthesized corners must not constrain geometry estimation).
"""

from __future__ import annotations

import argparse
import glob
import os


def build_argparser():
    p = argparse.ArgumentParser(description="Camera intrinsics calibration")
    p.add_argument("image_dir", help="directory with calibration *.png frames")
    p.add_argument("--pattern", default="9x6",
                   help="inner-corner grid for chessboard mode, e.g. 9x6")
    p.add_argument("--stride", type=int, default=5,
                   help="use every Nth frame")
    p.add_argument("--out", default=None,
                   help="output npz (default <dir>/camera_params.npz)")
    # --- deep ChArUco mode ---
    p.add_argument("--charuco", action="store_true",
                   help="calibrate from ChArUco-board views via the deep "
                        "two-stage pipeline instead of a chessboard")
    p.add_argument("--config", default=None,
                   help="board yaml for --charuco (default: built-in config)")
    p.add_argument("--deepc", default="artifacts/detector_devsynth.npz",
                   help="detector weights for --charuco")
    p.add_argument("--refinenet", default="artifacts/refinenet32_devsynth.npz",
                   help="RefineNet weights for --charuco")
    p.add_argument("--rn-patch-size", type=int, choices=[24, 32], default=32,
                   help="RefineNet patch size matching --refinenet")
    p.add_argument("--rn-decode", default="avg",
                   choices=["hard", "soft", "offset", "avg"],
                   help="RefineNet decode for --charuco")
    p.add_argument("--geom-decode", action="store_true",
                   help="geometry-consistent candidate reselection "
                        "(measured detections only; fills never feed "
                        "calibration)")
    p.add_argument("--hires", nargs="?", type=int, const=2, default=0,
                   help="hi-res patch tap: detector on the pooled view, "
                        "RefineNet patches at native resolution")
    p.add_argument("--min-corners", type=int, default=6,
                   help="per-view acceptance gate for --charuco")
    p.add_argument("--batch", type=int, default=16,
                   help="frames per pipeline dispatch for --charuco")
    p.add_argument("--full-dist", action="store_true",
                   help="fit the full 5-coeff distortion model "
                        "(default: zero tangential + fixed k3, the stable "
                        "choice for small view counts)")
    return p


def load_gray_frames(paths):
    """Read frames as grayscale uint8, cropped to H/W multiples of 8.

    Cropping the bottom/right edges keeps the pixel origin (and therefore
    the intrinsics being estimated) unchanged; the detector's stride-8
    decode grid requires the multiple-of-8 shape.
    """
    import cv2
    import numpy as np

    frames = []
    for path in paths:
        img = cv2.imread(path)
        if img is None:
            continue
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        h, w = gray.shape
        gray = gray[: h - h % 8, : w - w % 8]
        frames.append(gray)
    if not frames:
        raise SystemExit("no readable frames")
    shape = frames[0].shape
    if any(f.shape != shape for f in frames):
        raise SystemExit("calibration frames must share one resolution")
    return np.stack(frames)


def charuco_calibrate(frames, config, deepc, refinenet, *,
                      rn_patch_size: int = 32, rn_decode: str = "avg",
                      geom_decode: bool = False, hires=0,
                      min_corners: int = 6, batch: int = 16,
                      simple_dist: bool = True, verbose: bool = True):
    """Intrinsics from ChArUco-board views via the deep pipeline.

    The correspondence set is exactly the pose path's: refined sub-pixel
    corners paired with :func:`board.inner_corner_object_points` rows by
    corner id (the grid the reference builds inline in its PnP tail,
    ``src/inference.py:19-23``), fed to ``cv2.calibrateCamera`` per view.

    frames: (N, H, W) uint8 grayscale, H/W multiples of 8.
    Returns ``(K, dist, mean_reprojection_px, n_views_used)``.
    """
    import cv2
    import numpy as np

    from deepcharuco_tpu.board import inner_corner_object_points
    from deepcharuco_tpu.pipeline import load_pipeline

    pipe = load_pipeline(config, deepc, refinenet,
                         rn_patch_size=rn_patch_size, rn_decode=rn_decode,
                         geom_decode=geom_decode, hires=hires)
    object_points = inner_corner_object_points(
        config.row_count, config.col_count, config.square_len)

    obj_list, img_list = [], []
    n, h, w = frames.shape[:3]
    for start in range(0, n, batch):
        chunk = frames[start:start + batch]
        _, valid, refined = pipe.detect(chunk)
        for i in range(len(chunk)):
            ids = np.nonzero(valid[i])[0]
            if len(ids) < min_corners:
                continue
            pts = pipe.input_coords(refined[i][ids])
            obj_list.append(object_points[ids])
            img_list.append(
                np.asarray(pts, np.float32).reshape(-1, 1, 2))

    if len(obj_list) < 3:
        raise SystemExit(
            f"only {len(obj_list)}/{n} views passed the >= {min_corners}"
            f"-corner gate; need >= 3 usable views")

    if verbose:
        per_view = [len(o) for o in obj_list]
        print(f"calibrating on {len(obj_list)}/{n} views "
              f"({min(per_view)}-{max(per_view)} corners each)...")
    flags = (cv2.CALIB_ZERO_TANGENT_DIST | cv2.CALIB_FIX_K3
             if simple_dist else 0)
    ret, K, dist, rvecs, tvecs = cv2.calibrateCamera(
        obj_list, img_list, (w, h), None, None, flags=flags)

    err = 0.0
    for i in range(len(obj_list)):
        proj, _ = cv2.projectPoints(obj_list[i], rvecs[i], tvecs[i], K, dist)
        diff = img_list[i].reshape(-1, 2).astype(np.float64) - proj.reshape(-1, 2)
        err += float(np.sqrt(np.mean(np.sum(diff ** 2, axis=1))))
    err /= len(obj_list)
    if verbose:
        print(f"mean reprojection error: {err:.4f} px")
    return K, dist, err, len(obj_list)


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import cv2
    import numpy as np

    if args.charuco:
        from deepcharuco_tpu.configs import default_config, load_configuration

        config = (load_configuration(args.config) if args.config
                  else default_config())
        paths = sorted(glob.glob(os.path.join(args.image_dir, "*.png")))
        if not paths:
            raise SystemExit(f"no *.png frames under {args.image_dir}")
        frames = load_gray_frames(paths[::args.stride])
        K, dist, err, _ = charuco_calibrate(
            frames, config, args.deepc, args.refinenet,
            rn_patch_size=args.rn_patch_size, rn_decode=args.rn_decode,
            geom_decode=args.geom_decode, hires=args.hires,
            min_corners=args.min_corners, batch=args.batch,
            simple_dist=not args.full_dist)
        out = args.out or os.path.join(args.image_dir, "camera_params.npz")
        np.savez(out, camera_matrix=K, distortion_coeffs=dist)
        print(f"saved {out}")
        return

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
