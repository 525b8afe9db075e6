"""Inference CLI — image(s) → detected corners (+ optional drawn output).

Replaces the reference's ``src/inference.py`` ``__main__`` demo: runs the
fused pipeline on images, prints the reference-format ``(x, y, id)`` keypoint
rows, optionally draws raw (red) and refined (yellow) corners like
``infer_image(draw_pred=True)`` (``inference.py:45-66``) and renders the
classical cv2.aruco side-by-side baseline.
"""

from __future__ import annotations

import argparse
import glob
import os


def build_argparser():
    p = argparse.ArgumentParser(description="DeepCharuco TPU inference")
    p.add_argument("images", nargs="+", help="image files or globs")
    p.add_argument("--config", default=None)
    p.add_argument("--deepc", default=None, help="detector ckpt (.ckpt or orbax dir)")
    p.add_argument("--refinenet", default=None, help="refinenet ckpt")
    p.add_argument("--out-dir", default=None, help="write annotated images here")
    p.add_argument("--cv2-baseline", action="store_true",
                   help="append classical cv2.aruco detection side-by-side")
    p.add_argument("--hires", nargs="?", type=int, const=2, default=0,
                   choices=[2, 4], metavar="SCALE",
                   help="hi-res patch tap: images are at SCALE× the config "
                        "resolution (bare flag = 2); the detector runs on a "
                        "pooled view and RefineNet on full-res patches. "
                        "Printed/drawn coordinates are in the INPUT image's "
                        "pixels")
    p.add_argument("--rn-patch-size", type=int, choices=[24, 32], default=24,
                   help="RefineNet patch size (match the checkpoint)")
    p.add_argument("--rn-decode", choices=["hard", "soft", "offset", "avg"],
                   default=None, help="RefineNet decode (avg needs an "
                                      "offset-head checkpoint)")
    p.add_argument("--geom-decode", action="store_true",
                   help="geometry-consistent decode (planar-homography "
                        "candidate reselection; see ops/geom.py)")
    p.add_argument("--geom-fill", action="store_true",
                   help="with --geom-decode: predict undetected in-frame "
                        "corners at their homography-projected positions "
                        "and refine them (classical "
                        "interpolateCornersCharuco recovery)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import cv2
    import numpy as np

    from deepcharuco_tpu import board as B
    from deepcharuco_tpu.configs import default_config, load_configuration
    from deepcharuco_tpu.pipeline import load_pipeline

    cfg = load_configuration(args.config) if args.config else default_config()
    pipe = load_pipeline(cfg, args.deepc, args.refinenet,
                         rn_patch_size=args.rn_patch_size,
                         rn_decode=args.rn_decode, hires=args.hires,
                         geom_decode=args.geom_decode,
                         geom_fill=args.geom_fill)
    if args.deepc is None:
        print("WARNING: random detector weights (no --deepc given)")

    paths = []
    for pattern in args.images:
        paths.extend(sorted(glob.glob(pattern)) or [pattern])

    if args.cv2_baseline:
        dictionary = B.get_aruco_dict(cfg.board_name)
        brd = B.get_board(cfg)
        params = B.create_detector_parameters()

    for path in paths:
        img = cv2.imread(path)
        if img is None:
            print(f"skipping unreadable {path}")
            continue
        kp, valid, refined = pipe.detect(img[None])
        kp, refined = pipe.input_coords(kp), pipe.input_coords(refined)
        arr = pipe.keypoint_array(refined[0], valid[0])
        print(f"{path}: {int(valid[0].sum())} corners")
        print(arr)

        if args.out_dir:
            os.makedirs(args.out_dir, exist_ok=True)
            vis = B.draw_keypoints_with_validity(img, kp[0], valid[0],
                                                 draw_ids=True, radius=3,
                                                 color=(0, 0, 255))
            vis = B.draw_keypoints_with_validity(vis, refined[0], valid[0],
                                                 radius=1, color=(0, 255, 255))
            if args.cv2_baseline:
                base, _, _ = B.cv2_aruco_detect(img.copy(), dictionary, brd, params)
                vis = np.hstack([vis, base])
            out = os.path.join(args.out_dir, os.path.basename(path))
            cv2.imwrite(out, vis)
            print(f"wrote {out}")


if __name__ == "__main__":
    main()
