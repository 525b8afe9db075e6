"""Pose-estimation video CLI — replacement for reference ``src/pose_estimation.py``.

Per-frame flow there: ``infer_image`` → host ``cv2.solvePnP`` →
``drawFrameAxes`` → classical cv2.aruco side-by-side → mp4
(``pose_estimation.py:52-91``). Here the frames are processed in device-sized
batches through the fused detect+pose program (one XLA call per batch instead
of two transfers + a CPU solve per frame); drawing and video encode stay on
host.
"""

from __future__ import annotations

import argparse
import glob
import os


def build_argparser():
    p = argparse.ArgumentParser(description="Board pose over a frame directory")
    p.add_argument("input_dir", help="directory of *.png frames")
    p.add_argument("--config", default=None)
    p.add_argument("--deepc", default=None)
    p.add_argument("--refinenet", default=None)
    p.add_argument("--camera", default=None,
                   help="camera_params.npz (camera_matrix, distortion_coeffs)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--out", default=None, help="output mp4 (default res.mp4 in input dir)")
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--cv2-baseline", action="store_true",
                   help="render classical cv2.aruco estimate side-by-side")
    p.add_argument("--ransac", action="store_true",
                   help="robust pose: in-jit RANSAC over detections instead "
                        "of plain least squares")
    p.add_argument("--hires", nargs="?", type=int, const=2, default=0,
                   choices=[2, 4], metavar="SCALE",
                   help="hi-res patch tap: frames are at SCALE× the config "
                        "resolution (bare flag = 2); detector on the pooled "
                        "view, RefineNet on full-res patches. --camera is "
                        "the one calibrated at the frame (hi-res) resolution")
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
    p.add_argument("--smooth", action="store_true",
                   help="temporal pose filter (pose_filter.PoseFilter): "
                        "constant-velocity smoothing, planar-ambiguity flip "
                        "rejection, and coasting through short detection "
                        "dropouts — the reference draws each frame's raw "
                        "PnP result")
    p.add_argument("--smooth-gate-deg", type=float, default=15.0,
                   help="with --smooth: per-frame rotation innovation gate")
    p.add_argument("--smooth-max-coast", type=int, default=5,
                   help="with --smooth: frames predicted through a dropout "
                        "before the track is declared lost")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import cv2
    import numpy as np

    from deepcharuco_tpu import board as B
    from deepcharuco_tpu.configs import default_config, load_configuration
    from deepcharuco_tpu.pipeline import Camera, load_pipeline
    from deepcharuco_tpu.utils import save_video

    cfg = load_configuration(args.config) if args.config else default_config()

    if args.camera:
        camera = Camera.from_npz(args.camera)
    else:
        # fall back to a nominal pinhole at the FRAME resolution (2x the
        # config when --hires) so the pipeline still runs
        h, w = cfg.input_hw
        if args.hires:
            h, w = args.hires * h, args.hires * w
        camera = Camera(
            K=np.array([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1]], np.float32),
            dist=np.zeros(5, np.float32),
        )
        print("WARNING: no --camera given; using nominal intrinsics")

    pipe = load_pipeline(cfg, args.deepc, args.refinenet, camera=camera,
                         rn_patch_size=args.rn_patch_size,
                         rn_decode=args.rn_decode, hires=args.hires,
                         geom_decode=args.geom_decode,
                         geom_fill=args.geom_fill)

    if args.cv2_baseline:
        dictionary = B.get_aruco_dict(cfg.board_name)
        brd = B.get_board(cfg)
        params = B.create_detector_parameters()

    paths = sorted(glob.glob(os.path.join(args.input_dir, "*.png")))
    if not paths:
        raise SystemExit(f"no *.png frames under {args.input_dir}")

    if args.ransac:
        import jax
        import jax.numpy as jnp

        from deepcharuco_tpu.pnp.ransac import solve_pnp_ransac_batch

        ransac_key = jax.random.PRNGKey(0)

    pose_filter = None
    if args.smooth:
        from deepcharuco_tpu.pose_filter import PoseFilter

        # translation gate scaled to the board: 10 squares of motion per
        # frame is far beyond any plausible track
        pose_filter = PoseFilter(gate_deg=args.smooth_gate_deg,
                                 gate_t=10.0 * cfg.square_len,
                                 max_coast=args.smooth_max_coast)
        smooth_stats = {"tracking": 0, "coasting": 0, "lost": 0}

    frames_out = []
    for i in range(0, len(paths), args.batch):
        chunk = paths[i:i + args.batch]
        imgs = [cv2.imread(p) for p in chunk]
        batch = np.stack(imgs)
        if args.ransac:
            kp, valid, refined = pipe.detect(batch)
            ransac_key, sub = jax.random.split(ransac_key)
            # detections are in the pipeline's working units (pooled view
            # when --hires), so solve with the matching intrinsics
            cam_solve = camera.scaled(1.0 / args.hires) if args.hires else camera
            ok, rvec, tvec, rms, _ = solve_pnp_ransac_batch(
                pipe.object_points, jnp.asarray(refined), jnp.asarray(valid),
                jnp.asarray(cam_solve.K, jnp.float32),
                jnp.asarray(cam_solve.dist, jnp.float32), sub)
            ok, rvec, tvec = np.asarray(ok), np.asarray(rvec), np.asarray(tvec)
        else:
            kp, valid, refined, ok, rvec, tvec, rms = pipe.detect_with_pose(batch)
        # draw in the frame's own pixels (identity unless --hires)
        kp, refined = pipe.input_coords(kp), pipe.input_coords(refined)

        if pose_filter is not None:
            # sequential by nature: consume the batch's poses in frame order
            ok = np.asarray(ok).copy()
            rvec = np.asarray(rvec, np.float64).copy()
            tvec = np.asarray(tvec, np.float64).copy()
            for j in range(len(imgs)):
                ok_f, rv_f, tv_f, state = pose_filter.update(
                    bool(ok[j]), rvec[j].reshape(3), tvec[j].reshape(3))
                smooth_stats[state] += 1
                ok[j], rvec[j], tvec[j] = ok_f, rv_f.reshape(rvec[j].shape), \
                    tv_f.reshape(tvec[j].shape)

        for j, img in enumerate(imgs):
            vis = B.draw_keypoints_with_validity(img, kp[j], valid[j],
                                                 draw_ids=True, radius=3,
                                                 color=(0, 0, 255))
            vis = B.draw_keypoints_with_validity(vis, refined[j], valid[j],
                                                 radius=1, color=(0, 255, 255))
            if ok[j]:
                cv2.drawFrameAxes(vis, camera.K, camera.dist,
                                  rvec[j].reshape(3, 1), tvec[j].reshape(3, 1),
                                  0.01, 2)
            if args.cv2_baseline:
                base, corners, ids = B.cv2_aruco_detect(img.copy(), dictionary,
                                                        brd, params)
                pts = np.array(corners).reshape((-1, 2)) if len(corners) else np.zeros((0, 2))
                if pts.shape[0] >= 4 and ids is not None:
                    objp = B.get_board_object_points(brd)[ids.ravel()].reshape(-1, 3)
                    r_ok, r_cv, t_cv = cv2.solvePnP(objp.astype(np.float32),
                                                    pts.astype(np.float32),
                                                    camera.K, camera.dist)
                    if r_ok:
                        cv2.drawFrameAxes(base, camera.K, camera.dist, r_cv, t_cv,
                                          0.01, 2)
                vis = np.hstack([vis, base])
            frames_out.append(vis)
        print(f"{min(i + args.batch, len(paths))}/{len(paths)} frames")

    if pose_filter is not None:
        print("pose filter: " + ", ".join(
            f"{k} {v}" for k, v in smooth_stats.items()))

    out = args.out or os.path.join(args.input_dir, "res.mp4")
    save_video(frames_out, out, fps=args.fps)


if __name__ == "__main__":
    main()
