"""Accuracy evaluation CLI — the reference's ``inference.py __main__`` study.

Runs the seeded validation stream (synthetic boards), compares detector-only
vs RefineNet-refined corners against ground-truth labels (the reference's
``up_scale`` study + ``pixel_error`` report, ``src/inference.py:111-162``,
``src/utils.py:33-52``), and optionally the classical cv2.aruco detector as
an oracle baseline. Supports both the host (reference-distribution) and the
on-device synthetic val streams.
"""

from __future__ import annotations

import argparse


def build_argparser():
    p = argparse.ArgumentParser(description="Corner-accuracy evaluation")
    p.add_argument("--config", default=None)
    p.add_argument("--deepc", default=None)
    p.add_argument("--refinenet", default=None)
    p.add_argument("--samples", type=int, default=64)
    p.add_argument("--source", choices=["host", "device"], default="device",
                   help="validation stream: host (cv2, reference semantics) "
                        "or device (on-TPU synthesis)")
    p.add_argument("--px-margin", type=float, default=3.0)
    p.add_argument("--min-margin", type=float, default=None,
                   help="id-vs-dustbin logit margin filter (decode knob)")
    p.add_argument("--truth", choices=["labels", "subpixel"], default="labels",
                   help="reference corners: quantized label maps (reference "
                        "semantics) or exact warp-derived sub-pixel positions "
                        "(device source only; the honest metric for refined "
                        "corners)")
    p.add_argument("--rn-offset", action="store_true",
                   help="decode via the direct offset-regression branch "
                        "(requires a checkpoint trained with "
                        "--offset-weight; overrides --soft-argmax)")
    p.add_argument("--rn-avg", action="store_true",
                   help="average the soft-argmax heatmap decode and the "
                        "offset-branch decode — two partly-independent "
                        "estimators of the same corner (requires an "
                        "offset-head checkpoint; overrides --rn-offset)")
    p.add_argument("--soft-argmax", action="store_true",
                   help="decode the refine heatmap with soft-argmax "
                        "(continuous sub-pixel) instead of hard argmax")
    p.add_argument("--rn-upsample", choices=["nearest", "bilinear"],
                   default="nearest",
                   help="RefineNet decoder upsampling mode (weights are "
                        "mode-agnostic; match how the net was trained)")
    p.add_argument("--rn-patch-size", type=int, choices=[24, 32], default=24,
                   help="RefineNet input patch size (must match the "
                        "checkpoint: 24 parity / 32 wider-context)")
    p.add_argument("--images", default=None)
    p.add_argument("--labels", default=None)
    p.add_argument("--frontal", action="store_true",
                   help="device source: frontal probe — axis-snapped "
                        "geometry (n·90° ±2°, near-zero shear, translation "
                        "±0.1) with the STANDARD photometric pipeline; the "
                        "in-distribution frontal eval (the old clean-render "
                        "probe was photometrically off-distribution)")
    p.add_argument("--scale", type=float, default=None,
                   help="device source: pin the board scale (e.g. 1.0 for "
                        "the full-frame frontal probe)")
    p.add_argument("--hires", nargs="?", type=int, const=2, default=0,
                   choices=[2, 4], metavar="SCALE",
                   help="hi-res patch tap protocol: synthesize SCALE×-"
                        "resolution frames (bare flag = 2), detector on the "
                        "pooled view, RefineNet on full-res patches "
                        "(two_stage_forward_hires); errors reported in "
                        "base-config px (device+subpixel only)")
    p.add_argument("--geom-decode", action="store_true",
                   help="geometry-consistent decode: per-id candidate "
                        "reselection by planar-homography consistency, incl. "
                        "loc-gate-override candidates (ops/geom.py) — "
                        "training-free recall/outlier gains, see BENCH_NOTES")
    p.add_argument("--geom-fill", action="store_true",
                   help="with --geom-decode: fill undetected in-frame ids at "
                        "their homography-projected positions before "
                        "refinement (ops.fill_from_homography) — the "
                        "completeness mode; fills are refined by the same "
                        "RefineNet pass")
    p.add_argument("--geom-ransac", type=int, default=32,
                   help="with --geom-decode: RANSAC seed subset count "
                        "(ops/geom.py ransac_subsets; 0 = least-squares "
                        "seed) — the cost/robustness knob")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepcharuco_tpu.configs import default_config, load_configuration
    from deepcharuco_tpu.models import RefineNet
    from deepcharuco_tpu.ops import (
        extract_patches,
        label_to_keypoints,
        pred_to_keypoints,
        refine_keypoints,
        refine_keypoints_soft,
    )
    from deepcharuco_tpu.pipeline import load_detector_any, load_model_variables

    cfg = load_configuration(args.config) if args.config else default_config()
    # int8 artifacts (scripts/quantize_detector.py) route automatically —
    # QuantDetector mirrors Detector.apply's contract
    det, dv = load_detector_any(args.deepc, cfg.n_ids,
                                compute_dtype=jnp.float32)
    rn = RefineNet(dtype=jnp.float32, upsample=args.rn_upsample,
                   patch_size=args.rn_patch_size,
                   offset_head=args.rn_offset or args.rn_avg)
    if args.refinenet is None:
        # init must match THIS eval's architecture (patch size / offset head),
        # not load_model_variables' default 24-patch parity net
        ps = args.rn_patch_size
        rv = rn.init(jax.random.PRNGKey(0), jnp.zeros((1, ps, ps, 1), jnp.float32))
    else:
        rv = load_model_variables(args.refinenet, "refinenet")
    if args.deepc is None:
        print("WARNING: random detector weights")

    if args.geom_fill and not args.geom_decode:
        raise SystemExit("--geom-fill requires --geom-decode")

    if args.geom_decode:
        from deepcharuco_tpu.board import inner_corner_object_points
        from deepcharuco_tpu.ops import pred_to_keypoints_geom

        board_xy = jnp.asarray(inner_corner_object_points(
            cfg.row_count, cfg.col_count, cfg.square_len)[:, :2])

        def decode(loc_hat, ids_hat):
            kp, v = pred_to_keypoints_geom(loc_hat, ids_hat, cfg.n_ids,
                                           board_xy,
                                           min_margin=args.min_margin,
                                           ransac_subsets=args.geom_ransac)
            if args.geom_fill:
                from deepcharuco_tpu.ops import fill_from_homography

                h, w = cfg.input_hw
                kp, v, _ = jax.vmap(lambda k, m: fill_from_homography(
                    k, m, board_xy, (h, w)))(kp, v)
            return kp, v
    else:
        def decode(loc_hat, ids_hat):
            return pred_to_keypoints(loc_hat, ids_hat, cfg.n_ids,
                                     min_margin=args.min_margin)

    @jax.jit
    def forward(images):
        out = det.apply(dv, images)
        kp, valid = decode(out["loc"], out["ids"])
        patches = extract_patches(images, kp, patch_size=args.rn_patch_size)
        n, k, p, _ = patches.shape
        out = rn.apply(rv, patches.reshape(n * k, p, p, 1))
        if args.rn_avg:
            heat = out["heat"].reshape(n, k, 64, 64)
            refined = 0.5 * (refine_keypoints_soft(heat, kp)
                             + kp + out["offset"].reshape(n, k, 2))
        elif args.rn_offset:
            refined = kp + out["offset"].reshape(n, k, 2)
        else:
            heat = (out["heat"] if isinstance(out, dict) else out)
            heat = heat.reshape(n, k, 64, 64)
            refined = (refine_keypoints_soft(heat, kp) if args.soft_argmax
                       else refine_keypoints(heat, kp))
        return kp, valid, refined

    if args.hires:
        if args.source != "device" or args.truth != "subpixel":
            raise SystemExit("--hires requires --source device --truth subpixel")

        from deepcharuco_tpu.pipeline import two_stage_forward_hires

        hires_mode = ("avg" if args.rn_avg else "offset" if args.rn_offset
                      else "soft" if args.soft_argmax else "hard")

        gxy = board_xy if args.geom_decode else None

        @jax.jit
        def forward(images_hi):  # noqa: F811 — the hi-res tap forward
            return two_stage_forward_hires(det, rn, dv, rv, images_hi,
                                           cfg.n_ids,
                                           min_margin=args.min_margin,
                                           rn_decode=hires_mode,
                                           geom_board_xy=gxy,
                                           geom_fill=args.geom_fill,
                                           geom_ransac=args.geom_ransac,
                                           scale=args.hires)

    bs = 16
    n_batches = max(1, args.samples // bs)

    if args.truth == "subpixel" and args.source != "device":
        raise SystemExit("--truth subpixel requires --source device")

    if args.source == "device":
        from deepcharuco_tpu.configs import scaled_config
        from deepcharuco_tpu.data.device_synth import DeviceSynthesizer

        sr = (args.scale, args.scale + 1e-4) if args.scale else None
        synth_cfg = scaled_config(cfg, args.hires) if args.hires else cfg
        synth = DeviceSynthesizer(synth_cfg,
                                  negative_p=0.0 if args.frontal else 0.05,
                                  axis_snap_p=1.0 if args.frontal else 0.0,
                                  scale_range=sr)
        if args.frontal:
            synth.translate_frac = (-0.1, 0.1)  # keep the board in frame
        if args.truth == "subpixel":
            full_fn = jax.jit(lambda key: jax.vmap(synth._sample_full)(
                jax.random.split(key, bs)))

            def batches():
                for j in range(n_batches):
                    images, loc, ids, kpts, vis = full_fn(jax.random.PRNGKey(j))
                    if args.hires:
                        # hi-res coords → base-config px (pool convention:
                        # x_hi = s·x_lo + (s−1)/2)
                        s = args.hires
                        kpts = (kpts - (s - 1) * 0.5) / s
                    yield images, (kpts, vis)
        else:
            gen = synth.batch_fn(bs)

            def batches():
                for j in range(n_batches):
                    images, loc, ids = gen(jax.random.PRNGKey(j))
                    yield images, (loc, ids)
    else:
        from deepcharuco_tpu.data import CharucoDataset

        ds = CharucoDataset(cfg, labels=args.labels, images_folder=args.images,
                            validation=True)

        def batches():
            for j in range(n_batches):
                items = [ds[j * bs + k] for k in range(bs)]
                yield (jnp.asarray(np.stack([it["image"] for it in items])),
                       (jnp.asarray(np.stack([it["loc"] for it in items])),
                        jnp.asarray(np.stack([it["ids"] for it in items]))))

    raw_errs, ref_errs = [], []
    n_matched = n_target = n_pred = 0
    for images, truth in batches():
        kp, valid, refined = forward(images)
        if args.truth == "subpixel":
            kp_t, valid_t = truth
        else:
            kp_t, valid_t = label_to_keypoints(truth[0], truth[1], cfg.n_ids)
        kp, valid, refined = np.asarray(kp), np.asarray(valid), np.asarray(refined)
        kp_t, valid_t = np.asarray(kp_t), np.asarray(valid_t)

        both = valid & valid_t
        d_raw = np.linalg.norm(kp - kp_t, axis=-1)[both]
        d_ref = np.linalg.norm(refined - kp_t, axis=-1)[both]
        raw_errs.append(d_raw)
        ref_errs.append(d_ref)
        n_matched += int((d_raw < args.px_margin).sum())
        n_target += int(valid_t.sum())
        n_pred += int(valid.sum())

    raw = np.concatenate(raw_errs) if raw_errs else np.zeros(0)
    ref = np.concatenate(ref_errs) if ref_errs else np.zeros(0)
    print(f"samples: {n_batches * bs}  target corners: {n_target}  "
          f"predicted: {n_pred}  matched(<{args.px_margin}px): {n_matched}")
    if raw.size:
        print(f"raw     corner error: mean {raw.mean():.3f}px  "
              f"median {np.median(raw):.3f}px  max {raw.max():.2f}px")
        print(f"refined corner error: mean {ref.mean():.3f}px  "
              f"median {np.median(ref):.3f}px  max {ref.max():.2f}px")
        print(f"recall@{args.px_margin}px: {n_matched / max(1, n_target):.3f}")
    return {
        "raw_mean": float(raw.mean()) if raw.size else None,
        "refined_mean": float(ref.mean()) if ref.size else None,
        "recall": n_matched / max(1, n_target),
    }


if __name__ == "__main__":
    main()
