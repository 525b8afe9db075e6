"""Sweep the homography-fill fit-quality gates (VERDICT r3 item 3).

The round-4 gate (masked RMS residual ≤1.5 px + min principal spread ≥3 px)
cut host-stream fill outliers 0.254% → 0.062% (max 108 → 3.2 px) on the
512-sample CPU acceptance — just above the ≤0.05% target. This script finds
whether any (max_rms_px, min_spread_px) setting clears the target while
keeping frontal completeness (recall 1.000) and IMG_7412 at 16/16.

Cost control: the detector forward AND the geometry reselection
(`pred_to_keypoints_geom`) are threshold-independent, so both run ONCE per
stream and are cached; each gate combo re-runs only the tiny vmapped
`fill_from_homography`.

Usage: python scripts/sweep_fill_gate.py [--samples 512] [--cpu]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--detector", default="artifacts/detector_devsynth.npz")
    ap.add_argument("--samples", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rms", type=float, nargs="+", default=[1.0, 1.2, 1.5])
    ap.add_argument("--spread", type=float, nargs="+", default=[3.0, 4.0, 5.0])
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from deepcharuco_tpu.board import inner_corner_object_points
    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.data import CharucoDataset
    from deepcharuco_tpu.data.device_synth import DeviceSynthesizer
    from deepcharuco_tpu.models import Detector
    from deepcharuco_tpu.ops import (fill_from_homography, label_to_keypoints,
                                     pred_to_keypoints_geom)
    from deepcharuco_tpu.pipeline import load_model_variables

    cfg = default_config()
    det = Detector(n_ids=cfg.n_ids, dtype=jnp.float32)
    dv = load_model_variables(args.detector, "detector", cfg.n_ids)
    board_xy = jnp.asarray(inner_corner_object_points(
        cfg.row_count, cfg.col_count, cfg.square_len)[:, :2])
    h, w = cfg.input_hw

    @jax.jit
    def geom_kp(images):
        out = det.apply(dv, images)
        return pred_to_keypoints_geom(out["loc"], out["ids"], cfg.n_ids,
                                      board_xy)

    bs = 16
    nb = max(1, args.samples // bs)

    # --- cache the threshold-independent part per stream -------------------
    def cache(batches):
        kps, vs, kpts, vists = [], [], [], []
        for images, kp_t, v_t in batches:
            kp, v = geom_kp(images)
            kps.append(np.asarray(kp))
            vs.append(np.asarray(v))
            kpts.append(np.asarray(kp_t))
            vists.append(np.asarray(v_t))
        return (np.concatenate(kps), np.concatenate(vs),
                np.concatenate(kpts), np.concatenate(vists))

    ds = CharucoDataset(cfg, validation=True)

    def host_batches():
        for j in range(nb):
            items = [ds[j * bs + k] for k in range(bs)]
            images = jnp.asarray(np.stack([it["image"] for it in items]))
            loc = jnp.asarray(np.stack([it["loc"] for it in items]))
            ids = jnp.asarray(np.stack([it["ids"] for it in items]))
            kp_t, v_t = label_to_keypoints(loc, ids, cfg.n_ids)
            yield images, kp_t, v_t

    fr = DeviceSynthesizer(cfg, negative_p=0.0, axis_snap_p=1.0,
                           scale_range=(1.0, 1.0001))
    fr.translate_frac = (-0.1, 0.1)
    fr_full = jax.jit(lambda key: jax.vmap(fr._sample_full)(
        jax.random.split(key, bs)))

    def frontal_batches():
        for j in range(max(1, nb // 4)):
            images, _, _, kpts, vis = fr_full(jax.random.PRNGKey(500 + j))
            yield images, kpts, vis

    print("caching host stream...", flush=True)
    host = cache(host_batches())
    print("caching frontal stream...", flush=True)
    frontal = cache(frontal_batches())

    import os

    img_kp = None
    img_path = "/root/reference/src/reference/samples_test/IMG_7412.png"
    if os.path.exists(img_path):
        import cv2

        from deepcharuco_tpu.ops import normalize_gray

        g = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2GRAY)
        kp, v = geom_kp(normalize_gray(jnp.asarray(g[None])))
        img_kp = (np.asarray(kp), np.asarray(v))

    # --- sweep -------------------------------------------------------------
    def filled(kp, v, rms, spread):
        fill = jax.jit(jax.vmap(functools.partial(
            fill_from_homography, board_xy=board_xy, frame_hw=(h, w),
            max_rms_px=rms, min_spread_px=spread)))
        kp2, v2, _ = fill(jnp.asarray(kp), jnp.asarray(v))
        return np.asarray(kp2), np.asarray(v2)

    def score(cached, rms, spread, per_frame_target=None):
        kp, v, kp_t, v_t = cached
        kp, v = filled(kp, v, rms, spread)
        both = v & v_t
        d = np.linalg.norm(kp - kp_t, axis=-1)
        e = d[both]
        recall = (e < 3.0).sum() / max(1, v_t.sum())
        out_rate = (e >= 3.0).sum() / max(1, v.sum())
        res = dict(recall=float(recall), out_pct=100 * float(out_rate),
                   max_err=float(e.max() if e.size else 0.0))
        if per_frame_target:
            good = (both & (d < 3.0)).sum(axis=1)
            res["frames_ok"] = int((good >= per_frame_target).sum())
            res["frames_tot"] = int(v.shape[0])
        return res

    print(f"\n{'rms':>5} {'spread':>6} | {'host rec':>8} {'out%':>6} "
          f"{'max':>5} | {'frontal rec':>11} {'fr≥14':>7} | img")

    def score_nofill(cached, per_frame_target=None):
        kp, v, kp_t, v_t = cached
        both = v & v_t
        d = np.linalg.norm(kp - kp_t, axis=-1)
        e = d[both]
        res = dict(recall=float((e < 3.0).sum() / max(1, v_t.sum())),
                   out_pct=100 * float((e >= 3.0).sum() / max(1, v.sum())),
                   max_err=float(e.max() if e.size else 0.0))
        if per_frame_target:
            good = (both & (d < 3.0)).sum(axis=1)
            res["frames_ok"] = int((good >= per_frame_target).sum())
            res["frames_tot"] = int(v.shape[0])
        return res

    hs0 = score_nofill(host)
    fs0 = score_nofill(frontal, per_frame_target=14)
    img0 = "-"
    if img_kp is not None:
        img0 = f"{int(img_kp[1].sum())}/16"
    print(f"{'geom only (no fill)':>12} | {hs0['recall']:8.3f} "
          f"{hs0['out_pct']:6.3f} {hs0['max_err']:5.1f} | "
          f"{fs0['recall']:11.3f} {fs0['frames_ok']:3d}/{fs0['frames_tot']:<3d}"
          f" | {img0}")
    for rms in args.rms:
        for spread in args.spread:
            hsc = score(host, rms, spread)
            fsc = score(frontal, rms, spread, per_frame_target=14)
            img_txt = "-"
            if img_kp is not None:
                _, v2 = filled(*img_kp, rms, spread)
                img_txt = f"{int(v2.sum())}/16"
            print(f"{rms:5.2f} {spread:6.2f} | {hsc['recall']:8.3f} "
                  f"{hsc['out_pct']:6.3f} {hsc['max_err']:5.1f} | "
                  f"{fsc['recall']:11.3f} "
                  f"{fsc['frames_ok']:3d}/{fsc['frames_tot']:<3d} | "
                  f"{img_txt}", flush=True)
    print("\ntargets: host outliers ≤0.05%, frontal recall 1.000 with all "
          "frames complete, IMG_7412 16/16")


if __name__ == "__main__":
    main(sys.argv[1:])
