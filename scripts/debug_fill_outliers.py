"""Dissect host-stream fill/geom outliers: which frames, which ids, filled
or detected, and what the fit-quality gates saw. One detector pass, then
per-offender forensics. (Round-4 follow-up to the fill-gate commit whose
512-sample numbers do not reproduce.)"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--detector", default="artifacts/detector_devsynth.npz")
    ap.add_argument("--samples", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from deepcharuco_tpu.board import inner_corner_object_points
    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.data import CharucoDataset
    from deepcharuco_tpu.models import Detector
    from deepcharuco_tpu.ops import (fill_from_homography, label_to_keypoints,
                                     pred_to_keypoints_geom)
    from deepcharuco_tpu.ops.geom import _apply_homography, _dlt_homography
    from deepcharuco_tpu.pipeline import load_model_variables

    cfg = default_config()
    det = Detector(n_ids=cfg.n_ids, dtype=jnp.float32)
    dv = load_model_variables(args.detector, "detector", cfg.n_ids)
    board_xy = jnp.asarray(inner_corner_object_points(
        cfg.row_count, cfg.col_count, cfg.square_len)[:, :2])
    h, w = cfg.input_hw

    @jax.jit
    def fwd(images):
        out = det.apply(dv, images)
        kp_g, v_g = pred_to_keypoints_geom(out["loc"], out["ids"], cfg.n_ids,
                                           board_xy)
        kp_f, v_f, filled = jax.vmap(lambda k, m: fill_from_homography(
            k, m, board_xy, (h, w)))(kp_g, v_g)
        return kp_g, v_g, kp_f, v_f, filled

    ds = CharucoDataset(cfg, validation=True)
    bs = 16
    nb = max(1, args.samples // bs)
    bxy = np.asarray(board_xy)

    for j in range(nb):
        items = [ds[j * bs + k] for k in range(bs)]
        images = jnp.asarray(np.stack([it["image"] for it in items]))
        loc = jnp.asarray(np.stack([it["loc"] for it in items]))
        ids = jnp.asarray(np.stack([it["ids"] for it in items]))
        kp_t, v_t = label_to_keypoints(loc, ids, cfg.n_ids)
        kp_g, v_g, kp_f, v_f, filled = [np.asarray(a) for a in fwd(images)]
        kp_t, v_t = np.asarray(kp_t), np.asarray(v_t)
        both = v_f & v_t
        d = np.linalg.norm(kp_f - kp_t, axis=-1)
        bad = both & (d >= 3.0)
        for bi in np.argwhere(bad.any(axis=1)).ravel():
            idx = j * bs + int(bi)
            det_mask = v_g[bi]
            # recompute the gate quantities exactly as fill_from_homography
            wm = det_mask.astype(np.float32)
            n = max(wm.sum(), 1.0)
            H = np.asarray(_dlt_homography(board_xy, jnp.asarray(kp_g[bi]),
                                           jnp.asarray(wm)))
            proj = np.asarray(_apply_homography(jnp.asarray(H), board_xy))
            resid = np.linalg.norm(proj - kp_g[bi], axis=-1)
            rms = float(np.sqrt((np.where(det_mask, resid ** 2, 0)).sum() / n))
            mean_kp = (np.where(det_mask[:, None], kp_g[bi], 0)).sum(0) / n
            cen = np.where(det_mask[:, None], kp_g[bi] - mean_kp, 0)
            cov = cen.T @ cen / n
            eigs = np.linalg.eigvalsh(cov)
            print(f"frame {idx}: n_det={int(det_mask.sum())} "
                  f"rms={rms:.3f}px spread={np.sqrt(max(eigs[0],0)):.1f}px")
            for ci in np.argwhere(bad[bi]).ravel():
                src = "FILL" if filled[bi, ci] else (
                    "geom" if v_g[bi, ci] else "??")
                print(f"   id {ci}: err={d[bi, ci]:.1f}px [{src}] "
                      f"pred={kp_f[bi, ci]} true={kp_t[bi, ci]} "
                      f"resid_vs_H={resid[ci]:.2f}")


if __name__ == "__main__":
    main(sys.argv[1:])
