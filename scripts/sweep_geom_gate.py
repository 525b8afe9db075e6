"""Sweep the reselection self-consistency gate (``reselect_by_homography
max_rms_px``, round 4) against the host/frontal/photo acceptance streams.

The detector forward is gate-independent — its HEAD OUTPUTS are cached per
stream and every gate value re-runs only the decode. Reports geom-only and
geom+fill rows per gate value, plus the parity decode baseline.

Usage: python scripts/sweep_geom_gate.py [--samples 512] [--cpu]
       [--gates inf 2.0 1.5 1.0]
"""

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
    ap.add_argument("--gates", type=float, nargs="+",
                    default=[float("inf"), 2.0, 1.5, 1.0, 0.75])
    ap.add_argument("--ransac", type=int, nargs="+", default=[0],
                    help="ransac_subsets values to sweep (0 = ls seed)")
    ap.add_argument("--min-points", type=int, nargs="+", default=[6],
                    help="reselect min_points values to sweep")
    ap.add_argument("--mahal", type=float, nargs="+", default=[3.0],
                    help="fill max_mahal values to sweep")
    ap.add_argument("--fill-min-points", type=int, default=6,
                    help="fill min_points (detection floor for filling)")
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
                                     pred_to_keypoints, pred_to_keypoints_geom)
    from deepcharuco_tpu.pipeline import load_model_variables

    cfg = default_config()
    det = Detector(n_ids=cfg.n_ids, dtype=jnp.float32)
    dv = load_model_variables(args.detector, "detector", cfg.n_ids)
    board_xy = jnp.asarray(inner_corner_object_points(
        cfg.row_count, cfg.col_count, cfg.square_len)[:, :2])
    h, w = cfg.input_hw

    heads = jax.jit(lambda images: det.apply(dv, images))
    bs = 16
    nb = max(1, args.samples // bs)

    def cache(batches):
        locs, idss, kpts, vists = [], [], [], []
        for images, kp_t, v_t in batches:
            out = heads(images)
            locs.append(np.asarray(out["loc"], np.float32))
            idss.append(np.asarray(out["ids"], np.float32))
            kpts.append(np.asarray(kp_t))
            vists.append(np.asarray(v_t))
        return (np.concatenate(locs), np.concatenate(idss),
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

    dev = DeviceSynthesizer(cfg)
    dev_full = jax.jit(lambda key: jax.vmap(dev._sample_full)(
        jax.random.split(key, bs)))

    def device_batches():
        for j in range(nb):
            images, _, _, kpts, vis = dev_full(jax.random.PRNGKey(j))
            yield images, kpts, vis

    neg = DeviceSynthesizer(cfg, negative_p=1.0)
    neg_full = jax.jit(lambda key: jax.vmap(neg._sample_full)(
        jax.random.split(key, bs)))

    def negative_batches():
        for j in range(max(1, nb // 4)):
            images, _, _, kpts, vis = neg_full(jax.random.PRNGKey(900 + j))
            yield images, kpts, jnp.zeros_like(vis)

    print("caching host / frontal / device / negative streams + photo...",
          flush=True)
    host = cache(host_batches())
    frontal = cache(frontal_batches())
    device = cache(device_batches())
    negative = cache(negative_batches())

    img_heads = None
    img_path = "/root/reference/src/reference/samples_test/IMG_7412.png"
    if os.path.exists(img_path):
        import cv2

        from deepcharuco_tpu.ops import normalize_gray

        g = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2GRAY)
        out = heads(normalize_gray(jnp.asarray(g[None])))
        img_heads = (np.asarray(out["loc"]), np.asarray(out["ids"]))

    def decode(cached_heads, gate, fill, ransac=0, min_points=6, mahal=3.0):
        loc, ids = cached_heads
        kp, v = pred_to_keypoints_geom(jnp.asarray(loc), jnp.asarray(ids),
                                       cfg.n_ids, board_xy, max_rms_px=gate,
                                       ransac_subsets=ransac,
                                       min_points=min_points)
        if fill:
            kp, v, _ = jax.vmap(lambda k, m: fill_from_homography(
                k, m, board_xy, (h, w), max_mahal=mahal,
                min_points=args.fill_min_points))(kp, v)
        return np.asarray(kp), np.asarray(v)

    def score(cached, kp, v, per_frame_target=None):
        _, _, kp_t, v_t = cached
        both = v & v_t
        d = np.linalg.norm(kp - kp_t, axis=-1)
        e = d[both]
        txt = (f"rec {float((e < 3.0).sum() / max(1, v_t.sum())):.3f} "
               f"out {100 * float((e >= 3.0).sum() / max(1, v.sum())):6.3f}% "
               f"max {float(e.max() if e.size else 0):5.1f}")
        if per_frame_target:
            good = (both & (d < 3.0)).sum(axis=1)
            txt += f" fr≥14 {int((good >= per_frame_target).sum()):3d}/{v.shape[0]}"
        return txt

    def parity(cached_heads):
        loc, ids = cached_heads
        kp, v = pred_to_keypoints(jnp.asarray(loc), jnp.asarray(ids), cfg.n_ids)
        return np.asarray(kp), np.asarray(v)

    print("\n--- parity decode baseline ---")
    print("host   :", score(host, *parity(host[:2])))
    print("frontal:", score(frontal, *parity(frontal[:2]), per_frame_target=14))
    print("device :", score(device, *parity(device[:2])))
    _, v_np = parity(negative[:2])
    print("negativ: false-valid", int(v_np.sum()), "corners on",
          negative[2].shape[0], "board-free frames")
    if img_heads is not None:
        _, v = parity(img_heads)
        print("photo  :", int(v.sum()), "/16")

    fills = [(False, args.mahal[0])] + [(True, m) for m in args.mahal]
    for ransac in args.ransac:
        for mp in args.min_points:
            for gate in args.gates:
                for fill, mahal in fills:
                    tag = (f"rms≤{gate:g} rs={ransac} mp={mp}"
                           + (f" +fill m={mahal:g}" if fill else "      "))
                    print(f"\n--- geom {tag} ---", flush=True)
                    kw = dict(ransac=ransac, min_points=mp, mahal=mahal)
                    kp, v = decode(host[:2], gate, fill, **kw)
                    print("host   :", score(host, kp, v))
                    kp, v = decode(frontal[:2], gate, fill, **kw)
                    print("frontal:", score(frontal, kp, v,
                                            per_frame_target=14))
                    kp, v = decode(device[:2], gate, fill, **kw)
                    print("device :", score(device, kp, v))
                    _, v_n = decode(negative[:2], gate, fill, **kw)
                    print("negativ: false-valid", int(v_n.sum()),
                          f"(parity {int(v_np.sum())})")
                    if img_heads is not None:
                        _, v = decode(img_heads, gate, fill, **kw)
                        print("photo  :", int(v.sum()), "/16", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
