"""Round-3 acceptance evaluation — run after a detector training run frees
the chip. Scores a candidate detector checkpoint against every VERDICT r2
target in one pass and prints a verdict table:

- device-stream recall@3px + raw err stats (target: recall ≥ 0.965)
- HOST (reference-semantics cv2) recall@3px   (target: ≥ 0.965)
- wrong-cell outlier rate (>3 px predictions at min_margin=None;
  target: < 0.05%)
- frontal in-distribution probe at scale 1.0  (target: ≥ 14/16 per frame)
- real photo IMG_7412 corners                  (target: ≥ 14/16)

Usage: python scripts/eval_round3.py <detector.npz-or-ckpt-name> [--samples N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("detector", nargs="+",
                    help="one or more detector checkpoints (.npz / orbax "
                         "ckpt names / int8 qvars npz). Multiple candidates "
                         "share ONE process, ONE compiled program (weights "
                         "are a jit argument) and IDENTICAL eval streams — "
                         "the matched-soup-sweep protocol without paying "
                         "the tunnel compile per checkpoint.")
    ap.add_argument("--refinenet", default="artifacts/refinenet_devsynth.npz")
    ap.add_argument("--samples", type=int, default=512)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--geom", action="store_true",
                    help="score the geometry-consistent decode "
                         "(ops.pred_to_keypoints_geom) instead of the "
                         "parity decode")
    ap.add_argument("--fill", action="store_true",
                    help="with --geom: also fill undetected in-frame ids at "
                         "their homography-projected positions "
                         "(ops.fill_from_homography; raw positions, no "
                         "RefineNet pass in this script)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.data.device_synth import DeviceSynthesizer
    from deepcharuco_tpu.ops import label_to_keypoints, pred_to_keypoints
    from deepcharuco_tpu.pipeline import load_detector_any

    cfg = default_config()
    candidates = []  # (name, det_obj, dv)
    for path in args.detector:
        det_i, dv_i = load_detector_any(path, cfg.n_ids,
                                        compute_dtype=jnp.float32)
        candidates.append((path, det_i, dv_i))

    if args.geom:
        from deepcharuco_tpu.board import inner_corner_object_points
        from deepcharuco_tpu.ops import (fill_from_homography,
                                         pred_to_keypoints_geom)

        board_xy = jnp.asarray(inner_corner_object_points(
            cfg.row_count, cfg.col_count, cfg.square_len)[:, :2])
        h, w = cfg.input_hw

    # ONE compiled program per detector CLASS (weights are an argument, so
    # every f32 candidate reuses the first compile — the tunnel charges
    # ~minutes per compile, which used to be paid once per checkpoint).
    _fwd_cache = {}

    def make_fwd(det):
        key = type(det)
        if key in _fwd_cache:
            return _fwd_cache[key]

        if args.geom:
            @jax.jit
            def fwd(dv, images):
                out = det.apply(dv, images)
                kp, v = pred_to_keypoints_geom(out["loc"], out["ids"],
                                               cfg.n_ids, board_xy)
                if args.fill:
                    kp, v, _ = jax.vmap(lambda k, m: fill_from_homography(
                        k, m, board_xy, (h, w)))(kp, v)
                return kp, v
        else:
            @jax.jit
            def fwd(dv, images):
                out = det.apply(dv, images)
                return pred_to_keypoints(out["loc"], out["ids"], cfg.n_ids)
        _fwd_cache[key] = fwd
        return fwd

    def score(fwd, batches, name, per_frame_target=None):
        """batches: iterable of (images, kp_true, valid_true)."""
        errs, n_match, n_tgt, n_pred, n_out = [], 0, 0, 0, 0
        frames_ok = frames_tot = 0
        for images, kp_t, v_t in batches:
            kp, v = fwd(images)
            kp, v = np.asarray(kp), np.asarray(v)
            kp_t, v_t = np.asarray(kp_t), np.asarray(v_t)
            both = v & v_t
            d = np.linalg.norm(kp - kp_t, axis=-1)
            errs.append(d[both])
            n_match += int((d[both] < 3.0).sum())
            n_tgt += int(v_t.sum())
            n_pred += int(v.sum())
            n_out += int((d[both] >= 3.0).sum())
            if per_frame_target:
                good = (both & (d < 3.0)).sum(axis=1)
                frames_ok += int((good >= per_frame_target).sum())
                frames_tot += images.shape[0]
        e = np.concatenate(errs) if errs else np.zeros(1)
        recall = n_match / max(1, n_tgt)
        out_rate = n_out / max(1, n_pred)
        line = (f"{name:22s} recall@3px {recall:.3f}  raw mean {e.mean():.3f}px"
                f"  max {e.max():.1f}px  outliers {100 * out_rate:.3f}%")
        if per_frame_target:
            line += f"  frames ≥{per_frame_target}/16: {frames_ok}/{frames_tot}"
        print(line, flush=True)
        return recall, out_rate

    bs = 16
    nb = max(1, args.samples // bs)

    # 1) device stream (round-2-comparable: default diet, no bank/perspective)
    synth = DeviceSynthesizer(cfg)
    full = jax.jit(lambda key: jax.vmap(synth._sample_full)(
        jax.random.split(key, bs)))

    def device_batches():
        for j in range(nb):
            images, _, _, kpts, vis = full(jax.random.PRNGKey(j))
            yield images, kpts, vis

    # 2) frontal probe at scale 1.0, standard photometrics
    fr = DeviceSynthesizer(cfg, negative_p=0.0, axis_snap_p=1.0,
                           scale_range=(1.0, 1.0001))
    fr.translate_frac = (-0.1, 0.1)
    fr_full = jax.jit(lambda key: jax.vmap(fr._sample_full)(
        jax.random.split(key, bs)))

    def frontal_batches():
        for j in range(max(1, nb // 4)):
            images, _, _, kpts, vis = fr_full(jax.random.PRNGKey(500 + j))
            yield images, kpts, vis

    # 3) host (reference-semantics) stream — cv2 synthesis on the 1-core
    # host is the slow part, so materialize it ONCE and reuse across
    # candidates (also guarantees an identical stream for every candidate).
    from deepcharuco_tpu.data import CharucoDataset

    ds = CharucoDataset(cfg, validation=True)
    _host_cache = []

    def host_batches():
        if not _host_cache:
            for j in range(nb):
                items = [ds[j * bs + k] for k in range(bs)]
                images = jnp.asarray(np.stack([it["image"] for it in items]))
                loc = jnp.asarray(np.stack([it["loc"] for it in items]))
                ids = jnp.asarray(np.stack([it["ids"] for it in items]))
                kp_t, v_t = label_to_keypoints(loc, ids, cfg.n_ids)
                _host_cache.append((images, kp_t, v_t))
        return iter(_host_cache)

    # 4) real photo
    import os

    img_path = "/root/reference/src/reference/samples_test/IMG_7412.png"
    photo = None
    if os.path.exists(img_path):
        import cv2

        from deepcharuco_tpu.ops import normalize_gray

        img = cv2.imread(img_path)
        g = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        photo = normalize_gray(jnp.asarray(g[None]))

    for path, det, dv in candidates:
        if len(candidates) > 1:
            print(f"\n=== {path} ===", flush=True)
        fwd = make_fwd(det)
        score(lambda b: fwd(dv, b), device_batches(), "device (r2 protocol)")
        score(lambda b: fwd(dv, b), frontal_batches(), "frontal scale=1.0",
              per_frame_target=14)
        score(lambda b: fwd(dv, b), host_batches(), "host (reference)")
        if photo is not None:
            kp, v = fwd(dv, photo)
            found = int(np.asarray(v).sum())
            print(f"{'IMG_7412':22s} corners {found}/16 "
                  f"(ids {np.nonzero(np.asarray(v)[0])[0].tolist()})")

    print("\ntargets: device ≥0.965, host ≥0.965, outliers <0.05%, "
          "frontal ≥14/16, photo ≥14/16")


if __name__ == "__main__":
    main(sys.argv[1:])
