"""Quantize a detector checkpoint into the int8 serving artifact.

Post-training quantization (models/quant.py): folds BatchNorm, quantizes
weights per-output-channel, calibrates activation scales on synthesized
boards, writes the qvars npz, and prints an f32-vs-int8 decode agreement
table on held-out frames. Runs on CPU — quantization is offline and
one-time; the artifact is what serves on the TPU
(``load_pipeline(cfg, <out.npz>, ...)`` auto-detects it).

Usage:
    python scripts/quantize_detector.py artifacts/detector_devsynth.npz \
        --out artifacts/detector_devsynth_int8.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("detector", help=".npz / orbax ckpt of f32 variables")
    ap.add_argument("--out", required=True)
    ap.add_argument("--calib-samples", type=int, default=64)
    ap.add_argument("--eval-samples", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.data.device_synth import DeviceSynthesizer
    from deepcharuco_tpu.models import Detector
    from deepcharuco_tpu.models.quant import (QuantDetector, quantize_detector,
                                              qvars_to_npz)
    from deepcharuco_tpu.ops import label_to_keypoints, pred_to_keypoints
    from deepcharuco_tpu.pipeline import _to_gray_input, load_model_variables

    cfg = default_config()
    det = Detector(n_ids=cfg.n_ids, dtype=jnp.float32)
    dv = load_model_variables(args.detector, "detector", cfg.n_ids)
    synth = DeviceSynthesizer(cfg)

    key = jax.random.PRNGKey(args.seed)
    k_cal, k_ev = jax.random.split(key)
    imgs, _, _ = synth.batch(k_cal, args.calib_samples)
    qv = quantize_detector(det, dv, _to_gray_input(imgs))
    qvars_to_npz(args.out, qv)
    size_kb = os.path.getsize(args.out) / 1024
    print(f"wrote {args.out} ({size_kb:.0f} KiB)")

    if args.eval_samples <= 0:
        return
    imgs2, loc_l, ids_l = synth.batch(k_ev, args.eval_samples)
    g2 = _to_gray_input(imgs2)
    out_f = det.apply(dv, g2)
    out_q = QuantDetector(cfg.n_ids).apply(qv, g2)
    kp_f, v_f = pred_to_keypoints(out_f["loc"], out_f["ids"], cfg.n_ids)
    kp_q, v_q = pred_to_keypoints(out_q["loc"], out_q["ids"], cfg.n_ids)
    kp_f, v_f, kp_q, v_q = map(np.asarray, (kp_f, v_f, kp_q, v_q))
    both = v_f & v_q
    d = np.linalg.norm(kp_f - kp_q, axis=-1)[both]
    print(f"detections f32={int(v_f.sum())} int8={int(v_q.sum())} "
          f"both={int(both.sum())}")
    print(f"position agreement: mean {d.mean():.4f} px, max {d.max():.3f} px,"
          f" identical {float((d == 0).mean()):.3f}")
    kp_t, v_t = map(np.asarray, label_to_keypoints(loc_l, ids_l, cfg.n_ids))
    for name, kp, v in (("f32 ", kp_f, v_f), ("int8", kp_q, v_q)):
        err = np.linalg.norm(kp - kp_t, axis=-1)
        rec = ((err <= 3.0) & v & v_t).sum() / max(v_t.sum(), 1)
        print(f"{name} recall@3px = {rec:.4f}")


if __name__ == "__main__":
    main()
