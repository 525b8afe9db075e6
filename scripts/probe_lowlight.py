"""Multiplicative low-light floor probe: recall@3px vs sensor gain.

The reference's darkness augmentation is ADDITIVE (RandomBrightnessContrast
at ``src/transformations.py:115``); a real under-exposed sensor is
MULTIPLICATIVE: gain γ scales the whole signal, read noise adds, and uint8
quantization squeezes a γ=0.1 board into ~25 gray levels. This probe
measures recall@3px on a fixed synthetic stream degraded at a sweep of
gains — the same model the ChArUco-calibration low-light test uses — for
one or more detector checkpoints sharing one compiled program and
IDENTICAL streams (the eval_round3 matched protocol).

Usage:
  python scripts/probe_lowlight.py artifacts/detector_devsynth.npz \
      [more.npz ...] [--samples 256] [--cpu] [--gains 1.0,0.5,...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("detector", nargs="+")
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--gains", default="1.0,0.5,0.35,0.25,0.18,0.12,0.08")
    ap.add_argument("--read-noise", type=float, default=4.0,
                    help="sensor read noise sigma in gray levels")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.data.device_synth import DeviceSynthesizer
    from deepcharuco_tpu.ops import pred_to_keypoints
    from deepcharuco_tpu.pipeline import load_detector_any

    cfg = default_config()
    gains = [float(g) for g in args.gains.split(",")]
    candidates = [(p, *load_detector_any(p, cfg.n_ids,
                                         compute_dtype=jnp.float32))
                  for p in args.detector]

    bs = 16
    nb = max(1, args.samples // bs)
    synth = DeviceSynthesizer(cfg, negative_p=0.0)
    full = jax.jit(lambda key: jax.vmap(synth._sample_full)(
        jax.random.split(key, bs)))

    # one compiled degrade+forward program per detector CLASS; gain is a
    # traced scalar so the whole sweep reuses one compile
    _cache = {}

    def make_fwd(det):
        key = type(det)
        if key not in _cache:
            @jax.jit
            def fwd(dv, images_norm, gain, nkey):
                raw = images_norm[..., 0] * 255.0 + 128.0
                dark = raw * gain + args.read_noise * jax.random.normal(
                    nkey, raw.shape)
                dark = jnp.round(jnp.clip(dark, 0.0, 255.0))
                out = det.apply(dv, ((dark - 128.0) / 255.0)[..., None])
                return pred_to_keypoints(out["loc"], out["ids"], cfg.n_ids)
            _cache[key] = fwd
        return _cache[key]

    # materialize the stream once: identical frames for every (gain, ckpt)
    stream = [full(jax.random.PRNGKey(1000 + j)) for j in range(nb)]

    header = "gain    " + "".join(f"{os.path.basename(p)[:20]:>24s}"
                                  for p, _, _ in candidates)
    print(header, flush=True)
    for gain in gains:
        row = f"{gain:5.2f}  "
        for ci, (path, det, dv) in enumerate(candidates):
            fwd = make_fwd(det)
            n_match = n_tgt = 0
            errs = []
            for j, (images, _, _, kp_t, v_t) in enumerate(stream):
                kp, v = fwd(dv, images, gain, jax.random.PRNGKey(j))
                kp, v = np.asarray(kp), np.asarray(v)
                kp_t, v_t = np.asarray(kp_t), np.asarray(v_t)
                both = v & v_t
                d = np.linalg.norm(kp - kp_t, axis=-1)
                n_match += int((d[both] < 3.0).sum())
                n_tgt += int(v_t.sum())
                errs.append(d[both])
            e = np.concatenate(errs) if errs else np.zeros(1)
            row += f"    recall {n_match / max(1, n_tgt):.3f}"
            row += f" mean {e.mean():5.2f}px" if len(e) else "        --"
        print(row, flush=True)


if __name__ == "__main__":
    main()
