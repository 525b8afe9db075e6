"""Benchmark harness: full two-stage pipeline fps per chip at 320×240.

Mirrors the reference's ``src/benchmark.py`` protocol (warmup + timed loop on
one image, full detector→RefineNet path) but batched and fused: the whole
span — uint8 frames in, normalize, detector, decode, patch gather, RefineNet,
sub-pixel corners out — is one XLA program. Host→device transfer of the uint8
frames is *included* in the loop, as in the reference (``benchmark.py:44-53``).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is vs the reference's >200 fps on a GTX 1080 Ti
(``README.md:42-44``).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.models import Detector, RefineNet
    from deepcharuco_tpu.pipeline import two_stage_forward

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "40"))
    warmup = 5

    cfg = default_config()
    det = Detector(n_ids=cfg.n_ids)
    rn = RefineNet()
    # Use the shipped trained weights when present (throughput is identical
    # either way; this just makes the benchmarked program the real model).
    try:
        from deepcharuco_tpu.pipeline import variables_from_npz

        dv = variables_from_npz("artifacts/detector_devsynth.npz")
    except Exception:
        dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 240, 320, 1)))
    try:
        from deepcharuco_tpu.pipeline import variables_from_npz

        rv = variables_from_npz("artifacts/refinenet_devsynth.npz")
    except Exception:
        rv = rn.init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 1)))
    dv = jax.device_put(dv)
    rv = jax.device_put(rv)

    fused = jax.jit(
        lambda dv, rv, x: two_stage_forward(det, rn, dv, rv, x, cfg.n_ids)
    )

    # A realistic frame: rendered board pasted into a gray background. The
    # nets consume grayscale (paper input); feeding gray uint8 is the
    # production video format and 3× less host→HBM traffic than BGR.
    try:
        from deepcharuco_tpu import board as B
        import cv2

        brd = B.get_board(cfg)
        bimg, _ = B.board_image(brd, (240, 240), cfg.row_count, cfg.col_count)
        frame = np.full((240, 320, 3), 90, np.uint8)
        frame[:, 40:280] = bimg
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    except Exception:
        gray = np.random.default_rng(0).integers(0, 255, (240, 320), np.uint8)
    frames = np.broadcast_to(gray, (batch, 240, 320)).copy()
    # Unique payload per iteration: identical buffers can be deduped by the
    # transport (measured 14× inflation), which would turn the "end-to-end"
    # number into compute-only. A rolled copy per iter defeats any cache.
    batches = [np.roll(frames, i + 1, axis=2) for i in range(iters)]

    for _ in range(warmup):
        out = fused(dv, rv, jnp.asarray(frames))
    jax.block_until_ready(out)

    # Double-buffered: device_put is async, so the host→HBM copy of batch
    # N+1 overlaps compute of batch N.
    x_next = jax.device_put(batches[0])
    outs = []
    t0 = time.perf_counter()
    for i in range(iters):
        x = x_next
        if i + 1 < iters:
            x_next = jax.device_put(batches[i + 1])
        outs.append(fused(dv, rv, x))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    print(json.dumps({
        "metric": "fps_full_pipeline_320x240",
        "value": round(fps, 1),
        "unit": "fps",
        "vs_baseline": round(fps / 200.0, 2),
    }))


if __name__ == "__main__":
    main()
