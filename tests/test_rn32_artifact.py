"""Regression lock for the shipped 32-patch RefineNet artifact (round 3).

artifacts/refinenet32_devsynth.npz is the accuracy-priority refiner (wider
24→32 input context + offset branch; VERDICT r2 weak #2): 0.314 px median vs
true sub-pixel corners on the 256-frame device protocol with rn_decode="avg"
(BENCH_NOTES round 3). The 24-patch artifact remains the reference-parity
default. This test pins that the artifact loads through the product path and
refines a clean board render to sub-pixel agreement with the known corner
grid."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

ARTIFACT = "artifacts/refinenet32_devsynth.npz"


@pytest.mark.skipif(not os.path.exists(ARTIFACT), reason="artifact absent")
def test_rn32_artifact_loads_and_refines_board_render():
    import cv2

    from deepcharuco_tpu import board as B
    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.pipeline import load_pipeline

    cfg = default_config()
    img, corners = B.board_image(B.get_board(cfg), (200, 200),
                                 cfg.row_count, cfg.col_count)
    gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    frame = np.full((240, 320), 128, np.uint8)
    ox, oy = 60, 20
    frame[oy:oy + 200, ox:ox + 200] = gray
    truth = corners[:, :2].astype(np.float32) + np.array([ox, oy], np.float32)

    pipe = load_pipeline(cfg, "artifacts/detector_devsynth.npz", ARTIFACT,
                         compute_dtype=jnp.float32,
                         rn_patch_size=32, rn_decode="avg")
    kp, valid, refined = pipe.detect(frame[None])
    assert valid[0].sum() >= 14
    err = np.linalg.norm(refined[0][valid[0]] - truth[valid[0]], axis=-1)
    # truth is the reference's int-cast corner grid — sub-pixel-true corners
    # sit within 1 px of it; the refiner must land there too
    assert np.median(err) < 1.0, err
    assert err.max() < 2.0, err
