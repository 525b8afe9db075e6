"""Golden regression: the shipped trained weights on 4 fixed synthetic frames
must reproduce the committed outputs (catches silent behavior drift in the
synthesis, models, decode or refinement across rounds)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_pipeline.npz")


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no golden fixture")
def test_pipeline_matches_golden():
    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.data.device_synth import DeviceSynthesizer
    from deepcharuco_tpu.models import Detector, RefineNet
    from deepcharuco_tpu.pipeline import two_stage_forward, variables_from_npz

    cfg = default_config()
    synth = DeviceSynthesizer(cfg)
    imgs, _, _ = synth.batch(jax.random.PRNGKey(2024), 4)
    det = Detector(n_ids=16, dtype=jnp.float32)
    rn = RefineNet(dtype=jnp.float32)
    dv = variables_from_npz("artifacts/detector_devsynth.npz")
    rv = variables_from_npz("artifacts/refinenet_devsynth.npz")
    kp, valid, refined = jax.jit(
        lambda dv, rv, x: two_stage_forward(det, rn, dv, rv, x, 16)
    )(dv, rv, imgs)

    g = np.load(GOLDEN)
    np.testing.assert_array_equal(np.asarray(valid), g["valid"])
    v = g["valid"]
    np.testing.assert_array_equal(np.asarray(kp)[v], g["keypoints"][v])
    np.testing.assert_allclose(np.asarray(refined)[v], g["refined"][v], atol=1e-3)
    assert v.sum() >= 50  # the trained detector finds nearly all corners
