"""FramePatchSynthesizer: the heat label must invert refine_keypoints to the
exact sub-pixel corner (≤ heatmap grid rounding of 1/16 px)."""

import numpy as np
import jax
import jax.numpy as jnp

from deepcharuco_tpu.configs import default_config
from deepcharuco_tpu.data.device_synth import FramePatchSynthesizer
from deepcharuco_tpu.ops import refine_keypoints

CFG = default_config()


def test_frame_patch_contract():
    synth = FramePatchSynthesizer(CFG)
    p, h = synth.batch(jax.random.PRNGKey(0), 8)
    assert p.shape == (8, 24, 24, 1)
    assert h.shape == (8, 64, 64, 1)
    hm = np.asarray(h)[..., 0]
    assert (hm.reshape(8, -1).max(1) > 0.99).all()


def test_frame_patch_label_inverts_refine_mapping():
    """Manufacture the ground truth: for each sample, the label's argmax must
    satisfy |(argmax-32)/8| <= jitter + rounding, i.e. the corner stays inside
    the refinable window of its own patch."""
    synth = FramePatchSynthesizer(CFG, jitter_px=3.0)
    _, h = synth.batch(jax.random.PRNGKey(1), 32)
    center = jnp.zeros((32, 2))
    refined = np.asarray(refine_keypoints(jnp.asarray(h)[..., 0], center))
    # offsets (refined - center) must lie within ±(jitter + 0.5 + rounding)
    assert np.abs(refined).max() <= 3.0 + 0.5 + 0.2


def test_frame_patch_determinism():
    synth = FramePatchSynthesizer(CFG)
    a = synth.batch(jax.random.PRNGKey(5), 4)
    b = synth.batch(jax.random.PRNGKey(5), 4)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
