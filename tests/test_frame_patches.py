"""FramePatchSynthesizer: the heat label must invert refine_keypoints to the
exact sub-pixel corner (≤ heatmap grid rounding of 1/16 px)."""

import numpy as np
import jax
import jax.numpy as jnp

from deepcharuco_tpu.configs import default_config
from deepcharuco_tpu.data.device_synth import FramePatchSynthesizer
from deepcharuco_tpu.ops import refine_keypoints, refine_keypoints_soft

CFG = default_config()


def test_frame_patch_contract():
    synth = FramePatchSynthesizer(CFG)
    p, h = synth.batch(jax.random.PRNGKey(0), 8)
    assert p.shape == (8, 24, 24, 1)
    assert h.shape == (8, 64, 64, 1)
    hm = np.asarray(h)[..., 0]
    # continuous centers: worst-case grid peak exp(-(0.5²+0.5²)/8) ≈ 0.9394
    assert (hm.reshape(8, -1).max(1) > 0.93).all()


def test_continuous_vs_rounded_targets():
    """Continuous labels put the Gaussian at the exact sub-pixel center;
    rounded (reference-parity) labels peak at exactly 1.0 on the grid."""
    hr = np.asarray(FramePatchSynthesizer(CFG, continuous_targets=False)
                    .batch(jax.random.PRNGKey(2), 16)[1])[..., 0]
    np.testing.assert_allclose(hr.reshape(16, -1).max(1), 1.0, atol=1e-6)
    hc = np.asarray(FramePatchSynthesizer(CFG, continuous_targets=True)
                    .batch(jax.random.PRNGKey(2), 16)[1])[..., 0]
    # same keys ⇒ same corners; at least some peaks land off-grid
    assert (hc.reshape(16, -1).max(1) < 0.9999).any()


def test_soft_argmax_recovers_continuous_center():
    """refine_keypoints_soft on a continuous-center Gaussian label must
    recover the center far below the 1/8-px hard-argmax quantization."""
    rng = np.random.default_rng(3)
    centers = rng.uniform(20.0, 44.0, size=(64, 2)).astype(np.float32)
    gy = np.arange(64, dtype=np.float32)[None, :, None]
    gx = np.arange(64, dtype=np.float32)[None, None, :]
    expo = ((gx - centers[:, 0, None, None]) ** 2
            + (gy - centers[:, 1, None, None]) ** 2) / 8.0
    heat = np.where(expo > 4.6052, 0.0, np.exp(-expo)).astype(np.float32)
    out = np.asarray(refine_keypoints_soft(jnp.asarray(heat),
                                           jnp.zeros((64, 2))))
    err_grid = np.abs(out * 8.0 + 32.0 - centers)
    # hard argmax errs up to 0.5 grid px; the soft-argmax's residual bias
    # (softmax-of-Gaussian distortion + window truncation) measures ≤ 0.12
    # grid px ≈ 0.015 *image* px — ~4× tighter than hard argmax
    assert np.median(err_grid) < 0.1, np.median(err_grid)
    assert err_grid.max() < 0.25, err_grid.max()


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


def test_frame_patch_synthesizer_patch32():
    """32-patch synthesis: shapes, and the heat target still maps the corner
    through refined = (argmax−32)/8 + center (the 64×64 window semantics are
    patch-size-independent — it always covers the central 8×8 px)."""
    import jax
    import numpy as np

    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.data.device_synth import FramePatchSynthesizer

    synth = FramePatchSynthesizer(default_config(), patch_size=32)
    p, h = synth.batch(jax.random.PRNGKey(2), 16)
    assert p.shape == (16, 32, 32, 1)
    assert h.shape == (16, 64, 64, 1)
    hm = np.asarray(h)[..., 0]
    assert (hm.reshape(16, -1).max(1) > 0.9).all()
