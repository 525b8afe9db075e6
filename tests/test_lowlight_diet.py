"""Low-gain (multiplicative low-light) diet knob on the device synthesizer.

The reference diet darkens additively only (RandomBrightnessContrast,
``src/transformations.py:115``); ``low_gain_p`` adds the physical
under-exposure model — sensor gain x signal + read noise + uint8
quantization. Contract pins: the base stream stays bit-identical when the
knob is off, darkening touches pixels only (labels/keypoints unchanged),
and the CLI accepts the flags.
"""

import jax
import jax.numpy as jnp
import numpy as np

from deepcharuco_tpu.configs import default_config
from deepcharuco_tpu.data.device_synth import DeviceSynthesizer


def test_low_gain_zero_keeps_stream_bit_identical():
    cfg = default_config()
    base = DeviceSynthesizer(cfg)
    knob = DeviceSynthesizer(cfg, low_gain_p=0.0, low_gain_min=0.05)
    key = jax.random.PRNGKey(3)
    img_a, loc_a, ids_a = jax.vmap(base._sample)(jax.random.split(key, 4))
    img_b, loc_b, ids_b = jax.vmap(knob._sample)(jax.random.split(key, 4))
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
    np.testing.assert_array_equal(np.asarray(loc_a), np.asarray(loc_b))
    np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids_b))


def test_low_gain_darkens_pixels_but_not_labels():
    cfg = default_config()
    base = DeviceSynthesizer(cfg, negative_p=0.0)
    dark = DeviceSynthesizer(cfg, negative_p=0.0, low_gain_p=1.0)
    keys = jax.random.split(jax.random.PRNGKey(11), 16)
    img_a, loc_a, ids_a, kp_a, v_a = jax.vmap(base._sample_full)(keys)
    img_b, loc_b, ids_b, kp_b, v_b = jax.vmap(dark._sample_full)(keys)

    # labels and geometry are untouched by the photometric branch
    np.testing.assert_array_equal(np.asarray(loc_a), np.asarray(loc_b))
    np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids_b))
    np.testing.assert_allclose(np.asarray(kp_a), np.asarray(kp_b))
    np.testing.assert_array_equal(np.asarray(v_a), np.asarray(v_b))

    raw_a = np.asarray(img_a) * 255.0 + 128.0
    raw_b = np.asarray(img_b) * 255.0 + 128.0
    # every frame darker on average (gain <= 0.6), none blacked out entirely
    mean_a = raw_a.mean(axis=(1, 2, 3))
    mean_b = raw_b.mean(axis=(1, 2, 3))
    assert (mean_b < 0.75 * mean_a).all(), (mean_a, mean_b)
    assert (raw_b.max(axis=(1, 2, 3)) > 0).all()
    # the low-gain branch quantizes to integer gray levels
    np.testing.assert_allclose(raw_b, np.round(raw_b), atol=1e-3)


def test_train_cli_accepts_low_gain_flags(tmp_path, capsys):
    from deepcharuco_tpu.cli.train import main

    main(["--steps", "1", "--eval-every", "1", "--eval-batches", "1",
          "--batch-size", "2", "--device-synth",
          "--low-gain-p", "0.5", "--low-gain-min", "0.1",
          "--logdir", str(tmp_path / "logs"),
          "--ckpt-dir", str(tmp_path / "ckpts")])
    assert "best checkpoint" in capsys.readouterr().out
