"""Regenerate tests/golden_pipeline.npz from the SHIPPED artifact weights.

Run on the CPU backend (same backend the test suite uses) whenever the
shipped ``artifacts/*.npz`` change; mirrors ``tests/test_golden.py`` exactly.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from deepcharuco_tpu.configs import default_config  # noqa: E402
from deepcharuco_tpu.data.device_synth import DeviceSynthesizer  # noqa: E402
from deepcharuco_tpu.models import Detector, RefineNet  # noqa: E402
from deepcharuco_tpu.pipeline import two_stage_forward, variables_from_npz  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden_pipeline.npz")


def main():
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
    valid = np.asarray(valid)
    np.savez(OUT, valid=valid, keypoints=np.asarray(kp), refined=np.asarray(refined))
    print(f"wrote {os.path.normpath(OUT)}: {int(valid.sum())} valid corners")


if __name__ == "__main__":
    main()
