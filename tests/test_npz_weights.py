"""npz weight round-trip and pipeline loading."""

import numpy as np
import jax
import jax.numpy as jnp

from deepcharuco_tpu.configs import default_config
from deepcharuco_tpu.models import Detector
from deepcharuco_tpu.pipeline import (
    load_pipeline,
    variables_from_npz,
    variables_to_npz,
)


def test_npz_roundtrip(tmp_path):
    det = Detector(n_ids=16, dtype=jnp.float32)
    v = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 1)))
    path = str(tmp_path / "w.npz")
    variables_to_npz(path, v)
    back = variables_from_npz(path)
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(v)[0], key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_flatten_with_path(back)[0], key=lambda t: str(t[0])),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_pipeline_from_npz(tmp_path):
    cfg = default_config()
    det = Detector(n_ids=cfg.n_ids, dtype=jnp.float32)
    v = det.init(jax.random.PRNGKey(1), jnp.zeros((1, 240, 320, 1)))
    path = str(tmp_path / "det.npz")
    variables_to_npz(path, v)
    pipe = load_pipeline(cfg, path, compute_dtype=jnp.float32)
    kp, valid, refined = pipe.detect(np.zeros((1, 240, 320, 3), np.uint8))
    assert kp.shape == (1, 16, 2)
