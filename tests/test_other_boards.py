"""Generality: nothing may hardcode the 5×5 board / 16 ids. Run the whole
stack on a 4×3 board (n_ids = 6) at a different input size."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deepcharuco_tpu.configs import Config
from deepcharuco_tpu.board import inner_corner_object_points
from deepcharuco_tpu.models import Detector, RefineNet
from deepcharuco_tpu.pipeline import Camera, InferencePipeline
from deepcharuco_tpu.pnp import solve_pnp

CFG = Config(
    board_name="DICT_4X4_50",
    row_count=3,
    col_count=4,
    square_len=0.02,
    marker_len=0.015,
    input_size=(256, 192),
)


def test_derived_n_ids():
    assert CFG.n_ids == 6
    pts = inner_corner_object_points(3, 4, 0.02)
    assert pts.shape == (6, 3)


def test_pipeline_on_small_board():
    det = Detector(n_ids=CFG.n_ids, dtype=jnp.float32)
    rn = RefineNet(dtype=jnp.float32)
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 192, 256, 1)))
    rv = rn.init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 1)))
    K = np.array([[300.0, 0, 128], [0, 300.0, 96], [0, 0, 1]], np.float32)
    pipe = InferencePipeline(CFG, dv, rv,
                             camera=Camera(K=K, dist=np.zeros(5, np.float32)),
                             compute_dtype=jnp.float32)
    frames = np.zeros((2, 192, 256, 3), np.uint8)
    kp, valid, refined, ok, rvec, tvec, rms = pipe.detect_with_pose(frames)
    assert kp.shape == (2, 6, 2)
    assert valid.shape == (2, 6)
    assert rvec.shape == (2, 3)


def test_device_synth_small_board():
    cv2 = pytest.importorskip("cv2")
    from deepcharuco_tpu.data.device_synth import DeviceSynthesizer
    from deepcharuco_tpu.ops import label_to_keypoints

    synth = DeviceSynthesizer(CFG)
    imgs, loc, ids = synth.batch(jax.random.PRNGKey(0), 4)
    assert imgs.shape == (4, 192, 256, 1)
    assert loc.shape == (4, 24, 32)
    kp, valid = label_to_keypoints(loc, ids, CFG.n_ids)
    assert kp.shape == (4, 6, 2)
    assert int(np.asarray(valid).sum()) > 0


def test_pnp_small_board():
    cv2 = pytest.importorskip("cv2")
    obj = inner_corner_object_points(3, 4, 0.02)
    K = np.array([[300.0, 0, 128], [0, 300.0, 96], [0, 0, 1]], np.float32)
    rvec = np.array([0.2, -0.15, 0.1], np.float32)
    tvec = np.array([0.0, 0.0, 0.4], np.float32)
    img, _ = cv2.projectPoints(obj, rvec, tvec, K, np.zeros(5))
    ok, r, t, rms = solve_pnp(jnp.asarray(obj), jnp.asarray(img.squeeze(1)),
                              jnp.asarray(np.ones(6, bool)), jnp.asarray(K),
                              jnp.zeros(5))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(r), rvec, atol=5e-3)
    np.testing.assert_allclose(np.asarray(t), tvec, atol=5e-4)
