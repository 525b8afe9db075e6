"""Degenerate-input robustness: garbage/coincident detections must yield
ok=False with finite outputs, never NaN."""

import numpy as np
import jax.numpy as jnp

from deepcharuco_tpu.board import inner_corner_object_points
from deepcharuco_tpu.pnp import solve_pnp

K = np.array([[400.0, 0, 160.0], [0, 400.0, 120.0], [0, 0, 1.0]], np.float32)
DIST = np.zeros(5, np.float32)
OBJ = inner_corner_object_points(5, 5, 0.01)


def test_coincident_points_fail_cleanly():
    img = np.full((16, 2), 37.0, np.float32)  # all detections identical
    ok, r, t, rms = solve_pnp(jnp.asarray(OBJ), jnp.asarray(img),
                              jnp.asarray(np.ones(16, bool)),
                              jnp.asarray(K), jnp.asarray(DIST))
    assert not bool(ok)
    assert np.all(np.isfinite(np.asarray(r)))
    assert np.all(np.isfinite(np.asarray(t)))
    np.testing.assert_array_equal(np.asarray(r), 0)


def test_collinear_points_fail_cleanly():
    img = np.stack([np.linspace(10, 300, 16), np.linspace(10, 200, 16)],
                   axis=1).astype(np.float32)
    ok, r, t, rms = solve_pnp(jnp.asarray(OBJ), jnp.asarray(img),
                              jnp.asarray(np.ones(16, bool)),
                              jnp.asarray(K), jnp.asarray(DIST))
    assert not bool(ok)
    assert np.all(np.isfinite(np.asarray(r)))
    assert np.all(np.isfinite(np.asarray(t)))


def test_nan_in_invalid_slots_does_not_poison():
    import cv2

    rvec = np.array([0.3, -0.2, 0.1], np.float32)
    tvec = np.array([0.0, 0.0, 0.3], np.float32)
    img, _ = cv2.projectPoints(OBJ, rvec, tvec, K, DIST)
    img = img.squeeze(1).astype(np.float32)
    valid = np.ones(16, bool)
    valid[[2, 9]] = False
    img[~valid] = np.nan
    ok, r, t, rms = solve_pnp(jnp.asarray(OBJ), jnp.asarray(img),
                              jnp.asarray(valid), jnp.asarray(K),
                              jnp.asarray(DIST))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(r), rvec, atol=1e-3)
