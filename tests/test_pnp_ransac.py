"""RANSAC PnP: must recover the true pose despite gross outlier corners that
break the plain least-squares solver."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deepcharuco_tpu.board import inner_corner_object_points
from deepcharuco_tpu.pnp import solve_pnp
from deepcharuco_tpu.pnp.ransac import solve_pnp_ransac, solve_pnp_ransac_batch

cv2 = pytest.importorskip("cv2")

K = np.array([[420.0, 0, 160.0], [0, 420.0, 120.0], [0, 0, 1.0]], np.float32)
DIST = np.zeros(5, np.float32)
OBJ = inner_corner_object_points(5, 5, 0.01)


def _project(rvec, tvec):
    img, _ = cv2.projectPoints(OBJ, rvec, tvec, K, DIST)
    return img.squeeze(1).astype(np.float32)


def test_ransac_rejects_gross_outliers(rng):
    rvec = np.array([0.3, -0.2, 0.15], np.float32)
    tvec = np.array([0.005, 0.0, 0.3], np.float32)
    img = _project(rvec, tvec)
    img += rng.normal(scale=0.3, size=img.shape).astype(np.float32)
    # two gross outliers (wrong-cell detections, ~100px off)
    img[3] += np.array([95.0, -60.0])
    img[11] += np.array([-120.0, 40.0])
    valid = np.ones(16, bool)

    ok_r, r_r, t_r, rms_r, inlier = solve_pnp_ransac(
        jnp.asarray(OBJ), jnp.asarray(img), jnp.asarray(valid),
        jnp.asarray(K), jnp.asarray(DIST), jax.random.PRNGKey(0))
    assert bool(ok_r)
    np.testing.assert_allclose(np.asarray(r_r), rvec, atol=2e-2)
    np.testing.assert_allclose(np.asarray(t_r), tvec, atol=2e-3)
    # the outliers are excluded
    inl = np.asarray(inlier)
    assert not inl[3] and not inl[11]
    assert inl.sum() >= 12

    # plain LM on all points is dragged off by the outliers
    ok_p, r_p, t_p, rms_p = solve_pnp(
        jnp.asarray(OBJ), jnp.asarray(img), jnp.asarray(valid),
        jnp.asarray(K), jnp.asarray(DIST))
    err_plain = np.abs(np.asarray(t_p) - tvec).max()
    err_ransac = np.abs(np.asarray(t_r) - tvec).max()
    assert err_ransac < err_plain


def test_ransac_clean_input_matches_plain(rng):
    rvec = np.array([0.2, 0.1, -0.1], np.float32)
    tvec = np.array([0.0, 0.0, 0.25], np.float32)
    img = _project(rvec, tvec)
    valid = np.ones(16, bool)
    ok, r, t, rms, inlier = solve_pnp_ransac(
        jnp.asarray(OBJ), jnp.asarray(img), jnp.asarray(valid),
        jnp.asarray(K), jnp.asarray(DIST), jax.random.PRNGKey(1))
    assert bool(ok) and np.asarray(inlier).all()
    np.testing.assert_allclose(np.asarray(r), rvec, atol=5e-3)
    np.testing.assert_allclose(np.asarray(t), tvec, atol=2e-4)


def test_ransac_batch(rng):
    rvec = np.array([0.1, 0.2, 0.0], np.float32)
    tvec = np.array([0.0, 0.01, 0.35], np.float32)
    img = _project(rvec, tvec)
    imgs = np.broadcast_to(img, (3, 16, 2)).copy()
    valids = np.ones((3, 16), bool)
    ok, r, t, rms, inlier = solve_pnp_ransac_batch(
        jnp.asarray(OBJ), jnp.asarray(imgs), jnp.asarray(valids),
        jnp.asarray(K), jnp.asarray(DIST), jax.random.PRNGKey(2))
    assert ok.shape == (3,) and bool(np.asarray(ok).all())


def test_ransac_too_few_points():
    img = np.zeros((16, 2), np.float32)
    valid = np.zeros(16, bool)
    valid[:3] = True
    ok, r, t, rms, inlier = solve_pnp_ransac(
        jnp.asarray(OBJ), jnp.asarray(img), jnp.asarray(valid),
        jnp.asarray(K), jnp.asarray(DIST), jax.random.PRNGKey(3))
    assert not bool(ok)
    assert np.all(np.isfinite(np.asarray(r)))
