"""Outlier-robust planar PnP — fixed-shape RANSAC inside the jit.

The reference feeds every detection straight into ``cv2.solvePnP``
(``src/inference.py:15-29``); a single wrong-cell corner (the softmax-argmax
decode admits a few) can throw the pose. This solver runs S minimal
hypotheses in parallel — all static shapes, vmappable over frames:

1. draw S random 4-point subsets of the valid detections,
2. homography-init pose per subset (no LM — cheap),
3. count inliers by reprojection error,
4. LM-refine from the best hypothesis on its inlier set.

Everything is masked/batched; no data-dependent shapes, no host round-trip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from deepcharuco_tpu.pnp.projection import project_points, rodrigues_inverse, undistort_normalize
from deepcharuco_tpu.pnp.solve import (
    _dlt_homography,
    _lm_refine,
    _pose_from_homography,
)

_EPS = 1e-12


def _sample_weights(key, valid, n_points: int, subset: int = 4):
    """A soft 4-point subset: weights 1 for `subset` random valid points.

    Gumbel-top-k over the validity mask — fixed shapes, duplicate-free.
    """
    g = jax.random.gumbel(key, (n_points,))
    score = jnp.where(valid, g, -jnp.inf)
    thresh = jnp.sort(score)[-subset]
    w = (score >= thresh) & valid
    return w.astype(jnp.float32)


@partial(jax.jit, static_argnames=("n_hypotheses", "iters"))
def solve_pnp_ransac(object_points, image_points, valid, K, dist, key,
                     inlier_px: float = 3.0, n_hypotheses: int = 16,
                     iters: int = 20):
    """Robust planar PnP at fixed capacity.

    Same contract as :func:`deepcharuco_tpu.pnp.solve.solve_pnp` plus a PRNG
    ``key``; additionally returns the final inlier mask.
    """
    n = object_points.shape[0]
    w_all = valid.astype(jnp.float32)
    n_valid = jnp.sum(w_all)
    ok = n_valid >= 4

    safe = jnp.array([K[0, 2], K[1, 2]], dtype=image_points.dtype)
    image_points = jnp.where(valid[:, None], image_points, safe)

    xn = undistort_normalize(image_points, K, dist)

    def hypothesis(k):
        w = _sample_weights(k, valid, n)
        H = _dlt_homography(object_points[:, :2], xn, w)
        R0, t0 = _pose_from_homography(H)
        rvec0 = rodrigues_inverse(R0)
        proj = project_points(object_points, rvec0, t0, K, dist)
        err = jnp.linalg.norm(proj - image_points, axis=-1)
        inl = valid & (err < inlier_px) & jnp.isfinite(err)
        return rvec0, t0, jnp.sum(inl), inl

    keys = jax.random.split(key, n_hypotheses)
    rvecs, tvecs, counts, inls = jax.vmap(hypothesis)(keys)
    best = jnp.argmax(counts)
    inlier = inls[best]
    # degenerate RANSAC (no hypothesis with ≥4 inliers) → fall back to all
    # valid points
    use_all = counts[best] < 4
    inlier = jnp.where(use_all, valid, inlier)

    w = inlier.astype(jnp.float32)
    rvec, tvec, cost = _lm_refine(object_points, image_points, w, K, dist,
                                  rvecs[best], tvecs[best], iters=iters)
    rms = jnp.sqrt(cost / jnp.maximum(jnp.sum(w), 1.0))

    finite = jnp.isfinite(rms) & jnp.all(jnp.isfinite(rvec)) & jnp.all(jnp.isfinite(tvec))
    ok = ok & finite
    zero = jnp.zeros(3, dtype=rvec.dtype)
    rvec = jnp.where(ok, rvec, zero)
    tvec = jnp.where(ok, tvec, zero)
    rms = jnp.where(ok, rms, jnp.float32(jnp.inf))
    return ok, rvec, tvec, rms, inlier


def solve_pnp_ransac_batch(object_points, image_points, valid, K, dist, key,
                           inlier_px: float = 3.0, n_hypotheses: int = 16,
                           iters: int = 20):
    """vmap over a leading frame dim; per-frame subkeys."""
    n = image_points.shape[0]
    keys = jax.random.split(key, n)
    fn = lambda ip, v, k: solve_pnp_ransac(object_points, ip, v, K, dist, k,
                                           inlier_px=inlier_px,
                                           n_hypotheses=n_hypotheses,
                                           iters=iters)
    return jax.vmap(fn)(image_points, valid, keys)
