"""Batched planar PnP: masked DLT homography init + Levenberg–Marquardt.

Replaces the reference's per-frame host round-trip through OpenCV's
``cv2.solvePnP`` (SOLVEPNP_ITERATIVE, ``src/inference.py:28``) with a solver
that runs *inside* the XLA program, vmappable across frames and boards. For a
planar target cv2's iterative solver is homography-initialized DLT + LM on the
reprojection error — the same objective minimized here, so converged poses
agree to numeric tolerance (tested against cv2 across pose ranges).

Static shapes: all point arrays are fixed capacity (n_ids) with a validity
mask; the reference's ``< 4 points → failure`` gate (``inference.py:16-17``)
becomes an ``ok`` flag.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from deepcharuco_tpu.pnp.projection import (
    project_points,
    rodrigues,
    rodrigues_inverse,
    undistort_normalize,
)
from deepcharuco_tpu.pnp.smallmath import (
    cholesky_solve,
    inv3,
    polar_rotation,
    smallest_eigvec,
)

_EPS = 1e-12


def _normalization_transform(pts: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Hartley normalization: (3,3) similarity moving the weighted centroid to
    the origin and mean distance to √2. pts (N,2), w (N,) weights in {0,1}."""
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(pts * w[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=-1) + _EPS)
    mean_d = jnp.sum(d * w) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(mean_d, _EPS)
    return jnp.array([
        [s, 0.0, -s * mean[0]],
        [0.0, s, -s * mean[1]],
        [0.0, 0.0, 1.0],
    ])


def _dlt_homography(obj_xy: jnp.ndarray, img_xy: jnp.ndarray,
                    w: jnp.ndarray) -> jnp.ndarray:
    """Masked, normalized DLT: H mapping obj plane coords → image coords.

    obj_xy, img_xy: (N, 2); w: (N,) 0/1 validity. Invalid rows contribute
    zero equations. Returns (3,3) H (un-normalized scale).
    """
    To = _normalization_transform(obj_xy, w)
    Ti = _normalization_transform(img_xy, w)
    on = obj_xy * To[0, 0] + To[:2, 2]
    im = img_xy * Ti[0, 0] + Ti[:2, 2]

    X, Y = on[:, 0], on[:, 1]
    x, y = im[:, 0], im[:, 1]
    z = jnp.zeros_like(X)
    o = jnp.ones_like(X)
    r1 = jnp.stack([X, Y, o, z, z, z, -x * X, -x * Y, -x], axis=-1)
    r2 = jnp.stack([z, z, z, X, Y, o, -y * X, -y * Y, -y], axis=-1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)  # (2N, 9)

    # Null vector of A = eigenvector of AᵀA with the smallest eigenvalue —
    # inverse power iteration on unrolled 9×9 Cholesky (XLA's eigh lowers to
    # scalar-control-flow iterations that are ~1000× slower at this size).
    AtA = A.T @ A
    h = smallest_eigvec(AtA, 9)
    Hn = h.reshape(3, 3)
    H = inv3(Ti) @ (Hn @ To)
    return H / jnp.where(jnp.abs(H[2, 2]) > _EPS, H[2, 2], 1.0)


def _pose_from_homography(H: jnp.ndarray):
    """Planar homography (in *normalized camera* coords) → (R, t).

    H ∝ [r1 r2 t]; orthonormalize with SVD to get a proper rotation.
    """
    # Board must sit in front of the camera: t_z > 0.
    H = H * jnp.where(H[2, 2] < 0, -1.0, 1.0)
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 2.0 / (jnp.linalg.norm(h1) + jnp.linalg.norm(h2) + _EPS)
    r1 = h1 * lam
    r2 = h2 * lam
    t = h3 * lam
    r3 = jnp.cross(r1, r2)
    Q = jnp.stack([r1, r2, r3], axis=-1)
    R = polar_rotation(Q)  # nearest rotation; Newton polar beats XLA's svd here
    return R, t


def _lm_refine(obj: jnp.ndarray, img: jnp.ndarray, w: jnp.ndarray,
               K: jnp.ndarray, dist: jnp.ndarray,
               rvec0: jnp.ndarray, tvec0: jnp.ndarray, iters: int = 20):
    """Levenberg–Marquardt on masked pixel reprojection error, fixed iters."""

    def residual(p):
        r = project_points(obj, p[:3], p[3:], K, dist) - img
        return (r * w[:, None]).reshape(-1)

    jac = jax.jacfwd(residual)

    def step(carry, _):
        p, lam, cost = carry
        r = residual(p)
        J = jac(p)  # (2N, 6)
        JtJ = J.T @ J
        g = J.T @ r
        A = JtJ + lam * jnp.diag(jnp.diagonal(JtJ) + 1e-12)
        delta = cholesky_solve(A, g, 6)  # SPD by construction; unrolled, no LU
        p_new = p - delta
        cost_new = jnp.sum(residual(p_new) ** 2)
        better = cost_new < cost
        p = jnp.where(better, p_new, p)
        lam = jnp.where(better, jnp.maximum(lam * 0.3, 1e-12), jnp.minimum(lam * 4.0, 1e8))
        cost = jnp.where(better, cost_new, cost)
        return (p, lam, cost), None

    p0 = jnp.concatenate([rvec0, tvec0])
    cost0 = jnp.sum(residual(p0) ** 2)
    (p, _, cost), _ = jax.lax.scan(step, (p0, jnp.float32(1e-3), cost0), None,
                                   length=iters)
    return p[:3], p[3:], cost


def _twin_pose(R: jnp.ndarray, t: jnp.ndarray, obj_centroid: jnp.ndarray):
    """The second solution of the two-fold planar-pose ambiguity.

    A plane with normal n seen along view direction v admits a near-identical
    projection with the normal reflected across v. Constructing that twin and
    refining from *both* inits lets the solver return the global minimum —
    where cv2's single-init iterative solver can land in the worse basin
    (observed on low-tilt noisy boards).
    """
    n = R[:, 2]
    c = R @ obj_centroid + t
    v = c / (jnp.linalg.norm(c) + _EPS)
    n2 = 2.0 * jnp.dot(n, v) * v - n  # reflect normal across the view ray
    axis = jnp.cross(n, n2)
    s = jnp.linalg.norm(axis)
    cos_t = jnp.clip(jnp.dot(n, n2), -1.0, 1.0)
    theta = jnp.arctan2(s, cos_t)
    axis = axis / (s + _EPS)
    R_delta = rodrigues(axis * theta)
    return R_delta @ R, t


@partial(jax.jit, static_argnames=("iters",))
def solve_pnp(object_points: jnp.ndarray, image_points: jnp.ndarray,
              valid: jnp.ndarray, K: jnp.ndarray, dist: jnp.ndarray,
              iters: int = 20):
    """Planar PnP for one frame at fixed capacity.

    Parameters
    ----------
    object_points : (N, 3) board points (z=0 plane), slot k = corner id k.
    image_points : (N, 2) detected pixels (same slots).
    valid : (N,) bool slot occupancy.
    K : (3, 3) camera matrix;  dist : 4/5/8/12 cv2 coefficients
        (rational + thin-prism model, see ``projection.distort``).

    Returns
    -------
    ok : () bool — ≥4 valid points (reference gate, ``inference.py:16-17``).
    rvec, tvec : (3,) each — cv2 conventions; zeros when not ok.
    reproj_err : () float — RMS masked reprojection error in pixels.
    """
    w = valid.astype(jnp.float32)
    n_valid = jnp.sum(w)
    ok = n_valid >= 4

    # Geometric degeneracy gate: the valid detections must span a genuinely
    # 2-D constellation. Coincident or collinear points admit arbitrarily bad
    # "low-residual" poses (all corners on one pixel ⇒ board at infinity), so
    # require the smaller principal std-dev of the point cloud to exceed 1 px.
    wsum = jnp.maximum(n_valid, 1.0)
    mean_ip = jnp.sum(jnp.where(valid[:, None], image_points, 0.0), axis=0) / wsum
    cen = jnp.where(valid[:, None], image_points - mean_ip, 0.0)
    cxx = jnp.sum(cen[:, 0] * cen[:, 0]) / wsum
    cyy = jnp.sum(cen[:, 1] * cen[:, 1]) / wsum
    cxy = jnp.sum(cen[:, 0] * cen[:, 1]) / wsum
    tr = cxx + cyy
    det = cxx * cyy - cxy * cxy
    min_eig = tr / 2.0 - jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    ok = ok & (min_eig > 1.0)

    # Invalid slots may carry arbitrary garbage; replace with the principal
    # point so every arithmetic path stays finite (0·NaN would poison the
    # masked DLT/LM reductions otherwise).
    safe = jnp.array([K[0, 2], K[1, 2]], dtype=image_points.dtype)
    image_points = jnp.where(valid[:, None], image_points, safe)

    # Init in undistorted normalized coords (identity intrinsics) —
    # homography then directly encodes [r1 r2 t].
    xn = undistort_normalize(image_points, K, dist)
    H = _dlt_homography(object_points[:, :2], xn, w)
    R0, t0 = _pose_from_homography(H)
    rvec0 = rodrigues_inverse(R0)

    # Refine from the homography pose AND its planar-ambiguity twin; keep the
    # lower-cost result (global minimum of the reprojection objective).
    centroid = jnp.sum(object_points * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    R1, t1 = _twin_pose(R0, t0, centroid)
    rvec1 = rodrigues_inverse(R1)

    rv_a, tv_a, cost_a = _lm_refine(object_points, image_points, w, K, dist,
                                    rvec0, t0, iters=iters)
    rv_b, tv_b, cost_b = _lm_refine(object_points, image_points, w, K, dist,
                                    rvec1, t1, iters=iters)
    pick_a = cost_a <= cost_b
    rvec = jnp.where(pick_a, rv_a, rv_b)
    tvec = jnp.where(pick_a, tv_a, tv_b)
    cost = jnp.where(pick_a, cost_a, cost_b)
    rms = jnp.sqrt(cost / jnp.maximum(n_valid, 1.0))

    # Degenerate geometry (e.g. coincident points from garbage detections)
    # drives the DLT/LM to non-finite values — report failure, not NaN.
    finite = jnp.isfinite(rms) & jnp.all(jnp.isfinite(rvec)) & jnp.all(jnp.isfinite(tvec))
    ok = ok & finite

    zero = jnp.zeros(3, dtype=rvec.dtype)
    rvec = jnp.where(ok, rvec, zero)
    tvec = jnp.where(ok, tvec, zero)
    rms = jnp.where(ok, rms, jnp.float32(jnp.inf))
    return ok, rvec, tvec, rms


def solve_pnp_batch(object_points, image_points, valid, K, dist, iters: int = 20):
    """vmap of :func:`solve_pnp` over a leading batch dim of image points /
    validity (object points, K, dist broadcast)."""
    fn = lambda ip, v: solve_pnp(object_points, ip, v, K, dist, iters=iters)
    return jax.vmap(fn)(image_points, valid)
