"""Camera model: Rodrigues rotations, Brown–Conrady distortion, projection.

OpenCV conventions throughout (rvec axis-angle, distortion coefficient order
``[k1, k2, p1, p2, k3]``) so results are directly comparable with the
reference's ``cv2.solvePnP``/``cv2.projectPoints`` tail
(``src/inference.py:15-29``). Everything is pure jnp, differentiable, and
shaped for ``vmap`` over frames/boards.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (3,) → rotation matrix (3, 3).

    Taylor-safe at θ→0 so gradients flow through the identity pose.
    """
    theta2 = jnp.sum(rvec * rvec)
    theta = jnp.sqrt(theta2 + _EPS)
    # sin θ / θ and (1 − cos θ)/θ² with small-angle series fallback
    small = theta2 < 1e-10
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    kx, ky, kz = rvec[0], rvec[1], rvec[2]
    K = jnp.array([[0.0, -kz, ky], [kz, 0.0, -kx], [-ky, kx, 0.0]])
    return jnp.eye(3) + a * K + b * (K @ K)


def rodrigues_inverse(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (3, 3) → axis-angle (3,) (principal branch, θ ∈ [0, π])."""
    tr = jnp.trace(R)
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # Generic case: axis from the skew-symmetric part.
    w = jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    sin_t = jnp.sin(theta)
    generic = w * (theta / (2.0 * sin_t + _EPS))
    near_zero = theta < 1e-6
    near_pi = jnp.pi - theta < 1e-4
    # θ≈π: axis from diagonal of (R + I)/2 = aaᵀ; sign fixed by largest w-comp.
    aa = jnp.sqrt(jnp.maximum(jnp.diagonal(R) * 0.5 + 0.5, 0.0))
    # pick signs consistent with off-diagonals
    sx = jnp.where(R[0, 1] + R[1, 0] >= 0, 1.0, -1.0)
    sz = jnp.where(R[1, 2] + R[2, 1] >= 0, 1.0, -1.0)
    axis_pi = jnp.array([aa[0] * sx, aa[1], aa[2] * sz])
    axis_pi = axis_pi / (jnp.linalg.norm(axis_pi) + _EPS)
    out = jnp.where(near_pi, axis_pi * theta, generic)
    return jnp.where(near_zero, w * 0.5, out)


def _dist12(dist: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad a 4/5/8/12-coefficient cv2 distortion vector to length 12.

    cv2 order: [k1, k2, p1, p2, k3, k4, k5, k6, s1, s2, s3, s4]. The length
    is static under jit, so the pad resolves at trace time. The 14-element
    tilted-sensor model (τx, τy) is rejected upstream (``Camera.from_npz``).
    """
    d = jnp.asarray(dist, jnp.float32).ravel()
    n = d.shape[0]
    if n > 12:
        raise ValueError(
            f"{n}-coefficient distortion (tilted-sensor model) unsupported")
    if n < 12:
        d = jnp.concatenate([d, jnp.zeros(12 - n, jnp.float32)])
    return d


def distort(xn: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Apply cv2's rational + thin-prism distortion to normalized coords.

    xn: (..., 2) ideal normalized image coords; dist: 4/5/8/12 cv2
    coefficients (see :func:`_dist12`). With only the first 5 non-zero this
    reduces to the plain Brown–Conrady model; the rational denominator
    (k4..k6) and thin-prism terms (s1..s4) match ``cv2.projectPoints``
    (conventions used at reference ``src/pose_estimation.py:35-37``).
    """
    d = _dist12(dist)
    k1, k2, p1, p2, k3 = d[0], d[1], d[2], d[3], d[4]
    k4, k5, k6 = d[5], d[6], d[7]
    s1, s2, s3, s4 = d[8], d[9], d[10], d[11]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = ((1.0 + r2 * (k1 + r2 * (k2 + r2 * k3)))
              / (1.0 + r2 * (k4 + r2 * (k5 + r2 * k6))))
    xy = x * y
    xd = (x * radial + 2.0 * p1 * xy + p2 * (r2 + 2.0 * x * x)
          + r2 * (s1 + s2 * r2))
    yd = (y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * xy
          + r2 * (s3 + s4 * r2))
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalize(pts: jnp.ndarray, K: jnp.ndarray, dist: jnp.ndarray,
                        iters: int = 8) -> jnp.ndarray:
    """Pixel coords (..., 2) → ideal normalized coords, inverting distortion.

    Fixed-point iteration (cv2.undistortPoints uses the same scheme); a fixed
    small iteration count keeps the program static.
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    xd = jnp.stack([(pts[..., 0] - cx) / fx, (pts[..., 1] - cy) / fy], axis=-1)
    x = xd
    for _ in range(iters):
        d = distort(x, dist) - x  # distortion delta at current estimate
        x = xd - d
    return x


def project_points(obj: jnp.ndarray, rvec: jnp.ndarray, tvec: jnp.ndarray,
                   K: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """cv2.projectPoints semantics: (N, 3) object points → (N, 2) pixels."""
    R = rodrigues(rvec)
    cam = obj @ R.T + tvec  # (N, 3)
    xn = cam[..., :2] / jnp.maximum(cam[..., 2:3], _EPS)
    xd = distort(xn, dist)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack([xd[..., 0] * fx + cx, xd[..., 1] * fy + cy], axis=-1)
