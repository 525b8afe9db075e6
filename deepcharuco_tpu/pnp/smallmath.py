"""Small fixed-size linear algebra, TPU-friendly.

XLA's general ``eigh``/``svd``/``lu`` lower to iterative algorithms with
scalar control flow — disastrous for 3×3/6×6/9×9 problems inside a vmapped
pose solver (measured ~50 ms/frame on v5e). These replacements are
straight-line unrolled code: Cholesky solves with python-unrolled loops,
inverse power iteration for the smallest eigenvector, and Newton polar
iteration for the nearest rotation. Everything is elementwise/matmul ops that
batch trivially under ``vmap``.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def cholesky_solve(A: jnp.ndarray, b: jnp.ndarray, n: int,
                   jitter: float = 0.0) -> jnp.ndarray:
    """Solve A x = b for symmetric positive-definite A (n ≤ ~10, unrolled).

    Static python loops generate straight-line XLA; no pivot search, no scan.
    """
    # Build L row by row (lists of scalars; shapes broadcast under vmap).
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[i, j] + (jitter if i == j else 0.0)
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, _EPS))
            else:
                L[i][j] = s / L[j][j]
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution Lᵀ x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def smallest_eigvec(S: jnp.ndarray, n: int, iters: int = 12) -> jnp.ndarray:
    """Unit eigenvector of symmetric PSD S for its smallest eigenvalue.

    Inverse power iteration: x ← (S + εI)⁻¹ x via the unrolled Cholesky
    solve. ε is scaled to the matrix magnitude so conditioning stays sane; the
    DLT null vector separates after a handful of iterations.
    """
    scale = jnp.trace(S) / n + _EPS
    jitter = 1e-9 * scale
    x = jnp.ones((n,), S.dtype) / jnp.sqrt(jnp.float32(n))
    for _ in range(iters):
        x = cholesky_solve(S, x, n, jitter=jitter)
        x = x / (jnp.linalg.norm(x) + _EPS)
    return x


def inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3×3 inverse (adjugate / determinant)."""
    a, b, c = M[0, 0], M[0, 1], M[0, 2]
    d, e, f = M[1, 0], M[1, 1], M[1, 2]
    g, h, i = M[2, 0], M[2, 1], M[2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    adj = jnp.array([[A, B, C], [D, E, F], [G, H, I]])
    return adj / (det + jnp.where(jnp.abs(det) < _EPS, _EPS, 0.0))


def polar_rotation(Q: jnp.ndarray, iters: int = 9) -> jnp.ndarray:
    """Nearest rotation matrix to 3×3 Q (the orthogonal polar factor).

    Newton iteration X ← ½(X + X⁻ᵀ) — quadratically convergent, pure 3×3
    matmuls/inverses. A negative determinant (reflection) is fixed up front by
    flipping the last column, matching the SVD-based ``U·diag(1,1,det)·Vᵀ``
    projection.
    """
    det = jnp.linalg.det(Q)
    Q = Q * jnp.where(det < 0, jnp.array([1.0, 1.0, -1.0]), jnp.ones(3))[None, :]
    X = Q / (jnp.linalg.norm(Q, ord="fro") / jnp.sqrt(3.0) + _EPS)
    for _ in range(iters):
        X = 0.5 * (X + inv3(X).T)
    return X
