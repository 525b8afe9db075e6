"""Gaussian heatmap label generation — closed-form, vectorized.

The reference splats its RefineNet training targets with a numba-jitted
double loop (``src/data_refinenet.py:16-38``, ``_add_gaussian``): per pixel
``exp(-d²/2σ²)``, skipped when the exponent exceeds ln(100) (~1% mass), clamped
to 1. For integer corner positions and stride 1 (the only configuration the
reference uses — ``create_sample`` passes rounded ints, ``data_refinenet.py:84-91``)
the bounding-box pre-clip is strictly looser than the exponent threshold, so a
single vectorized expression reproduces it bit-for-bit. No numba, no loop —
runs in numpy on host workers or jnp on device.
"""

from __future__ import annotations

import numpy as np

_LN100 = 4.6052


def gaussian_heatmap(cx, cy, size: int = 64, sigma: float = 2.0,
                     xp=np) -> "np.ndarray":
    """Heatmap with a thresholded Gaussian at integer (cx, cy).

    xp: array namespace — ``numpy`` (host label gen) or ``jax.numpy``.
    Returns (size, size) float32.
    """
    ys = xp.arange(size, dtype=xp.float32)[:, None]
    xs = xp.arange(size, dtype=xp.float32)[None, :]
    d2 = (xs - cx) ** 2 + (ys - cy) ** 2
    expo = d2 / (2.0 * sigma * sigma)
    heat = xp.where(expo > _LN100, 0.0, xp.exp(-expo))
    return xp.minimum(heat, 1.0).astype(xp.float32)
