"""Fixed-capacity on-device patch gather.

Reference ``extract_patches`` (``src/models/model_utils.py:19-36``) zero-pads
the frame by 12 px and gathers one 24×24 patch per detected keypoint — but
only for a single image and a variable number of keypoints. Here the gather is
batched over frames and runs at fixed capacity (one slot per corner id), so it
lives inside the same jitted program as both networks.

The two-level gather (rows then columns) maps to two XLA gathers over
contiguous memory — cheap on TPU compared to a scatter-based crop.
"""

from __future__ import annotations

import jax.numpy as jnp


def extract_patches(gray: jnp.ndarray, keypoints: jnp.ndarray,
                    patch_size: int = 24) -> jnp.ndarray:
    """Gather patch_size×patch_size patches centered on integer keypoints.

    Parameters
    ----------
    gray : (N, H, W) or (N, H, W, 1) float — normalized grayscale frames.
    keypoints : (N, K, 2) — (x, y) integer pixel positions (float ok, truncated).

    Returns
    -------
    (N, K, patch_size, patch_size) float — zero-padded out-of-bounds regions,
    matching the reference's constant-0 padding.
    """
    squeeze_ch = gray.ndim == 4
    if squeeze_ch:
        gray = gray[..., 0]
    n, h, w = gray.shape
    k = keypoints.shape[1]
    pad = patch_size // 2
    padded = jnp.pad(gray, ((0, 0), (pad, pad), (pad, pad)))

    kx = jnp.clip(keypoints[..., 0].astype(jnp.int32), 0, w - 1)  # (N, K)
    ky = jnp.clip(keypoints[..., 1].astype(jnp.int32), 0, h - 1)

    offs = jnp.arange(patch_size, dtype=jnp.int32)
    # Patch centered on kp spans rows [ky, ky+patch_size) of the padded frame.
    rows = ky[..., None] + offs  # (N, K, P)
    cols = kx[..., None] + offs  # (N, K, P)

    batch_idx = jnp.arange(n, dtype=jnp.int32)[:, None, None]
    p_rows = padded[batch_idx, rows]  # (N, K, P, W+2p) — one gather
    patches = jnp.take_along_axis(
        p_rows, cols[:, :, None, :], axis=-1
    )  # (N, K, P, P) — second gather
    return patches
