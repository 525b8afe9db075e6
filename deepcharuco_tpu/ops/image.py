"""On-device image preprocessing.

The reference does BGR→gray + normalize on host with cv2/numpy
(``src/inference.py:40-41``, ``src/models/model_utils.py:46-50``) and ships a
float32 tensor to the device per frame. Here the *uint8* frame is shipped once
and everything else happens inside the jitted program — 4× less PCIe/DMA
traffic and zero host work in the hot loop.
"""

from __future__ import annotations

import jax.numpy as jnp


def bgr_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """BGR (..., 3) uint8/float → grayscale (...,) float32.

    Uses the ITU-R BT.601 weights that cv2.COLOR_BGR2GRAY uses
    (0.114·B + 0.587·G + 0.299·R), without the uint8 rounding step; the ≤0.5
    LSB difference is absorbed by the (g−128)/255 normalization and is far
    below the detector's quantization (8×8 cell argmax).
    """
    img = img.astype(jnp.float32)
    return img[..., 0] * 0.114 + img[..., 1] * 0.587 + img[..., 2] * 0.299


def normalize_gray(gray: jnp.ndarray) -> jnp.ndarray:
    """(g − 128)/255 — reference ``pre_bgr_image`` (``model_utils.py:46-50``).

    Input (..., H, W) uint8/float; output float32 (..., H, W, 1) NHWC.
    """
    g = gray.astype(jnp.float32)
    return ((g - 128.0) / 255.0)[..., None]


def preprocess_bgr(img: jnp.ndarray) -> jnp.ndarray:
    """BGR uint8 (..., H, W, 3) → normalized grayscale (..., H, W, 1) float32."""
    return normalize_gray(bgr_to_gray(img))


def downsample2x(gray: jnp.ndarray) -> jnp.ndarray:
    """2×2 average-pool (..., 2H, 2W, C) → (..., H, W, C).

    The hi-res tap's detector view (see ``pipeline.two_stage_forward_hires``):
    low-res pixel (i, j) is the mean of hi-res pixels (2i..2i+1, 2j..2j+1),
    so a point at low-res center-coordinate x sits at hi-res coordinate
    2·x + 0.5 — the mapping the hi-res pipeline inverts when returning
    low-res corners. Requires even spatial dims (static-shape check).
    """
    *lead, h, w, c = gray.shape
    if h % 2 or w % 2:
        raise ValueError(f"downsample2x needs even spatial dims, got {h}x{w}")
    x = gray.reshape(*lead, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(-2, -4))
