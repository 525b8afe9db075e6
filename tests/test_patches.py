"""Patch gather tests vs a direct numpy crop (ref src/models/model_utils.py:19-36)."""

import numpy as np
import jax.numpy as jnp

from deepcharuco_tpu.ops import extract_patches


def _ref_patch(img, kx, ky, p=24):
    """Reference semantics: zero-pad by p//2, crop [k, k+p) in padded coords."""
    pad = p // 2
    padded = np.pad(img, pad)
    return padded[ky : ky + p, kx : kx + p]


def test_extract_patches_center_and_edges(rng):
    h, w = 48, 64
    img = rng.normal(size=(2, h, w)).astype(np.float32)
    kpts = np.array(
        [
            [[10, 20], [0, 0], [63, 47], [32, 5]],
            [[5, 5], [60, 40], [1, 46], [31, 24]],
        ],
        dtype=np.float32,
    )
    out = np.asarray(extract_patches(jnp.asarray(img), jnp.asarray(kpts)))
    assert out.shape == (2, 4, 24, 24)
    for n in range(2):
        for k in range(4):
            kx, ky = int(kpts[n, k, 0]), int(kpts[n, k, 1])
            np.testing.assert_array_equal(out[n, k], _ref_patch(img[n], kx, ky))


def test_extract_patches_channel_dim(rng):
    img = rng.normal(size=(1, 48, 64, 1)).astype(np.float32)
    kpts = np.array([[[12, 12]]], dtype=np.float32)
    out = np.asarray(extract_patches(jnp.asarray(img), jnp.asarray(kpts)))
    assert out.shape == (1, 1, 24, 24)
    np.testing.assert_array_equal(out[0, 0], _ref_patch(img[0, ..., 0], 12, 12))
