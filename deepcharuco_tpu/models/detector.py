"""DeepCharuco detector — SuperPoint-style fully-convolutional network in Flax.

Architecture parity with reference ``src/models/net.py:9-80`` (dcModel): a
shared VGG-style encoder (conv pairs at 64/64/128/128 channels with three 2×2
max-pools), a ``loc`` head (3×3 conv to 256 → 1×1 conv to 65 = 8·8 sub-cell
positions + dustbin) and an ``ids`` head (3×3 conv to 256 → 1×1 conv to
``n_ids``+1). BatchNorm runs *before* ReLU (``net.py:59-60``) and head outputs
carry **no activation** (``net.py:74,77``).

TPU-first design choices (not a port):
- **NHWC layout** end to end — XLA:TPU's native conv layout; channel dim maps
  onto the 128-lane axis of the VPU/MXU.
- **bfloat16 compute / float32 params** by default; the final head logits are
  cast back to float32 so the decode argmax is exact.
- Inputs are (N, H, W, 1) already-normalized grayscale; normalization lives in
  :mod:`deepcharuco_tpu.ops.image` so the whole pipeline jits as one program.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class ConvBNRelu(nn.Module):
    """3×3 conv → BatchNorm → ReLU (the reference's repeated block).

    torch BatchNorm2d defaults are eps=1e-5, momentum=0.1 where
    ``running = 0.9*running + 0.1*batch``; flax's momentum is the decay factor,
    so momentum=0.9 reproduces it exactly (needed for checkpoint parity).
    """

    features: int
    kernel: int = 3
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding="SAME" if self.kernel > 1 else "VALID",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="bn",
        )(x)
        return nn.relu(x)


def _pool(x):
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class Detector(nn.Module):
    """Returns dict with ``loc`` (N, H/8, W/8, 65) and ``ids`` (N, H/8, W/8, n_ids+1)."""

    n_ids: int = 16
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, trunk_only: bool = False):
        c1, c2, c3, c4, c5 = 64, 64, 128, 128, 256
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        x = x.astype(self.dtype)
        # Shared encoder (ref net.py:59-71): three pools → stride-8 cell grid.
        x = ConvBNRelu(c1, name="conv1a", **dt)(x, train)
        x = ConvBNRelu(c1, name="conv1b", **dt)(x, train)
        x = _pool(x)
        x = ConvBNRelu(c2, name="conv2a", **dt)(x, train)
        x = ConvBNRelu(c2, name="conv2b", **dt)(x, train)
        x = _pool(x)
        x = ConvBNRelu(c3, name="conv3a", **dt)(x, train)
        x = ConvBNRelu(c3, name="conv3b", **dt)(x, train)
        x = _pool(x)
        x = ConvBNRelu(c4, name="conv4a", **dt)(x, train)
        x = ConvBNRelu(c4, name="conv4b", **dt)(x, train)
        if trunk_only:
            # Shared features for the fused Pallas head+decode kernel
            # (ops/pallas_fused.py); heads are skipped entirely.
            return {"trunk": x}

        # loc head (ref net.py:73-75): 65 = 64 sub-cell positions + dustbin.
        p = ConvBNRelu(c5, name="convPa", **dt)(x, train)
        loc = nn.Conv(65, (1, 1), name="convPb", **dt)(p)  # no activation
        # ids head (ref net.py:76-78): n_ids corner identities + dustbin.
        d = ConvBNRelu(c5, name="convDa", **dt)(x, train)
        ids = nn.Conv(self.n_ids + 1, (1, 1), name="convDb", **dt)(d)  # no activation

        return {"loc": loc.astype(jnp.float32), "ids": ids.astype(jnp.float32)}
