"""RefineNet — per-corner sub-pixel refinement head in Flax.

Architecture parity with reference ``src/models/refinenet.py:9-83``: input a
24×24 grayscale patch centered on a detected corner; output a 64×64 heatmap of
the central 8×8 region at 8× resolution. The early convs use **VALID padding**
(24→22→20→18→16 spatial, ``refinenet.py:21-27``), then a 2×2 max-pool to 8,
two SAME conv pairs around nearest-neighbour ×2 upsamples (8→16→32→64), and a
1×1 head conv with no activation.

Channel plan (ref ``refinenet.py:16``): 64, 128, 128, 128, 64, head 64→1.
BatchNorm before ReLU throughout, torch-default eps/momentum (see
:class:`deepcharuco_tpu.models.detector.ConvBNRelu`).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from deepcharuco_tpu.models.detector import ConvBNRelu, _pool


def _upsample_nearest_2x(x):
    """Nearest-neighbour ×2 upsample (torch UpsamplingNearest2d semantics)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def _upsample_bilinear_2x(x):
    """Bilinear ×2 upsample — smoother interpolation for the sub-pixel
    heatmap path (beyond-parity option; upsampling carries no parameters, so
    either mode loads the same checkpoints)."""
    import jax

    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * 2, w * 2, c), method="bilinear")


class _ConvBNReluValid(nn.Module):
    """3×3 VALID-padding conv → BN → ReLU (RefineNet's shrinking early stage)."""

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding="VALID", dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=self.param_dtype, name="bn")(x)
        return nn.relu(x)


class RefineNet(nn.Module):
    """(N, P, P, 1) patch → (N, 64, 64, 1) sub-pixel heatmap, P ∈ {24, 32}.

    ``patch_size=24`` (default) is exact reference parity — identical layer
    names/shapes, so all existing checkpoints load unchanged. ``patch_size=32``
    is the round-3 wider-context variant: the measured 0.37 px localization
    floor of the 24×24 net is input-information-limited (BENCH_NOTES — 0.331
    px even on photometrically clean patches), and a 32×32 window sees ~33%
    more support pixels along the two crossing board edges whose intersection
    defines the corner. The 32 front-end runs the same four VALID convs
    (32→24), pools to 12, then two extra VALID convs (``conv2c``/``conv2d``,
    12→10→8) join the standard trunk — every 24-model parameter keeps its
    name, so a 24-checkpoint warm-starts the 32 net (new convs fresh; see
    ``pipeline.merge_variables``). The 64×64 heatmap still covers the central
    8×8 px at 8× resolution, so the decode mapping is unchanged.

    ``upsample="nearest"`` (default) is reference parity; ``"bilinear"`` is
    the beyond-parity smooth-interpolation variant — parameter-free, so both
    modes share checkpoints/weights.

    ``offset_head=True`` adds a direct sub-pixel offset-regression branch
    (round-3 accuracy lever, VERDICT r2 weak #2): the reference decode
    quantizes the 64×64 heatmap argmax to a 1/8-px grid and even soft-argmax
    interpolates over resampled heat values, while this branch regresses the
    continuous (dx, dy) image-px offset of the true corner from the patch
    center straight off the 8×8 bottleneck features — no intermediate
    heatmap, no grid. The heatmap path is untouched (same names/shapes), so
    heatmap-only checkpoints warm-start an offset-head net with only the
    branch fresh. When enabled ``__call__`` returns ``{"heat", "offset"}``.
    """

    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    upsample: str = "nearest"
    patch_size: int = 24
    offset_head: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.patch_size not in (24, 32):
            raise ValueError(f"patch_size must be 24 or 32, got {self.patch_size}")
        c1, c2, c3, c4, c5 = 64, 128, 128, 128, 64
        dt = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        up = (_upsample_bilinear_2x if self.upsample == "bilinear"
              else _upsample_nearest_2x)

        x = x.astype(self.dtype)
        # Shrinking stage, VALID padding (ref refinenet.py:56-62):
        # 24 → 16 (parity) or 32 → 24 (wider context).
        x = _ConvBNReluValid(c1, name="conv1a", **dt)(x, train)
        x = _ConvBNReluValid(c1, name="conv1b", **dt)(x, train)
        x = _ConvBNReluValid(c2, name="conv2a", **dt)(x, train)
        x = _ConvBNReluValid(c2, name="conv2b", **dt)(x, train)
        x = _pool(x)  # 16 → 8  (or 24 → 12)
        if self.patch_size == 32:
            # extra shrink to the trunk's 8×8 grid: 12 → 10 → 8
            x = _ConvBNReluValid(c2, name="conv2c", **dt)(x, train)
            x = _ConvBNReluValid(c2, name="conv2d", **dt)(x, train)

        x = ConvBNRelu(c3, name="conv3a", **dt)(x, train)
        x = ConvBNRelu(c3, name="conv3b", **dt)(x, train)
        bottleneck = x  # (N, 8, 8, c3) — shared trunk tap for the offset head
        x = up(x)  # 8 → 16
        x = ConvBNRelu(c4, name="conv4a", **dt)(x, train)
        x = ConvBNRelu(c4, name="conv4b", **dt)(x, train)
        x = up(x)  # 16 → 32
        x = ConvBNRelu(c5, name="conv5a", **dt)(x, train)
        x = ConvBNRelu(c5, name="conv5b", **dt)(x, train)
        x = up(x)  # 32 → 64

        # Head (ref refinenet.py:81-83): conv-bn-relu then 1×1, no activation.
        x = ConvBNRelu(64, name="convPa", **dt)(x, train)
        heat = nn.Conv(1, (1, 1), name="convPb", **dt)(x)
        heat = heat.astype(jnp.float32)
        if not self.offset_head:
            return heat

        # Offset branch: 8×8 bottleneck → conv → pool → MLP → (dx, dy) in
        # image px relative to the patch center (the same quantity the
        # heatmap decode reconstructs as (argmax − 32)/8). Linear output —
        # targets live within the ±4 px heatmap window, no squashing needed.
        o = ConvBNRelu(128, name="convOa", **dt)(bottleneck, train)
        o = _pool(o)  # 8 → 4
        o = o.reshape(o.shape[0], -1)
        o = nn.Dense(256, name="denseOa", dtype=self.dtype,
                     param_dtype=self.param_dtype)(o)
        o = nn.relu(o)
        offset = nn.Dense(2, name="denseOb", dtype=self.dtype,
                          param_dtype=self.param_dtype)(o)
        return {"heat": heat, "offset": offset.astype(jnp.float32)}
