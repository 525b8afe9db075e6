"""Int8 post-training quantization for detector inference.

TPU v5e's MXU runs int8×int8→int32 at twice the bf16 peak, and the
detector's two-stage path is compute-bound past batch ~128 (BENCH_NOTES
round-4 batch sweep), so an int8 forward raises the throughput ceiling —
no reference analogue exists (the torch reference, ``src/models/net.py``,
serves f32); this is a TPU-native serving option layered on the same
weights.

Scheme (post-training, no fine-tuning):

- **BatchNorm folding**: each ``conv → BN → ReLU`` block collapses to
  ``conv' → ReLU`` with ``w' = w·γ/√(σ²+ε)`` and
  ``b' = (b−μ)·γ/√(σ²+ε) + β`` (inference-only; uses running stats).
- **Weights**: per-output-channel symmetric int8 over the folded kernel
  (``s_w[c] = max|w'[..,c]| / 127``).
- **Input**: the pipeline's normalization is ``(g−128)/255``
  (``ops/image.py``), so a uint8 frame maps LOSSLESSLY onto int8 with
  scale 1/255 and zero-point 0 (``q = g−128``) — int8 zero coincides
  with the f32 path's SAME-padding zero, so the input conv pads with 0.
- **Inner activations**: per-tensor ASYMMETRIC int8 with zero-point
  −128. Every inner activation is post-ReLU (non-negative), so
  ``q = round(y/s) − 128`` spends all 256 levels on ``[0, max]`` —
  measured decode-identical to f32 where symmetric (7 effective bits)
  loses ~0.5 % recall. The zero-point costs nothing at runtime: SAME
  padding uses constant −128 (= activation 0), and the cross-term
  ``zp·Σw`` folds into the f32 bias at quantization time.
- **Compute**: ``lax.conv_general_dilated`` on int8 operands with
  ``preferred_element_type=int32`` (the MXU-native path), then a fused
  f32 epilogue ``acc·(s_x·s_w[c]) + b''[c] → ReLU → requantize``.
  Max-pool commutes with the monotone quantizer and runs on int8.
- **Heads**: ``convPb``/``convDb`` (1×1, no BN/ReLU) dequantize straight
  to f32 logits, so the decode contract (f32 argmax) is unchanged.

``QuantDetector.apply(qvars, g)`` mirrors ``Detector.apply``'s input and
output contract exactly, so it drops into ``pipeline.two_stage_forward``
(and the hires tap) unmodified.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from jax import lax

# Encoder blocks in graph order; (name, pool_after).
_ENCODER = [
    ("conv1a", False), ("conv1b", True),
    ("conv2a", False), ("conv2b", True),
    ("conv3a", False), ("conv3b", True),
    ("conv4a", False), ("conv4b", False),
]
_BN_EPS = 1e-5   # Detector's BatchNorm epsilon (models/detector.py)
_ZP = -128       # inner-activation zero-point (post-ReLU ⇒ [0,max] → 256 levels)


def fold_bn(block_params: Dict[str, Any], block_stats: Dict[str, Any]):
    """Collapse a ConvBNRelu block's BN (running stats) into the conv.

    Returns (kernel, bias) in f32 such that conv(x, kernel) + bias equals
    BN(conv(x, w) + b) at inference.
    """
    gamma = block_params["bn"]["scale"]
    beta = block_params["bn"]["bias"]
    mean = block_stats["bn"]["mean"]
    var = block_stats["bn"]["var"]
    s = gamma / jnp.sqrt(var + _BN_EPS)          # (O,)
    kernel = block_params["conv"]["kernel"] * s  # HWIO: broadcasts over O
    bias = (block_params["conv"]["bias"] - mean) * s + beta
    return kernel.astype(jnp.float32), bias.astype(jnp.float32)


def quantize_weight(kernel: jnp.ndarray):
    """Per-output-channel symmetric int8: returns (w_q int8, s_w (O,) f32)."""
    absmax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    s_w = jnp.maximum(absmax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)
    return w_q, s_w.astype(jnp.float32)


def calibrate_activations(detector, det_vars, frames) -> Dict[str, float]:
    """Per-block output absmax over a calibration batch.

    ``frames``: normalized f32 NHWC (use ``pipeline._to_gray_input``).
    Returns {block_name: absmax} for every ConvBNRelu block (post-ReLU,
    so absmax = max).
    """
    _, state = detector.apply(det_vars, frames,
                              capture_intermediates=True,
                              mutable=["intermediates"])
    inter = state["intermediates"]
    out = {}
    for name in [n for n, _ in _ENCODER] + ["convPa", "convDa"]:
        val = inter[name]["__call__"][0]
        out[name] = float(jnp.max(jnp.abs(val.astype(jnp.float32))))
    return out


def _fuse(w_q, s_w, bias, s_x: float, zp_x: int):
    """Fold dequant scale + zero-point cross-term into (scale, bias).

    With x = s_x·(q − zp_x) and padding value zp_x, the int accumulator
    satisfies conv(x, w) = s_x·s_w·(acc − zp_x·Σw_q), so
    y = acc·scale + bias_eff with scale = s_x·s_w and
    bias_eff = bias − zp_x·Σw_q·scale.
    """
    scale = (s_x * s_w).astype(jnp.float32)
    sum_w = w_q.astype(jnp.float32).sum(axis=(0, 1, 2))
    return scale, (bias - zp_x * sum_w * scale).astype(jnp.float32)


def quantize_detector(detector, det_vars, calib_frames) -> Dict[str, Any]:
    """Build the int8 parameter pytree from f32 variables + calibration.

    ``calib_frames``: normalized f32 NHWC frames spanning the serving
    distribution (a few dozen synthesized boards suffice — scales are
    max-based and the activations are ReLU-bounded).
    """
    params = det_vars["params"]
    stats = det_vars["batch_stats"]
    act = calibrate_activations(detector, det_vars, calib_frames)

    q: Dict[str, Any] = {}
    s_in, zp_in = 1.0 / 255.0, 0  # exact input scale: q = g·255 = uint8 − 128
    for name, _ in _ENCODER + [("convPa", False), ("convDa", False)]:
        kernel, bias = fold_bn(params[name], stats[name])
        w_q, s_w = quantize_weight(kernel)
        scale, bias_eff = _fuse(w_q, s_w, bias, s_in, zp_in)
        s_out = act[name] / 255.0  # 256 levels on [0, max], zp = −128
        q[name] = {"w": w_q, "scale": scale, "bias": bias_eff,
                   "inv_s_out": jnp.float32(1.0 / s_out)}
        if name == "conv4b":
            s_trunk = s_out  # both heads read conv4b's output
        s_in, zp_in = (s_out, _ZP) if name not in ("convPa", "convDa") \
            else (s_trunk, _ZP)

    # Head output convs (1×1, bias, no BN/ReLU) → f32 logits.
    for name, src in (("convPb", "convPa"), ("convDb", "convDa")):
        kernel = params[name]["kernel"].astype(jnp.float32)
        w_q, s_w = quantize_weight(kernel)
        s_x = 1.0 / float(q[src]["inv_s_out"])
        scale, bias_eff = _fuse(w_q, s_w,
                                params[name]["bias"].astype(jnp.float32),
                                s_x, _ZP)
        q[name] = {"w": w_q, "scale": scale, "bias": bias_eff}
    return q


def _qconv(q_x: jnp.ndarray, layer: Dict[str, Any], pad: int | None):
    """int8 NHWC 3×3 (padded) or 1×1 conv → int32 accumulator (MXU-native).

    ``pad``: SAME-padding constant in the quantized domain — 0 for the
    input layer (int8 zero = f32 zero), −128 (= activation 0) inside.
    None for the heads' 1×1 convs (no padding needed).
    """
    if pad is not None and layer["w"].shape[0] > 1:
        q_x = jnp.pad(q_x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                      constant_values=pad)
    return lax.conv_general_dilated(
        q_x, layer["w"], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def _block(q_x: jnp.ndarray, layer: Dict[str, Any], pad: int) -> jnp.ndarray:
    """Quantized ConvBNRelu: conv → dequant+bias → ReLU → requant (int8)."""
    y = _qconv(q_x, layer, pad).astype(jnp.float32) * layer["scale"] \
        + layer["bias"]
    y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y * layer["inv_s_out"]) + _ZP, -128, 127
                    ).astype(jnp.int8)


def _pool(q_x: jnp.ndarray) -> jnp.ndarray:
    # max-pool commutes with the (monotone) quantizer — runs on int8.
    return lax.reduce_window(q_x, jnp.int8(-128), lax.max,
                             (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


class QuantDetector:
    """Drop-in ``Detector`` replacement serving the int8 forward.

    ``apply(qvars, g)`` takes the same normalized f32 NHWC input as
    ``Detector.apply`` and returns the same ``{"loc", "ids"}`` f32 logits,
    so every pipeline entry point (``two_stage_forward``, the hires tap,
    ``InferencePipeline``) accepts it unchanged.
    """

    def __init__(self, n_ids: int = 16):
        self.n_ids = n_ids

    def apply(self, qvars: Dict[str, Any], x: jnp.ndarray,
              train: bool = False):
        if train:
            raise ValueError("QuantDetector is inference-only")
        # x is (g−128)/255. For integer-valued gray g (the base-resolution
        # uint8 path) round(x·255) recovers g−128 exactly; fractional grays
        # (hires pooled views, BGR→gray means) add up to ±0.5 gray-level of
        # input quantization vs the f32 detector — measured harmless at the
        # hires production composition (recall 0.974 vs 0.976, refined
        # agreement ≤0.14 px; BENCH_NOTES round-5 int8 section,
        # tests/test_quant.py::test_int8_composes_with_hires_tap).
        q = jnp.clip(jnp.round(x.astype(jnp.float32) * 255.0), -128, 127
                     ).astype(jnp.int8)
        pad = 0  # input layer: int8 zero IS the f32 path's padding zero
        for name, pool in _ENCODER:
            q = _block(q, qvars[name], pad)
            pad = _ZP
            if pool:
                q = _pool(q)
        heads = {}
        for out, a, b in (("loc", "convPa", "convPb"),
                          ("ids", "convDa", "convDb")):
            h = _block(q, qvars[a], _ZP)
            acc = _qconv(h, qvars[b], None).astype(jnp.float32)
            heads[out] = acc * qvars[b]["scale"] + qvars[b]["bias"]
        return heads


def qvars_to_npz(path: str, qvars: Dict[str, Any]) -> None:
    """Flat npz serialization (int8 kernels kept int8 on disk). Writes a
    ``__quant__`` marker key so ``pipeline.is_quantized_npz`` routes by an
    explicit tag instead of sniffing kernel names."""
    flat = {"__quant__": np.int8(1)}
    for name, layer in qvars.items():
        for k, v in layer.items():
            flat[f"{name}/{k}"] = np.asarray(v)
    np.savez(path, **flat)


def qvars_from_npz(path: str) -> Dict[str, Any]:
    with np.load(path) as z:
        q: Dict[str, Any] = {}
        for key in z.files:
            if key == "__quant__":
                continue
            name, k = key.split("/", 1)
            q.setdefault(name, {})[k] = jnp.asarray(z[key])
    return q
