"""Training/validation metrics — vectorized jnp re-designs of the reference's
per-sample python loops.

Reference semantics (``src/models/metrics.py``):
- ``DC_Metrics`` (``:38-132``): per sample, decode pred + target label maps to
  keypoints; per unique target id compute the max L2 distance between all
  pred/target keypoints of that id; ``val_l2_pixels`` = mean of those distances
  over *found* ids; ``val_match_ratio`` = fraction of target ids whose distance
  is under ``px_margin=3``.
- ``Refinenet_Metrics`` (``:135-161``): L2 between pred/target heatmap argmax
  indices on the 64×64 grid, mean over the batch.

With the fixed-capacity decode (one slot per id) the per-id "max" collapses to
a single distance, and everything vectorizes over (batch, n_ids) — no host
loops, runs inside the eval jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from deepcharuco_tpu.ops.decode import heatmap_argmax2d, label_to_keypoints, pred_argmax


def detector_metrics(loc_hat, ids_hat, loc_target, ids_target, dust_bin_ids: int,
                     px_margin: float = 3.0):
    """→ dict(l2_pixels, match_ratio), scalars averaged over the batch.

    loc_hat/ids_hat: NHWC logits; loc_target/ids_target: (N, Hc, Wc) int maps.
    """
    loc_a, ids_a = pred_argmax(loc_hat, ids_hat, dust_bin_ids)
    conf = jnp.max(ids_hat, axis=-1)
    kp_pred, v_pred = label_to_keypoints(loc_a, ids_a, dust_bin_ids, scores=conf)
    kp_tgt, v_tgt = label_to_keypoints(loc_target, ids_target, dust_bin_ids)

    both = v_pred & v_tgt                       # (N, n_ids)
    d = jnp.linalg.norm(kp_pred - kp_tgt, axis=-1)  # (N, n_ids)
    d = jnp.where(both, d, 0.0)

    n_found = jnp.sum(both, axis=-1)            # per-sample found ids
    n_tgt = jnp.sum(v_tgt, axis=-1)             # per-sample target ids

    # mean distance over found ids, per sample; samples with no target ids
    # are excluded from the batch mean (reference's `atleast` gate, :60-75)
    has = n_tgt > 0
    l2_per_sample = jnp.sum(d, axis=-1) / jnp.maximum(n_found, 1)
    ratio_per_sample = (
        jnp.sum(both & (d < px_margin), axis=-1) / jnp.maximum(n_tgt, 1)
    )
    denom = jnp.maximum(jnp.sum(has), 1)
    return {
        "l2_pixels": jnp.sum(jnp.where(has, l2_per_sample, 0.0)) / denom,
        "match_ratio": jnp.sum(jnp.where(has, ratio_per_sample, 0.0)) / denom,
        # mean predictions/targets per frame — separates "collapsed to
        # dustbin" (n_pred≈0) from "detecting but inaccurate"
        "n_pred": jnp.mean(jnp.sum(v_pred, axis=-1).astype(jnp.float32)),
        "n_target": jnp.mean(jnp.sum(v_tgt, axis=-1).astype(jnp.float32)),
    }


def refinenet_metric(heat_hat, heat_target):
    """Mean L2 between heatmap argmax positions (64×64 grid → pixels at 8×
    the original resolution; divide by 8 for original-res pixels)."""
    if heat_hat.ndim == 4:
        heat_hat = heat_hat[..., 0]
    if heat_target.ndim == 4:
        heat_target = heat_target[..., 0]
    p = heatmap_argmax2d(heat_hat)
    t = heatmap_argmax2d(heat_target)
    return jnp.mean(jnp.linalg.norm(p - t, axis=-1))


class MeanAccumulator:
    """Tiny host-side streaming mean for logging scalars across steps."""

    def __init__(self):
        self._sum = {}
        self._n = {}

    def update(self, **scalars):
        for k, v in scalars.items():
            self._sum[k] = self._sum.get(k, 0.0) + float(v)
            self._n[k] = self._n.get(k, 0) + 1

    def compute(self):
        return {k: self._sum[k] / self._n[k] for k in self._sum}

    def reset(self):
        self._sum.clear()
        self._n.clear()
