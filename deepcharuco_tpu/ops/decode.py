"""Static-shape corner decode — the core torch→XLA semantic translation.

The reference decodes detections with data-dependent shapes
(``src/models/model_utils.py:53-123``): channel-argmax both heads, mask cells
whose ids-argmax is not the dustbin, and emit a *variable-length* list of
keypoints. Variable shapes don't jit, so here decode emits **fixed-capacity,
id-indexed** arrays: one slot per corner id, plus a validity mask. Everything
downstream (patch gather, RefineNet, PnP) runs masked at full capacity.

Default-mode behavioral delta vs the reference (documented, tested): when
several cells claim the same corner id, the reference keeps *all* of them
(``model_utils.py:111-123``), while :func:`label_to_keypoints` keeps the
single cell with the highest ids-head confidence. For a physical board each
id exists once, so on real detections the two decodes agree; duplicate-id
cells are model noise that the reference's downstream consumers (PnP by id,
metrics by id) effectively collapse anyway. When unconditional parity is
required, :func:`label_to_keypoints_topk` / :func:`pred_to_keypoints_topk`
preserve duplicates exactly (capacity-K slots per id) — zero deltas.

Coordinate convention (identical to reference ``model_utils.py:118-122``):
``x = 8·col + pix % 8``, ``y = 8·row + pix // 8`` with ``pix`` the loc-head
argmax in the 8×8 cell, dustbin channels 64 (loc) / n_ids (ids).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pred_argmax(loc_hat: jnp.ndarray, ids_hat: jnp.ndarray, dust_bin_ids: int):
    """Channel argmax of both heads with dustbin suppression.

    Parity with reference ``pred_argmax`` (``model_utils.py:53-78``), NHWC:
    ``loc_hat`` (N, Hc, Wc, 65), ``ids_hat`` (N, Hc, Wc, n_ids+1).
    Returns (loc_argmax, ids_argmax), both (N, Hc, Wc) int32.
    """
    loc_argmax = jnp.argmax(loc_hat, axis=-1).astype(jnp.int32)
    ids_argmax = jnp.argmax(ids_hat, axis=-1).astype(jnp.int32)
    ids_argmax = jnp.where(loc_argmax == 64, dust_bin_ids, ids_argmax)
    return loc_argmax, ids_argmax


def label_to_keypoints(loc: jnp.ndarray, ids: jnp.ndarray, dust_bin_ids: int,
                       scores: jnp.ndarray | None = None):
    """Decode (loc, ids) class-index maps to fixed-capacity keypoints.

    Parameters
    ----------
    loc, ids : (N, Hc, Wc) int — class-index maps (model argmax or labels).
    dust_bin_ids : number of corner ids (the dustbin class index).
    scores : optional (N, Hc, Wc) float — per-cell confidence used to break
        duplicate-id ties (highest wins). Defaults to uniform, in which case
        the *last* cell in row-major order wins.

    Returns
    -------
    keypoints : (N, n_ids, 2) float32 — (x, y) in original resolution,
        slot k holds corner id k.
    valid : (N, n_ids) bool — slot occupancy.
    """
    n, hc, wc = loc.shape
    m = hc * wc
    n_ids = dust_bin_ids
    loc_f = loc.reshape(n, m)
    ids_f = ids.reshape(n, m)
    mask = ids_f != dust_bin_ids

    if scores is None:
        # row-major index as score → deterministic winner among duplicates
        score_f = jnp.broadcast_to(
            jnp.arange(m, dtype=jnp.float32)[None, :], (n, m)
        )
    else:
        score_f = scores.reshape(n, m).astype(jnp.float32)

    id_range = jnp.arange(n_ids, dtype=ids_f.dtype)
    # (N, n_ids, M): score where the cell claims this id, else -inf
    claims = (ids_f[:, None, :] == id_range[None, :, None]) & mask[:, None, :]
    neg_inf = jnp.float32(-jnp.inf)
    sel_scores = jnp.where(claims, score_f[:, None, :], neg_inf)
    best_cell = jnp.argmax(sel_scores, axis=-1).astype(jnp.int32)  # (N, n_ids)
    valid = jnp.any(claims, axis=-1)  # (N, n_ids)

    row = best_cell // wc
    col = best_cell % wc
    pix = jnp.take_along_axis(loc_f, best_cell, axis=-1)
    x = 8 * col + pix % 8
    y = 8 * row + pix // 8
    keypoints = jnp.stack([x, y], axis=-1).astype(jnp.float32)
    return keypoints, valid


def label_to_keypoints_topk(loc: jnp.ndarray, ids: jnp.ndarray,
                            dust_bin_ids: int, capacity: int = 4,
                            scores: jnp.ndarray | None = None):
    """Duplicate-preserving decode: up to ``capacity`` cells PER corner id.

    The reference keeps *every* non-dustbin cell, so several cells claiming
    the same id all survive (``src/models/model_utils.py:111-123``). The
    default :func:`label_to_keypoints` collapses those to one winner per id —
    the one documented behavioral delta. This variant closes it: with
    ``capacity`` ≥ the true duplicate multiplicity (a 320×240 frame has 1200
    cells; physical boards produce ≤2–3 duplicates from model noise), the
    decoded *set* of (x, y, id) equals the reference's exactly
    (``tests/test_decode.py`` round-trips random maps incl. duplicates).

    Returns
    -------
    keypoints : (N, n_ids, capacity, 2) float32 — slot [*, k, j] is the
        j-th highest-score cell claiming id k (score order; ties broken by
        ascending cell index, matching ``jax.lax.top_k``).
    valid : (N, n_ids, capacity) bool.
    """
    n, hc, wc = loc.shape
    m = hc * wc
    n_ids = dust_bin_ids
    loc_f = loc.reshape(n, m)
    ids_f = ids.reshape(n, m)
    mask = ids_f != dust_bin_ids

    if scores is None:
        score_f = jnp.broadcast_to(
            jnp.arange(m, dtype=jnp.float32)[None, :], (n, m))
    else:
        score_f = scores.reshape(n, m).astype(jnp.float32)

    id_range = jnp.arange(n_ids, dtype=ids_f.dtype)
    claims = (ids_f[:, None, :] == id_range[None, :, None]) & mask[:, None, :]
    neg_inf = jnp.float32(-jnp.inf)
    sel = jnp.where(claims, score_f[:, None, :], neg_inf)  # (N, n_ids, M)
    top_scores, top_cells = jax.lax.top_k(sel, capacity)   # (N, n_ids, C)
    valid = jnp.isfinite(top_scores)

    row = top_cells // wc
    col = top_cells % wc
    pix = jnp.take_along_axis(loc_f[:, None, :], top_cells, axis=-1)
    x = 8 * col + pix % 8
    y = 8 * row + pix // 8
    keypoints = jnp.stack([x, y], axis=-1).astype(jnp.float32)
    return keypoints, valid


def pred_to_keypoints_topk(loc_hat: jnp.ndarray, ids_hat: jnp.ndarray,
                           dust_bin_ids: int, capacity: int = 4,
                           min_margin: float | None = None):
    """Model heads → duplicate-preserving keypoints (see
    :func:`label_to_keypoints_topk`). With sufficient ``capacity`` this is an
    exact static-shape image of the reference's variable-length
    ``pred_to_keypoints`` (``model_utils.py:81-88``), duplicates included."""
    loc_argmax, ids_argmax = pred_argmax(loc_hat, ids_hat, dust_bin_ids)
    conf = jnp.max(ids_hat, axis=-1)
    if min_margin is not None:
        margin = conf - ids_hat[..., dust_bin_ids]
        ids_argmax = jnp.where(margin >= min_margin, ids_argmax, dust_bin_ids)
    return label_to_keypoints_topk(loc_argmax, ids_argmax, dust_bin_ids,
                                   capacity=capacity, scores=conf)


def pred_to_keypoints(loc_hat: jnp.ndarray, ids_hat: jnp.ndarray, dust_bin_ids: int,
                      min_margin: float | None = None):
    """Model heads → fixed-capacity keypoints (ref ``pred_to_keypoints``,
    ``model_utils.py:81-88``). Ties between duplicate-id cells break by
    ids-head confidence (the winning channel's logit).

    ``min_margin`` (optional, OFF by default for reference parity): require
    the winning id logit to beat the dustbin logit by at least this much —
    suppresses the rare wrong-cell outliers a softmax-argmax decode admits.
    """
    loc_argmax, ids_argmax = pred_argmax(loc_hat, ids_hat, dust_bin_ids)
    conf = jnp.max(ids_hat, axis=-1)  # (N, Hc, Wc)
    if min_margin is not None:
        margin = conf - ids_hat[..., dust_bin_ids]
        ids_argmax = jnp.where(margin >= min_margin, ids_argmax, dust_bin_ids)
    return label_to_keypoints(loc_argmax, ids_argmax, dust_bin_ids, scores=conf)


def heatmap_argmax2d(heat: jnp.ndarray) -> jnp.ndarray:
    """Flat argmax of (..., H, W) heatmaps → (..., 2) float32 (x, y).

    Parity with reference ``speedy_bargmax2d`` (``model_utils.py:39-43``).
    """
    h, w = heat.shape[-2], heat.shape[-1]
    flat = heat.reshape(*heat.shape[:-2], h * w)
    idx = jnp.argmax(flat, axis=-1)
    return jnp.stack([idx % w, idx // w], axis=-1).astype(jnp.float32)


def refine_keypoints(heat: jnp.ndarray, keypoints: jnp.ndarray) -> jnp.ndarray:
    """RefineNet heatmap decode: 64×64 argmax mapped back to original resolution.

    ``refined = keypoint + (argmax − 32)/8`` — reference
    ``RefineNet.infer_patches`` (``src/models/refinenet.py:111-114``); the
    heatmap covers the central 8×8 px of the patch at 8× resolution.

    heat: (..., 64, 64) or (..., 64, 64, 1); keypoints: (..., 2).
    """
    if heat.shape[-1] == 1 and heat.ndim >= 3 and heat.shape[-2] == 64:
        heat = heat[..., 0]
    corners = heatmap_argmax2d(heat)
    return (corners - 32.0) / 8.0 + keypoints


def soft_argmax_2d(heat: jnp.ndarray, temperature: float = 30.0) -> jnp.ndarray:
    """Softmax-expectation position of (..., H, W[, 1]) heatmaps → (..., 2)
    float32 (x, y) in heatmap-grid units. Differentiable — also used as a
    training loss term (train.steps refinenet coord loss)."""
    if heat.shape[-1] == 1 and heat.ndim >= 3:
        heat = heat[..., 0]
    h, w = heat.shape[-2], heat.shape[-1]
    flat = heat.reshape(*heat.shape[:-2], h * w) * temperature
    p = jax.nn.softmax(flat, axis=-1)
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    grid_x = jnp.tile(xs, h)
    grid_y = jnp.repeat(ys, w)
    ex = jnp.sum(p * grid_x, axis=-1)
    ey = jnp.sum(p * grid_y, axis=-1)
    return jnp.stack([ex, ey], axis=-1)


def refine_keypoints_soft(heat: jnp.ndarray, keypoints: jnp.ndarray,
                          temperature: float = 30.0) -> jnp.ndarray:
    """Soft-argmax heatmap decode — continuous sub-pixel positions.

    The reference's hard argmax (``refinenet.py:111-114``) quantizes to the
    1/8-px heatmap grid and is single-pixel-noise sensitive. The softmax
    expectation over the grid interpolates *between* heatmap pixels: with the
    σ=2 Gaussian targets the nets are trained on, a sharp softmax
    (temperature ≳ 20 on [0,1]-valued maps) concentrates on the true peak and
    recovers the sub-grid mode position. Pure vector math — free on the VPU.
    """
    corners = soft_argmax_2d(heat, temperature)
    return (corners - 32.0) / 8.0 + keypoints


def refine_keypoints_offset(offsets: jnp.ndarray,
                            keypoints: jnp.ndarray) -> jnp.ndarray:
    """Offset-head decode: the regression branch already predicts the corner's
    continuous (dx, dy) image-px displacement from the patch center — the
    quantity the heatmap decodes reconstruct as ``(argmax − 32)/8``
    (``refine_keypoints``) — so refinement is a plain add, grid-free.

    offsets: (..., 2) from ``RefineNet(offset_head=True)``; keypoints: (..., 2).
    """
    return keypoints + offsets
