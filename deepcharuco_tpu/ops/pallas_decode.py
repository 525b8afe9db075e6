"""Pallas TPU kernel: fused corner decode.

Fuses the whole decode stage of the serving path — channel argmax of both
heads, dustbin suppression, per-id best-cell selection, and keypoint
reconstruction (the jnp ops in :mod:`deepcharuco_tpu.ops.decode`, reference
semantics ``src/models/model_utils.py:53-123``) — into a single VMEM-resident
kernel, one grid step per image. Avoids materializing the (N, n_ids, cells)
claim tensor in HBM and the separate XLA reductions of the lax path.

Everything is lane-parallel VPU math: argmax/max reductions over the cell
axis and a one-hot masked sum instead of any dynamic indexing (TPU vector
units have no cross-lane gather). CPU tests run the same kernel under
``interpret=True``.

Measured on v5e (batch 256, 30×40 grid): exact output parity with the jnp
path, but 5.7× slower (5.1 ms vs 0.9 ms) — the per-id static unroll here
reduces (cells, 1) columns, using 1 of 128 VPU lanes, and the sequential
per-image grid under-utilizes the VPU where XLA batches the reductions
across images. The jnp path remains the pipeline default. The successor
kernel — :mod:`deepcharuco_tpu.ops.pallas_fused` — fixes the lane waste
(decode vectorized over ids in the lane dim) AND fuses the detector heads
in, so the logits never round-trip HBM; see its docstring and
``cli/benchmark.py --fused-head`` for the A/B measurement.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.4e38  # python literal: jnp constants would be captured tracers


def _decode_kernel(loc_ref, ids_ref, kpts_ref, valid_ref, *, n_ids: int, wc: int):
    """One image: loc (1, M, 65), ids (1, M, n_ids+1) →
    kpts (1, n_ids, 2), valid (1, n_ids). M = Hc·Wc flattened cells."""
    loc = loc_ref[0]            # (M, 65)
    idsl = ids_ref[0]           # (M, n_ids+1)
    m = loc.shape[0]

    loc_pix = jnp.argmax(loc, axis=-1, keepdims=True).astype(jnp.int32)  # (M,1)
    ids_arg = jnp.argmax(idsl, axis=-1, keepdims=True).astype(jnp.int32)
    conf = jnp.max(idsl, axis=-1, keepdims=True)                          # (M,1)
    # dustbin suppression (ref model_utils.py:72-77)
    ids_arg = jnp.where(loc_pix == 64, n_ids, ids_arg)
    claim = ids_arg != n_ids

    cell = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    x_all = (8 * (cell % wc) + loc_pix % 8).astype(jnp.float32)
    y_all = (8 * (cell // wc) + loc_pix // 8).astype(jnp.float32)

    xs, ys, has_all = [], [], []
    for k in range(n_ids):  # static unroll: n_ids lane-parallel reductions
        mine = claim & (ids_arg == k)
        score = jnp.where(mine, conf, _NEG)
        smax = jnp.max(score)
        has = smax > _NEG / 2
        is_best = mine & (score >= smax)
        # first winner only (deterministic under confidence ties); cumsum has
        # no TPU Pallas lowering, so pick the minimum cell index instead
        best_cell = jnp.min(jnp.where(is_best, cell, m))
        pick = (is_best & (cell == best_cell)).astype(jnp.float32)
        xs.append(jnp.sum(x_all * pick))
        ys.append(jnp.sum(y_all * pick))
        has_all.append(has.astype(jnp.int32))
    # vector stores only (scalar VMEM stores are not lowerable on TPU)
    kpts_ref[0] = jnp.stack([jnp.stack(xs), jnp.stack(ys)], axis=-1)
    valid_ref[0] = jnp.stack(has_all)[:, None]


@partial(jax.jit, static_argnames=("n_ids", "interpret"))
def pallas_pred_to_keypoints(loc_hat: jnp.ndarray, ids_hat: jnp.ndarray,
                             n_ids: int = 16, interpret: bool = False):
    """Drop-in fused replacement for ``ops.decode.pred_to_keypoints``.

    loc_hat (N, Hc, Wc, 65), ids_hat (N, Hc, Wc, n_ids+1) →
    (keypoints (N, n_ids, 2) f32, valid (N, n_ids) bool).
    """
    n, hc, wc, cl = loc_hat.shape
    m = hc * wc
    loc_flat = loc_hat.reshape(n, m, cl).astype(jnp.float32)
    ids_flat = ids_hat.reshape(n, m, ids_hat.shape[-1]).astype(jnp.float32)

    kernel = partial(_decode_kernel, n_ids=n_ids, wc=wc)
    kpts, valid = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, m, cl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, ids_flat.shape[-1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n_ids, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # 3-D so the last-two block dims equal the array dims (the TPU
            # lowering requires (8,128)-divisible or full-dim trailing blocks)
            pl.BlockSpec((1, n_ids, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, n_ids, 2), jnp.float32),
            jax.ShapeDtypeStruct((n, n_ids, 1), jnp.int32),
        ],
        interpret=interpret,
    )(loc_flat, ids_flat)
    return kpts, valid[..., 0].astype(bool)
