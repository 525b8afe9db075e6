"""Pallas TPU kernel: fused detector-head + corner decode.

The serving-path tail of the detector — convPa/convPb and convDa/convDb
(reference ``src/models/net.py:73-78``) followed by the full corner decode
(``src/models/model_utils.py:53-123``) — computed in ONE VMEM-resident kernel
from the shared trunk features. The structural win over the XLA path: the
(N, Hc, Wc, 65) + (N, Hc, Wc, n_ids+1) head logits and the (N, n_ids, cells)
claim tensor never round-trip HBM; per image only (n_ids, 2) keypoints and
(n_ids,) validity leave the chip.

Design notes (see also ops/pallas_decode.py for round-1 lowering pitfalls):
- The 3×3 head convs run as im2col + ONE (cells × 1152) @ (1152 × 512) MXU
  matmul covering BOTH heads over the zero-padded trunk block, BN folded
  into weights/bias on the host (inference affine — exact in f32).
- The decode is *lane-vectorized over ids*: the per-id best-cell selection
  runs on (cells, n_ids) arrays with sublane reductions, replacing round 1's
  static per-id unroll of (cells, 1) reductions that used 1 of 128 lanes.
- Winner-among-duplicates parity with ``ops.decode.label_to_keypoints``:
  highest ids-logit confidence wins; equal-confidence ties break to the
  lowest row-major cell (jnp.argmax first-max semantics).
- Outputs are written ids-on-lanes as (1, 2, n_ids)/(1, 1, n_ids) and
  transposed outside the kernel (XLA fuses it), avoiding an in-kernel
  relayout of tiny arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.4e38  # python literal: jnp constants would be captured tracers


# ---------------------------------------------------------------------------
# Host-side parameter folding
# ---------------------------------------------------------------------------

def fold_head_params(variables, n_ids: int = 16):
    """Fold BatchNorm (inference affine) into the head conv weights.

    Returns a dict of arrays shaped for the kernel:
      wpa/wda: (9*128, 256) bf16 — 3×3 taps stacked row-major (ky*3+kx),
      bpa/bda: (1, 256) f32, wpb: (256, 65) bf16, bpb: (1, 65) f32,
      wdb: (256, n_ids+1) bf16, bdb: (1, n_ids+1) f32.
    """
    p = variables["params"]
    s = variables["batch_stats"]

    def fold(name):
        k = np.asarray(p[name]["conv"]["kernel"], np.float32)   # (3,3,Cin,Cout)
        b = np.asarray(p[name]["conv"]["bias"], np.float32)
        gamma = np.asarray(p[name]["bn"]["scale"], np.float32)
        beta = np.asarray(p[name]["bn"]["bias"], np.float32)
        mean = np.asarray(s[name]["bn"]["mean"], np.float32)
        var = np.asarray(s[name]["bn"]["var"], np.float32)
        scale = gamma / np.sqrt(var + 1e-5)
        kf = k * scale  # broadcast over (3,3,Cin,·)
        bf = (b - mean) * scale + beta
        cin, cout = k.shape[2], k.shape[3]
        w = kf.reshape(9 * cin, cout)  # rows: tap (ky*3+kx) block of Cin
        return w.astype(jnp.bfloat16), bf[None, :].astype(np.float32)

    wpa, bpa = fold("convPa")
    wda, bda = fold("convDa")
    wpb = np.asarray(p["convPb"]["kernel"], np.float32)[0, 0]   # (256, 65)
    bpb = np.asarray(p["convPb"]["bias"], np.float32)[None, :]
    wdb = np.asarray(p["convDb"]["kernel"], np.float32)[0, 0]   # (256, n_ids+1)
    bdb = np.asarray(p["convDb"]["bias"], np.float32)[None, :]
    # Both heads' 3×3 convs as ONE (9*Cin, 512) matrix: the kernel builds the
    # im2col patch matrix once and hits the MXU with a single K=1152 matmul
    # instead of 18 K=128 passes.
    wh = np.concatenate([np.asarray(wpa, np.float32),
                         np.asarray(wda, np.float32)], axis=1)
    return dict(
        wpa=jnp.asarray(wpa), bpa=jnp.asarray(bpa),
        wda=jnp.asarray(wda), bda=jnp.asarray(bda),
        wh=jnp.asarray(wh.astype(jnp.bfloat16)),
        wpb=jnp.asarray(wpb.astype(jnp.bfloat16)), bpb=jnp.asarray(bpb),
        wdb=jnp.asarray(wdb.astype(jnp.bfloat16)), bdb=jnp.asarray(bdb),
    )


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _head_decode_kernel(x_ref, wh_ref, bpa_ref, wpb_ref, bpb_ref,
                        bda_ref, wdb_ref, bdb_ref,
                        kpts_ref, valid_ref, *, hc: int, wc: int,
                        n_ids: int, cin: int, min_margin):
    m = hc * wc
    x = x_ref[0]  # (hc+2, wc+2, cin) bf16, zero-padded trunk

    # --- heads: im2col once, then ONE (m, 9*cin) @ (9*cin, 512) MXU matmul
    # covering BOTH heads' 3×3 convs (K=1152 saturates the systolic array
    # where 18 separate K=128 passes did not), f32 accumulation.
    cols = [x[ky:ky + hc, kx:kx + wc, :].reshape(m, cin)
            for ky in range(3) for kx in range(3)]
    patch = jnp.concatenate(cols, axis=-1)                   # (m, 9*cin)
    pd = jnp.dot(patch, wh_ref[:], preferred_element_type=jnp.float32)
    # BN folded into (w, b); relu; bf16 for the 1×1 matmul like the model
    p_act = jnp.maximum(pd[:, :256] + bpa_ref[:], 0.0).astype(jnp.bfloat16)
    d_act = jnp.maximum(pd[:, 256:] + bda_ref[:], 0.0).astype(jnp.bfloat16)
    loc = jnp.dot(p_act, wpb_ref[:],
                  preferred_element_type=jnp.float32) + bpb_ref[:]   # (m, 65)
    idsl = jnp.dot(d_act, wdb_ref[:],
                   preferred_element_type=jnp.float32) + bdb_ref[:]  # (m, n_ids+1)

    # --- decode, lane-vectorized over ids ---------------------------------
    loc_pix = jnp.argmax(loc, axis=-1, keepdims=True).astype(jnp.int32)  # (m,1)
    ids_arg = jnp.argmax(idsl, axis=-1, keepdims=True).astype(jnp.int32)
    conf = jnp.max(idsl, axis=-1, keepdims=True)                          # (m,1)
    ids_arg = jnp.where(loc_pix == 64, n_ids, ids_arg)  # dustbin suppression
    claim = ids_arg != n_ids
    if min_margin is not None:
        margin = conf - idsl[:, n_ids:n_ids + 1]
        claim = claim & (margin >= min_margin)

    cell = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    x_all = (8 * (cell % wc) + loc_pix % 8).astype(jnp.float32)
    y_all = (8 * (cell // wc) + loc_pix // 8).astype(jnp.float32)

    k_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_ids), 1)
    mine = claim & (ids_arg == k_iota)                    # (m, n_ids)
    score = jnp.where(mine, conf, _NEG)
    smax = jnp.max(score, axis=0, keepdims=True)          # (1, n_ids)
    has = smax > _NEG / 2
    is_best = mine & (score >= smax)
    best_cell = jnp.min(jnp.where(is_best, cell, m), axis=0, keepdims=True)
    pick = (is_best & (cell == best_cell)).astype(jnp.float32)
    xk = jnp.sum(x_all * pick, axis=0, keepdims=True)     # (1, n_ids)
    yk = jnp.sum(y_all * pick, axis=0, keepdims=True)

    kpts_ref[0] = jnp.concatenate([xk, yk], axis=0)       # (2, n_ids)
    valid_ref[0] = has.astype(jnp.int32)                  # (1, n_ids)


@partial(jax.jit, static_argnames=("n_ids", "min_margin", "interpret"))
def pallas_fused_head_decode(trunk: jnp.ndarray, folded: dict,
                             n_ids: int = 16, min_margin=None,
                             interpret: bool = False):
    """Trunk features → keypoints, with heads+decode fused on-chip.

    trunk: (N, Hc, Wc, 128) from ``Detector(..., trunk_only=True)``;
    folded: :func:`fold_head_params` output.
    Returns (keypoints (N, n_ids, 2) f32, valid (N, n_ids) bool) — the same
    contract as ``ops.decode.pred_to_keypoints``.
    """
    n, hc, wc, cin = trunk.shape
    xpad = jnp.pad(trunk.astype(jnp.bfloat16),
                   ((0, 0), (1, 1), (1, 1), (0, 0)))

    kernel = partial(_head_decode_kernel, hc=hc, wc=wc, n_ids=n_ids,
                     cin=cin, min_margin=min_margin)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    kpts, valid = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hc + 2, wc + 2, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full((9 * cin, 512)), full((1, 256)),
            full((256, 65)), full((1, 65)),
            full((1, 256)),
            full((256, n_ids + 1)), full((1, n_ids + 1)),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, n_ids), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_ids), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 2, n_ids), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, n_ids), jnp.int32),
        ],
        interpret=interpret,
    )(xpad, folded["wh"], folded["bpa"], folded["wpb"], folded["bpb"],
      folded["bda"], folded["wdb"], folded["bdb"])
    return kpts.transpose(0, 2, 1), valid[:, 0].astype(bool)
