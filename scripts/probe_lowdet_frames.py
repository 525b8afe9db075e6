"""One-off: on the n_det<6 bad host frames (133, 138, 415), dump the full
candidate set (capacity-K + loc-override slots) and the RANSAC winner's
consensus, to decide whether a lower reselect floor can be meaningful
(consensus >= 5 needs a true candidate for the decoy id to exist)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from deepcharuco_tpu.board import inner_corner_object_points
from deepcharuco_tpu.configs import default_config
from deepcharuco_tpu.data import CharucoDataset
from deepcharuco_tpu.models import Detector
from deepcharuco_tpu.ops import label_to_keypoints
from deepcharuco_tpu.ops.decode import (label_to_keypoints_topk,
                                        pred_to_keypoints_topk)
from deepcharuco_tpu.ops.geom import _apply_homography, _ransac_seed
from deepcharuco_tpu.pipeline import load_model_variables

cfg = default_config()
det = Detector(n_ids=cfg.n_ids, dtype=jnp.float32)
dv = load_model_variables("artifacts/detector_devsynth.npz", "detector",
                          cfg.n_ids)
board_xy = jnp.asarray(inner_corner_object_points(
    cfg.row_count, cfg.col_count, cfg.square_len)[:, :2])
heads = jax.jit(lambda images: det.apply(dv, images))

ds = CharucoDataset(cfg, validation=True)
frames = [133, 138, 415]
items = []
for i in range(max(frames) + 1):
    it = ds[i]
    if i in frames:
        items.append(it)

images = jnp.asarray(np.stack([it["image"] for it in items]))
loc_l = jnp.asarray(np.stack([it["loc"] for it in items]))
ids_l = jnp.asarray(np.stack([it["ids"] for it in items]))
kp_t, v_t = label_to_keypoints(loc_l, ids_l, cfg.n_ids)
kp_t, v_t = np.asarray(kp_t), np.asarray(v_t)

out = heads(images)
# replicate pred_to_keypoints_geom's candidate assembly
kp_k, val_k = pred_to_keypoints_topk(out["loc"], out["ids"], cfg.n_ids,
                                     capacity=3)
loc_argmax = jnp.argmax(out["loc"], axis=-1).astype(jnp.int32)
pos64 = jnp.argmax(out["loc"][..., :64], axis=-1).astype(jnp.int32)
ids_raw = jnp.argmax(out["ids"], axis=-1).astype(jnp.int32)
conf = jnp.max(out["ids"], axis=-1)
ids_ov = jnp.where(loc_argmax == 64, ids_raw, cfg.n_ids)
kp_o, val_o = label_to_keypoints_topk(pos64, ids_ov, cfg.n_ids,
                                      capacity=2, scores=conf)
kp_k = np.asarray(jnp.concatenate([kp_k, kp_o], axis=2))
val_k = np.asarray(jnp.concatenate([val_k, val_o], axis=2))

for i, f in enumerate(frames):
    v0 = val_k[i, :, 0]
    print(f"frame {f}: n_det(top1)={int(v0.sum())}")
    H, n_inl = _ransac_seed(jnp.asarray(kp_k[i]), jnp.asarray(val_k[i]),
                            board_xy, 64, 4.0)
    proj = np.asarray(_apply_homography(H, board_xy))
    print(f"  ransac consensus={int(n_inl)}")
    for c in range(cfg.n_ids):
        if not val_k[i, c].any() and not v_t[i, c]:
            continue
        cands = [
            f"s{s}@{np.round(kp_k[i, c, s], 0).astype(int).tolist()}"
            for s in range(kp_k.shape[2]) if val_k[i, c, s]
        ]
        derr = (np.linalg.norm(kp_k[i, c] - kp_t[i, c], axis=-1)
                if v_t[i, c] else None)
        dH = np.linalg.norm(kp_k[i, c] - proj[c], axis=-1)
        best_true = (float(np.min(np.where(val_k[i, c], derr, np.inf)))
                     if derr is not None else float("nan"))
        best_H = float(np.min(np.where(val_k[i, c], dH, np.inf)))
        print(f"  id {c:2d} true={v_t[i, c]} cands={cands} "
              f"best|err_true={best_true:.1f} best|d_H={best_H:.1f}")
