"""One-off: on the known bad-fit host frames (133/138/201/349), compare
parity vs geom(ungated) vs geom(gated) decodes to test the hypothesis that
the reselection's outliers there are parity-identical (gate fallback = noop).
"""

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
from deepcharuco_tpu.ops import (label_to_keypoints, pred_to_keypoints,
                                 pred_to_keypoints_geom)
from deepcharuco_tpu.pipeline import load_model_variables

cfg = default_config()
det = Detector(n_ids=cfg.n_ids, dtype=jnp.float32)
dv = load_model_variables("artifacts/detector_devsynth.npz", "detector",
                          cfg.n_ids)
board_xy = jnp.asarray(inner_corner_object_points(
    cfg.row_count, cfg.col_count, cfg.square_len)[:, :2])
heads = jax.jit(lambda images: det.apply(dv, images))

ds = CharucoDataset(cfg, validation=True)
frames = [60, 133, 138, 201, 349, 415]
# the validation stream shares ONE seeded rng — frame identity depends on
# sequential call order, so enumerate from 0 like the eval scripts do
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
kp_p, v_p = [np.asarray(a) for a in
             pred_to_keypoints(out["loc"], out["ids"], cfg.n_ids)]
kp_u, v_u = [np.asarray(a) for a in
             pred_to_keypoints_geom(out["loc"], out["ids"], cfg.n_ids,
                                    board_xy, max_rms_px=float("inf"))]
kp_g, v_g = [np.asarray(a) for a in
             pred_to_keypoints_geom(out["loc"], out["ids"], cfg.n_ids,
                                    board_xy, max_rms_px=1.5)]

for i, f in enumerate(frames):
    same_ug = (np.array_equal(v_p[i], v_u[i])
               and np.allclose(np.where(v_u[i][:, None], kp_u[i], 0),
                               np.where(v_p[i][:, None], kp_p[i], 0)))
    same_gp = (np.array_equal(v_p[i], v_g[i])
               and np.allclose(np.where(v_g[i][:, None], kp_g[i], 0),
                               np.where(v_p[i][:, None], kp_p[i], 0)))
    gate_fired = not (np.array_equal(v_u[i], v_g[i])
                      and np.allclose(kp_u[i], kp_g[i]))
    d_p = np.linalg.norm(kp_p[i] - kp_t[i], axis=-1)
    d_u = np.linalg.norm(kp_u[i] - kp_t[i], axis=-1)
    d_g = np.linalg.norm(kp_g[i] - kp_t[i], axis=-1)

    def _bad(d, v):
        m = v & v_t[i] & (d >= 3.0)
        return [(int(c), round(float(d[c]), 1)) for c in np.argwhere(m).ravel()]

    print(f"frame {f}: gate_fired={gate_fired} ungated==parity={same_ug} "
          f"gated==parity={same_gp}")
    print(f"   parity bad: {_bad(d_p, v_p[i])}")
    print(f"   ungated bad:{_bad(d_u, v_u[i])}")
    print(f"   gated bad:  {_bad(d_g, v_g[i])}")
