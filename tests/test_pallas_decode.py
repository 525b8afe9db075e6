"""Pallas fused decode vs the jnp reference path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from deepcharuco_tpu.ops import pred_to_keypoints
from deepcharuco_tpu.ops.pallas_decode import pallas_pred_to_keypoints

N_IDS = 16


def test_pallas_decode_matches_jnp_random(rng):
    for _ in range(5):
        loc = rng.normal(size=(2, 30, 40, 65)).astype(np.float32)
        ids = rng.normal(size=(2, 30, 40, N_IDS + 1)).astype(np.float32)
        kp_ref, v_ref = pred_to_keypoints(jnp.asarray(loc), jnp.asarray(ids), N_IDS)
        kp_pl, v_pl = pallas_pred_to_keypoints(jnp.asarray(loc), jnp.asarray(ids),
                                               N_IDS, interpret=True)
        np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_pl))
        # compare only valid slots (invalid slots hold arbitrary values)
        vr = np.asarray(v_ref)
        np.testing.assert_array_equal(np.asarray(kp_ref)[vr], np.asarray(kp_pl)[vr])


def test_pallas_decode_dustbin_only(rng):
    loc = np.zeros((1, 6, 8, 65), np.float32)
    loc[..., 64] = 5.0  # loc dustbin everywhere
    ids = rng.normal(size=(1, 6, 8, N_IDS + 1)).astype(np.float32)
    kp, v = pallas_pred_to_keypoints(jnp.asarray(loc), jnp.asarray(ids), N_IDS,
                                     interpret=True)
    assert not np.asarray(v).any()
