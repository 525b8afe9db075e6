"""Fused detector-head+decode Pallas kernel (interpret mode on CPU).

Two layers of evidence:
1. exact parity of the kernel against a jnp restatement of the SAME folded
   math (validates the Pallas lowering semantics — shifted-matmul conv,
   lane-vectorized decode, tie-breaking);
2. agreement with the production path (Flax heads in bf16 + jnp decode) on
   trained weights — BN folding reorders float ops, so this is checked as a
   mismatch *rate* over realistic frames, not bit equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcharuco_tpu.configs import default_config
from deepcharuco_tpu.models import Detector
from deepcharuco_tpu.ops.decode import pred_to_keypoints
from deepcharuco_tpu.ops.pallas_fused import (
    fold_head_params,
    pallas_fused_head_decode,
)

CFG = default_config()


def _variables(seed=0):
    det = Detector(n_ids=CFG.n_ids)
    v = det.init(jax.random.PRNGKey(seed), jnp.zeros((1, 240, 320, 1)))
    return det, v


def _jnp_folded_reference(trunk, folded, n_ids):
    """Same folded math as the kernel, in plain jnp (f32 accumulation)."""
    n, hc, wc, cin = trunk.shape
    xpad = jnp.pad(trunk.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1), (0, 0)))
    m = hc * wc
    acc_p = jnp.zeros((n, m, 256), jnp.float32)
    acc_d = jnp.zeros((n, m, 256), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            patch = xpad[:, ky:ky + hc, kx:kx + wc, :].reshape(n, m, cin)
            t = (ky * 3 + kx) * cin
            acc_p += jnp.einsum("nmc,co->nmo", patch, folded["wpa"][t:t + cin],
                                preferred_element_type=jnp.float32)
            acc_d += jnp.einsum("nmc,co->nmo", patch, folded["wda"][t:t + cin],
                                preferred_element_type=jnp.float32)
    p_act = jnp.maximum(acc_p + folded["bpa"], 0.0).astype(jnp.bfloat16)
    d_act = jnp.maximum(acc_d + folded["bda"], 0.0).astype(jnp.bfloat16)
    loc = jnp.einsum("nmc,co->nmo", p_act, folded["wpb"],
                     preferred_element_type=jnp.float32) + folded["bpb"]
    ids = jnp.einsum("nmc,co->nmo", d_act, folded["wdb"],
                     preferred_element_type=jnp.float32) + folded["bdb"]
    return (loc.reshape(n, hc, wc, 65), ids.reshape(n, hc, wc, n_ids + 1))


def test_kernel_matches_jnp_folded_math(rng):
    det, v = _variables()
    folded = fold_head_params(v, CFG.n_ids)
    trunk = jnp.asarray(rng.normal(size=(3, 30, 40, 128)).astype(np.float32))

    loc, ids = _jnp_folded_reference(trunk, folded, CFG.n_ids)
    ref_kpts, ref_valid = pred_to_keypoints(loc, ids, CFG.n_ids)

    kpts, valid = pallas_fused_head_decode(trunk, folded, CFG.n_ids,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_valid), np.asarray(valid))
    rv = np.asarray(ref_valid)
    np.testing.assert_array_equal(np.asarray(ref_kpts)[rv],
                                  np.asarray(kpts)[rv])


def test_kernel_min_margin(rng):
    det, v = _variables(1)
    folded = fold_head_params(v, CFG.n_ids)
    trunk = jnp.asarray(rng.normal(size=(2, 30, 40, 128)).astype(np.float32))
    loc, ids = _jnp_folded_reference(trunk, folded, CFG.n_ids)
    ref_kpts, ref_valid = pred_to_keypoints(loc, ids, CFG.n_ids, min_margin=2.0)
    kpts, valid = pallas_fused_head_decode(trunk, folded, CFG.n_ids,
                                           min_margin=2.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_valid), np.asarray(valid))
    rv = np.asarray(ref_valid)
    np.testing.assert_array_equal(np.asarray(ref_kpts)[rv],
                                  np.asarray(kpts)[rv])


def test_fused_path_agrees_with_production_on_trained_weights():
    from deepcharuco_tpu.data.device_synth import DeviceSynthesizer
    from deepcharuco_tpu.pipeline import variables_from_npz

    det = Detector(n_ids=CFG.n_ids)
    v = variables_from_npz("artifacts/detector_devsynth.npz")
    folded = fold_head_params(v, CFG.n_ids)

    synth = DeviceSynthesizer(CFG)
    imgs, _, _ = synth.batch(jax.random.PRNGKey(0), 8)

    out = det.apply(v, imgs)
    ref_kpts, ref_valid = pred_to_keypoints(out["loc"], out["ids"], CFG.n_ids)
    trunk = det.apply(v, imgs, trunk_only=True)["trunk"].astype(jnp.float32)
    kpts, valid = pallas_fused_head_decode(trunk, folded, CFG.n_ids,
                                           interpret=True)

    rv, pv = np.asarray(ref_valid), np.asarray(valid)
    slot_mismatch = (rv != pv).mean()
    coord_mismatch = ((np.abs(np.asarray(ref_kpts) - np.asarray(kpts))
                       .max(-1) > 0) & rv & pv).mean()
    # BN folding reorders bf16 float ops; only near-tie cells may flip.
    assert slot_mismatch <= 0.02, slot_mismatch
    assert coord_mismatch <= 0.02, coord_mismatch
