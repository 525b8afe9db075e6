"""rn_decode plumbing through the product pipeline (round 3): the averaged
soft-argmax + offset decode measured best on the 256-frame protocol must be
reachable through two_stage_forward / InferencePipeline, not just cli.eval."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deepcharuco_tpu.configs import default_config
from deepcharuco_tpu.models import Detector, RefineNet
from deepcharuco_tpu.pipeline import (
    InferencePipeline,
    two_stage_forward,
    variables_to_npz,
)

N_IDS = 16


def _models(offset_head, patch_size=32):
    det = Detector(n_ids=N_IDS, dtype=jnp.float32)
    rn = RefineNet(dtype=jnp.float32, patch_size=patch_size,
                   offset_head=offset_head)
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 1)))
    rv = rn.init(jax.random.PRNGKey(1),
                 jnp.zeros((1, patch_size, patch_size, 1)))
    return det, rn, dv, rv


def test_rn_decode_modes_shapes_and_avg_identity():
    det, rn, dv, rv = _models(offset_head=True)
    frames = np.random.default_rng(0).integers(
        0, 255, (2, 96, 96), np.uint8)

    outs = {}
    for mode in ("hard", "soft", "offset", "avg"):
        kp, valid, refined = two_stage_forward(
            det, rn, dv, rv, frames, N_IDS, rn_decode=mode)
        assert kp.shape == (2, N_IDS, 2)
        assert valid.shape == (2, N_IDS)
        assert refined.shape == (2, N_IDS, 2)
        assert np.isfinite(np.asarray(refined)).all()
        outs[mode] = np.asarray(refined)

    # avg is exactly the mean of the two estimators
    np.testing.assert_allclose(
        outs["avg"], 0.5 * (outs["soft"] + outs["offset"]),
        rtol=1e-5, atol=1e-5)
    # distinct decodes actually differ on random weights
    assert not np.allclose(outs["soft"], outs["offset"])


def test_rn_decode_offset_requires_offset_head():
    det, rn, dv, rv = _models(offset_head=False)
    frames = np.zeros((1, 96, 96), np.uint8)
    with pytest.raises(ValueError, match="offset_head"):
        two_stage_forward(det, rn, dv, rv, frames, N_IDS, rn_decode="avg")


def test_inference_pipeline_rn_decode_avg(tmp_path):
    cfg = default_config()
    det, rn, dv, rv = _models(offset_head=True)
    dp, rp = str(tmp_path / "d.npz"), str(tmp_path / "r.npz")
    variables_to_npz(dp, dv)
    variables_to_npz(rp, rv)

    from deepcharuco_tpu.pipeline import load_pipeline

    pipe = load_pipeline(cfg, dp, rp, compute_dtype=jnp.float32,
                         rn_patch_size=32, rn_decode="avg")
    kp, valid, refined = pipe.detect(
        np.zeros((1, cfg.input_hw[0], cfg.input_hw[1], 3), np.uint8))
    assert refined.shape == (1, N_IDS, 2)
    assert np.isfinite(refined).all()


def test_rn_decode_offset_dce_drops_heatmap_pyramid():
    """The fast serving mode's mechanism (round 5, BENCH_NOTES "offset fast
    mode"): with ``rn_decode="offset"`` the refined output depends only on
    the RefineNet trunk + offset branch, so XLA dead-code-eliminates the
    64×64 heatmap decoder (conv4*/conv5*/convPa/convPb — the bulk of
    RefineNet's FLOPs; chip-measured 3,271 → 4,875 fps at batch 256).
    Pin the mechanism, not the fps: the compiled offset program must cost
    well under 3/4 of the avg program's FLOPs (analytic ratio ≈ 0.59 at
    16 patches/frame on 240×320 input)."""
    det, rn, dv, rv = _models(offset_head=True)

    def flops(mode):
        fn = jax.jit(lambda dv, rv, x: two_stage_forward(
            det, rn, dv, rv, x, N_IDS, rn_decode=mode))
        x = jnp.zeros((2, 240, 320), jnp.uint8)
        cost = fn.lower(dv, rv, x).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])

    f_avg, f_off = flops("avg"), flops("offset")
    assert f_off < 0.75 * f_avg, (f_off, f_avg)


def test_rn_decode_none_backcompat_matches_soft_refine_flag():
    """rn_decode=None defers to the legacy soft_refine bool."""
    det, rn, dv, rv = _models(offset_head=True)
    frames = np.random.default_rng(1).integers(
        0, 255, (1, 96, 96), np.uint8)
    _, _, a = two_stage_forward(det, rn, dv, rv, frames, N_IDS,
                                soft_refine=True)
    _, _, b = two_stage_forward(det, rn, dv, rv, frames, N_IDS,
                                rn_decode="soft")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
