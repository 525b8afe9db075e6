"""End-to-end pipeline tests on synthetic data: a rendered board warped into
a frame with a known pose; the fused program must localize corners near the
projected positions once fed a detector that 'cheats' via labels, and the
full program must recover the pose."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deepcharuco_tpu.configs import default_config
from deepcharuco_tpu.pipeline import Camera, InferencePipeline, full_forward, two_stage_forward
from deepcharuco_tpu.models import Detector, RefineNet
from deepcharuco_tpu.board import inner_corner_object_points
from deepcharuco_tpu.pnp import solve_pnp

cv2 = pytest.importorskip("cv2")

CFG = default_config()
K = np.array([[400.0, 0, 160.0], [0, 400.0, 120.0], [0, 0, 1.0]], np.float32)
DIST = np.zeros(5, np.float32)


def _variables():
    det = Detector(n_ids=CFG.n_ids, dtype=jnp.float32)
    rn = RefineNet(dtype=jnp.float32)
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 240, 320, 1)))
    rv = rn.init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 1)))
    return det, rn, dv, rv


def test_pipeline_shapes_and_jit():
    det, rn, dv, rv = _variables()
    frames = jnp.zeros((2, 240, 320, 3), jnp.uint8)
    kp, valid, refined = jax.jit(
        lambda dv, rv, x: two_stage_forward(det, rn, dv, rv, x, CFG.n_ids)
    )(dv, rv, frames)
    assert kp.shape == (2, 16, 2)
    assert valid.shape == (2, 16)
    assert refined.shape == (2, 16, 2)


def test_pipeline_without_refinenet():
    det, _, dv, _ = _variables()
    frames = jnp.zeros((1, 240, 320, 3), jnp.uint8)
    kp, valid, refined = two_stage_forward(det, None, dv, None, frames, CFG.n_ids)
    np.testing.assert_array_equal(np.asarray(kp), np.asarray(refined))


def test_full_forward_pose_outputs():
    det, rn, dv, rv = _variables()
    frames = jnp.zeros((2, 240, 320, 3), jnp.uint8)
    obj = jnp.asarray(inner_corner_object_points(5, 5, 0.01))
    out = jax.jit(
        lambda dv, rv, x: full_forward(det, rn, dv, rv, x, CFG.n_ids, obj,
                                       jnp.asarray(K), jnp.asarray(DIST))
    )(dv, rv, frames)
    kp, valid, refined, ok, rvec, tvec, rms = out
    assert ok.shape == (2,)
    assert rvec.shape == (2, 3) and tvec.shape == (2, 3)


def test_pnp_on_ground_truth_corner_projections():
    """Bypass the (untrained) nets: feed ground-truth projected corners to the
    same masked PnP the pipeline uses and recover the exact warp pose."""
    rvec = np.array([0.3, -0.2, 0.1], np.float32)
    tvec = np.array([0.01, -0.005, 0.3], np.float32)
    obj = inner_corner_object_points(5, 5, 0.01)
    img, _ = cv2.projectPoints(obj, rvec, tvec, K, DIST)
    ok, r, t, rms = solve_pnp(jnp.asarray(obj), jnp.asarray(img.squeeze(1)),
                              jnp.asarray(np.ones(16, bool)), jnp.asarray(K),
                              jnp.asarray(DIST))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(r), rvec, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t), tvec, atol=1e-4)


def test_inference_pipeline_class():
    _, _, dv, rv = _variables()
    pipe = InferencePipeline(CFG, dv, rv, camera=Camera(K=K, dist=DIST),
                             compute_dtype=jnp.float32)
    frames = np.zeros((1, 240, 320, 3), np.uint8)
    kp, valid, refined = pipe.detect(frames)
    assert kp.shape == (1, 16, 2)
    out = pipe.detect_with_pose(frames)
    assert len(out) == 7

    # keypoint_array mirrors the reference's sorted (x, y, id) output
    arr = pipe.keypoint_array(refined[0], valid[0])
    assert arr.ndim == 2 and arr.shape[1] == 3
    assert np.all(np.diff(arr[:, 2]) > 0)  # sorted by id


def test_inference_pipeline_gray_input():
    _, _, dv, rv = _variables()
    pipe = InferencePipeline(CFG, dv, rv, compute_dtype=jnp.float32)
    frames = np.zeros((1, 240, 320), np.uint8)
    kp, valid, refined = pipe.detect(frames)
    assert kp.shape == (1, 16, 2)


def test_inference_pipeline_soft_refine_and_margin():
    _, _, dv, rv = _variables()
    pipe = InferencePipeline(CFG, dv, rv, compute_dtype=jnp.float32,
                             soft_refine=True, min_margin=0.5)
    frames = np.zeros((1, 240, 320, 3), np.uint8)
    kp, valid, refined = pipe.detect(frames)
    assert refined.shape == (1, 16, 2)
    assert np.isfinite(refined).all()


def test_two_stage_forward_decode_capacity_refines_duplicates():
    """decode_capacity>1: BOTH cells claiming one id survive decode AND each
    gets its own RefineNet patch/refinement — the reference refines every
    decoded keypoint (inference.py:55-57), duplicates included. Slot 0 must
    equal the default decode's winner."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.models import Detector, RefineNet
    from deepcharuco_tpu.pipeline import two_stage_forward

    cfg = default_config()
    det = Detector(n_ids=cfg.n_ids, dtype=jnp.float32)
    rn = RefineNet(dtype=jnp.float32)
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 240, 320, 1)))
    rv = rn.init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 1)))

    frames = np.random.default_rng(0).integers(0, 255, (1, 240, 320),
                                               np.uint8)

    class _DupDet:
        """Detector stand-in emitting two cells that claim id 5."""

        def apply(self, variables, g):
            hc, wc = g.shape[1] // 8, g.shape[2] // 8
            loc = np.zeros((1, hc, wc, 65), np.float32)
            ids = np.zeros((1, hc, wc, cfg.n_ids + 1), np.float32)
            loc[..., 64] = 9.0
            ids[..., cfg.n_ids] = 9.0
            for (r, c, conf) in [(5, 5, 12.0), (20, 30, 11.0)]:
                loc[0, r, c] = 0.0
                loc[0, r, c, 27] = 9.0          # pix 27 → offset (3, 3)
                ids[0, r, c] = 0.0
                ids[0, r, c, 5] = conf
            return {"loc": jnp.asarray(loc), "ids": jnp.asarray(ids)}

    kp, valid, refined = two_stage_forward(_DupDet(), rn, dv, rv,
                                           jnp.asarray(frames), cfg.n_ids,
                                           decode_capacity=2)
    kp, valid, refined = (np.asarray(kp), np.asarray(valid),
                          np.asarray(refined))
    assert kp.shape == (1, cfg.n_ids, 2, 2) and valid.shape == (1, cfg.n_ids, 2)
    assert valid[0, 5].tolist() == [True, True]     # both duplicates kept
    assert int(valid.sum()) == 2
    np.testing.assert_array_equal(kp[0, 5, 0], [8 * 5 + 3, 8 * 5 + 3])
    np.testing.assert_array_equal(kp[0, 5, 1], [8 * 30 + 3, 8 * 20 + 3])
    # each duplicate refined from its OWN patch: refined within ±4px window
    assert np.abs(refined[0, 5] - kp[0, 5]).max() <= 4.0

    # slot 0 == default decode winner
    kp1, valid1, _ = two_stage_forward(_DupDet(), rn, dv, rv,
                                       jnp.asarray(frames), cfg.n_ids)
    np.testing.assert_array_equal(np.asarray(kp1)[0, 5], kp[0, 5, 0])


def test_keypoint_array_capacity_shapes():
    """keypoint_array must emit the reference's (M,3) [x,y,id] rows for BOTH
    decode shapes — incl. duplicate slots from a capacity-K pipeline."""
    import numpy as np

    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.pipeline import InferencePipeline

    pipe = InferencePipeline.__new__(InferencePipeline)  # method is pure

    refined = np.zeros((16, 2), np.float32)
    refined[3] = [10.0, 20.0]
    valid = np.zeros(16, bool)
    valid[3] = True
    rows = pipe.keypoint_array(refined, valid)
    np.testing.assert_array_equal(rows, [[10.0, 20.0, 3.0]])

    refined_k = np.zeros((16, 2, 2), np.float32)
    refined_k[5, 0] = [1.0, 2.0]
    refined_k[5, 1] = [3.0, 4.0]
    refined_k[7, 0] = [5.0, 6.0]
    valid_k = np.zeros((16, 2), bool)
    valid_k[5] = [True, True]
    valid_k[7, 0] = True
    rows = pipe.keypoint_array(refined_k, valid_k)
    np.testing.assert_array_equal(
        rows, [[1.0, 2.0, 5.0], [3.0, 4.0, 5.0], [5.0, 6.0, 7.0]])
