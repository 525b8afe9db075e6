"""Decode op unit tests against hand-computed values and the reference's
variable-shape torch semantics (src/models/model_utils.py:53-123)."""

import numpy as np
import jax.numpy as jnp

from deepcharuco_tpu.ops import (
    pred_argmax,
    label_to_keypoints,
    pred_to_keypoints,
    heatmap_argmax2d,
    refine_keypoints,
)

N_IDS = 16


def _one_hot_maps(loc_idx, ids_idx, hc=4, wc=5, n_ids=N_IDS):
    """Build NHWC logit maps whose argmax equals the given index maps."""
    loc = np.zeros((1, hc, wc, 65), np.float32)
    ids = np.zeros((1, hc, wc, n_ids + 1), np.float32)
    for (r, c), v in loc_idx.items():
        loc[0, r, c, v] = 5.0
    for (r, c), v in ids_idx.items():
        ids[0, r, c, v] = 5.0
    # push everything else toward dustbin
    loc[..., 64] += 1.0
    ids[..., n_ids] += 1.0
    return jnp.asarray(loc), jnp.asarray(ids)


def test_pred_argmax_dustbin_suppression():
    # Cell (1,2): valid id 3 with loc pix 10. Cell (2,3): id 5 but loc dustbin.
    loc, ids = _one_hot_maps({(1, 2): 10, (2, 3): 64}, {(1, 2): 3, (2, 3): 5})
    loc_a, ids_a = pred_argmax(loc, ids, N_IDS)
    assert loc_a.shape == (1, 4, 5)
    assert int(loc_a[0, 1, 2]) == 10
    assert int(ids_a[0, 1, 2]) == 3
    # loc dustbin ⇒ id forced to dustbin (ref model_utils.py:72-77)
    assert int(ids_a[0, 2, 3]) == N_IDS


def test_label_to_keypoints_hand_computed():
    # id 3 at cell (row=1, col=2) with pix 10 → offset x=2, y=1
    # ⇒ x = 8*2+2 = 18, y = 8*1+1 = 9   (ref model_utils.py:118-122)
    loc, ids = _one_hot_maps({(1, 2): 10}, {(1, 2): 3})
    loc_a, ids_a = pred_argmax(loc, ids, N_IDS)
    kpts, valid = label_to_keypoints(loc_a, ids_a, N_IDS)
    assert kpts.shape == (1, N_IDS, 2)
    assert valid.shape == (1, N_IDS)
    assert bool(valid[0, 3])
    assert int(valid[0].sum()) == 1
    np.testing.assert_array_equal(np.asarray(kpts[0, 3]), [18.0, 9.0])


def test_pred_to_keypoints_duplicate_id_highest_confidence_wins():
    hc, wc = 4, 5
    loc = np.zeros((1, hc, wc, 65), np.float32)
    ids = np.zeros((1, hc, wc, N_IDS + 1), np.float32)
    loc[..., 64] += 1.0
    ids[..., N_IDS] += 1.0
    # Two cells claim id 7; cell (0,1) with conf 3.0, cell (3,4) with conf 9.0.
    loc[0, 0, 1, 5] = 5.0
    ids[0, 0, 1, 7] = 3.0
    loc[0, 3, 4, 0] = 5.0
    ids[0, 3, 4, 7] = 9.0
    kpts, valid = pred_to_keypoints(jnp.asarray(loc), jnp.asarray(ids), N_IDS)
    assert bool(valid[0, 7])
    # winner is cell (3,4), pix 0 → x = 8*4, y = 8*3
    np.testing.assert_array_equal(np.asarray(kpts[0, 7]), [32.0, 24.0])


def test_decode_matches_reference_semantics_random():
    """Randomized cross-check vs a numpy re-statement of the torch reference
    decode, on the (typical) case where every id appears at most once."""
    rng = np.random.default_rng(0)
    hc, wc = 30, 40
    for _ in range(10):
        loc_hat = rng.normal(size=(1, hc, wc, 65)).astype(np.float32)
        ids_hat = rng.normal(size=(1, hc, wc, N_IDS + 1)).astype(np.float32)
        # reference decode, numpy:
        loc_arg = loc_hat.argmax(-1)
        ids_arg = ids_hat.argmax(-1)
        ids_arg[loc_arg == 64] = N_IDS
        ref = {}
        for r in range(hc):
            for c in range(wc):
                k = ids_arg[0, r, c]
                if k == N_IDS:
                    continue
                pix = loc_arg[0, r, c]
                x, y = 8 * c + pix % 8, 8 * r + pix // 8
                conf = ids_hat[0, r, c].max()
                if k not in ref or conf > ref[k][2]:
                    ref[k] = (x, y, conf)
        kpts, valid = pred_to_keypoints(jnp.asarray(loc_hat), jnp.asarray(ids_hat), N_IDS)
        kpts, valid = np.asarray(kpts), np.asarray(valid)
        for k in range(N_IDS):
            assert valid[0, k] == (k in ref)
            if k in ref:
                np.testing.assert_array_equal(kpts[0, k], ref[k][:2])


def test_pred_to_keypoints_min_margin():
    hc, wc = 4, 5
    loc = np.zeros((1, hc, wc, 65), np.float32)
    ids = np.zeros((1, hc, wc, N_IDS + 1), np.float32)
    loc[..., 64] += 1.0
    ids[..., N_IDS] += 1.0
    # confident detection: id 2 at (1,1), margin 8-1=7
    loc[0, 1, 1, 0] = 5.0
    ids[0, 1, 1, 2] = 8.0
    # marginal detection: id 5 at (2,2), margin 1.4-1=0.4
    loc[0, 2, 2, 0] = 5.0
    ids[0, 2, 2, 5] = 1.4
    _, v_off = pred_to_keypoints(jnp.asarray(loc), jnp.asarray(ids), N_IDS)
    _, v_on = pred_to_keypoints(jnp.asarray(loc), jnp.asarray(ids), N_IDS,
                                min_margin=2.0)
    assert bool(v_off[0, 2]) and bool(v_off[0, 5])      # parity: both kept
    assert bool(v_on[0, 2]) and not bool(v_on[0, 5])    # margin filters


def test_heatmap_argmax2d():
    heat = np.zeros((3, 64, 64), np.float32)
    heat[0, 10, 20] = 1.0
    heat[1, 0, 0] = 1.0
    heat[2, 63, 63] = 1.0
    out = np.asarray(heatmap_argmax2d(jnp.asarray(heat)))
    np.testing.assert_array_equal(out, [[20, 10], [0, 0], [63, 63]])


def test_refine_keypoints_soft_subgrid_precision():
    """Soft-argmax recovers a Gaussian peak BETWEEN heatmap pixels — the
    sub-grid precision hard argmax cannot reach."""
    from deepcharuco_tpu.ops import refine_keypoints_soft
    from deepcharuco_tpu.ops.heatmap import gaussian_heatmap

    # peak at fractional position (20.4, 33.7): build by sampling the
    # gaussian at that continuous center
    ys = np.arange(64, dtype=np.float32)[:, None]
    xs = np.arange(64, dtype=np.float32)[None, :]
    cx, cy = 20.4, 33.7
    heat = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / 8.0).astype(np.float32)

    kpt = jnp.asarray([[50.0, 60.0]])
    soft = np.asarray(refine_keypoints_soft(jnp.asarray(heat)[None], kpt))
    expect = np.array([50.0 + (cx - 32) / 8, 60.0 + (cy - 32) / 8])
    np.testing.assert_allclose(soft[0], expect, atol=0.02)  # ≪ 1/8 px grid

    hard = np.asarray(refine_keypoints(jnp.asarray(heat)[None], kpt))
    soft_err = np.abs(soft[0] - expect).max()
    hard_err = np.abs(hard[0] - expect).max()
    assert soft_err < hard_err  # soft beats the grid quantization


def test_refine_keypoints_mapping():
    # Argmax exactly at (32, 32) ⇒ refined == keypoint (ref refinenet.py:114)
    heat = np.zeros((2, 64, 64), np.float32)
    heat[0, 32, 32] = 1.0
    heat[1, 40, 16] = 1.0  # (x=16, y=40) → delta = ((16-32)/8, (40-32)/8) = (-2, 1)
    kpts = jnp.asarray([[100.0, 50.0], [8.0, 9.0]])
    ref = np.asarray(refine_keypoints(jnp.asarray(heat), kpts))
    np.testing.assert_allclose(ref[0], [100.0, 50.0])
    np.testing.assert_allclose(ref[1], [6.0, 10.0])


def test_topk_decode_preserves_duplicates_sparse():
    """Capacity-K decode round-trips random sparse label maps against the
    reference's keep-every-cell semantics (model_utils.py:111-123), with
    several cells intentionally claiming the SAME id — the case the default
    one-slot decode collapses (its one documented delta). Zero deltas here."""
    from deepcharuco_tpu.ops import pred_to_keypoints_topk

    rng = np.random.default_rng(42)
    hc, wc = 30, 40
    for trial in range(8):
        loc_hat = np.zeros((1, hc, wc, 65), np.float32)
        ids_hat = np.zeros((1, hc, wc, N_IDS + 1), np.float32)
        loc_hat[..., 64] = 1.0
        ids_hat[..., N_IDS] = 1.0
        for k in range(N_IDS):
            for _ in range(int(rng.integers(0, 5))):  # 0..4 claims per id
                r, c = int(rng.integers(hc)), int(rng.integers(wc))
                loc_hat[0, r, c] = 0.0
                loc_hat[0, r, c, int(rng.integers(64))] = 5.0
                ids_hat[0, r, c] = 0.0
                ids_hat[0, r, c, k] = 5.0 + rng.random()
        # independent numpy statement of the reference decode (ALL cells)
        loc_arg = loc_hat.argmax(-1)
        ids_arg = ids_hat.argmax(-1)
        ids_arg[loc_arg == 64] = N_IDS
        ref_set = set()
        for r in range(hc):
            for c in range(wc):
                k = ids_arg[0, r, c]
                if k == N_IDS:
                    continue
                pix = loc_arg[0, r, c]
                ref_set.add((8 * c + pix % 8, 8 * r + pix // 8, k))

        kpts, valid = pred_to_keypoints_topk(jnp.asarray(loc_hat),
                                             jnp.asarray(ids_hat), N_IDS,
                                             capacity=4)
        kpts, valid = np.asarray(kpts), np.asarray(valid)
        assert kpts.shape == (1, N_IDS, 4, 2)
        got = {(float(kpts[0, k, j, 0]), float(kpts[0, k, j, 1]), k)
               for k in range(N_IDS) for j in range(4) if valid[0, k, j]}
        assert got == ref_set


def test_topk_decode_full_capacity_dense():
    """With capacity = number of cells, the top-k decode equals the reference
    set exactly even on dense random logits (every cell claims some id)."""
    from deepcharuco_tpu.ops import pred_to_keypoints_topk

    rng = np.random.default_rng(7)
    hc, wc = 8, 10
    cap = hc * wc
    loc_hat = rng.normal(size=(1, hc, wc, 65)).astype(np.float32)
    ids_hat = rng.normal(size=(1, hc, wc, N_IDS + 1)).astype(np.float32)
    loc_arg = loc_hat.argmax(-1)
    ids_arg = ids_hat.argmax(-1)
    ids_arg[loc_arg == 64] = N_IDS
    ref_set = set()
    for r in range(hc):
        for c in range(wc):
            k = ids_arg[0, r, c]
            if k == N_IDS:
                continue
            pix = loc_arg[0, r, c]
            ref_set.add((8 * c + pix % 8, 8 * r + pix // 8, k))
    kpts, valid = pred_to_keypoints_topk(jnp.asarray(loc_hat),
                                         jnp.asarray(ids_hat), N_IDS,
                                         capacity=cap)
    kpts, valid = np.asarray(kpts), np.asarray(valid)
    got = {(float(kpts[0, k, j, 0]), float(kpts[0, k, j, 1]), k)
           for k in range(N_IDS) for j in range(cap) if valid[0, k, j]}
    assert got == ref_set
