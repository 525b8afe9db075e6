"""Geometry-consistent decode (ops/geom.py): planar-homography candidate
reselection + loc-gate-override candidates. Training-free recall/outlier
gains measured in BENCH_NOTES round 3; OFF by default (reference parity —
``src/models/model_utils.py:81-123`` has no geometric filtering)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deepcharuco_tpu.ops import (
    pred_to_keypoints,
    pred_to_keypoints_geom,
    reselect_by_homography,
)

N_IDS = 16


def _grid_and_true(seed=0):
    """A 4x4 board-plane grid and its image under a fixed homography."""
    ids = np.arange(N_IDS)
    bx = np.stack([ids % 4, ids // 4], -1).astype(np.float32)
    H = np.array([[20, 1.5, 30], [0.8, 19, 40], [0.001, 0, 1]], np.float32)
    p = bx @ H[:, :2].T + H[:, 2]
    true_px = (p[:, :2] / p[:, 2:]).astype(np.float32)
    rng = np.random.default_rng(seed)
    return bx, true_px, rng


def test_reselect_recovers_displaced_and_rejects_decoys():
    bx, true_px, rng = _grid_and_true()
    C = 3
    kp = np.zeros((N_IDS, C, 2), np.float32)
    val = np.zeros((N_IDS, C), bool)
    kp[:, 0] = true_px
    val[:, 0] = True
    # id 5: slot 0 is a decoy 16 px away, the true corner sits in slot 1
    kp[5, 1] = true_px[5]
    val[5, 1] = True
    kp[5, 0] = true_px[5] + np.array([16, 8], np.float32)
    # id 9: ONLY a wrong candidate exists (neighbor-id decoy)
    kp[9, 0] = true_px[9] + np.array([-24, 0], np.float32)
    # id 12: no candidates at all
    val[12] = False
    kp[val] += rng.normal(0, 0.5, kp[val].shape).astype(np.float32)

    out_kp, out_v = jax.jit(
        lambda a, b: reselect_by_homography(a, b, jnp.asarray(bx))
    )(jnp.asarray(kp), jnp.asarray(val))
    out_kp, out_v = np.asarray(out_kp), np.asarray(out_v)
    d = np.linalg.norm(out_kp - true_px, axis=-1)

    assert out_v[5] and d[5] < 3.0          # displaced corner recovered
    assert not out_v[9]                     # lone decoy rejected
    assert not out_v[12]                    # absent stays absent
    others = [i for i in range(N_IDS) if i not in (5, 9, 12)]
    assert out_v[others].all() and d[others].max() < 3.0


def test_reselect_guard_keeps_top1_when_underdetermined():
    bx, true_px, _ = _grid_and_true()
    kp = np.zeros((N_IDS, 2, 2), np.float32)
    val = np.zeros((N_IDS, 2), bool)
    kp[:4, 0] = true_px[:4]
    val[:4, 0] = True  # only 4 points: below min_points=6
    out_kp, out_v = reselect_by_homography(jnp.asarray(kp), jnp.asarray(val),
                                           jnp.asarray(bx))
    np.testing.assert_array_equal(np.asarray(out_v), val[:, 0])
    np.testing.assert_allclose(np.asarray(out_kp)[:4], kp[:4, 0])


def _maps_from_corners(true_px, hc=30, wc=40):
    """loc/ids head maps (logits) that decode exactly to ``true_px``."""
    loc = np.full((1, hc, wc, 65), -5.0, np.float32)
    ids = np.full((1, hc, wc, N_IDS + 1), -5.0, np.float32)
    loc[..., 64] = 5.0   # everything dustbin by default
    ids[..., N_IDS] = 5.0
    for i, (x, y) in enumerate(true_px):
        cx, cy = int(x) // 8, int(y) // 8
        pix = (int(y) % 8) * 8 + int(x) % 8
        loc[0, cy, cx, 64] = -5.0
        loc[0, cy, cx, pix] = 5.0
        ids[0, cy, cx, N_IDS] = -5.0
        ids[0, cy, cx, i] = 5.0 + 0.1 * i
    return jnp.asarray(loc), jnp.asarray(ids)


def test_geom_matches_plain_on_clean_input():
    bx, true_px, _ = _grid_and_true()
    true_px = np.round(true_px)  # cell-grid decode is integer-valued
    loc, ids = _maps_from_corners(true_px)
    kp_p, v_p = pred_to_keypoints(loc, ids, N_IDS)
    kp_g, v_g = pred_to_keypoints_geom(loc, ids, N_IDS, jnp.asarray(bx))
    np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_g))
    np.testing.assert_allclose(np.asarray(kp_p), np.asarray(kp_g))


def test_geom_loc_gate_override_recovers_suppressed_corner():
    """A cell whose ids head names the corner but whose loc head argmaxes the
    dustbin is invisible to the parity decode; the override + homography
    consistency recovers it at the loc head's best non-dustbin bin."""
    bx, true_px, _ = _grid_and_true()
    true_px = np.round(true_px)
    loc, ids = _maps_from_corners(true_px)
    loc, ids = np.asarray(loc).copy(), np.asarray(ids).copy()
    i = 10
    x, y = true_px[i]
    cx, cy = int(x) // 8, int(y) // 8
    loc[0, cy, cx, 64] = 6.0  # loc gate fires; pos64 still points at true pix

    kp_p, v_p = pred_to_keypoints(jnp.asarray(loc), jnp.asarray(ids), N_IDS)
    assert not np.asarray(v_p)[0, i]  # parity decode drops it

    kp_g, v_g = pred_to_keypoints_geom(jnp.asarray(loc), jnp.asarray(ids),
                                       N_IDS, jnp.asarray(bx))
    assert np.asarray(v_g)[0, i]
    np.testing.assert_allclose(np.asarray(kp_g)[0, i], true_px[i], atol=1.0)
    # and with the override disabled it stays dropped
    kp_n, v_n = pred_to_keypoints_geom(jnp.asarray(loc), jnp.asarray(ids),
                                       N_IDS, jnp.asarray(bx),
                                       loc_override=False)
    assert not np.asarray(v_n)[0, i]


def test_pipeline_geom_decode_integration():
    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.models import Detector, RefineNet
    from deepcharuco_tpu.pipeline import InferencePipeline

    cfg = default_config()
    det = Detector(n_ids=cfg.n_ids, dtype=jnp.float32)
    rn = RefineNet(dtype=jnp.float32)
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 1)))
    rv = rn.init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 1)))
    with pytest.raises(ValueError, match="exclusive"):
        InferencePipeline(cfg, dv, rv, geom_decode=True, decode_capacity=4)
    pipe = InferencePipeline(cfg, dv, rv, geom_decode=True,
                             compute_dtype=jnp.float32)
    h, w = cfg.input_hw
    frames = np.zeros((2, h, w), np.uint8)
    kp, valid, refined = pipe.detect(frames)
    assert kp.shape == (2, cfg.n_ids, 2) and valid.shape == (2, cfg.n_ids)


def test_fill_from_homography_recovers_dropped_corner():
    from deepcharuco_tpu.ops import fill_from_homography

    bx, true_px, _ = _grid_and_true()
    true_px = np.round(true_px)
    kp = true_px.copy()
    val = np.ones(N_IDS, bool)
    val[7] = False            # id 7 undetected (in frame)
    kp[7] = 0.0
    centers, v_out, filled = fill_from_homography(
        jnp.asarray(kp), jnp.asarray(val), jnp.asarray(bx), (240, 320))
    centers, v_out, filled = (np.asarray(centers), np.asarray(v_out),
                              np.asarray(filled))
    assert v_out[7] and filled[7]
    assert np.linalg.norm(centers[7] - true_px[7]) <= 1.5
    assert not filled[val].any()          # detected ids untouched
    np.testing.assert_allclose(centers[val], kp[val])


def test_fill_skips_out_of_frame_and_underdetermined():
    from deepcharuco_tpu.ops import fill_from_homography

    bx, true_px, _ = _grid_and_true()
    kp = np.round(true_px)
    val = np.ones(N_IDS, bool)
    val[3] = False
    # frame cropped so id 3's position (x≈true_px[3,0]) is outside
    w = int(true_px[3, 0]) - 2
    _, v_out, filled = fill_from_homography(
        jnp.asarray(kp), jnp.asarray(val), jnp.asarray(bx), (240, w))
    assert not np.asarray(filled)[3] and not np.asarray(v_out)[3]
    # below min_points nothing is filled
    val_few = np.zeros(N_IDS, bool)
    val_few[:5] = True
    _, v2, f2 = fill_from_homography(
        jnp.asarray(kp), jnp.asarray(val_few), jnp.asarray(bx), (240, 320))
    assert not np.asarray(f2).any()
    np.testing.assert_array_equal(np.asarray(v2), val_few)


def test_pipeline_geom_fill_guard():
    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.models import Detector
    from deepcharuco_tpu.pipeline import InferencePipeline

    cfg = default_config()
    det = Detector(n_ids=cfg.n_ids, dtype=jnp.float32)
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 1)))
    with pytest.raises(ValueError, match="geom_fill requires"):
        InferencePipeline(cfg, dv, None, geom_fill=True)


def test_reselect_degenerate_fit_falls_back_to_parity():
    """Collinear detections make the homography underdetermined; the decode
    must fall back to top-1 rather than dropping every detection on a
    garbage fit."""
    bx, _, rng = _grid_and_true()
    kp = np.zeros((N_IDS, 2, 2), np.float32)
    val = np.zeros((N_IDS, 2), bool)
    # 8 detections all on ONE board row -> rank-deficient DLT
    for j, i in enumerate(range(8)):
        kp[i, 0] = np.array([30 + 20 * j, 50], np.float32)
        val[i, 0] = True
    out_kp, out_v = reselect_by_homography(jnp.asarray(kp), jnp.asarray(val),
                                           jnp.asarray(bx))
    out_v = np.asarray(out_v)
    # either the fit coincidentally explains the line (keeps them) or the
    # fallback fires — in no case may detections be lost
    assert (out_v | ~val[:, 0]).all()
    np.testing.assert_allclose(np.asarray(out_kp)[val[:, 0]], kp[val[:, 0], 0])


def test_eval_cli_geom_decode(capsys):
    """--geom-decode drives pred_to_keypoints_geom through the eval CLI."""
    from deepcharuco_tpu.cli.eval import main

    out = main(["--samples", "16", "--source", "device", "--geom-decode"])
    assert "target corners" in capsys.readouterr().out
    assert out["recall"] >= 0.0


def test_eval_cli_geom_fill(capsys):
    """--geom-fill composes with --geom-decode through the eval CLI (fills
    enter the recall count and are refined by the same RefineNet pass)."""
    import pytest

    from deepcharuco_tpu.cli.eval import main

    out = main(["--samples", "16", "--source", "device", "--geom-decode",
                "--geom-fill"])
    assert "target corners" in capsys.readouterr().out
    assert out["recall"] >= 0.0
    with pytest.raises(SystemExit, match="geom-decode"):
        main(["--samples", "16", "--geom-fill"])


def test_pose_ignores_filled_corners():
    """full_forward with geom_fill must solve pose from measured detections
    only — identical rvec/tvec to the geom-only pipeline even though the
    returned corner set includes fills (fills lie on the fitted homography;
    feeding them to PnP adds correlated bias, measured in BENCH_NOTES)."""
    import cv2

    from deepcharuco_tpu import board as B
    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.pipeline import Camera, load_pipeline

    cfg = default_config()
    img, _ = B.board_image(B.get_board(cfg), (400, 400),
                           cfg.row_count, cfg.col_count)
    tex = cv2.cvtColor(np.asarray(img), cv2.COLOR_BGR2GRAY)
    frame = np.full((240, 320), 128, np.uint8)
    M = cv2.getRotationMatrix2D((100.0, 100.0), 20, 1.0)
    frame[20:220, 60:260] = cv2.warpAffine(
        cv2.resize(tex, (200, 200), interpolation=cv2.INTER_AREA),
        M, (200, 200), borderValue=128)
    frame = frame.copy()
    frame[90:150, 130:190] = 128  # occlude the middle of the board

    cam = Camera(K=np.array([[320, 0, 160], [0, 320, 120], [0, 0, 1]],
                            np.float32), dist=np.zeros(5, np.float32))
    kw = dict(camera=cam, geom_decode=True)
    geom = load_pipeline(cfg, "artifacts/detector_devsynth.npz",
                         "artifacts/refinenet_devsynth.npz", **kw)
    fill = load_pipeline(cfg, "artifacts/detector_devsynth.npz",
                         "artifacts/refinenet_devsynth.npz", geom_fill=True,
                         **kw)
    out_g = geom.detect_with_pose(frame[None])
    out_f = fill.detect_with_pose(frame[None])
    assert int(out_f[1].sum()) >= int(out_g[1].sum())  # fills only add
    if out_g[3][0]:  # pose solvable
        np.testing.assert_allclose(out_f[4], out_g[4], atol=1e-5)  # rvec
        np.testing.assert_allclose(out_f[5], out_g[5], atol=1e-6)  # tvec


def test_hires_geom_fill_pipeline():
    """The hires tap composes with geom decode + fill (trust-clamp branch in
    two_stage_forward_hires) and with pose (fills excluded from PnP)."""
    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.models import Detector, RefineNet
    from deepcharuco_tpu.pipeline import Camera, InferencePipeline

    cfg = default_config()
    det = Detector(n_ids=cfg.n_ids, dtype=jnp.float32)
    rn = RefineNet(dtype=jnp.float32, patch_size=32)
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 1)))
    rv = rn.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 1)))
    h, w = cfg.input_hw
    cam = Camera(K=np.array([[2 * w, 0, w], [0, 2 * w, h], [0, 0, 1]],
                            np.float32), dist=np.zeros(12, np.float32))
    pipe = InferencePipeline(cfg, dv, rv, camera=cam, rn_patch_size=32,
                             compute_dtype=jnp.float32, hires=True,
                             geom_decode=True, geom_fill=True)
    frames = np.zeros((2, 2 * h, 2 * w), np.uint8)
    kp, valid, refined = pipe.detect(frames)
    assert kp.shape == (2, cfg.n_ids, 2)
    out = pipe.detect_with_pose(frames)
    assert len(out) == 7


def test_fill_residual_gate_blocks_bad_fit():
    """A homography that does not explain its own detections (decoy-skewed
    fit) must fill NOTHING — the round-4 gate on the measured 108-px
    extrapolation outlier class (BENCH_NOTES round-4 acceptance)."""
    from deepcharuco_tpu.ops import fill_from_homography

    bx, true_px, rng = _grid_and_true()
    kp = np.round(true_px)
    val = np.ones(N_IDS, bool)
    val[7] = False
    # four detections pulled 6-10 px off-plane: the fit's RMS residual on
    # its own support blows past any healthy decode error
    kp[[1, 4, 10, 14]] += rng.uniform(6, 10, (4, 2)).astype(np.float32)
    _, v_out, filled = fill_from_homography(
        jnp.asarray(kp), jnp.asarray(val), jnp.asarray(bx), (240, 320),
        min_spread_px=0.0)
    assert not np.asarray(filled).any()
    np.testing.assert_array_equal(np.asarray(v_out), val)
    # same frame, healthy detections: the fill fires
    kp_ok = np.round(true_px)
    _, _, f_ok = fill_from_homography(
        jnp.asarray(kp_ok), jnp.asarray(val), jnp.asarray(bx), (240, 320),
        min_spread_px=0.0)
    assert np.asarray(f_ok)[7]


def test_fill_spread_gate_blocks_degenerate_constellation():
    """Near-collinear detections admit a low-residual fit that extrapolates
    arbitrarily — the spread gate (min principal std-dev, the PnP degeneracy
    gate) must block filling from them."""
    from deepcharuco_tpu.ops import fill_from_homography

    bx, _, rng = _grid_and_true()
    kp = np.zeros((N_IDS, 2), np.float32)
    val = np.zeros(N_IDS, bool)
    # 8 detections on one image line (y jitter 0.2 px): min std-dev ~0
    for j in range(8):
        kp[j] = [30 + 18 * j,
                 60 + float(rng.normal(0, 0.2))]
        val[j] = True
    _, v_out, filled = fill_from_homography(
        jnp.asarray(kp), jnp.asarray(val), jnp.asarray(bx), (240, 320),
        max_rms_px=1e9)
    assert not np.asarray(filled).any()
    np.testing.assert_array_equal(np.asarray(v_out), val)


def test_fill_mahalanobis_gate_blocks_long_extrapolation():
    """Round-4 leverage gate: fills far outside the detected constellation
    (in Mahalanobis units under its covariance) are extrapolations whose
    error grows with distance — the measured 7.5-px raw-fill tail on the
    device stream. Near holes keep filling; far ones don't."""
    from deepcharuco_tpu.ops import fill_from_homography

    bx, true_px, _ = _grid_and_true()
    kp = np.round(true_px)
    val = np.ones(N_IDS, bool)
    val[5] = False       # interior hole: well inside the constellation
    val[8:] = False      # far half undetected: the last row sits ~5 sigma
    # out under the two detected rows' covariance (y std 0.5 cells)
    # (min_points=7: this test isolates the mahal gate from the floor)
    args = (jnp.asarray(kp), jnp.asarray(val), jnp.asarray(bx), (400, 500))

    _, v3, f3 = fill_from_homography(*args, max_mahal=3.0, min_points=7)
    f3 = np.asarray(f3)
    assert f3[5]                      # interior hole filled
    assert not f3[12:].any()          # far row gated

    _, _, f_inf = fill_from_homography(*args, max_mahal=1e9, min_points=7)
    assert np.asarray(f_inf)[12:].sum() >= 3  # only the gate was blocking


def test_reselect_self_consistency_gate_falls_back_to_parity():
    """Round-4 gate: a final selection no single homography explains (refit
    RMS above ``max_rms_px``) must NOT be trusted — the frame falls back to
    the parity decode. Measured in the wild as decoy constellations with
    refit RMS 4.8-60 px admitting up to 46-px errors (host stream,
    scripts/debug_fill_outliers.py)."""
    bx, true_px, rng = _grid_and_true()
    C = 2
    kp = np.zeros((N_IDS, C, 2), np.float32)
    val = np.zeros((N_IDS, C), bool)
    kp[:, 0] = true_px
    val[:, 0] = True
    # a third of the constellation rides a DIFFERENT (shifted+sheared)
    # plane: individually plausible, jointly inconsistent
    bad = [1, 3, 6, 10, 13]
    for i, b in enumerate(bad):
        kp[b, 0] = true_px[b] + np.array([7.0 - 3 * i, 5.0 + 2 * i],
                                         np.float32)

    # iters=1 + generous tol: every candidate stays eligible, so the loop
    # cannot trim the bad points — only the final-refit gate can catch it.
    # ransac_subsets=0 pins the round-3 least-squares seed: this test is
    # about the GATE; the RANSAC seed would reject the decoys up front
    # (covered by test_reselect_ransac_rejects_decoy_constellation).
    run = lambda gate: jax.jit(lambda a, b: reselect_by_homography(
        a, b, jnp.asarray(bx), tol_px=16.0, iters=1, ransac_subsets=0,
        max_rms_px=gate))(jnp.asarray(kp), jnp.asarray(val))

    kp_g, v_g = run(jnp.inf)
    assert np.asarray(v_g).sum() == N_IDS  # ungated: all kept (bad fit wins)

    kp_s, v_s = run(1.5)
    # gated: exact parity fallback — same positions, same validity
    np.testing.assert_array_equal(np.asarray(v_s), val[:, 0])
    np.testing.assert_array_equal(np.asarray(kp_s), kp[:, 0])


def test_reselect_ransac_rejects_decoy_constellation():
    """Round-4 RANSAC seed: a minority of slot-0 decoys displaced onto a
    coherent OTHER plane pulls the least-squares seed enough that the loop
    blesses them (host frame 349: 4 decoys among 10 detections survived
    with up to 46-px errors). The consensus seed must instead lock onto
    the majority plane, recover the true corners hiding in lower slots,
    and reject decoy ids with no true candidate."""
    bx, true_px, rng = _grid_and_true()
    C = 2
    kp = np.zeros((N_IDS, C, 2), np.float32)
    val = np.zeros((N_IDS, C), bool)
    kp[:, 0] = true_px
    val[:, 0] = True
    # 5 of 16 slot-0 entries ride a coherent decoy plane (shift + shear),
    # exactly the churn class the LS seed falls for
    bad = [1, 3, 6, 10, 13]
    S = np.array([[1.1, 0.15], [0.05, 1.05]], np.float32)
    for b in bad:
        kp[b, 0] = true_px[b] @ S.T + np.array([11.0, 7.0], np.float32)
    # two of them keep their TRUE corner in slot 1 (displaced pathology)
    for b in bad[:2]:
        kp[b, 1] = true_px[b]
        val[b, 1] = True
    kp[val] += rng.normal(0, 0.3, kp[val].shape).astype(np.float32)

    # the shipped default (32 subsets) plus the 64/16 sweep points must all
    # reject the decoy plane (the 512-sample sweep measured them identical
    # on every stream; this pins that equivalence at the unit level)
    for n_subsets in (64, 32, 16):
        out_kp, out_v = jax.jit(lambda a, b: reselect_by_homography(
            a, b, jnp.asarray(bx), ransac_subsets=n_subsets,
        ))(jnp.asarray(kp), jnp.asarray(val))
        out_kp, out_v = np.asarray(out_kp), np.asarray(out_v)
        d = np.linalg.norm(out_kp - true_px, axis=-1)

        good = [i for i in range(N_IDS) if i not in bad]
        assert out_v[good].all() and d[good].max() < 3.0  # majority plane kept
        assert out_v[bad[:2]].all() and d[bad[:2]].max() < 3.0  # slot-1 rescue
        assert not out_v[bad[2:]].any()      # pure decoys rejected, not kept
