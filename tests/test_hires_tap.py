"""Hi-res patch tap (round 3): detector on a 2×-downsampled view, RefineNet
on full-resolution patches — the TPU-native form of the reference's 2×
RefineNet rendering (``src/data_refinenet.py:97-100``)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deepcharuco_tpu.configs import default_config, scaled_config
from deepcharuco_tpu.models import Detector, RefineNet
from deepcharuco_tpu.ops import downsample2x
from deepcharuco_tpu.pipeline import two_stage_forward_hires

N_IDS = 16


def test_downsample2x_exact_mean_and_coordinate_convention():
    x = np.arange(8 * 6, dtype=np.float32).reshape(1, 6, 8, 1)
    y = np.asarray(downsample2x(jnp.asarray(x)))
    assert y.shape == (1, 3, 4, 1)
    # block mean
    assert y[0, 0, 0, 0] == pytest.approx((0 + 1 + 8 + 9) / 4)
    # coordinate contract: on a linear ramp f(x_hi) = x_hi, pooled pixel j
    # holds the ramp's value at x_hi = 2j + 0.5 — the mapping the hi-res
    # pipeline inverts
    ramp = np.broadcast_to(np.arange(8, dtype=np.float32)[None, :],
                           (6, 8)).reshape(1, 6, 8, 1)
    r = np.asarray(downsample2x(jnp.asarray(ramp)))
    np.testing.assert_allclose(r[0, 0, :, 0], 2 * np.arange(4) + 0.5)


def test_downsample2x_rejects_odd_dims():
    with pytest.raises(ValueError, match="even"):
        downsample2x(jnp.zeros((1, 5, 8, 1)))


def test_hires_forward_shapes_and_units():
    det = Detector(n_ids=N_IDS, dtype=jnp.float32)
    rn = RefineNet(dtype=jnp.float32, patch_size=32, offset_head=True)
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 1)))
    rv = rn.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 1)))
    frames_hi = np.random.default_rng(0).integers(
        0, 255, (2, 192, 192), np.uint8)
    for mode in ("soft", "avg"):
        kp, valid, refined = two_stage_forward_hires(
            det, rn, dv, rv, frames_hi, N_IDS, rn_decode=mode)
        # detector grid is the POOLED 96×96 view → low-res units
        assert kp.shape == (2, N_IDS, 2)
        assert np.asarray(kp).max() < 96
        assert refined.shape == (2, N_IDS, 2)
        assert np.isfinite(np.asarray(refined)).all()
        # refined stays within ~the low-res frame bounds
        assert np.asarray(refined).max() < 97


def test_frame_patch_synthesizer_at_scale_2():
    from deepcharuco_tpu.data.device_synth import FramePatchSynthesizer

    cfg2 = scaled_config(default_config(), 2)
    synth = FramePatchSynthesizer(cfg2, patch_size=32, jitter_px=4.0)
    patches, heats = synth.batch_fn(16)(jax.random.PRNGKey(0))
    assert patches.shape == (16, 32, 32, 1)
    assert heats.shape == (16, 64, 64, 1)
    p, h = np.asarray(patches), np.asarray(heats)
    assert np.isfinite(p).all()
    # each target is a normalized Gaussian with its peak on-grid
    assert (h.reshape(16, -1).max(-1) > 0.5).all()


def test_train_refinenet_cli_frame_scale(tmp_path, capsys):
    """--frame-scale 2 trains the hi-res tap end-to-end for a couple of
    steps (tiny config keeps CPU synthesis cheap)."""
    import yaml

    from deepcharuco_tpu.cli.train_refinenet import main

    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(yaml.safe_dump(dict(
        board_name="DICT_4X4_50", row_count=5, col_count=5,
        square_len=0.01, marker_len=0.0075, input_size=[160, 120])))
    main(["--config", str(cfg), "--steps", "2", "--eval-every", "2",
          "--eval-batches", "1", "--batch-size", "8",
          "--device-synth", "--frame-patches", "--patch-size", "32",
          "--frame-scale", "2", "--offset-weight", "0.25",
          "--logdir", str(tmp_path / "logs"),
          "--ckpt-dir", str(tmp_path / "ckpts")])
    out = capsys.readouterr().out
    assert "best checkpoint" in out


def test_eval_cli_hires(capsys):
    from deepcharuco_tpu.cli.eval import main

    out = main(["--samples", "16", "--source", "device", "--truth", "subpixel",
                "--hires", "--rn-patch-size", "32", "--rn-avg"])
    captured = capsys.readouterr().out
    assert "refined corner error" in captured
    assert 0.0 <= out["recall"] <= 1.0


def test_hires_requires_device_subpixel():
    from deepcharuco_tpu.cli.eval import main

    with pytest.raises(SystemExit):
        main(["--samples", "16", "--source", "device", "--hires"])


def test_benchmark_cli_hires(tmp_path, capsys):
    """--hires drives two_stage_forward_hires through the benchmark CLI
    (tiny config; correctness smoke, not a timing)."""
    import yaml

    from deepcharuco_tpu.cli.benchmark import main

    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(yaml.safe_dump(dict(
        board_name="DICT_4X4_50", row_count=5, col_count=5,
        square_len=0.01, marker_len=0.0075, input_size=[160, 120])))
    main(["--config", str(cfg), "--batch", "2", "--iters", "2",
          "--warmup", "1", "--hires", "--rn-patch-size", "32"])
    assert "hires tap" in capsys.readouterr().out
    with pytest.raises(SystemExit):
        main(["--config", str(cfg), "--hires", "--breakdown"])


def test_camera_scaled_matches_pool_convention():
    """Projecting with Camera.scaled(0.5) must land exactly where the
    downsample2x coordinate contract puts the hi-res projection:
    x_lo = (x_hi − 0.5)/2."""
    from deepcharuco_tpu.pipeline import Camera

    cam = Camera(K=np.array([[600.0, 0, 321.3], [0, 590.0, 237.9],
                             [0, 0, 1]], np.float32),
                 dist=np.zeros(12, np.float32))
    lo = cam.scaled(0.5)
    pts = np.array([[0.1, -0.05, 1.0], [-0.2, 0.15, 2.0]], np.float32)
    for X, Y, Z in pts:
        x_hi = cam.K[0, 0] * X / Z + cam.K[0, 2]
        y_hi = cam.K[1, 1] * Y / Z + cam.K[1, 2]
        x_lo = lo.K[0, 0] * X / Z + lo.K[0, 2]
        y_lo = lo.K[1, 1] * Y / Z + lo.K[1, 2]
        assert x_lo == pytest.approx((x_hi - 0.5) / 2, abs=1e-4)
        assert y_lo == pytest.approx((y_hi - 0.5) / 2, abs=1e-4)


def test_pipeline_hires_detect_and_pose():
    """hires=True product path: detect() and detect_with_pose() accept
    2×-resolution frames and report low-res-unit outputs."""
    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.pipeline import Camera, InferencePipeline

    cfg = default_config()
    det = Detector(n_ids=cfg.n_ids, dtype=jnp.float32)
    rn = RefineNet(dtype=jnp.float32, patch_size=32, offset_head=True)
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 1)))
    rv = rn.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 1)))
    w, h = cfg.input_size
    cam = Camera(K=np.array([[600.0, 0, w], [0, 600.0, h], [0, 0, 1]],
                            np.float32),
                 dist=np.zeros(12, np.float32))
    pipe = InferencePipeline(cfg, dv, rv, camera=cam, rn_patch_size=32,
                             rn_decode="avg", compute_dtype=jnp.float32,
                             hires=True)
    frames_hi = np.random.default_rng(0).integers(
        0, 255, (2, 2 * h, 2 * w), np.uint8)
    kp, valid, refined = pipe.detect(frames_hi)
    assert kp.shape == (2, cfg.n_ids, 2) and refined.shape == (2, cfg.n_ids, 2)
    assert kp.max() < w  # low-res units
    out = pipe.detect_with_pose(frames_hi)
    assert len(out) == 7
    assert all(np.isfinite(o).all() for o in out[:3])


def test_pipeline_hires_guards():
    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.pipeline import InferencePipeline

    cfg = default_config()
    det = Detector(n_ids=cfg.n_ids, dtype=jnp.float32)
    rn = RefineNet(dtype=jnp.float32)
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 1)))
    rv = rn.init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 1)))
    with pytest.raises(ValueError, match="RefineNet"):
        InferencePipeline(cfg, dv, None, hires=True)
    with pytest.raises(ValueError, match="decode_capacity"):
        InferencePipeline(cfg, dv, rv, hires=True, decode_capacity=4)


def test_infer_cli_hires(tmp_path, capsys):
    """infer --hires prints corners in INPUT-frame pixels (not pooled units)."""
    import cv2

    from deepcharuco_tpu import board as B
    from deepcharuco_tpu.cli.infer import main
    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.models import RefineNet
    from deepcharuco_tpu.pipeline import variables_to_npz

    rn = RefineNet(patch_size=32)
    rnp = str(tmp_path / "rn32.npz")
    variables_to_npz(rnp, rn.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 32, 32, 1))))
    cfg = default_config()
    bimg, _ = B.board_image(B.get_board(cfg), (400, 400),
                            cfg.row_count, cfg.col_count)
    frame = np.full((480, 640, 3), 90, np.uint8)
    frame[40:440, 120:520] = bimg
    img = str(tmp_path / "hi.png")
    cv2.imwrite(img, frame)
    main([img, "--refinenet", rnp, "--rn-patch-size", "32", "--hires",
          "--out-dir", str(tmp_path / "out")])
    assert (tmp_path / "out" / "hi.png").exists()
    capsys.readouterr()


def test_pose_video_cli_hires(tmp_path):
    """pose_video --hires end-to-end on 2x-resolution frames (+ --ransac)."""
    import cv2

    from deepcharuco_tpu.cli.pose_video import main
    from deepcharuco_tpu.models import RefineNet
    from deepcharuco_tpu.pipeline import variables_to_npz

    rn = RefineNet(patch_size=32)
    rnp = str(tmp_path / "rn32.npz")
    variables_to_npz(rnp, rn.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 32, 32, 1))))
    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        cv2.imwrite(str(frames / f"{i:03d}.png"),
                    rng.integers(0, 255, (480, 640, 3)).astype(np.uint8))
    out = str(tmp_path / "res.mp4")
    main([str(frames), "--refinenet", rnp, "--rn-patch-size", "32",
          "--hires", "--batch", "2", "--out", out])
    assert os.path.getsize(out) > 0
    out2 = str(tmp_path / "res2.mp4")
    main([str(frames), "--refinenet", rnp, "--rn-patch-size", "32",
          "--hires", "--ransac", "--batch", "2", "--out", out2])
    assert os.path.getsize(out2) > 0


# ---------------------------------------------------------------------------
# 4x tap (round 4): one more pooling octave, same contract composed twice
# ---------------------------------------------------------------------------

def test_downsample_composed_4x_coordinate_convention():
    """Two 2x2 pools compose to x_hi = 4*x_lo + 1.5 on a linear ramp — the
    mapping two_stage_forward_hires(scale=4) inverts."""
    ramp = np.broadcast_to(np.arange(16, dtype=np.float32)[None, :],
                           (8, 16)).reshape(1, 8, 16, 1)
    r = np.asarray(downsample2x(downsample2x(jnp.asarray(ramp))))
    np.testing.assert_allclose(r[0, 0, :, 0], 4 * np.arange(4) + 1.5)


def test_hires_scale4_forward_shapes_and_units():
    det = Detector(n_ids=N_IDS, dtype=jnp.float32)
    rn = RefineNet(dtype=jnp.float32, patch_size=32, offset_head=True)
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 1)))
    rv = rn.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 1)))
    frames_hi = np.random.default_rng(0).integers(
        0, 255, (2, 192, 192), np.uint8)
    kp, valid, refined = two_stage_forward_hires(
        det, rn, dv, rv, frames_hi, N_IDS, rn_decode="avg", scale=4)
    # detector grid is the 4x-pooled 48x48 view -> low-res units
    assert kp.shape == (2, N_IDS, 2)
    assert np.asarray(kp).max() < 48
    assert np.isfinite(np.asarray(refined)).all()
    assert np.asarray(refined).max() < 49


def test_hires_rejects_unsupported_scale():
    det = Detector(n_ids=N_IDS, dtype=jnp.float32)
    rn = RefineNet(dtype=jnp.float32)
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 1)))
    rv = rn.init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 1)))
    frames = np.zeros((1, 96, 96), np.uint8)
    with pytest.raises(ValueError, match="scale 2 or 4"):
        two_stage_forward_hires(det, rn, dv, rv, frames, N_IDS, scale=3)
    from deepcharuco_tpu.pipeline import InferencePipeline
    with pytest.raises(ValueError, match="True/2/4"):
        InferencePipeline(default_config(), dv, rv, hires=3)


def test_pipeline_hires_scale4_detect_and_input_coords():
    """hires=4 product path: detect() takes 4x frames; input_coords maps
    pooled-view units back by x_hi = 4*x_lo + 1.5."""
    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.pipeline import Camera, InferencePipeline

    cfg = default_config()
    det = Detector(n_ids=cfg.n_ids, dtype=jnp.float32)
    rn = RefineNet(dtype=jnp.float32, patch_size=32, offset_head=True)
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 1)))
    rv = rn.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 1)))
    w, h = cfg.input_size
    cam = Camera(K=np.array([[1200.0, 0, 2 * w], [0, 1200.0, 2 * h],
                             [0, 0, 1]], np.float32),
                 dist=np.zeros(12, np.float32))
    pipe = InferencePipeline(cfg, dv, rv, camera=cam, rn_patch_size=32,
                             rn_decode="avg", compute_dtype=jnp.float32,
                             hires=4)
    frames_hi = np.random.default_rng(0).integers(
        0, 255, (1, 4 * h, 4 * w), np.uint8)
    kp, valid, refined = pipe.detect(frames_hi)
    assert kp.shape == (1, cfg.n_ids, 2) and kp.max() < w  # low-res units
    np.testing.assert_allclose(pipe.input_coords(np.array([[3.0, 5.0]])),
                               [[13.5, 21.5]])
    out = pipe.detect_with_pose(frames_hi)
    assert len(out) == 7


def test_camera_scaled_quarter_matches_composed_pool_convention():
    """Camera.scaled(0.25) must land where the composed 4x pool contract
    puts the projection: x_lo = (x_hi - 1.5)/4."""
    from deepcharuco_tpu.pipeline import Camera

    cam = Camera(K=np.array([[600.0, 0, 321.3], [0, 590.0, 237.9],
                             [0, 0, 1]], np.float32),
                 dist=np.zeros(12, np.float32))
    lo = cam.scaled(0.25)
    for X, Y, Z in [(0.1, -0.05, 1.0), (-0.2, 0.15, 2.0)]:
        x_hi = cam.K[0, 0] * X / Z + cam.K[0, 2]
        x_lo = lo.K[0, 0] * X / Z + lo.K[0, 2]
        assert x_lo == pytest.approx((x_hi - 1.5) / 4, abs=1e-4)


def test_eval_cli_hires_scale4(capsys):
    from deepcharuco_tpu.cli.eval import main

    out = main(["--samples", "16", "--source", "device", "--truth", "subpixel",
                "--hires", "4", "--rn-patch-size", "32", "--rn-avg"])
    captured = capsys.readouterr().out
    assert "refined corner error" in captured
    assert 0.0 <= out["recall"] <= 1.0
