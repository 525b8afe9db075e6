"""CLI smoke tests — drive each entry point's main() on tiny workloads."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _board_frame(tmp_path, name="frame_000.png", size=(320, 240)):
    from deepcharuco_tpu import board as B
    from deepcharuco_tpu.configs import default_config

    cfg = default_config()
    brd = B.get_board(cfg)
    mins = min(size)
    bimg, _ = B.board_image(brd, (mins, mins), cfg.row_count, cfg.col_count)
    frame = np.full((size[1], size[0], 3), 90, np.uint8)
    x0 = (size[0] - mins) // 2
    frame[:mins, x0:x0 + mins] = bimg
    path = str(tmp_path / name)
    cv2.imwrite(path, frame)
    return path


def test_infer_cli(tmp_path, capsys):
    from deepcharuco_tpu.cli.infer import main

    img = _board_frame(tmp_path)
    out_dir = str(tmp_path / "out")
    main([img, "--out-dir", out_dir])
    captured = capsys.readouterr()
    assert "corners" in captured.out
    assert os.path.exists(os.path.join(out_dir, os.path.basename(img)))


def test_infer_cli_cv2_baseline(tmp_path, capsys):
    from deepcharuco_tpu.cli.infer import main

    img = _board_frame(tmp_path)
    out_dir = str(tmp_path / "out")
    main([img, "--out-dir", out_dir, "--cv2-baseline"])
    vis = cv2.imread(os.path.join(out_dir, os.path.basename(img)))
    assert vis.shape[1] == 640  # side-by-side doubles the width


def test_pose_video_cli(tmp_path):
    from deepcharuco_tpu.cli.pose_video import main

    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(3):
        _board_frame(frames, name=f"f_{i:03d}.png")
    out = str(tmp_path / "res.mp4")
    main([str(frames), "--out", out, "--batch", "2"])
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_calib_cli(tmp_path, capsys):
    from deepcharuco_tpu.cli.calib_intrinsics import main

    # Render a synthetic 9x6-inner-corner chessboard at several poses
    cols, rows = 9, 6
    sq = 40
    board = np.zeros(((rows + 1) * sq, (cols + 1) * sq), np.uint8)
    for r in range(rows + 1):
        for c in range(cols + 1):
            if (r + c) % 2 == 0:
                board[r * sq:(r + 1) * sq, c * sq:(c + 1) * sq] = 255
    d = tmp_path / "calib"
    d.mkdir()
    h, w = 480, 640
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    for i, (dx, dy, s) in enumerate([(0, 0, 0.9), (30, 10, 0.8), (-20, 25, 1.0),
                                     (10, -15, 0.85), (-30, -10, 0.95)]):
        src = np.float32([[0, 0], [board.shape[1], 0],
                          [board.shape[1], board.shape[0]], [0, board.shape[0]]])
        bw, bh = board.shape[1] * s * 0.9, board.shape[0] * s * 0.9
        x0, y0 = (w - bw) / 2 + dx, (h - bh) / 2 + dy
        dst = np.float32([[x0, y0], [x0 + bw, y0 + 10 * s],
                          [x0 + bw - 15, y0 + bh], [x0 + 5, y0 + bh - 10 * s]])
        M = cv2.getPerspectiveTransform(src, dst)
        img = cv2.warpPerspective(board, M, (w, h), borderValue=128)
        cv2.imwrite(str(d / f"c_{i:03d}.png"), cv2.cvtColor(img, cv2.COLOR_GRAY2BGR))

    out = str(tmp_path / "cam.npz")
    main([str(d), "--stride", "1", "--out", out])
    data = np.load(out)
    assert data["camera_matrix"].shape == (3, 3)
    assert "reprojection" in capsys.readouterr().out


def test_eval_cli_device_source(capsys):
    from deepcharuco_tpu.cli.eval import main

    out = main(["--samples", "16", "--source", "device"])
    captured = capsys.readouterr().out
    assert "target corners" in captured
    assert out["recall"] >= 0.0


def test_train_cli_few_steps(tmp_path, capsys):
    from deepcharuco_tpu.cli.train import main

    main(["--steps", "2", "--eval-every", "2", "--eval-batches", "1",
          "--batch-size", "2", "--num-workers", "1",
          "--logdir", str(tmp_path / "logs"),
          "--ckpt-dir", str(tmp_path / "ckpts")])
    out = capsys.readouterr().out
    assert "best checkpoint" in out
    assert os.path.exists(tmp_path / "logs" / "scalars.jsonl")


def test_train_refinenet_cli_few_steps(tmp_path, capsys):
    from deepcharuco_tpu.cli.train_refinenet import main

    main(["--steps", "2", "--eval-every", "2", "--eval-batches", "1",
          "--batch-size", "8", "--total", "4", "--num-workers", "1",
          "--logdir", str(tmp_path / "logs"),
          "--ckpt-dir", str(tmp_path / "ckpts")])
    out = capsys.readouterr().out
    assert "best checkpoint" in out


def test_train_refinenet_cli_fused_device_synth(tmp_path, capsys):
    """--device-synth --fused-steps: scanned synthesis+step per dispatch."""
    from deepcharuco_tpu.cli.train_refinenet import main

    cfg = tmp_path / "tiny.yaml"
    cfg.write_text("board_name: DICT_4X4_50\nrow_count: 5\ncol_count: 5\n"
                   "square_len: 0.01\nmarker_len: 0.0075\ninput_size: [64, 48]\n")
    main(["--config", str(cfg), "--device-synth", "--fused-steps", "2",
          "--steps", "2", "--eval-every", "2", "--eval-batches", "1",
          "--batch-size", "8", "--total", "4",
          "--logdir", str(tmp_path / "logs"),
          "--ckpt-dir", str(tmp_path / "ckpts")])
    out = capsys.readouterr().out
    assert "fused program compiled" in out
    assert "best checkpoint" in out


def test_pose_video_cli_ransac(tmp_path):
    from deepcharuco_tpu.cli.pose_video import main

    frames = tmp_path / "frames_r"
    frames.mkdir()
    for i in range(2):
        _board_frame(frames, name=f"f_{i:03d}.png")
    out = str(tmp_path / "res_r.mp4")
    main([str(frames), "--out", out, "--batch", "2", "--ransac"])
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_pose_video_cli_smooth(tmp_path, capsys):
    """--smooth runs the temporal PoseFilter over the frame stream and
    reports the tracking/coasting/lost summary (behavioral contracts are
    unit-tested in test_pose_filter.py)."""
    from deepcharuco_tpu.cli.pose_video import main

    frames = tmp_path / "frames_s"
    frames.mkdir()
    for i in range(3):
        _board_frame(frames, name=f"f_{i:03d}.png")
    out = str(tmp_path / "res_s.mp4")
    main([str(frames), "--out", out, "--batch", "2", "--smooth"])
    assert os.path.exists(out) and os.path.getsize(out) > 0
    assert "pose filter:" in capsys.readouterr().out


def test_train_cli_mixed_diet(tmp_path, capsys):
    """Device-synth training with a host-pipeline batch every 2nd dispatch
    plus host-stream validation scalars (the round-2 mixed diet)."""
    from deepcharuco_tpu.cli.train import main

    main(["--steps", "2", "--eval-every", "2", "--eval-batches", "1",
          "--batch-size", "2", "--device-synth", "--mixed-host-every", "2",
          "--eval-host-batches", "1", "--num-workers", "1",
          "--conf-weight", "0.3",
          "--logdir", str(tmp_path / "logs"),
          "--ckpt-dir", str(tmp_path / "ckpts")])
    out = capsys.readouterr().out
    assert "mixed diet" in out
    assert "host_match=" in out
    assert "best checkpoint" in out


def test_train_cli_resume_full_fidelity(tmp_path, capsys):
    """--resume restores optimizer state + step from a new-format checkpoint."""
    from deepcharuco_tpu.cli.train import main

    common = ["--eval-batches", "1", "--batch-size", "2", "--device-synth",
              "--logdir", str(tmp_path / "logs"),
              "--ckpt-dir", str(tmp_path / "ckpts")]
    main(["--steps", "2", "--eval-every", "2", *common])
    main(["--steps", "1", "--eval-every", "1", "--resume", "step_0000002",
          *common])
    out = capsys.readouterr().out
    assert "with optimizer state" in out
    # resumed checkpoints carry GLOBAL step names — the series is extended
    # (step_0000003), not overwritten from step_0000001
    assert os.path.isdir(tmp_path / "ckpts" / "step_0000003")
    assert os.path.isdir(tmp_path / "ckpts" / "step_0000002")


def test_train_cli_device_synth_fused(tmp_path, capsys):
    from deepcharuco_tpu.cli.train import main

    main(["--steps", "1", "--eval-every", "1", "--eval-batches", "1",
          "--batch-size", "2", "--device-synth", "--fused-steps", "2",
          "--logdir", str(tmp_path / "logs"),
          "--ckpt-dir", str(tmp_path / "ckpts")])
    out = capsys.readouterr().out
    assert "fused program compiled" in out
    assert "best checkpoint" in out


def test_eval_cli_frontal_probe(capsys):
    """--frontal --scale 1.0: the in-distribution frontal probe runs and
    reports; geometry is axis-snapped at full frame scale with the standard
    photometric pipeline (VERDICT r2 weak #3's honest probe)."""
    from deepcharuco_tpu.cli.eval import main

    out = main(["--samples", "16", "--source", "device", "--frontal",
                "--scale", "1.0"])
    captured = capsys.readouterr().out
    assert "target corners" in captured
    assert 0.0 <= out["recall"] <= 1.0


def test_train_cli_bg_bank_and_perspective(tmp_path, capsys):
    """--device-synth with the round-3 diet flags (bank, perspective,
    scale-max) runs end-to-end for a couple of steps."""
    from deepcharuco_tpu.cli.train import main

    main(["--steps", "2", "--eval-every", "2", "--eval-batches", "1",
          "--batch-size", "2", "--device-synth", "--bg-bank", "2",
          "--perspective-p", "0.5", "--scale-max", "1.05",
          "--axis-snap-p", "0.2",
          "--logdir", str(tmp_path / "logs"),
          "--ckpt-dir", str(tmp_path / "ckpts")])
    out = capsys.readouterr().out
    assert "best checkpoint" in out


def test_eval_cli_rn_avg_decode(capsys):
    """--rn-avg: averaged heatmap-soft-argmax + offset-branch decode runs
    with random offset-head weights and reports finite errors."""
    from deepcharuco_tpu.cli.eval import main

    out = main(["--samples", "16", "--source", "device", "--truth", "subpixel",
                "--rn-avg", "--rn-patch-size", "32"])
    captured = capsys.readouterr().out
    assert "refined corner error" in captured
    assert 0.0 <= out["recall"] <= 1.0


def test_view_cli_dataset_grid(tmp_path):
    """Grid viewer (reference GridWindow flows, src/data.py:77-86): one
    dataset contact-sheet page renders and lands on disk."""
    from deepcharuco_tpu.cli.view import main

    out = str(tmp_path / "grid")
    main(["--what", "dataset", "--n", "2", "--cols", "2", "--pages", "1",
          "--out", out, "--validation"])
    img = cv2.imread(out + "_p0.png")
    assert img is not None and img.shape[0] > 100


def test_benchmark_cli_fetch_refined(tmp_path, capsys):
    """--fetch refined (= bench.py's exact completion payload, BENCH_NOTES
    'harness reconciliation, part 2') must drive the timed loop end-to-end;
    combined with --geom-decode it also exercises the rs=32 default."""
    import yaml

    from deepcharuco_tpu.cli.benchmark import main

    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(yaml.safe_dump(dict(
        board_name="DICT_4X4_50", row_count=5, col_count=5,
        square_len=0.01, marker_len=0.0075, input_size=[160, 120])))
    main(["--config", str(cfg), "--batch", "2", "--iters", "3",
          "--warmup", "1", "--fetch", "refined", "--geom-decode"])
    out = capsys.readouterr().out
    assert "geom decode" in out and "fps" in out


def test_geom_ransac_default_consistent_everywhere():
    """The ransac_subsets default (32; BENCH_NOTES 'ransac_subsets default
    = 32') must agree across the op, the pipeline entry points, and both
    CLI argparsers — a drift here would silently benchmark one config and
    ship another."""
    import inspect

    from deepcharuco_tpu.cli.benchmark import build_argparser as bench_ap
    from deepcharuco_tpu.cli.eval import build_argparser as eval_ap
    from deepcharuco_tpu.ops.geom import reselect_by_homography
    from deepcharuco_tpu.pipeline import InferencePipeline, load_pipeline

    op_default = inspect.signature(
        reselect_by_homography).parameters["ransac_subsets"].default
    assert op_default == 32
    for fn in (load_pipeline, InferencePipeline.__init__):
        assert inspect.signature(
            fn).parameters["geom_ransac"].default == op_default
    for ap in (bench_ap(), eval_ap()):
        assert ap.get_default("geom_ransac") == op_default
