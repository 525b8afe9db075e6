"""Test config: run all tests on CPU-backend JAX with 8 virtual devices.

Must execute before the first ``import jax`` anywhere in the test session so
the platform/device-count flags take effect (mirrors how the driver validates
multi-chip sharding without real chips).
"""

import os

# The session environment pins JAX_PLATFORMS=axon (the real TPU tunnel) and
# the axon plugin re-asserts it through jax.config at interpreter start, so
# both the env var AND the config flag must be overridden for tests to run
# on the virtual 8-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402


# Tests measured ≥10 s per call on the 1-core host (full-suite duration
# profile, `RUN_SLOW=1 pytest --durations=0`, 2026-08-19: 2,488 s of test
# calls; the ≥12 s band alone left the default run at 9:37 — too little
# margin under the <10 min budget, hence the 10–12 s band too).
# Centralized here rather than decorating 15 files; every entry still
# runs under RUN_SLOW=1. Fast smoke-level variants of the geom behavioral
# pins were considered and measured infeasible: even a ransac_subsets=8
# reselect jit costs 23 s of COMPILE on this host (the unrolled small-
# matrix eigensolves dominate, not the work), so any geom smoke lands in
# the slow band by construction. Deliberately NOT listed despite qualifying:
# test_graft_entry.py::test_entry_compiles_and_runs (12.2 s, pins a
# driver gate), test_golden.py::test_pipeline_matches_golden (11.2 s,
# pins the shipped artifacts), and the two test_lowlight_diet.py contract
# pins (12-13 s each, pin the round-5 low-gain knob's bit-identity and
# label-invariance) stay in the default subset. When a test's cost
# changes materially, re-profile and update this list.
_SLOW = {
    "test_device_synth.py::test_device_synth_negative_probability",
    "test_frame_patches.py::test_frame_patch_label_inverts_refine_mapping",
    "test_hires_tap.py::test_hires_forward_shapes_and_units",
    "test_lowlight_diet.py::test_train_cli_accepts_low_gain_flags",
    "test_other_boards.py::test_device_synth_small_board",
    "test_pipeline.py::test_full_forward_pose_outputs",
    "test_pipeline.py::test_inference_pipeline_class",
    "test_pnp.py::test_solve_pnp_batch",
    "test_pnp_ransac.py::test_ransac_batch",
    "test_quant.py::test_int8_decode_agrees_with_f32_on_shipped_weights",
    "test_quant.py::test_qvars_npz_roundtrip_and_load_pipeline_autodetect",
    "test_quant.py::test_int8_composes_with_hires_tap",
    "test_rn_decode.py::test_rn_decode_offset_dce_drops_heatmap_pyramid",
    "test_cli.py::test_eval_cli_device_source",
    "test_cli.py::test_eval_cli_frontal_probe",
    "test_cli.py::test_eval_cli_rn_avg_decode",
    "test_cli.py::test_pose_video_cli",
    "test_cli.py::test_pose_video_cli_ransac",
    "test_cli.py::test_pose_video_cli_smooth",
    "test_cli.py::test_train_cli_bg_bank_and_perspective",
    "test_cli.py::test_train_cli_device_synth_fused",
    "test_cli.py::test_train_cli_few_steps",
    "test_cli.py::test_train_cli_mixed_diet",
    "test_cli.py::test_train_cli_resume_full_fidelity",
    "test_cli.py::test_train_refinenet_cli_fused_device_synth",
    "test_device_synth.py::test_axis_snap_produces_axis_aligned_boards",
    "test_device_synth.py::test_background_bank_mixes_without_touching_labels",
    "test_device_synth.py::test_background_bank_probability_zero_is_procedural",
    "test_device_synth.py::test_device_synth_batch_contract",
    "test_device_synth.py::test_device_synth_deterministic_by_key",
    "test_device_synth.py::test_device_synth_labels_decode_in_bounds",
    "test_device_synth.py::test_fused_synth_train_step_runs",
    "test_device_synth.py::test_perspective_warp_geometry_and_alignment",
    "test_frame_patches.py::test_continuous_vs_rounded_targets",
    "test_full_chain_parity.py::test_full_chain_matches_reference_loop",
    "test_geom_decode.py::test_eval_cli_geom_decode",
    "test_geom_decode.py::test_eval_cli_geom_fill",
    "test_geom_decode.py::test_geom_loc_gate_override_recovers_suppressed_corner",
    "test_geom_decode.py::test_geom_matches_plain_on_clean_input",
    "test_geom_decode.py::test_hires_geom_fill_pipeline",
    "test_geom_decode.py::test_pipeline_geom_decode_integration",
    "test_geom_decode.py::test_pose_ignores_filled_corners",
    "test_geom_decode.py::test_reselect_guard_keeps_top1_when_underdetermined",
    "test_geom_decode.py::test_reselect_ransac_rejects_decoy_constellation",
    "test_geom_decode.py::test_reselect_recovers_displaced_and_rejects_decoys",
    "test_geom_decode.py::test_reselect_self_consistency_gate_falls_back_to_parity",
    "test_graft_entry.py::test_dryrun_multichip_8",
    "test_hires_tap.py::test_eval_cli_hires",
    "test_hires_tap.py::test_eval_cli_hires_scale4",
    "test_hires_tap.py::test_pipeline_hires_detect_and_pose",
    "test_hires_tap.py::test_pipeline_hires_scale4_detect_and_input_coords",
    "test_hires_tap.py::test_pose_video_cli_hires",
    "test_hires_tap.py::test_train_refinenet_cli_frame_scale",
    "test_other_boards.py::test_pipeline_on_small_board",
    "test_pallas_fused.py::test_fused_path_agrees_with_production_on_trained_weights",
    "test_real_image.py::test_geom_fill_completes_the_board",
    "test_serving.py::test_device_queue_server_matches_stream_server",
    "test_serving.py::test_device_queue_server_with_pose",
    "test_sharded_inference.py::test_full_forward_with_pose_sharded",
    "test_sharded_inference.py::test_geom_decode_fill_sharded_matches_single_device",
    "test_sharded_training.py::test_cli_train_device_synth_data_parallel_composes",
    "test_sharded_training.py::test_fused_synth_step_matches_single_device",
    "test_sharded_training.py::test_fused_synth_step_partitioned_and_runs",
    "test_train.py::test_sharded_detector_train_step_8_devices",
}


def pytest_collection_modifyitems(config, items):
    """Default run = fast subset (<10 min on the 1-core host). The tests
    in ``_SLOW`` (long device-synth/train/CLI integration runs) need
    ``RUN_SLOW=1 python -m pytest tests/ -q`` — the documented full suite."""
    for item in items:
        rel = item.nodeid.split("/")[-1]
        if rel in _SLOW:
            item.add_marker(pytest.mark.slow)
    if os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow: run with RUN_SLOW=1 for full suite")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
