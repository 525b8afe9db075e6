"""Multi-stream serving tests."""

import numpy as np
import jax
import jax.numpy as jnp

from deepcharuco_tpu.configs import default_config
from deepcharuco_tpu.models import Detector, RefineNet
from deepcharuco_tpu.pipeline import Camera, InferencePipeline
from deepcharuco_tpu.serving import (DeviceQueueServer, StreamServer,
                                     VideoStream, pipelined_map)

CFG = default_config()


def _pipe(with_camera=False):
    det = Detector(n_ids=CFG.n_ids, dtype=jnp.float32)
    rn = RefineNet(dtype=jnp.float32)
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 240, 320, 1)))
    rv = rn.init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 1)))
    cam = None
    if with_camera:
        K = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]], np.float32)
        cam = Camera(K=K, dist=np.zeros(5, np.float32))
    return InferencePipeline(CFG, dv, rv, camera=cam, compute_dtype=jnp.float32)


def test_pipelined_map_order_and_results(rng):
    fn = jax.jit(lambda x: jnp.sum(x, axis=(1, 2)))
    batches = [rng.normal(size=(2, 8, 8)).astype(np.float32) for _ in range(5)]
    outs = list(pipelined_map(fn, batches, depth=2))
    assert len(outs) == 5
    for b, o in zip(batches, outs):
        np.testing.assert_allclose(o, b.sum(axis=(1, 2)), rtol=1e-5)


def test_stream_server_multi_stream(rng):
    pipe = _pipe()
    n_frames = [3, 5, 2]
    streams = [
        VideoStream((rng.integers(0, 255, (240, 320, 3)).astype(np.uint8)
                     for _ in range(n)), name=f"s{i}")
        for i, n in enumerate(n_frames)
    ]
    server = StreamServer(pipe, streams)
    per_stream_counts = [0, 0, 0]
    for results in server.run():
        for idx, r in results.items():
            per_stream_counts[idx] += 1
            assert r["keypoints"].shape == (16, 2)
            assert r["valid"].shape == (16,)
    assert per_stream_counts == n_frames  # every frame of every stream served


def test_device_queue_server_matches_stream_server(rng):
    """Chunked device-queue serving yields the SAME per-step results as the
    per-step server: same steps, same stream indices, same values — on
    uneven stream lengths that exercise both padding paths (short batch
    inside a chunk, trailing partial chunk)."""
    pipe = _pipe()
    n_frames = [5, 3, 1]
    frames = [[rng.integers(0, 255, (240, 320, 3)).astype(np.uint8)
               for _ in range(n)] for n in n_frames]

    def make_streams():
        return [VideoStream(iter(f), name=f"s{i}")
                for i, f in enumerate(frames)]

    ref_steps = list(StreamServer(pipe, make_streams()).run())
    dq_steps = list(DeviceQueueServer(pipe, make_streams(), chunk=2).run())
    assert len(dq_steps) == len(ref_steps) == 5
    for ref, dq in zip(ref_steps, dq_steps):
        assert set(ref) == set(dq)
        for idx in ref:
            for k in ("keypoints", "valid", "refined"):
                np.testing.assert_array_equal(ref[idx][k], dq[idx][k])


def test_device_queue_server_with_pose(rng):
    pipe = _pipe(with_camera=True)
    streams = [VideoStream((np.zeros((240, 320, 3), np.uint8)
                            for _ in range(3)))]
    server = DeviceQueueServer(pipe, streams, chunk=4, with_pose=True)
    steps = list(server.run())
    assert len(steps) == 3
    assert "rvec" in steps[0][0] and steps[0][0]["rvec"].shape == (3,)


def test_stream_server_with_pose(rng):
    pipe = _pipe(with_camera=True)
    streams = [VideoStream((np.zeros((240, 320, 3), np.uint8) for _ in range(2)))]
    server = StreamServer(pipe, streams, with_pose=True)
    steps = list(server.run())
    assert len(steps) == 2
    assert "rvec" in steps[0][0] and steps[0][0]["rvec"].shape == (3,)


def test_hbm_budget_guard_vga_ceiling():
    """The measured VGA ceiling (batch 256 @640x480 needs 18.75 GB of
    15.75 GB HBM, BENCH_NOTES round-4) must fail fast with the documented
    explanation + suggested batch, not a raw XLA allocation error."""
    import pytest

    from deepcharuco_tpu.serving import (check_hbm_budget,
                                         two_stage_batch_ceiling)

    # chunk=16 x 8 streams (the measured-good config) fits
    check_hbm_budget(128, 480, 640)
    # chunk=32 x 8 streams (the measured OOM) is rejected with the ceiling
    with pytest.raises(ValueError, match="GB of two-stage activations"):
        check_hbm_budget(256, 480, 640)
    # the model's ceiling must sit inside the measured bracket:
    # 128 @VGA ran, 256 @VGA OOMed
    ceil = two_stage_batch_ceiling(480, 640)
    assert 128 <= ceil < 256
    check_hbm_budget(ceil, 480, 640)  # the stated ceiling itself fits
    # the headline 320x240 batch-256 config is far inside budget
    check_hbm_budget(256, 240, 320)


def test_device_queue_server_rejects_oversized_chunk():
    """DeviceQueueServer itself (not just the CLI) guards the first launch."""
    import pytest

    frames = [np.zeros((480, 640), np.uint8)] * 2
    streams = [VideoStream(iter(frames), name=f"s{i}") for i in range(8)]
    server = DeviceQueueServer(_pipe(), streams, chunk=32)
    with pytest.raises(ValueError, match="DeviceQueueServer chunk=32"):
        next(server.run())


def test_hbm_guard_budgets_hires_at_pooled_resolution():
    """A hires pipeline's detector runs on the pooled view, so chunk x
    streams that would overflow at raw VGA must pass when hires_scale=2
    (round-4 measured hires-2 VGA batches run fine where two-stage VGA
    OOMs)."""

    class _FakeHiresPipe:
        hires_scale = 2
        det_vars = rn_vars = None

        def _two_stage(self, dv, rv, x):
            n = x.shape[0]
            z = np.zeros((n, 16, 2), np.float32)
            return z, np.zeros((n, 16), bool), z

    frames = [np.zeros((480, 640), np.uint8)] * 32
    streams = [VideoStream(iter(frames), name=f"s{i}") for i in range(8)]
    # 32 x 8 = 256 raw-VGA frames: rejected for a base pipeline (see
    # test_device_queue_server_rejects_oversized_chunk) but inside budget
    # at the pooled 320x240 view
    server = DeviceQueueServer(_FakeHiresPipe(), streams, chunk=32)
    steps = list(server.run())
    assert len(steps) == 32 * 8 / 8  # 32 steps of 8 streams
