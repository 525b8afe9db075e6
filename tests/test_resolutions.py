"""Resolution generality (BASELINE config #5: multi-stream 640×480): the
fully-convolutional pipeline must serve other frame sizes unchanged."""

import numpy as np
import jax
import jax.numpy as jnp

from deepcharuco_tpu.configs import default_config
from deepcharuco_tpu.models import Detector, RefineNet
from deepcharuco_tpu.pipeline import two_stage_forward
from deepcharuco_tpu.serving import StreamServer, VideoStream
from deepcharuco_tpu.pipeline import InferencePipeline

CFG = default_config()


def test_two_stage_640x480(rng):
    det = Detector(n_ids=CFG.n_ids, dtype=jnp.float32)
    rn = RefineNet(dtype=jnp.float32)
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 1)))
    rv = rn.init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 1)))
    frames = rng.integers(0, 255, (1, 480, 640, 3)).astype(np.uint8)
    kp, valid, refined = jax.jit(
        lambda dv, rv, x: two_stage_forward(det, rn, dv, rv, x, CFG.n_ids)
    )(dv, rv, jnp.asarray(frames))
    assert kp.shape == (1, 16, 2)
    k = np.asarray(kp)[np.asarray(valid)]
    if k.size:
        assert (k[:, 0] < 640).all() and (k[:, 1] < 480).all()


def test_multi_stream_mixed_use_640(rng):
    det = Detector(n_ids=CFG.n_ids, dtype=jnp.float32)
    rn = RefineNet(dtype=jnp.float32)
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 1)))
    rv = rn.init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 1)))
    pipe = InferencePipeline(CFG, dv, rv, compute_dtype=jnp.float32)
    streams = [
        VideoStream((rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
                     for _ in range(2)), name=f"cam{i}") for i in range(2)
    ]
    server = StreamServer(pipe, streams)
    steps = list(server.run())
    assert len(steps) == 2
    assert steps[0][0]["keypoints"].shape == (16, 2)
