"""End-to-end checkpoint loading: a synthetic Lightning .ckpt (torch pickle,
'model.'-prefixed state dict — the reference's published format) must load
through load_pipeline and produce the same outputs as the source weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deepcharuco_tpu.configs import default_config  # noqa: E402
from deepcharuco_tpu.models import Detector, RefineNet  # noqa: E402
from deepcharuco_tpu.compat import (  # noqa: E402
    detector_state_dict_from_variables,
    refinenet_state_dict_from_variables,
)
from deepcharuco_tpu.pipeline import load_pipeline  # noqa: E402

CFG = default_config()


def _write_lightning_ckpt(path, sd):
    torch.save(
        {"state_dict": {f"model.{k}": torch.from_numpy(np.asarray(v).copy())
                        for k, v in sd.items()},
         "epoch": 99},
        path,
    )


def test_load_pipeline_from_lightning_ckpts(tmp_path):
    det = Detector(n_ids=CFG.n_ids, dtype=jnp.float32)
    rn = RefineNet(dtype=jnp.float32)
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 240, 320, 1)))
    rv = rn.init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 1)))

    d_path = str(tmp_path / "deepc.ckpt")
    r_path = str(tmp_path / "refinenet.ckpt")
    _write_lightning_ckpt(d_path, detector_state_dict_from_variables(dv))
    _write_lightning_ckpt(r_path, refinenet_state_dict_from_variables(rv))

    pipe = load_pipeline(CFG, d_path, r_path, compute_dtype=jnp.float32)
    frames = np.random.default_rng(0).integers(0, 255, (1, 240, 320, 3)).astype(np.uint8)
    kp, valid, refined = pipe.detect(frames)

    # Reference: same weights applied directly
    from deepcharuco_tpu.pipeline import two_stage_forward

    ref = jax.jit(lambda dv, rv, x: two_stage_forward(
        Detector(n_ids=CFG.n_ids, dtype=jnp.float32),
        RefineNet(dtype=jnp.float32), dv, rv, x, CFG.n_ids
    ))(dv, rv, jnp.asarray(frames))
    np.testing.assert_array_equal(kp, np.asarray(ref[0]))
    np.testing.assert_array_equal(valid, np.asarray(ref[1]))
    np.testing.assert_allclose(refined, np.asarray(ref[2]), atol=1e-5)


def test_load_pipeline_from_orbax_dir(tmp_path):
    from deepcharuco_tpu.train.checkpoints import CheckpointManager

    det = Detector(n_ids=CFG.n_ids, dtype=jnp.float32)
    dv = det.init(jax.random.PRNGKey(2), jnp.zeros((1, 240, 320, 1)))
    mgr = CheckpointManager(str(tmp_path / "ck"), top_k=2)
    mgr.save("step_42", {"params": dv["params"], "batch_stats": dv["batch_stats"]},
             metric=0.5)

    pipe = load_pipeline(CFG, str(tmp_path / "ck" / "step_42"),
                         compute_dtype=jnp.float32)
    frames = np.zeros((1, 240, 320, 3), np.uint8)
    kp, valid, refined = pipe.detect(frames)
    assert kp.shape == (1, 16, 2)


def test_save_lightning_checkpoint_roundtrip(tmp_path):
    """TPU-trained weights exported back to the reference's .ckpt format must
    reload identically through the compat path."""
    from deepcharuco_tpu.compat import save_lightning_checkpoint

    det = Detector(n_ids=CFG.n_ids, dtype=jnp.float32)
    dv = det.init(jax.random.PRNGKey(7), jnp.zeros((1, 48, 48, 1)))
    path = str(tmp_path / "export.ckpt")
    save_lightning_checkpoint(path, dv, "detector")

    pipe = load_pipeline(CFG, path, compute_dtype=jnp.float32)
    frames = np.random.default_rng(1).integers(0, 255, (1, 240, 320, 3)).astype(np.uint8)
    kp, valid, refined = pipe.detect(frames)

    from deepcharuco_tpu.pipeline import two_stage_forward
    import jax as _jax

    ref = _jax.jit(lambda dv, x: two_stage_forward(
        Detector(n_ids=CFG.n_ids, dtype=jnp.float32), None, dv, None, x, CFG.n_ids
    ))(dv, jnp.asarray(frames))
    np.testing.assert_array_equal(kp, np.asarray(ref[0]))
    np.testing.assert_array_equal(valid, np.asarray(ref[1]))
