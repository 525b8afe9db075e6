"""Direct offset-regression branch (round-3 accuracy lever, VERDICT r2
weak #2): RefineNet(offset_head=True) regresses the corner's continuous
(dx, dy) image-px offset from the patch center straight off the bottleneck
features — the grid-free alternative to the reference's 1/8-px heatmap
argmax decode (``src/models/refinenet.py:111-114``)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deepcharuco_tpu.models import RefineNet
from deepcharuco_tpu.ops import refine_keypoints_offset
from deepcharuco_tpu.train import create_refinenet_state
from deepcharuco_tpu.train.steps import make_refinenet_train_step, refinenet_loss_fn


def _gaussian_heat(centers, sigma=2.0):
    """(N,2) continuous 64-grid centers → (N,64,64,1) unit-peak Gaussians
    (the device-synth continuous-target label shape)."""
    ys, xs = jnp.mgrid[0:64, 0:64]
    d2 = ((xs[None] - centers[:, 0, None, None]) ** 2
          + (ys[None] - centers[:, 1, None, None]) ** 2)
    return jnp.exp(-d2 / (2 * sigma * sigma))[..., None].astype(jnp.float32)


def test_offset_head_output_shapes_and_parity_path_untouched():
    rn = RefineNet(dtype=jnp.float32, offset_head=True)
    x = jnp.zeros((3, 24, 24, 1), jnp.float32)
    v = rn.init(jax.random.PRNGKey(0), x)
    out = rn.apply(v, x)
    assert set(out) == {"heat", "offset"}
    assert out["heat"].shape == (3, 64, 64, 1)
    assert out["offset"].shape == (3, 2)

    # same input through the heatmap trunk of a plain net with the shared
    # subset of weights gives the identical heatmap — the branch is additive
    plain = RefineNet(dtype=jnp.float32)
    pv = plain.init(jax.random.PRNGKey(0), x)
    shared = {k: v["params"][k] for k in pv["params"]}
    heat_plain = plain.apply(
        {"params": shared, "batch_stats":
         {k: v["batch_stats"][k] for k in pv["batch_stats"]}}, x)
    np.testing.assert_allclose(np.asarray(out["heat"]),
                               np.asarray(heat_plain), atol=1e-6)


def test_offset_head_warm_starts_from_heatmap_checkpoint():
    from deepcharuco_tpu.pipeline import merge_variables

    rn24 = RefineNet(dtype=jnp.float32)
    v24 = rn24.init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 1)))
    rn_off = RefineNet(dtype=jnp.float32, offset_head=True)
    v_off = rn_off.init(jax.random.PRNGKey(2), jnp.zeros((1, 24, 24, 1)))
    merged, loaded, skipped = merge_variables(
        {"params": v_off["params"], "batch_stats": v_off["batch_stats"]}, v24)
    # every heatmap-trunk array loads; only the offset branch stays fresh
    assert any("convPb" in p for p in loaded)
    assert not any("denseO" in p or "convOa" in p for p in loaded)
    out = rn_off.apply(merged, jnp.zeros((1, 24, 24, 1)))
    assert out["offset"].shape == (1, 2)


def test_offset_loss_zero_when_branch_predicts_target():
    """The loss's soft-argmax-recovered target must equal the decode-time
    semantics: offset = (continuous 64-grid center − 32)/8 image px."""
    centers = jnp.array([[32.0, 32.0], [44.8, 24.4]], jnp.float32)
    heat = _gaussian_heat(centers)
    true_off = (centers - 32.0) / 8.0

    rn = RefineNet(dtype=jnp.float32, offset_head=True)
    v = rn.init(jax.random.PRNGKey(0), jnp.zeros((2, 24, 24, 1)))
    patches = jax.random.uniform(jax.random.PRNGKey(3), (2, 24, 24, 1))
    _, (aux, _, _) = refinenet_loss_fn(
        rn, v["params"], v["batch_stats"], patches, heat,
        train=False, offset_weight=1.0)
    # the loss's target is the soft-argmax recovery of the label Gaussian —
    # grid discretization biases it ≲0.015 px off the continuous center
    # (negligible vs the 0.3 px accuracy target)
    from deepcharuco_tpu.ops.decode import soft_argmax_2d

    rec = (soft_argmax_2d(heat) - 32.0) / 8.0
    np.testing.assert_allclose(np.asarray(rec), np.asarray(true_off),
                               atol=2e-2)
    out = rn.apply(v, patches)
    expected = float(jnp.mean(jnp.sum((out["offset"] - rec) ** 2, -1)))
    assert aux["loss_offset"] == pytest.approx(expected, rel=1e-4, abs=1e-5)


def test_offset_branch_learns_and_decode_maps_back():
    """A few Adam steps on a fixed batch must shrink the offset loss, and
    refine_keypoints_offset must map branch output back to image coords."""
    rn = RefineNet(dtype=jnp.float32, offset_head=True)
    tx = optax.adam(1e-3)
    tx, state = create_refinenet_state(rn, jax.random.PRNGKey(0), tx=tx)
    step = jax.jit(make_refinenet_train_step(rn, tx, offset_weight=1.0))

    centers = jnp.array([[30.0, 35.0], [36.0, 28.0]], jnp.float32)
    heat = _gaussian_heat(centers)
    patches = jax.random.uniform(jax.random.PRNGKey(7), (2, 24, 24, 1))

    losses = []
    for _ in range(12):
        state, aux = step(state, patches, heat)
        losses.append(float(aux["loss_offset"]))
    assert losses[-1] < losses[0] * 0.5, losses

    kp = jnp.array([[[10.0, 20.0]]], jnp.float32)
    off = jnp.array([[[0.25, -0.5]]], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(refine_keypoints_offset(off, kp)),
        np.array([[[10.25, 19.5]]]), atol=1e-6)
