"""Model shape/structure tests (canonical sizes from the reference __main__
blocks: detector (1,1,240,320), refinenet (1,1,24,24))."""

import jax
import jax.numpy as jnp
import numpy as np

from deepcharuco_tpu.models import Detector, RefineNet


def test_detector_shapes():
    model = Detector(n_ids=16, dtype=jnp.float32)
    x = jnp.zeros((2, 240, 320, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["loc"].shape == (2, 30, 40, 65)
    assert out["ids"].shape == (2, 30, 40, 17)
    assert out["loc"].dtype == jnp.float32


def test_detector_param_count():
    """The encoder+heads should carry the same parameter count as the torch
    model (torchinfo summary of dcModel(n_ids=16) counts conv+bn params)."""
    model = Detector(n_ids=16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 240, 320, 1)))
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))

    def conv_p(cin, cout, k):
        return cin * cout * k * k + cout

    def bn_p(c):
        return 2 * c

    expected = (
        conv_p(1, 64, 3) + bn_p(64) + conv_p(64, 64, 3) + bn_p(64)
        + conv_p(64, 64, 3) + bn_p(64) + conv_p(64, 64, 3) + bn_p(64)
        + conv_p(64, 128, 3) + bn_p(128) + conv_p(128, 128, 3) + bn_p(128)
        + conv_p(128, 128, 3) + bn_p(128) + conv_p(128, 128, 3) + bn_p(128)
        + conv_p(128, 256, 3) + bn_p(256) + conv_p(256, 65, 1)
        + conv_p(128, 256, 3) + bn_p(256) + conv_p(256, 17, 1)
    )
    assert n_params == expected


def test_refinenet_shapes():
    model = RefineNet(dtype=jnp.float32)
    x = jnp.zeros((3, 24, 24, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (3, 64, 64, 1)


def test_refinenet_bilinear_mode_shares_checkpoints():
    """The bilinear decoder is parameter-free: the SAME variables run in
    both modes (distinct outputs, identical shapes/param tree)."""
    import numpy as np

    near = RefineNet(dtype=jnp.float32)
    bilin = RefineNet(dtype=jnp.float32, upsample="bilinear")
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(2, 24, 24, 1)).astype(np.float32))
    variables = near.init(jax.random.PRNGKey(0), x)
    out_n = near.apply(variables, x)
    out_b = bilin.apply(variables, x)   # same weights, different decoder
    assert out_b.shape == out_n.shape == (2, 64, 64, 1)
    assert np.isfinite(np.asarray(out_b)).all()
    assert np.abs(np.asarray(out_b) - np.asarray(out_n)).max() > 0
    assert (jax.tree.structure(bilin.init(jax.random.PRNGKey(0), x))
            == jax.tree.structure(variables))


def test_detector_train_mode_updates_batch_stats():
    model = Detector(n_ids=16, dtype=jnp.float32)
    x = jnp.ones((2, 48, 48, 1), jnp.float32) * 0.3
    variables = model.init(jax.random.PRNGKey(0), x)
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["conv1a"]["bn"]["mean"]
    after = mutated["batch_stats"]["conv1a"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_refinenet_fully_convolutional_spatial_map():
    """VALID convs shrink 24→16 before the pool; check an alternate input size
    keeps the 24→64 (8/3×) relation implied by the architecture."""
    model = RefineNet(dtype=jnp.float32)
    x = jnp.zeros((1, 24, 24, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape[1:3] == (64, 64)


def test_refinenet_patch32_variant():
    """patch_size=32: (N,32,32,1) → (N,64,64,1); every 24-model parameter
    keeps its name so shipped 24-checkpoints warm-start the shared layers
    (merge_variables), with only conv2c/conv2d (+BN) fresh."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepcharuco_tpu.models import RefineNet
    from deepcharuco_tpu.pipeline import merge_variables

    rn24 = RefineNet(dtype=jnp.float32)
    rn32 = RefineNet(dtype=jnp.float32, patch_size=32)
    v24 = rn24.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 1)))
    v32 = rn32.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 1)))

    p24 = set(v24["params"].keys())
    p32 = set(v32["params"].keys())
    assert p32 - p24 == {"conv2c", "conv2d"}
    assert p24 <= p32

    merged, loaded, skipped = merge_variables(dict(v32), dict(v24))
    assert len(loaded) > 0
    assert all("conv2c" in s or "conv2d" in s for s in skipped)
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["conv1a"]["conv"]["kernel"]),
        np.asarray(v24["params"]["conv1a"]["conv"]["kernel"]))

    out = rn32.apply(merged, jnp.zeros((2, 32, 32, 1)))
    assert out.shape == (2, 64, 64, 1)
