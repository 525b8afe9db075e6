"""scripts/soup.py — weight-space interpolation utility."""

import numpy as np

from deepcharuco_tpu.pipeline import variables_from_npz


def test_soup_writes_linear_interpolation(tmp_path):
    import jax
    import jax.numpy as jnp

    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.models import Detector
    from deepcharuco_tpu.pipeline import variables_to_npz
    from scripts.soup import main

    cfg = default_config()
    det = Detector(n_ids=cfg.n_ids, dtype=jnp.float32)
    x = jnp.zeros((1, 48, 48, 1), jnp.float32)
    va = det.init(jax.random.PRNGKey(0), x)
    vb = det.init(jax.random.PRNGKey(1), x)
    pa, pb = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    variables_to_npz(pa, va)
    variables_to_npz(pb, vb)

    main([pa, pb, "--alphas", "0.25", "--out", str(tmp_path / "soup")])

    soup = variables_from_npz(str(tmp_path / "soup_a25.npz"))
    leaf = lambda v: np.asarray(  # noqa: E731
        v["params"]["conv1a"]["conv"]["kernel"], np.float64)
    np.testing.assert_allclose(
        leaf(soup), 0.75 * leaf(va) + 0.25 * leaf(vb), rtol=1e-4, atol=1e-6)
    bn = lambda v: np.asarray(  # noqa: E731
        v["batch_stats"]["conv1a"]["bn"]["mean"], np.float64)
    np.testing.assert_allclose(bn(soup), 0.75 * bn(va) + 0.25 * bn(vb),
                               rtol=1e-4, atol=1e-6)
