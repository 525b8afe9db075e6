"""Metric parity vs a python re-statement of the reference metric loops, and
checkpoint top-k retention behavior."""

import numpy as np
import jax.numpy as jnp

from deepcharuco_tpu.train.metrics import (
    MeanAccumulator,
    detector_metrics,
    refinenet_metric,
)
from deepcharuco_tpu.train.checkpoints import CheckpointManager

N_IDS = 16


def _maps_from_kpts(kpts_by_id, hc=6, wc=8):
    """Build (loc, ids) label maps placing each id at its keypoint."""
    loc = np.full((hc, wc), 64, np.int32)
    ids = np.full((hc, wc), N_IDS, np.int32)
    for k, (x, y) in kpts_by_id.items():
        cx, cy = x // 8, y // 8
        loc[cy, cx] = (x % 8) + 8 * (y % 8)
        ids[cy, cx] = k
    return loc, ids


def _logits_from_maps(loc, ids):
    hc, wc = loc.shape
    loc_hat = np.zeros((hc, wc, 65), np.float32)
    ids_hat = np.zeros((hc, wc, N_IDS + 1), np.float32)
    for r in range(hc):
        for c in range(wc):
            loc_hat[r, c, loc[r, c]] = 9.0
            ids_hat[r, c, ids[r, c]] = 9.0
    return loc_hat, ids_hat


def test_detector_metrics_hand_computed():
    # target: ids 0@(10,10), 1@(30,20); pred: 0@(12,11) (d≈2.24, match),
    # 1@(37,24) (d≈8.06, no match), 5 spurious@(50,40)
    tgt_loc, tgt_ids = _maps_from_kpts({0: (10, 10), 1: (30, 20)})
    prd_loc, prd_ids = _maps_from_kpts({0: (12, 11), 1: (37, 24), 5: (50, 40)})
    loc_hat, ids_hat = _logits_from_maps(prd_loc, prd_ids)

    m = detector_metrics(jnp.asarray(loc_hat[None]), jnp.asarray(ids_hat[None]),
                         jnp.asarray(tgt_loc[None]), jnp.asarray(tgt_ids[None]),
                         N_IDS)
    d0 = np.hypot(2, 1)
    d1 = np.hypot(7, 4)
    np.testing.assert_allclose(float(m["l2_pixels"]), (d0 + d1) / 2, rtol=1e-6)
    np.testing.assert_allclose(float(m["match_ratio"]), 0.5, rtol=1e-6)


def test_detector_metrics_empty_target():
    tgt_loc, tgt_ids = _maps_from_kpts({})
    prd_loc, prd_ids = _maps_from_kpts({3: (20, 20)})
    loc_hat, ids_hat = _logits_from_maps(prd_loc, prd_ids)
    m = detector_metrics(jnp.asarray(loc_hat[None]), jnp.asarray(ids_hat[None]),
                         jnp.asarray(tgt_loc[None]), jnp.asarray(tgt_ids[None]),
                         N_IDS)
    assert np.isfinite(float(m["l2_pixels"]))
    assert float(m["l2_pixels"]) == 0.0


def test_refinenet_metric():
    a = np.zeros((2, 64, 64, 1), np.float32)
    b = np.zeros((2, 64, 64, 1), np.float32)
    a[0, 10, 20, 0] = 1
    b[0, 13, 24, 0] = 1  # d = 5
    a[1, 0, 0, 0] = 1
    b[1, 0, 0, 0] = 1  # d = 0
    m = refinenet_metric(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(float(m), 2.5, rtol=1e-6)


def test_mean_accumulator():
    acc = MeanAccumulator()
    acc.update(loss=1.0)
    acc.update(loss=3.0, extra=10.0)
    out = acc.compute()
    assert out["loss"] == 2.0 and out["extra"] == 10.0
    acc.reset()
    assert acc.compute() == {}


def test_checkpoint_topk_retention(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpts"), top_k=2)
    state = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    mgr.save("step_1", state, metric=5.0)
    mgr.save("step_2", state, metric=3.0)
    mgr.save("step_3", state, metric=4.0)  # evicts step_1 (worst=5.0)
    assert set(mgr.index) == {"step_2", "step_3"}
    assert mgr.best_checkpoint() == "step_2"
    assert mgr.latest_checkpoint() == "step_3"

    restored = mgr.restore("step_2")
    np.testing.assert_array_equal(restored["w"], state["w"])


def test_checkpoint_roundtrip_train_state(tmp_path):
    import jax
    from deepcharuco_tpu.models import RefineNet
    from deepcharuco_tpu.train import create_refinenet_state

    rn = RefineNet(dtype=jnp.float32)
    _, state = create_refinenet_state(rn, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "c"), top_k=3)
    mgr.save("s1", {"params": state.params, "batch_stats": state.batch_stats},
             metric=1.0)
    back = mgr.restore("s1")
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(back["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
