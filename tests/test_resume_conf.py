"""Round-2 training features: full-fidelity checkpoint resume (optimizer
state + step, Lightning ``resume_from_checkpoint`` semantics, ref
``src/train.py:42``) and the ids-head margin-calibration auxiliary loss."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deepcharuco_tpu.models import Detector
from deepcharuco_tpu.train import create_detector_state, make_detector_train_step
from deepcharuco_tpu.train.checkpoints import (
    CheckpointManager,
    flatten_opt_state,
    unflatten_opt_state,
)
from deepcharuco_tpu.train.steps import detector_loss_fn

HW = (48, 64)


@pytest.fixture(scope="module")
def tiny_batch():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, *HW, 1)).astype(np.float32))
    loc = jnp.asarray(rng.integers(0, 65, size=(2, HW[0] // 8, HW[1] // 8)))
    ids = jnp.asarray(rng.integers(0, 17, size=(2, HW[0] // 8, HW[1] // 8)))
    return images, loc, ids


def test_opt_state_flat_roundtrip():
    det = Detector(n_ids=16, dtype=jnp.float32)
    tx, state = create_detector_state(det, jax.random.PRNGKey(0), input_hw=HW,
                                      tx=optax.adam(1e-3))
    flat = flatten_opt_state(state.opt_state)
    assert all(isinstance(v, np.ndarray) for v in flat.values())
    back = unflatten_opt_state(state.opt_state, flat)
    assert jax.tree.structure(back) == jax.tree.structure(state.opt_state)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_training_exactly(tmp_path, tiny_batch):
    """A save/restore round trip through CheckpointManager must reproduce the
    *identical* continued trajectory — no Adam-moment reset, no loss bump."""
    images, loc, ids = tiny_batch
    det = Detector(n_ids=16, dtype=jnp.float32)
    tx = optax.adam(5e-3)
    _, state = create_detector_state(det, jax.random.PRNGKey(0), input_hw=HW,
                                     tx=tx)
    step = jax.jit(make_detector_train_step(det, tx))

    for _ in range(3):
        state, _ = step(state, images, loc, ids)

    mgr = CheckpointManager(str(tmp_path / "ck"), top_k=2)
    mgr.save("step_3", {"params": state.params,
                        "batch_stats": state.batch_stats,
                        "opt_state_flat": flatten_opt_state(state.opt_state),
                        "step": np.asarray(state.step)}, metric=1.0)

    # continue the original run two more steps — the golden trajectory
    gold = state
    gold_losses = []
    for _ in range(2):
        gold, aux = step(gold, images, loc, ids)
        gold_losses.append(float(aux["loss"]))

    # resume from the checkpoint into a FRESH state (as the CLI does)
    _, fresh = create_detector_state(det, jax.random.PRNGKey(99), input_hw=HW,
                                     tx=tx)
    restored = mgr.restore("step_3")
    fresh = fresh.replace(
        params=restored["params"], batch_stats=restored["batch_stats"],
        opt_state=unflatten_opt_state(fresh.opt_state,
                                      restored["opt_state_flat"]),
        step=jnp.asarray(restored["step"], jnp.int32))
    assert int(fresh.step) == 3
    for _ in range(2):
        fresh, aux = step(fresh, images, loc, ids)
    np.testing.assert_allclose(float(aux["loss"]), gold_losses[-1],
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree.leaves(fresh.params), jax.tree.leaves(gold.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_conf_loss_zero_weight_is_reference_parity(tiny_batch):
    images, loc, ids = tiny_batch
    det = Detector(n_ids=16, dtype=jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), jnp.zeros((1, *HW, 1)))
    l0, (aux0, _, _) = detector_loss_fn(det, variables["params"],
                                        variables["batch_stats"], images, loc,
                                        ids, train=False, conf_weight=0.0)
    assert "loss_conf" not in aux0
    l1, (aux1, _, _) = detector_loss_fn(det, variables["params"],
                                        variables["batch_stats"], images, loc,
                                        ids, train=False, conf_weight=0.5)
    assert "loss_conf" in aux1
    # untrained logits violate the margin everywhere → strictly larger loss
    assert float(l1) > float(l0)
    np.testing.assert_allclose(float(l1),
                               float(l0) + 0.5 * float(aux1["loss_conf"]),
                               rtol=1e-6)


def test_conf_loss_satisfied_margins_vanish(tiny_batch):
    """Hand-built ids logits that satisfy the margin must incur zero aux loss
    (checked through the same hinge math on a fabricated head output)."""
    _, loc, ids = tiny_batch
    n, hc, wc = ids.shape
    n_ids = 16
    margin = 4.0
    # perfect logits: true channel at +10, everything else at 0
    ids_hat = np.zeros((n, hc, wc, n_ids + 1), np.float32)
    flat_idx = np.asarray(ids).reshape(-1)
    ids_hat.reshape(-1, n_ids + 1)[np.arange(flat_idx.size), flat_idx] = 10.0
    ids_hat = jnp.asarray(ids_hat)

    dust = ids_hat[..., n_ids]
    best_id = jnp.max(ids_hat[..., :n_ids], axis=-1)
    is_bg = jnp.asarray(ids) == n_ids
    bg_viol = jax.nn.relu(best_id - dust + margin)
    true_logit = jnp.take_along_axis(ids_hat, jnp.asarray(ids)[..., None],
                                     axis=-1)[..., 0]
    onehot = jax.nn.one_hot(jnp.asarray(ids), n_ids + 1)
    rival = jnp.max(ids_hat - onehot * 1e9, axis=-1)
    fg_viol = jax.nn.relu(rival - true_logit + margin)
    loss_conf = jnp.mean(jnp.where(is_bg, bg_viol, fg_viol))
    # background cells: best id 0 vs dust 10 → 0-10+4 < 0 → clipped;
    # corner cells: true 10 vs best rival 0 → 0-10+4 < 0 → clipped.
    assert float(loss_conf) == 0.0
