"""Training step tests: loss parity with torch CE/MSE semantics, gradient
descent sanity, and the sharded multi-chip path on the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from deepcharuco_tpu.models import Detector, RefineNet
from deepcharuco_tpu.train import (
    create_detector_state,
    create_refinenet_state,
    detector_loss_fn,
    make_detector_train_step,
    make_refinenet_train_step,
)
from deepcharuco_tpu.parallel import make_mesh, replicate, shard_batch, sharded_train_step

HW = (48, 64)  # small for test speed
HC, WC = HW[0] // 8, HW[1] // 8


def _batch(rng, n=4):
    images = rng.normal(size=(n, *HW, 1)).astype(np.float32)
    loc = rng.integers(0, 65, size=(n, HC, WC))
    ids = rng.integers(0, 17, size=(n, HC, WC))
    return jnp.asarray(images), jnp.asarray(loc), jnp.asarray(ids)


def test_detector_loss_matches_torch_cross_entropy(rng):
    import torch
    import torch.nn.functional as F

    det = Detector(n_ids=16, dtype=jnp.float32)
    tx, state = create_detector_state(det, jax.random.PRNGKey(0), input_hw=HW)
    images, loc, ids = _batch(rng)
    loss, (aux, _, out) = detector_loss_fn(det, state.params, state.batch_stats,
                                           images, loc, ids, train=False)
    # torch CE over NCHW logits with class-index target (ref net.py:152-153)
    loc_t = torch.from_numpy(np.asarray(out["loc"]).transpose(0, 3, 1, 2))
    ids_t = torch.from_numpy(np.asarray(out["ids"]).transpose(0, 3, 1, 2))
    ref_loc = F.cross_entropy(loc_t, torch.from_numpy(np.asarray(loc)).long())
    ref_ids = F.cross_entropy(ids_t, torch.from_numpy(np.asarray(ids)).long())
    np.testing.assert_allclose(float(aux["loss_loc"]), float(ref_loc), rtol=1e-5)
    np.testing.assert_allclose(float(aux["loss_ids"]), float(ref_ids), rtol=1e-5)


def test_detector_train_step_reduces_loss(rng):
    det = Detector(n_ids=16, dtype=jnp.float32)
    tx, state = create_detector_state(det, jax.random.PRNGKey(0), input_hw=HW)
    step = jax.jit(make_detector_train_step(det, tx))
    images, loc, ids = _batch(rng, n=2)
    losses = []
    for _ in range(12):
        state, aux = step(state, images, loc, ids)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses
    assert int(state.step) == 12


def test_refinenet_train_step_reduces_loss(rng):
    rn = RefineNet(dtype=jnp.float32)
    tx, state = create_refinenet_state(rn, jax.random.PRNGKey(0),
                                       tx=optax.adam(1e-3))
    step = jax.jit(make_refinenet_train_step(rn, tx))
    patches = jnp.asarray(rng.normal(size=(4, 24, 24, 1)).astype(np.float32))
    heat = jnp.asarray(rng.uniform(0, 1, size=(4, 64, 64, 1)).astype(np.float32))
    losses = []
    for _ in range(10):
        state, aux = step(state, patches, heat)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0]


def test_refinenet_coord_loss(rng):
    """Soft-argmax coordinate auxiliary: zero when the predicted heatmap IS
    the target, positive and equal to the squared image-px offset when the
    peak is shifted."""
    from deepcharuco_tpu.ops.heatmap import gaussian_heatmap
    from deepcharuco_tpu.train.steps import refinenet_loss_fn

    rn = RefineNet(dtype=jnp.float32)
    tx, state = create_refinenet_state(rn, jax.random.PRNGKey(0))
    patches = jnp.asarray(rng.normal(size=(2, 24, 24, 1)).astype(np.float32))

    def mk(centers):
        return jnp.stack([gaussian_heatmap(cx, cy, 64, 2.0, jnp)
                          for cx, cy in centers])[..., None]

    target = mk([(30.25, 33.5), (28.0, 36.75)])

    # identical pred/target → loss_coord ≈ 0 (probe the loss fn directly)
    from deepcharuco_tpu.ops.decode import soft_argmax_2d

    same = soft_argmax_2d(target) - soft_argmax_2d(target)
    assert float(jnp.abs(same).max()) == 0.0
    _, (aux, _, _) = refinenet_loss_fn(rn, state.params, state.batch_stats,
                                       patches, target, train=False,
                                       coord_weight=1.0)
    assert "loss_coord" in aux and np.isfinite(float(aux["loss_coord"]))

    # a 2-grid-px (0.25 image px) peak shift costs ~0.25² in the coord term
    shifted = mk([(32.25, 33.5), (30.0, 36.75)])
    pred_xy = soft_argmax_2d(shifted) / 8.0
    true_xy = soft_argmax_2d(target) / 8.0
    sq = float(jnp.mean(jnp.sum((pred_xy - true_xy) ** 2, -1)))
    np.testing.assert_allclose(sq, 0.0625, atol=0.005)

    # and the step trains with it enabled
    step = jax.jit(make_refinenet_train_step(rn, tx, coord_weight=0.1))
    state2, aux2 = step(state, patches, target)
    assert np.isfinite(float(aux2["loss"])) and "loss_coord" in aux2


def test_sharded_detector_train_step_8_devices(rng):
    """DP×SP mesh (4×2) over the virtual CPU devices: one real sharded step,
    numerically equal to the single-device step."""
    assert len(jax.devices()) == 8
    det = Detector(n_ids=16, dtype=jnp.float32)
    # SGD for the equality check: Adam's first step is ~sign(grad), which
    # amplifies float reduction-order noise into full-lr differences.
    tx, state = create_detector_state(det, jax.random.PRNGKey(0), input_hw=HW,
                                      tx=optax.sgd(0.1))
    images, loc, ids = _batch(rng, n=8)

    # single-device result
    ref_state, ref_aux = jax.jit(make_detector_train_step(det, tx))(
        state, images, loc, ids
    )

    mesh = make_mesh(n_data=4, n_spatial=2)
    with mesh:
        sstate = replicate(mesh, state)
        batch = shard_batch(mesh, (images, loc, ids))
        step = sharded_train_step(make_detector_train_step(det, tx), mesh)
        new_state, aux = step(sstate, *batch)

    np.testing.assert_allclose(float(aux["loss"]), float(ref_aux["loss"]), rtol=1e-5)
    # parameters identical to the single-device step
    flat_ref = jax.tree.leaves(ref_state.params)
    flat_new = jax.tree.leaves(new_state.params)
    for a, b in zip(flat_ref, flat_new):
        # float reduction-order noise across shardings; 1e-4 ≪ the 0.1 lr step
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_sharded_step_data_parallel_only(rng):
    mesh = make_mesh(n_data=8, n_spatial=1)
    det = Detector(n_ids=16, dtype=jnp.float32)
    tx, state = create_detector_state(det, jax.random.PRNGKey(0), input_hw=HW)
    images, loc, ids = _batch(rng, n=8)
    with mesh:
        sstate = replicate(mesh, state)
        batch = shard_batch(mesh, (images, loc, ids))
        step = sharded_train_step(make_detector_train_step(det, tx), mesh)
        new_state, aux = step(sstate, *batch)
    assert np.isfinite(float(aux["loss"]))


def test_conf_topk_excludes_corner_adjacent_cells():
    """The top-k hard-offender pool must skip the 3x3 neighborhood of true
    corner cells (mining those suppressed real detections — round-2 negative
    result). A violation ADJACENT to a corner adds nothing; the SAME
    violation far away adds loss."""
    import jax
    import jax.numpy as jnp

    from deepcharuco_tpu.models import Detector
    from deepcharuco_tpu.train.steps import detector_loss_fn

    n_ids = 16
    det = Detector(n_ids=n_ids, dtype=jnp.float32)

    hc, wc = 6, 8
    loc = np.full((1, hc, wc), 64, np.int64)
    ids = np.full((1, hc, wc), n_ids, np.int64)
    loc[0, 2, 2] = 3          # one true corner at cell (2, 2)
    ids[0, 2, 2] = 5

    class _Fake:
        """Stand-in for Detector.apply returning fixed logits."""

        def __init__(self, out):
            self.out = out

        def apply(self, variables, images, train=False, mutable=None):
            return (self.out, {"batch_stats": {}}) if train else self.out

    def make_out(offender_rc):
        loc_hat = np.zeros((1, hc, wc, 65), np.float32)
        ids_hat = np.zeros((1, hc, wc, n_ids + 1), np.float32)
        loc_hat[..., 64] = 10.0       # loc dustbin everywhere
        ids_hat[..., n_ids] = 10.0    # ids dustbin everywhere
        loc_hat[0, 2, 2, 64] = 0.0
        loc_hat[0, 2, 2, 3] = 10.0    # true corner correct
        ids_hat[0, 2, 2, n_ids] = 0.0
        ids_hat[0, 2, 2, 5] = 10.0
        r, c = offender_rc            # a bg cell violating both hinges
        loc_hat[0, r, c, 7] = 30.0
        ids_hat[0, r, c, 9] = 30.0
        return {"loc": jnp.asarray(loc_hat), "ids": jnp.asarray(ids_hat)}

    kw = dict(conf_weight=1.0, conf_margin=4.0, train=False)
    base_adj, _ = detector_loss_fn(_Fake(make_out((2, 3))), None, {},
                                   None, jnp.asarray(loc), jnp.asarray(ids),
                                   conf_topk=0, **kw)
    topk_adj, _ = detector_loss_fn(_Fake(make_out((2, 3))), None, {},
                                   None, jnp.asarray(loc), jnp.asarray(ids),
                                   conf_topk=4, **kw)
    base_far, _ = detector_loss_fn(_Fake(make_out((5, 7))), None, {},
                                   None, jnp.asarray(loc), jnp.asarray(ids),
                                   conf_topk=0, **kw)
    topk_far, _ = detector_loss_fn(_Fake(make_out((5, 7))), None, {},
                                   None, jnp.asarray(loc), jnp.asarray(ids),
                                   conf_topk=4, **kw)
    # adjacent offender: excluded from the pool — no extra loss
    assert abs(float(topk_adj) - float(base_adj)) < 1e-6
    # far offender: mined — extra loss strictly positive
    assert float(topk_far) - float(base_far) > 1.0


def test_conf_fg_topk_mines_worst_corner_cells():
    """Foreground hard mining (--conf-fg-topk): a TRUE-corner cell whose ids
    head argmaxes the dustbin (the round-3 frontal pathology) must add loss
    beyond the mean hinge; with every corner satisfied it adds nothing."""
    import jax.numpy as jnp

    from deepcharuco_tpu.train.steps import detector_loss_fn

    n_ids = 16
    hc, wc = 6, 8
    loc = np.full((1, hc, wc), 64, np.int64)
    ids = np.full((1, hc, wc), n_ids, np.int64)
    for k, (r, c) in enumerate([(1, 1), (1, 5), (4, 1), (4, 5)]):
        loc[0, r, c] = 3
        ids[0, r, c] = k

    class _Fake:
        def __init__(self, out):
            self.out = out

        def apply(self, variables, images, train=False, mutable=None):
            return (self.out, {"batch_stats": {}}) if train else self.out

    def make_out(confused):
        loc_hat = np.zeros((1, hc, wc, 65), np.float32)
        ids_hat = np.zeros((1, hc, wc, n_ids + 1), np.float32)
        loc_hat[..., 64] = 10.0
        ids_hat[..., n_ids] = 10.0
        for k, (r, c) in enumerate([(1, 1), (1, 5), (4, 1), (4, 5)]):
            loc_hat[0, r, c, 64] = 0.0
            loc_hat[0, r, c, 3] = 10.0
            ids_hat[0, r, c, n_ids] = 0.0
            ids_hat[0, r, c, k] = 10.0
        if confused:  # corner (1,1): ids head prefers the dustbin (margin -20)
            ids_hat[0, 1, 1, 0] = -10.0
            ids_hat[0, 1, 1, n_ids] = 10.0
        return {"loc": jnp.asarray(loc_hat), "ids": jnp.asarray(ids_hat)}

    kw = dict(conf_weight=1.0, conf_margin=4.0, train=False)
    args = (None, {}, None, jnp.asarray(loc), jnp.asarray(ids))
    sat_base, _ = detector_loss_fn(_Fake(make_out(False)), *args,
                                   conf_fg_topk=0, **kw)
    sat_fg, _ = detector_loss_fn(_Fake(make_out(False)), *args,
                                 conf_fg_topk=2, **kw)
    # all corners satisfied: fg mining adds exactly nothing
    assert abs(float(sat_fg) - float(sat_base)) < 1e-6
    bad_base, _ = detector_loss_fn(_Fake(make_out(True)), *args,
                                   conf_fg_topk=0, **kw)
    bad_fg, _ = detector_loss_fn(_Fake(make_out(True)), *args,
                                 conf_fg_topk=2, **kw)
    # the confused corner's margin violation (24) is mined at ~1/k weight
    # beyond its mean-hinge contribution
    assert float(bad_fg) - float(bad_base) > 5.0
