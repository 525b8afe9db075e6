"""Optax training steps for the detector and RefineNet.

Loss parity with the reference Lightning wrappers:
- Detector: ``cross_entropy(loc_hat, loc) + cross_entropy(ids_hat, ids)`` over
  class-index label maps, Adam lr=5e-3 (``src/models/net.py:148-161``).
- RefineNet: MSE on the 64×64 heatmap, Adam lr=1e-4
  (``src/models/refinenet.py:163-179``).

TPU-first: steps are pure functions of a :class:`TrainState` pytree, so the
same jitted step runs single-chip or under a ``jax.sharding.Mesh`` with the
batch sharded over ``('data', 'spatial')`` axes — XLA inserts the gradient
all-reduces and BatchNorm's cross-shard statistics automatically from the
sharding annotations (no hand-written collectives at this model scale; see
``deepcharuco_tpu.parallel``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from deepcharuco_tpu.models import Detector, RefineNet


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


# ---------------------------------------------------------------------------
# State creation
# ---------------------------------------------------------------------------

def create_detector_state(det: Detector, rng, input_hw=(240, 320),
                          tx: Optional[optax.GradientTransformation] = None):
    variables = det.init(rng, jnp.zeros((1, *input_hw, 1), jnp.float32))
    tx = tx if tx is not None else optax.adam(5e-3)
    return tx, TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )


def create_refinenet_state(rn: RefineNet, rng,
                           tx: Optional[optax.GradientTransformation] = None):
    ps = getattr(rn, "patch_size", 24)
    variables = rn.init(rng, jnp.zeros((1, ps, ps, 1), jnp.float32))
    tx = tx if tx is not None else optax.adam(1e-4)
    return tx, TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def detector_loss_fn(det: Detector, params, batch_stats, images, loc_labels,
                     ids_labels, train: bool = True,
                     conf_weight: float = 0.0, conf_margin: float = 4.0,
                     conf_topk: int = 0, conf_fg_topk: int = 0):
    """CE(loc) + CE(ids); labels are (N, Hc, Wc) int maps (ref net.py:148-153,
    label construction data.py:14-51). Returns (loss, (aux, new_batch_stats)).

    ``conf_weight > 0`` adds a margin-calibration auxiliary on the ids head,
    targeting the decode's one failure mode the plain CE leaves open: a
    *background* cell whose best id logit beats its dustbin logit wins the
    per-id argmax whenever the true cell misses, producing a wrong-cell
    outlier tens of px away (1.7% of detections in round 1). The hinge pushes
    every background cell's best id logit at least ``conf_margin`` under its
    dustbin logit, and every corner cell's true logit at least ``conf_margin``
    over its best rival — so the reference-parity decode (``min_margin=None``)
    is clean at the source instead of filtered after the fact. CE saturates
    and stops ordering logits long before this hinge is satisfied, which is
    why the outliers survive CE-only training.
    """
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, mutated = det.apply(variables, images, train=True,
                                 mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    else:
        out = det.apply(variables, images)
        new_stats = batch_stats
    loss_loc = optax.softmax_cross_entropy_with_integer_labels(
        out["loc"], loc_labels
    ).mean()
    loss_ids = optax.softmax_cross_entropy_with_integer_labels(
        out["ids"], ids_labels
    ).mean()
    loss = loss_loc + loss_ids
    aux = {"loss": loss, "loss_loc": loss_loc, "loss_ids": loss_ids}
    if conf_weight > 0.0:
        ids_hat = out["ids"]                      # (N, Hc, Wc, n_ids+1)
        n_ids = ids_hat.shape[-1] - 1
        dust = ids_hat[..., n_ids]
        best_id = jnp.max(ids_hat[..., :n_ids], axis=-1)
        is_bg = ids_labels == n_ids
        # background: best id logit must trail dustbin by >= margin
        bg_viol = jax.nn.relu(best_id - dust + conf_margin)
        # corner cell: true id logit must lead every rival by >= margin
        true_logit = jnp.take_along_axis(
            ids_hat, ids_labels[..., None], axis=-1)[..., 0]
        onehot = jax.nn.one_hot(ids_labels, n_ids + 1, dtype=ids_hat.dtype)
        rival = jnp.max(ids_hat - onehot * jnp.float32(1e9), axis=-1)
        fg_viol = jax.nn.relu(rival - true_logit + conf_margin)
        loss_conf = jnp.mean(jnp.where(is_bg, bg_viol, fg_viol))
        # The decode admits a wrong-cell only when BOTH heads clear their
        # dustbins (pred_argmax gates ids on loc_pix != 64), so calibrate
        # the LOC head's dustbin on background cells too. No fg-side loc
        # hinge: sub-cell position classes are legitimately ambiguous at
        # ±1 px and a margin there would fight the CE.
        loc_hat = out["loc"]                      # (N, Hc, Wc, 65)
        loc_dust = loc_hat[..., 64]
        best_pos = jnp.max(loc_hat[..., :64], axis=-1)
        loc_bg_viol = jax.nn.relu(best_pos - loc_dust + conf_margin)
        loss_conf = loss_conf + jnp.mean(jnp.where(is_bg, loc_bg_viol, 0.0))
        if conf_topk > 0:
            # Hard-offender mining: the mean over ~1200 bg cells dilutes the
            # hinge gradient ~1200× per offender — exactly why a handful of
            # wrong-cells survive mean-hinge training while pushing the
            # weight up suppresses real corners. A top-k mean over each
            # image's WORST bg cells concentrates gradient on the actual
            # offenders (satisfied cells contribute exactly 0) and leaves
            # the fg margins untouched.
            #
            # Corner-neighborhood exclusion (round 3, fixes the round-2
            # negative result — BENCH_NOTES "Top-k hard-offender hinge"):
            # without it the top-k pool is dominated by cells ADJACENT to
            # true corners, where the real response legitimately bleeds
            # across the stride-8 cell borders; mining those suppressed
            # real detections through shared features (recall 0.96 → 0.82).
            # Dilating the corner map 3×3 and mining only OUTSIDE it leaves
            # exactly the genuinely-far offenders — the wrong-cell outliers
            # tens of px away the hinge exists to kill.
            n = ids_hat.shape[0]
            corner = (~is_bg).astype(jnp.float32)          # (N, Hc, Wc)
            p = jnp.pad(corner, ((0, 0), (1, 1), (1, 1)))
            near_corner = jnp.zeros_like(corner)
            for dy in range(3):
                for dx in range(3):
                    near_corner = jnp.maximum(
                        near_corner,
                        p[:, dy:dy + corner.shape[1], dx:dx + corner.shape[2]])
            minable = is_bg & (near_corner == 0.0)
            worst = jnp.where(minable, bg_viol + loc_bg_viol, 0.0).reshape(n, -1)
            topk = jax.lax.top_k(worst, conf_topk)[0]      # (N, k)
            loss_conf = loss_conf + jnp.mean(topk)
        if conf_fg_topk > 0:
            # Foreground hard mining (round 3): the geom-decode pathology
            # dump showed the remaining frontal misses are TRUE-corner
            # cells whose ids head argmaxes the dustbin or a neighbor id —
            # a foreground margin failure the mean fg hinge dilutes over
            # every easy corner. Mining each image's worst corner cells
            # concentrates gradient on exactly those (frontal/foreshortened)
            # cells; satisfied corners contribute 0.
            n = ids_hat.shape[0]
            fg_worst = jnp.where(~is_bg, fg_viol, 0.0).reshape(n, -1)
            loss_conf = loss_conf + jnp.mean(
                jax.lax.top_k(fg_worst, conf_fg_topk)[0])
        loss = loss + conf_weight * loss_conf
        aux = {**aux, "loss": loss, "loss_conf": loss_conf}
    return loss, (aux, new_stats, out)


def refinenet_loss_fn(rn: RefineNet, params, batch_stats, patches, heatmaps,
                      train: bool = True, coord_weight: float = 0.0,
                      offset_weight: float = 0.0):
    """MSE on heatmaps; patches (N,24,24,1), heatmaps (N,64,64,1)
    (ref refinenet.py:163-175).

    ``coord_weight > 0`` adds a soft-argmax coordinate loss: squared error
    between the *decoded* sub-pixel position of the predicted heatmap and
    that of the target heatmap, in image px (the 64×64 grid is 8× the image
    resolution). The MSE trains the heat *values* but is nearly flat in the
    peak's sub-grid position — this term optimizes exactly what inference
    decodes (``ops.refine_keypoints_soft``). The target position is recovered
    by soft-argmaxing the target Gaussian itself (exact to <0.002 px for the
    continuous-center labels), so the step signature stays (patches, heats).

    ``offset_weight > 0`` trains the direct offset-regression branch
    (``RefineNet(offset_head=True)``): squared image-px error between the
    branch's (dx, dy) and the target offset, recovered from the target
    Gaussian the same soft-argmax way. The heatmap MSE keeps training the
    parity path alongside.
    """
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, mutated = rn.apply(variables, patches, train=True,
                                mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    else:
        out = rn.apply(variables, patches)
        new_stats = batch_stats
    heat = out["heat"] if isinstance(out, dict) else out
    loss = jnp.mean((heat - heatmaps) ** 2)
    aux = {"loss": loss}
    if coord_weight > 0.0:
        from deepcharuco_tpu.ops.decode import soft_argmax_2d

        pred_xy = soft_argmax_2d(heat) / 8.0       # image px
        true_xy = soft_argmax_2d(heatmaps) / 8.0
        loss_coord = jnp.mean(jnp.sum((pred_xy - true_xy) ** 2, axis=-1))
        loss = loss + coord_weight * loss_coord
        aux = {**aux, "loss": loss, "loss_coord": loss_coord}
    if offset_weight > 0.0:
        from deepcharuco_tpu.ops.decode import soft_argmax_2d

        true_off = (soft_argmax_2d(heatmaps) - 32.0) / 8.0   # image px
        loss_off = jnp.mean(jnp.sum((out["offset"] - true_off) ** 2, axis=-1))
        loss = loss + offset_weight * loss_off
        aux = {**aux, "loss": loss, "loss_offset": loss_off}
    return loss, (aux, new_stats, heat)


# ---------------------------------------------------------------------------
# Steps
# ---------------------------------------------------------------------------

def make_detector_train_step(det: Detector,
                             tx: optax.GradientTransformation,
                             conf_weight: float = 0.0,
                             conf_margin: float = 4.0,
                             conf_topk: int = 0,
                             conf_fg_topk: int = 0) -> Callable:
    def step(state: TrainState, images, loc_labels, ids_labels):
        (loss, (aux, new_stats, _)), grads = jax.value_and_grad(
            lambda p: detector_loss_fn(det, p, state.batch_stats, images,
                                       loc_labels, ids_labels,
                                       conf_weight=conf_weight,
                                       conf_margin=conf_margin,
                                       conf_topk=conf_topk,
                                       conf_fg_topk=conf_fg_topk),
            has_aux=True,
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          batch_stats=new_stats, opt_state=opt_state), aux

    return step


def make_refinenet_train_step(rn: RefineNet,
                              tx: optax.GradientTransformation,
                              coord_weight: float = 0.0,
                              offset_weight: float = 0.0) -> Callable:
    def step(state: TrainState, patches, heatmaps):
        (loss, (aux, new_stats, _)), grads = jax.value_and_grad(
            lambda p: refinenet_loss_fn(rn, p, state.batch_stats, patches,
                                        heatmaps, coord_weight=coord_weight,
                                        offset_weight=offset_weight),
            has_aux=True,
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          batch_stats=new_stats, opt_state=opt_state), aux

    return step


def make_detector_eval_step(det: Detector) -> Callable:
    def step(state: TrainState, images, loc_labels, ids_labels):
        _, (aux, _, out) = detector_loss_fn(det, state.params,
                                            state.batch_stats, images,
                                            loc_labels, ids_labels,
                                            train=False)
        return aux, out

    return step


def make_refinenet_eval_step(rn: RefineNet,
                             offset_weight: float = 0.0) -> Callable:
    def step(state: TrainState, patches, heatmaps):
        _, (aux, _, heat) = refinenet_loss_fn(rn, state.params,
                                              state.batch_stats, patches,
                                              heatmaps, train=False,
                                              offset_weight=offset_weight)
        return aux, heat

    return step
