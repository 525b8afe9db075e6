"""Multi-chip scale-out: mesh construction + sharded training steps.

The reference has *no* distributed training (SURVEY §2.4); scale-out here is a
green-field TPU design. The models are small CNNs, so the honest parallelism
axes are:

- ``data``  — batch data-parallel: batch dim sharded, params replicated,
  gradient all-reduce over ICI (inserted by XLA from sharding annotations).
- ``spatial`` — image-height sharding (the spatial analogue of sequence
  parallelism): conv halo exchanges over ICI, again compiler-inserted. Only
  worthwhile for large frames; kept in the mesh so the same program scales
  from (N,1) to (N_dp, N_sp) without rewrites.

No hand-written collectives: under ``jit`` with ``NamedSharding`` constraints
the semantics are global (BatchNorm statistics reduce across the whole batch)
and XLA chooses psum/all-gather placement.
"""

from __future__ import annotations

import warnings
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _warn_unsharded(axis: str, dim_size: int, n: int, what: str) -> None:
    """A divisibility miss silently leaves the dimension replicated — say so
    (no silent caps; ADVICE r2). Fires at trace/placement time, not per step."""
    warnings.warn(
        f"{what}: size {dim_size} not divisible by mesh axis '{axis}' ({n}) — "
        f"dimension left UNPARTITIONED (replicated); that axis does no work",
        stacklevel=3)


def make_mesh(n_data: Optional[int] = None, n_spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'spatial') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    if n_data < 1 or n_spatial < 1:
        raise ValueError(
            f"mesh {n_data}x{n_spatial} is empty — n_spatial ({n_spatial}) "
            f"likely exceeds the device count ({len(devices)})")
    assert n_data * n_spatial <= len(devices), (
        f"mesh {n_data}x{n_spatial} needs more than {len(devices)} devices"
    )
    grid = np.array(devices[: n_data * n_spatial]).reshape(n_data, n_spatial)
    return Mesh(grid, axis_names=("data", "spatial"))


def shard_batch(mesh: Mesh, batch, spatial_dim: Optional[int] = 1):
    """Place a batch pytree: dim 0 over 'data', optionally one spatial dim
    over 'spatial'; remaining dims replicated."""

    def put(x):
        spec = [None] * x.ndim
        spec[0] = "data"
        if (spatial_dim is not None and x.ndim > spatial_dim
                and mesh.shape["spatial"] > 1):
            if x.shape[spatial_dim] % mesh.shape["spatial"] == 0:
                spec[spatial_dim] = "spatial"
            else:
                _warn_unsharded("spatial", x.shape[spatial_dim],
                                mesh.shape["spatial"], "shard_batch")
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def sharded_inference(fn, mesh: Mesh, frames_argnum: int = -1):
    """Jit an inference program for the mesh with frames sharded over
    ('data', 'spatial') on (batch, height).

    For large frames this is the spatial analogue of sequence parallelism:
    XLA inserts conv halo exchanges over ICI from the frame sharding. The
    frame batch (argument ``frames_argnum``, default last) is *constrained*
    to the mesh inside the program — compute is partitioned even if the
    caller passed an unplaced (single-device) array.
    """

    def constrained(*args):
        args = list(args)
        frames = args[frames_argnum]
        spec = [None] * frames.ndim
        if frames.shape[0] % mesh.shape["data"] == 0:
            spec[0] = "data"
        elif mesh.shape["data"] > 1:
            _warn_unsharded("data", frames.shape[0], mesh.shape["data"],
                            "sharded_inference batch")
        if mesh.shape["spatial"] > 1 and frames.ndim > 1:
            if frames.shape[1] % mesh.shape["spatial"] == 0:
                spec[1] = "spatial"
            else:
                _warn_unsharded("spatial", frames.shape[1],
                                mesh.shape["spatial"],
                                "sharded_inference height")
        args[frames_argnum] = jax.lax.with_sharding_constraint(
            frames, NamedSharding(mesh, P(*spec)))
        return fn(*args)

    return jax.jit(constrained)


def shard_frames(mesh: Mesh, frames):
    """Place a frame batch (N, H, W[, C]) with batch over 'data' and height
    over 'spatial' (when divisible)."""
    spec = [None] * frames.ndim
    spec[0] = "data"
    if mesh.shape["spatial"] > 1:
        if frames.shape[1] % mesh.shape["spatial"] == 0:
            spec[1] = "spatial"
        else:
            _warn_unsharded("spatial", frames.shape[1], mesh.shape["spatial"],
                            "shard_frames")
    return jax.device_put(frames, NamedSharding(mesh, P(*spec)))


def synth_scan_program(step_fn, batch_fn, fused_steps: int = 1):
    """Synthesis + train-step program body: ``(state, key) → (state, aux)``,
    optionally ``lax.scan``-fused over ``fused_steps`` sub-keys per dispatch
    (aux = last step's). ``batch_fn``: key → tuple of batch arrays. The ONE
    scan wrapper shared by the single-device CLIs and the sharded program
    below — jit/donate at the call site."""

    def one_step(state, key):
        return step_fn(state, *batch_fn(key))

    if fused_steps <= 1:
        return one_step

    def program(state, key):
        state, auxs = jax.lax.scan(one_step, state,
                                   jax.random.split(key, fused_steps))
        return state, jax.tree.map(lambda a: a[-1], auxs)

    return program


def sharded_synth_train_program(step_fn, sample_fn, mesh: Mesh,
                                batch_size: int, fused_steps: int = 1,
                                spatial_dim: Optional[int] = 1):
    """The flagship multi-chip training program: ON-DEVICE synthesis + train
    step(s), fused in ONE jit over the ('data', 'spatial') mesh.

    The host feeds a single PRNG key per dispatch. Inside the program the key
    splits into per-sample keys *sharded over 'data'* — each device
    synthesizes only its own sub-batch (no host bottleneck, no cross-chip
    traffic for data). The synthesized image batch is further constrained
    over ('data', 'spatial') on (batch, height) so XLA partitions the
    synthesis pixel math and the conv forward/backward spatially (halo
    exchanges over ICI), and the replicated-state output sharding makes it
    insert the gradient all-reduce. With ``fused_steps=K`` the whole
    synthesis+step pair is ``lax.scan``-ned K times per dispatch, amortizing
    tunnel/dispatch latency (measured 6.4 vs 4.0 steps/s at K=8 single-chip).

    ``sample_fn``: key → tuple of per-sample arrays (e.g. (image, loc, ids)
    or (patch, heat)); the first element is treated as image-like and gets
    the spatial constraint (``spatial_dim=None`` disables it — use for
    patch-shaped data where splitting the tiny height axis would only buy
    conv halo traffic). ``step_fn``: (state, *batch) → (state, aux).
    """
    state_sharding = NamedSharding(mesh, P())
    data_sharding = NamedSharding(mesh, P("data"))

    def constrain(batch):
        out = []
        for i, x in enumerate(batch):
            spec = [None] * x.ndim
            spec[0] = "data"
            if (i == 0 and spatial_dim is not None
                    and mesh.shape["spatial"] > 1 and x.ndim > spatial_dim):
                if x.shape[spatial_dim] % mesh.shape["spatial"] == 0:
                    spec[spatial_dim] = "spatial"
                else:
                    _warn_unsharded("spatial", x.shape[spatial_dim],
                                    mesh.shape["spatial"],
                                    "synth_train_program image height")
            out.append(jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(*spec))))
        return tuple(out)

    def batch_fn(key):
        keys = jax.random.split(key, batch_size)
        keys = jax.lax.with_sharding_constraint(keys, data_sharding)
        return constrain(jax.vmap(sample_fn)(keys))

    program = synth_scan_program(step_fn, batch_fn, fused_steps)
    return jax.jit(program, out_shardings=(state_sharding, None),
                   donate_argnums=(0,))


def sharded_train_step(step_fn, mesh: Mesh):
    """Jit a train step for the mesh: state replicated, batch args sharded.

    The returned callable takes (state, *batch_arrays); batch arrays must
    already be placed with :func:`shard_batch` (or will be committed by jit
    according to the output shardings of the donated inputs).
    """
    state_sharding = NamedSharding(mesh, P())
    return jax.jit(
        step_fn,
        out_shardings=(state_sharding, None),
        donate_argnums=(0,),
    )
