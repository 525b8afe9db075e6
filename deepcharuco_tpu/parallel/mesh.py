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

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'spatial') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
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
        if spatial_dim is not None and x.ndim > spatial_dim and \
                mesh.shape["spatial"] > 1 and x.shape[spatial_dim] % mesh.shape["spatial"] == 0:
            spec[spatial_dim] = "spatial"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def sharded_inference(fn, mesh: Mesh):
    """Jit an inference program for the mesh with frames sharded over
    ('data', 'spatial') on (batch, height).

    For large frames this is the spatial analogue of sequence parallelism:
    XLA inserts conv halo exchanges over ICI from the input sharding alone.
    The returned callable takes the frame batch (N, H, W[, C]) already placed
    (or places it itself via the committed sharding on first use).
    """
    return jax.jit(fn, out_shardings=None)


def shard_frames(mesh: Mesh, frames):
    """Place a frame batch (N, H, W[, C]) with batch over 'data' and height
    over 'spatial' (when divisible)."""
    spec = [None] * frames.ndim
    spec[0] = "data"
    if mesh.shape["spatial"] > 1 and frames.shape[1] % mesh.shape["spatial"] == 0:
        spec[1] = "spatial"
    return jax.device_put(frames, NamedSharding(mesh, P(*spec)))


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
