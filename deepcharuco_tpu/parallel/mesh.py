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
