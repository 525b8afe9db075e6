"""Checkpointing: orbax-backed save/restore with top-k-by-metric retention.

The reference relies on Lightning's ``ModelCheckpoint(save_top_k=10,
monitor="val_loss")`` (``src/train.py:38-39``) and ``load_from_checkpoint``
(``src/inference.py:73-84``). Here the same policy runs on orbax: every save
records its monitored metric; when more than ``top_k`` checkpoints exist, the
worst is deleted. ``best_checkpoint`` mirrors Lightning's best-model lookup.

The torch-``.ckpt`` compatibility path lives in
:mod:`deepcharuco_tpu.compat.torch_convert` — a reference Lightning file can
be converted into these orbax trees directly.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def flatten_opt_state(opt_state) -> Dict[str, np.ndarray]:
    """Serialize an optax state pytree (NamedTuples etc.) as a flat dict of
    arrays keyed by leaf index — the form orbax round-trips losslessly.

    Lightning checkpoints carry optimizer state and ``resume_from_checkpoint``
    restores it (ref ``src/train.py:42``); this is the equivalent for optax
    states, whose NamedTuple containers would otherwise come back from orbax
    as plain dicts with a different treedef.
    """
    leaves = jax.tree.leaves(opt_state)
    return {f"{i:05d}": np.asarray(leaf) for i, leaf in enumerate(leaves)}


def unflatten_opt_state(template, flat: Dict[str, np.ndarray]):
    """Inverse of :func:`flatten_opt_state` given a freshly-initialized
    ``template`` state with the same structure (e.g. ``tx.init(params)``)."""
    treedef = jax.tree.structure(template)
    leaves = [np.asarray(flat[k]) for k in sorted(flat)]
    assert len(leaves) == treedef.num_leaves, (
        f"checkpointed opt state has {len(leaves)} leaves, "
        f"optimizer expects {treedef.num_leaves}"
    )
    return jax.tree.unflatten(treedef, leaves)


class CheckpointManager:
    """Top-k checkpoint retention keyed by a monitored scalar (lower=better)."""

    def __init__(self, directory: str, top_k: int = 10, higher_is_better: bool = False):
        self.dir = directory
        self.top_k = top_k
        self.higher_is_better = higher_is_better
        os.makedirs(directory, exist_ok=True)
        self._index_path = os.path.join(directory, "index.json")
        self._index: Dict[str, float] = {}
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self._index = json.load(f)

    # -----------------------------------------------------------------

    def _save_index(self):
        with open(self._index_path, "w") as f:
            json.dump(self._index, f, indent=1)

    def _ckpt_path(self, name: str) -> str:
        return os.path.join(self.dir, name)

    def save(self, name: str, state: Any, metric: float,
             extra: Optional[Dict] = None) -> str:
        """Save a pytree under ``name`` (e.g. ``step_001200``); prune to top-k."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(self._ckpt_path(name))
        ckptr = ocp.PyTreeCheckpointer()
        payload = {"state": _to_numpy_tree(state)}
        if extra:
            payload["extra"] = _to_numpy_tree(extra)
        ckptr.save(path, payload, force=True)
        self._index[name] = float(metric)
        self._prune()
        self._save_index()
        return path

    def _prune(self):
        import shutil

        while len(self._index) > self.top_k:
            worst = (max if not self.higher_is_better else min)(
                self._index, key=self._index.get
            )
            shutil.rmtree(self._ckpt_path(worst), ignore_errors=True)
            del self._index[worst]

    # -----------------------------------------------------------------

    def restore(self, name: str, target: Optional[Any] = None) -> Any:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        payload = ckptr.restore(os.path.abspath(self._ckpt_path(name)))
        state = payload["state"]
        if target is not None:
            state = jax.tree.map(lambda t, x: np.asarray(x).astype(t.dtype).reshape(t.shape)
                                 if hasattr(t, "dtype") else x, target, state)
        return state

    def best_checkpoint(self) -> Optional[str]:
        if not self._index:
            return None
        pick = min if not self.higher_is_better else max
        return pick(self._index, key=self._index.get)

    def latest_checkpoint(self) -> Optional[str]:
        names = [n for n in self._index]
        return sorted(names)[-1] if names else None

    @property
    def index(self) -> Dict[str, float]:
        return dict(self._index)
