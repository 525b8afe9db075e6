"""Tracing / profiling utilities.

The reference's only perf tooling is a wall-clock FPS loop
(``src/benchmark.py:44-53``). Here:

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-viewable trace of device execution;
- :class:`StageTimer` — wall-clock stage timing with device sync, for the
  benchmark CLI's per-stage breakdown;
- :func:`device_memory_stats` — live HBM usage of the local device.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


def force_fetch(tree) -> None:
    """Force completion of every execution whose outputs appear in ``tree``
    by fetching one leaf value per top-level element to the host.

    Through the axon tunnel ``jax.block_until_ready`` alone does not
    guarantee an execution really ran (BENCH_NOTES "Round-3 benchmark
    protocol"); an execution can only materialize an output value on the
    host by completing, and one leaf per execution suffices (all outputs of
    one executable complete together). Pass a list/tuple whose elements come
    from distinct dispatches to force each of them; a bare output tree
    counts as one element.
    """
    import jax
    import numpy as np

    elements = tree if isinstance(tree, (list, tuple)) else [tree]
    for el in elements:
        leaves = jax.tree_util.tree_leaves(el)
        if leaves:
            np.asarray(leaves[0])


@contextlib.contextmanager
def trace(logdir: str = "/tmp/dctpu_trace"):
    """Capture a jax.profiler trace (open with TensorBoard's profile tab)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall-clock per stage, synchronizing the device around each
    measured region so async dispatch doesn't hide the cost.

    Synchronization FETCHES one output leaf instead of only calling
    ``block_until_ready``: through the axon tunnel block alone does not
    guarantee the execution really ran (BENCH_NOTES "Round-3 benchmark
    protocol"), while an execution can only materialize an output value on
    the host by completing."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        if sync is not None:
            force_fetch(sync)
        t0 = time.perf_counter()
        out = {}
        yield out
        if "result" in out:
            force_fetch(out["result"])
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name in self.totals:
            mean = self.totals[name] / self.counts[name]
            lines.append(f"{name:24s} {mean * 1000:8.2f} ms/call "
                         f"({self.counts[name]} calls)")
        return "\n".join(lines)


def device_memory_stats(device=None) -> Optional[Dict[str, int]]:
    """Bytes in use / limit on the (first local) device, when the backend
    exposes them."""
    import jax

    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", None)
    if stats is None:
        return None
    try:
        return dict(stats())
    except Exception:
        return None
