"""deepcharuco_tpu — a TPU-native Deep ChArUco framework.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of
JunkyByte/deepcharuco (PyTorch/Lightning): ChArUco-board inner-corner
detection with a SuperPoint-style FCN, per-corner sub-pixel refinement with
RefineNet, and 6-DoF board pose recovery — with the whole two-stage
inference pipeline plus pose solve fused into a single XLA program so a
frame never round-trips to host between stages.

Layout
------
- :mod:`deepcharuco_tpu.configs`   — YAML config schema (parity with reference ``src/configs.py``)
- :mod:`deepcharuco_tpu.board`     — board geometry + host-side rendering (ref ``src/aruco_utils.py``)
- :mod:`deepcharuco_tpu.models`    — Flax modules: Detector, RefineNet
- :mod:`deepcharuco_tpu.ops`       — pure-jnp decode/patch/heatmap ops (static shapes)
- :mod:`deepcharuco_tpu.pnp`       — batched planar PnP (homography init + Levenberg–Marquardt)
- :mod:`deepcharuco_tpu.pipeline`  — the single jitted frame→pose program
- :mod:`deepcharuco_tpu.data`      — host-side synthetic data generation + prefetch
- :mod:`deepcharuco_tpu.train`     — optax training loops, metrics, orbax checkpoints
- :mod:`deepcharuco_tpu.parallel`  — mesh/sharding helpers for multi-chip scale-out
- :mod:`deepcharuco_tpu.compat`    — torch Lightning ``.ckpt`` → JAX param converter
- :mod:`deepcharuco_tpu.cli`       — train / infer / benchmark / pose-video / calib entry points
"""

__version__ = "0.1.0"
