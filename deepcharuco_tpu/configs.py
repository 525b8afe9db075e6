"""Configuration schema and loader.

Parity target: reference ``src/configs.py:12-41`` — same YAML keys, same derived
``n_ids = (row_count-1)*(col_count-1)``, so a reference ``config.yaml`` /
``demo_config.yaml`` loads unchanged. Unlike the reference (hard-coded
``CONFIG_PATH='config.yaml'``, ``src/configs.py:9``), every CLI here takes the
config path as a flag, and we add optional TPU-specific knobs (dtype, batch
mesh) with defaults that keep reference YAMLs valid.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import yaml


@dataclasses.dataclass(frozen=True)
class Config:
    """Board + training configuration (reference-compatible schema)."""

    # Board geometry (ref src/configs.py:14-18)
    board_name: str
    row_count: int
    col_count: int
    square_len: float
    marker_len: float

    # Training / input (ref src/configs.py:20-28)
    input_size: Tuple[int, int]  # (W, H) — reference convention
    num_workers: int = 6
    bs_train: int = 32
    bs_train_rn: int = 64
    bs_val: int = 64
    bs_val_rn: int = 128
    train_labels: str = ""
    val_labels: str = ""
    train_images: str = ""
    val_images: str = ""

    # TPU-native extensions (absent from the reference; all defaulted)
    compute_dtype: str = "bfloat16"  # forward-pass compute dtype for inference
    param_dtype: str = "float32"
    data_axis: int = 8  # virtual/real devices for data-parallel training

    # Derived (ref src/configs.py:31-35)
    n_ids: Optional[int] = None

    def __post_init__(self):
        if self.n_ids is None:
            object.__setattr__(
                self, "n_ids", (self.row_count - 1) * (self.col_count - 1)
            )
        if not isinstance(self.input_size, tuple):
            object.__setattr__(self, "input_size", tuple(self.input_size))

    @property
    def input_wh(self) -> Tuple[int, int]:
        """(width, height) — the on-disk YAML convention."""
        return self.input_size

    @property
    def input_hw(self) -> Tuple[int, int]:
        """(height, width) — the array-shape convention used on device."""
        return (self.input_size[1], self.input_size[0])


def load_configuration(path: str) -> Config:
    """Load a YAML config (same file format as reference ``src/configs.py:38-41``)."""
    with open(path, "r") as f:
        raw = yaml.safe_load(f)
    known = {f.name for f in dataclasses.fields(Config)}
    unknown = set(raw) - known
    if unknown:
        raise ValueError(f"Unknown config keys: {sorted(unknown)}")
    return Config(**raw)


def default_config(**overrides) -> Config:
    """The demo configuration (ref ``src/demo_config.yaml:1-17``) minus dataset paths."""
    base = dict(
        board_name="DICT_4X4_50",
        row_count=5,
        col_count=5,
        square_len=0.01,
        marker_len=0.0075,
        input_size=(320, 240),
    )
    base.update(overrides)
    return Config(**base)


def scaled_config(cfg: Config, factor: int = 2) -> Config:
    """The same board/config with ``input_size`` scaled ``factor``× — the
    hi-res frame view for the patch tap (``pipeline.two_stage_forward_hires``;
    the reference's ``s_factor=2`` rendering, ``src/data_refinenet.py:97-100``).
    Board geometry is physical and unchanged; synthesis with this config
    renders the board texture at ``factor``× detail."""
    return dataclasses.replace(
        cfg, input_size=(cfg.input_size[0] * factor,
                         cfg.input_size[1] * factor))
