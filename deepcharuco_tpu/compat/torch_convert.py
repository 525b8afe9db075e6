"""PyTorch-Lightning checkpoint ⇄ Flax variable conversion.

The reference ships Lightning ``.ckpt`` files (torch pickles whose
``state_dict`` keys carry a ``model.`` prefix, loaded at
``src/inference.py:73-84``). This module maps those tensors into the Flax
variable trees of :class:`~deepcharuco_tpu.models.Detector` /
:class:`~deepcharuco_tpu.models.RefineNet`, including BatchNorm running
statistics, and back — the reverse direction powers the torch forward-parity
tests (the pretrained ckpts are absent from the reference mount, so parity is
validated with shared random weights).

Layout conversion: torch conv weights are OIHW, flax kernels HWIO.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

# (flax module name, torch conv prefix, torch bn prefix or None)
_DETECTOR_BLOCKS: List[Tuple[str, str, Optional[str]]] = [
    ("conv1a", "conv1a", "bn1a"),
    ("conv1b", "conv1b", "bn1b"),
    ("conv2a", "conv2a", "bn2a"),
    ("conv2b", "conv2b", "bn2b"),
    ("conv3a", "conv3a", "bn3a"),
    ("conv3b", "conv3b", "bn3b"),
    ("conv4a", "conv4a", "bn4a"),
    ("conv4b", "conv4b", "bn4b"),
    ("convPa", "convPa", "bnPa"),
    ("convPb", "convPb", None),
    ("convDa", "convDa", "bnDa"),
    ("convDb", "convDb", None),
]

_REFINENET_BLOCKS: List[Tuple[str, str, Optional[str]]] = [
    ("conv1a", "conv1a", "bn1a"),
    ("conv1b", "conv1b", "bn1b"),
    ("conv2a", "conv2a", "bn2a"),
    ("conv2b", "conv2b", "bn2b"),
    ("conv3a", "conv3a", "bn3a"),
    ("conv3b", "conv3b", "bn3b"),
    ("conv4a", "conv4a", "bn4a"),
    ("conv4b", "conv4b", "bn4b"),
    ("conv5a", "conv5a", "bn5a"),
    ("conv5b", "conv5b", "bn5b"),
    ("convPa", "convPa", "bnPa"),
    ("convPb", "convPb", None),
]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _strip_prefix(state_dict: Dict, prefix: str = "model.") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        if k.startswith(prefix):
            k = k[len(prefix):]
        out[k] = _np(v)
    return out


def load_lightning_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a Lightning ``.ckpt`` and return the bare (prefix-stripped) state dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return _strip_prefix(sd)


def _variables_from_blocks(sd: Dict[str, np.ndarray],
                           blocks: List[Tuple[str, str, Optional[str]]]):
    params: Dict = {}
    batch_stats: Dict = {}
    for flax_name, conv, bn in blocks:
        kernel = _np(sd[f"{conv}.weight"]).transpose(2, 3, 1, 0)  # OIHW→HWIO
        bias = _np(sd[f"{conv}.bias"])
        if bn is None:
            params[flax_name] = {"kernel": kernel, "bias": bias}
        else:
            params[flax_name] = {
                "conv": {"kernel": kernel, "bias": bias},
                "bn": {
                    "scale": _np(sd[f"{bn}.weight"]),
                    "bias": _np(sd[f"{bn}.bias"]),
                },
            }
            batch_stats[flax_name] = {
                "bn": {
                    "mean": _np(sd[f"{bn}.running_mean"]),
                    "var": _np(sd[f"{bn}.running_var"]),
                }
            }
    return {"params": params, "batch_stats": batch_stats}


def detector_variables_from_torch(state_dict: Dict) -> Dict:
    """Torch dcModel state dict (``src/models/net.py:23-48`` parameter names)
    → Flax Detector variables."""
    return _variables_from_blocks(_strip_prefix(state_dict), _DETECTOR_BLOCKS)


def refinenet_variables_from_torch(state_dict: Dict) -> Dict:
    """Torch RefineNet state dict (``src/models/refinenet.py:21-48``)
    → Flax RefineNet variables."""
    return _variables_from_blocks(_strip_prefix(state_dict), _REFINENET_BLOCKS)


def _state_dict_from_variables(variables: Dict,
                               blocks: List[Tuple[str, str, Optional[str]]]):
    """Flax variables → torch-layout numpy state dict (for parity harnesses)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    for flax_name, conv, bn in blocks:
        p = params[flax_name]
        if bn is None:
            sd[f"{conv}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)
            sd[f"{conv}.bias"] = _np(p["bias"])
        else:
            sd[f"{conv}.weight"] = _np(p["conv"]["kernel"]).transpose(3, 2, 0, 1)
            sd[f"{conv}.bias"] = _np(p["conv"]["bias"])
            sd[f"{bn}.weight"] = _np(p["bn"]["scale"])
            sd[f"{bn}.bias"] = _np(p["bn"]["bias"])
            sd[f"{bn}.running_mean"] = _np(stats[flax_name]["bn"]["mean"])
            sd[f"{bn}.running_var"] = _np(stats[flax_name]["bn"]["var"])
    return sd


def detector_state_dict_from_variables(variables: Dict) -> Dict[str, np.ndarray]:
    return _state_dict_from_variables(variables, _DETECTOR_BLOCKS)


def refinenet_state_dict_from_variables(variables: Dict) -> Dict[str, np.ndarray]:
    return _state_dict_from_variables(variables, _REFINENET_BLOCKS)


def save_lightning_checkpoint(path: str, variables: Dict, kind: str) -> None:
    """Write Flax variables as a reference-loadable Lightning ``.ckpt``.

    The file round-trips through the reference's
    ``lModel.load_from_checkpoint`` / ``lRefineNet.load_from_checkpoint``
    (``src/inference.py:73-84``): torch pickle with a ``state_dict`` whose
    keys carry the ``model.`` prefix. Enables moving TPU-trained weights back
    into the torch ecosystem.
    """
    import torch

    sd = (detector_state_dict_from_variables(variables) if kind == "detector"
          else refinenet_state_dict_from_variables(variables))
    payload = {
        "state_dict": {
            f"model.{k}": torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd.items()
        },
        "pytorch-lightning_version": "2.1.0",
        "epoch": 0,
        "global_step": 0,
    }
    torch.save(payload, path)
