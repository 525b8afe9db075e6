from deepcharuco_tpu.compat.torch_convert import (
    detector_variables_from_torch,
    refinenet_variables_from_torch,
    load_lightning_checkpoint,
    detector_state_dict_from_variables,
    refinenet_state_dict_from_variables,
    save_lightning_checkpoint,
)

__all__ = [
    "detector_variables_from_torch",
    "refinenet_variables_from_torch",
    "load_lightning_checkpoint",
    "detector_state_dict_from_variables",
    "refinenet_state_dict_from_variables",
    "save_lightning_checkpoint",
]
