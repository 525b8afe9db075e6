from deepcharuco_tpu.models.detector import Detector
from deepcharuco_tpu.models.refinenet import RefineNet

__all__ = ["Detector", "RefineNet"]
