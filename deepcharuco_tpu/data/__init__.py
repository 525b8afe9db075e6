from deepcharuco_tpu.data.synth import BoardSynthesizer, SynthSample
from deepcharuco_tpu.data.dataset import (
    CharucoDataset,
    RefineNetDataset,
    create_label,
    create_refine_sample,
)
from deepcharuco_tpu.data.sources import (
    DirectoryImageSource,
    CocoJsonImageSource,
    ProceduralImageSource,
    open_image_source,
)
from deepcharuco_tpu.data.prefetch import BatchLoader, device_prefetch

__all__ = [
    "BoardSynthesizer",
    "SynthSample",
    "CharucoDataset",
    "RefineNetDataset",
    "create_label",
    "create_refine_sample",
    "DirectoryImageSource",
    "CocoJsonImageSource",
    "ProceduralImageSource",
    "open_image_source",
    "BatchLoader",
    "device_prefetch",
]
