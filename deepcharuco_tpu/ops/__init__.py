from deepcharuco_tpu.ops.image import bgr_to_gray, downsample2x, normalize_gray, preprocess_bgr
from deepcharuco_tpu.ops.decode import (
    pred_argmax,
    label_to_keypoints,
    label_to_keypoints_topk,
    pred_to_keypoints,
    pred_to_keypoints_topk,
    heatmap_argmax2d,
    refine_keypoints,
    refine_keypoints_offset,
    refine_keypoints_soft,
)
from deepcharuco_tpu.ops.geom import (
    fill_from_homography,
    pred_to_keypoints_geom,
    reselect_by_homography,
)
from deepcharuco_tpu.ops.patches import extract_patches
from deepcharuco_tpu.ops.heatmap import gaussian_heatmap

__all__ = [
    "bgr_to_gray",
    "downsample2x",
    "normalize_gray",
    "preprocess_bgr",
    "pred_argmax",
    "label_to_keypoints",
    "label_to_keypoints_topk",
    "pred_to_keypoints",
    "pred_to_keypoints_topk",
    "heatmap_argmax2d",
    "refine_keypoints",
    "refine_keypoints_offset",
    "refine_keypoints_soft",
    "fill_from_homography",
    "pred_to_keypoints_geom",
    "reselect_by_homography",
    "extract_patches",
    "gaussian_heatmap",
]
