"""The fused inference program: frames → corners → sub-pixel → pose, one jit.

The reference's production path (``src/inference.py:32-70``) crosses
host↔device twice per frame and finishes with per-frame CPU PnP
(``src/pose_estimation.py:58-66``). Here the *entire* span — grayscale
normalize, detector, fixed-capacity decode, 24×24 patch gather, RefineNet,
sub-pixel refine, and batched planar PnP — is a single XLA program over a
batch of frames. The only transfers are uint8 frames in and small pose/corner
arrays out.

Functional core + a thin convenience class:

- :func:`two_stage_forward` — frames → (keypoints, valid, refined)
- :func:`full_forward` — + (ok, rvec, tvec, reproj_rms)
- :class:`InferencePipeline` — holds params/config, jits once, numpy I/O
"""

from __future__ import annotations

import dataclasses
import os
import zipfile
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepcharuco_tpu.board import inner_corner_object_points
from deepcharuco_tpu.configs import Config
from deepcharuco_tpu.models import Detector, RefineNet
from deepcharuco_tpu.ops import (
    extract_patches,
    normalize_gray,
    pred_to_keypoints,
    preprocess_bgr,
    refine_keypoints,
)
from deepcharuco_tpu.pnp import solve_pnp

# How far a RefineNet correction may move a homography-FILLED corner before
# the geometric prediction is trusted instead (see two_stage_forward's
# geom_fill; fills over occluded texture have no corner signal to refine).
_FILL_TRUST_PX = 1.5


@dataclasses.dataclass(frozen=True)
class Camera:
    """Intrinsics (cv2 conventions; dist = [k1, k2, p1, p2, k3, k4, k5, k6,
    s1, s2, s3, s4] — 4/5/8/12-coefficient vectors accepted, zero-padded)."""

    K: np.ndarray
    dist: np.ndarray

    @classmethod
    def from_npz(cls, path: str) -> "Camera":
        """Load the reference's ``camera_params.npz`` format
        (``src/pose_estimation.py:35-37``).

        cv2 legally emits 4, 5, 8, 12 or 14 coefficients. The on-device
        projection model (``pnp/projection.distort``) implements the full
        rational + thin-prism model (first 12), so those load exactly;
        the 14-coefficient tilted-sensor model is NOT supported and raises
        (silently truncating it would *change* the camera model).
        """
        data = np.load(path)
        raw = np.asarray(data["distortion_coeffs"], np.float32).ravel()
        if raw.size not in (0, 4, 5, 8, 12):
            raise ValueError(
                f"{raw.size}-coefficient distortion model unsupported "
                "(cv2 tilted-sensor τx/τy terms have no on-device "
                "implementation); re-calibrate without CALIB_TILTED_MODEL")
        dist = np.zeros(12, np.float32)
        dist[: raw.size] = raw
        return cls(K=np.asarray(data["camera_matrix"], np.float32), dist=dist)

    def scaled(self, factor: float = 0.5) -> "Camera":
        """Intrinsics for a resampled view whose pixel grid maps as
        x' = (x + 0.5)·factor − 0.5 (area resampling with aligned pixel
        centers — ``ops.downsample2x``'s convention at factor 0.5, used by
        the hi-res patch tap to express a camera calibrated at the native
        frame resolution in pooled-view units). Distortion coefficients act
        on normalized coordinates and carry over unchanged."""
        K = np.array(self.K, np.float32, copy=True)
        K[0, 0] *= factor
        K[1, 1] *= factor
        K[0, 2] = (K[0, 2] + 0.5) * factor - 0.5
        K[1, 2] = (K[1, 2] + 0.5) * factor - 0.5
        return Camera(K=K, dist=self.dist)


def _to_gray_input(frames: jnp.ndarray) -> jnp.ndarray:
    """Accept BGR uint8 (N,H,W,3), gray (N,H,W)/(N,H,W,1) in uint8 scale, or
    already-normalized float gray in [-1, 1]; return normalized NHWC float32.

    The float-in-[-1,1] case (e.g. frames straight from the synthesis
    pipeline) must NOT be normalized again — double application of
    ``(g−128)/255`` silently collapses the image to ≈ −0.5.
    """
    if frames.ndim == 4 and frames.shape[-1] == 3:
        return preprocess_bgr(frames)
    g = frames[..., 0] if frames.ndim == 4 else frames
    if jnp.issubdtype(frames.dtype, jnp.floating):
        # float gray ⇒ already-normalized contract (dtype decides, statically)
        return g.astype(jnp.float32)[..., None]
    return normalize_gray(g)


def _apply_refiner(refinenet, rn_vars, patches, keypoints, mode: str):
    """RefineNet on gathered patches + the selected decode (see
    ``two_stage_forward``'s ``rn_decode``). ``keypoints`` are the integer
    patch centers in the same pixel units as ``patches``' source frame;
    returns refined positions in those units."""
    from deepcharuco_tpu.ops import refine_keypoints_soft

    n, k, p, _ = patches.shape
    out_rn = refinenet.apply(rn_vars, patches.reshape(n * k, p, p, 1))
    if isinstance(out_rn, dict):
        heat, offset = out_rn["heat"], out_rn["offset"].reshape(n, k, 2)
    else:
        heat, offset = out_rn, None
    heat = heat.reshape(n, k, 64, 64)
    if mode in ("offset", "avg") and offset is None:
        raise ValueError(
            f"rn_decode={mode!r} needs RefineNet(offset_head=True) and an "
            "offset-trained checkpoint")
    if mode == "offset":
        return keypoints + offset
    if mode == "avg":
        return 0.5 * (refine_keypoints_soft(heat, keypoints)
                      + keypoints + offset)
    if mode == "soft":
        return refine_keypoints_soft(heat, keypoints)
    return refine_keypoints(heat, keypoints)


def two_stage_forward(detector: Detector, refinenet: Optional[RefineNet],
                      det_vars, rn_vars, frames, n_ids: int,
                      soft_refine: bool = False,
                      min_margin: Optional[float] = None,
                      decode_capacity: int = 1,
                      rn_decode: Optional[str] = None,
                      geom_board_xy: Optional[jnp.ndarray] = None,
                      geom_fill: bool = False,
                      geom_ransac: int = 32,
                      return_filled: bool = False):
    """Detector → decode → patch gather → RefineNet → sub-pixel corners.

    Returns (keypoints, valid, refined): (N, n_ids, 2), (N, n_ids) bool,
    (N, n_ids, 2). With no refinenet, ``refined`` is the raw keypoints
    (reference behavior when ``refinenet is None``, ``inference.py:53-57``).

    ``soft_refine`` decodes the heatmap with a soft-argmax (continuous
    sub-pixel positions, measurably better than the reference's hard argmax);
    ``min_margin`` filters low-confidence ids (see ``ops.pred_to_keypoints``).
    Both default off for reference parity.

    ``decode_capacity > 1`` switches to the duplicate-preserving decode
    (``ops.pred_to_keypoints_topk``): K slots per id, EVERY decoded cell
    refined through RefineNet exactly as the reference refines its
    variable-length keypoint list (``inference.py:55-57``). Output shapes
    become (N, n_ids, K, 2) / (N, n_ids, K) / (N, n_ids, K, 2) — slot
    [:, :, 0] is the default decode's winner.

    ``rn_decode`` selects the refinement decode explicitly (overriding
    ``soft_refine``): ``"hard"`` (reference argmax), ``"soft"``
    (soft-argmax), ``"offset"`` (the direct offset-regression branch), or
    ``"avg"`` (mean of the soft-argmax and offset estimates — the measured
    best, see BENCH_NOTES round 3). ``"offset"``/``"avg"`` require a
    ``RefineNet(offset_head=True)`` and matching checkpoint.

    ``geom_board_xy`` (the board's inner-corner plane coordinates,
    (n_ids, 2)) switches to the geometry-consistent decode
    (``ops.pred_to_keypoints_geom``): candidates are reselected per id by
    planar-homography consistency, recovering loc-gate-suppressed corners
    and rejecting wrong-cell decoys — see BENCH_NOTES round 3. Off (None)
    for reference parity; incompatible with ``decode_capacity > 1``.

    ``geom_fill`` (requires ``geom_board_xy``) additionally predicts every
    undetected in-frame id at its homography-projected position and runs it
    through the same RefineNet pass — the classical
    ``interpolateCornersCharuco`` recovery, measured as accurate as
    detected corners (``ops.fill_from_homography``).
    """
    from deepcharuco_tpu.ops import (fill_from_homography,
                                     pred_to_keypoints_geom,
                                     pred_to_keypoints_topk)

    if geom_board_xy is not None and decode_capacity > 1:
        raise ValueError("geom decode and decode_capacity>1 are exclusive")
    if geom_fill and geom_board_xy is None:
        raise ValueError("geom_fill requires geom_board_xy (geom decode)")
    g = _to_gray_input(frames)
    out = detector.apply(det_vars, g)
    if decode_capacity > 1:
        kp_k, valid_k = pred_to_keypoints_topk(out["loc"], out["ids"], n_ids,
                                               capacity=decode_capacity,
                                               min_margin=min_margin)
        n = kp_k.shape[0]
        keypoints = kp_k.reshape(n, n_ids * decode_capacity, 2)
        valid = valid_k
    elif geom_board_xy is not None:
        keypoints, valid = pred_to_keypoints_geom(out["loc"], out["ids"],
                                                  n_ids, geom_board_xy,
                                                  min_margin=min_margin,
                                                  ransac_subsets=geom_ransac)
        if geom_fill:
            hw = g.shape[1:3]
            keypoints, valid, filled = jax.vmap(
                lambda kp, v: fill_from_homography(kp, v, geom_board_xy, hw)
            )(keypoints, valid)
    else:
        keypoints, valid = pred_to_keypoints(out["loc"], out["ids"], n_ids,
                                             min_margin=min_margin)
    if not geom_fill:
        filled = jnp.zeros_like(valid)
    if refinenet is None:
        kp_out = (keypoints.reshape(valid.shape + (2,))
                  if decode_capacity > 1 else keypoints)
        return ((kp_out, valid, kp_out, filled) if return_filled
                else (kp_out, valid, kp_out))
    patches = extract_patches(g, keypoints,
                              patch_size=getattr(refinenet, "patch_size", 24))
    mode = rn_decode or ("soft" if soft_refine else "hard")
    refined = _apply_refiner(refinenet, rn_vars, patches, keypoints, mode)
    if geom_board_xy is not None and geom_fill:
        # For a VISIBLE undetected corner the refinement sharpens the fill;
        # for an OCCLUDED one the patch carries no corner signal and the
        # refiner drifts arbitrarily, poisoning downstream PnP (measured:
        # occlusion-probe tvec err 0.46 → 8.6 mm). Trust the refinement of
        # filled ids only while it stays near the geometric prediction.
        drift = jnp.linalg.norm(refined - keypoints, axis=-1, keepdims=True)
        keep = filled[..., None] & (drift > _FILL_TRUST_PX)
        refined = jnp.where(keep, keypoints, refined)
    if decode_capacity > 1:
        shape = (n, n_ids, decode_capacity, 2)
        return keypoints.reshape(shape), valid, refined.reshape(shape)
    return ((keypoints, valid, refined, filled) if return_filled
            else (keypoints, valid, refined))


def two_stage_forward_hires(detector: Detector, refinenet: RefineNet,
                            det_vars, rn_vars, frames_hi, n_ids: int,
                            min_margin: Optional[float] = None,
                            rn_decode: str = "soft",
                            geom_board_xy: Optional[jnp.ndarray] = None,
                            geom_fill: bool = False,
                            geom_ransac: int = 32,
                            return_filled: bool = False,
                            scale: int = 2):
    """Hi-res patch tap: detector on a ``scale``×-downsampled view, RefineNet
    on full-resolution patches.

    The TPU-native form of the reference's 2×-resolution RefineNet data
    (``src/data_refinenet.py:97-100`` renders at ``s_factor=2`` so refine
    patches carry detail the detector never sees). Input ``frames_hi`` at
    (N, s·H, s·W[, C]) — e.g. the camera's native 640×480 when the detector
    runs its usual 320×240 grid (``scale=2``), or 1280×960 for the 4× tap.
    Detector cost is unchanged (it sees the pooled view); the refiner sees
    ``scale``× detail at identical FLOPs, so the whole tap costs only the
    pooling + the larger input transfer.

    Coordinate contract: each 2×2 average pool puts low-res center x at
    hi-res coordinate 2x + 0.5 (``ops.image.downsample2x``); composed
    ``log2(scale)`` times that is x_hi = s·x_lo + (s−1)/2, so refined hi-res
    positions map back as (x_hi − (s−1)/2)/s. Returns (keypoints, valid,
    refined) in LOW-res pixel units — drop-in comparable with
    :func:`two_stage_forward`. The shipped RN-32 generalizes to 2× patches
    without retraining (BENCH_NOTES); ``scale=4`` is the experimental next
    octave (``cli.train_refinenet --frame-scale N`` trains matched weights).
    """
    from deepcharuco_tpu.ops import downsample2x

    if scale not in (2, 4):
        raise ValueError(f"hires tap supports scale 2 or 4, got {scale}")
    g_hi = _to_gray_input(frames_hi)
    g_lo = g_hi
    for _ in range(scale.bit_length() - 1):
        g_lo = downsample2x(g_lo)
    out = detector.apply(det_vars, g_lo)
    if geom_board_xy is not None:
        from deepcharuco_tpu.ops import fill_from_homography, pred_to_keypoints_geom

        keypoints, valid = pred_to_keypoints_geom(out["loc"], out["ids"],
                                                  n_ids, geom_board_xy,
                                                  min_margin=min_margin,
                                                  ransac_subsets=geom_ransac)
        if geom_fill:
            hw = g_lo.shape[1:3]  # fills live in pooled-view units
            keypoints, valid, filled = jax.vmap(
                lambda kp, v: fill_from_homography(kp, v, geom_board_xy, hw)
            )(keypoints, valid)
    elif geom_fill:
        raise ValueError("geom_fill requires geom_board_xy (geom decode)")
    else:
        keypoints, valid = pred_to_keypoints(out["loc"], out["ids"], n_ids,
                                             min_margin=min_margin)
    if not geom_fill:
        filled = jnp.zeros_like(valid)
    kp_hi = float(scale) * keypoints  # integer patch centers, hi-res frame
    patches = extract_patches(g_hi, kp_hi,
                              patch_size=getattr(refinenet, "patch_size", 24))
    refined_hi = _apply_refiner(refinenet, rn_vars, patches, kp_hi, rn_decode)
    refined = (refined_hi - (scale - 1) * 0.5) / scale
    if geom_board_xy is not None and geom_fill:
        # same occlusion guard as two_stage_forward, in low-res units
        drift = jnp.linalg.norm(refined - keypoints, axis=-1, keepdims=True)
        keep = filled[..., None] & (drift > _FILL_TRUST_PX)
        refined = jnp.where(keep, keypoints.astype(refined.dtype), refined)
    return ((keypoints, valid, refined, filled) if return_filled
            else (keypoints, valid, refined))


def full_forward_hires(detector: Detector, refinenet: RefineNet,
                       det_vars, rn_vars, frames_hi, n_ids: int,
                       object_points, K, dist, pnp_iters: int = 20,
                       min_margin: Optional[float] = None,
                       rn_decode: str = "soft",
                       geom_board_xy: Optional[jnp.ndarray] = None,
                       geom_fill: bool = False,
                       geom_ransac: int = 32,
                       scale: int = 2):
    """:func:`two_stage_forward_hires` + batched planar PnP, one program.

    ``K``/``dist`` must be expressed in the LOW-res (pooled-view) pixel
    units the tap reports corners in — convert a camera calibrated at the
    hi-res input resolution with ``Camera.scaled(1/scale)``.
    """
    keypoints, valid, refined, filled = two_stage_forward_hires(
        detector, refinenet, det_vars, rn_vars, frames_hi, n_ids,
        min_margin=min_margin, rn_decode=rn_decode,
        geom_board_xy=geom_board_xy, geom_fill=geom_fill,
        geom_ransac=geom_ransac, return_filled=True,
        scale=scale)
    # Pose from MEASURED detections only: filled corners lie on the fitted
    # homography by construction — they add no independent evidence, and
    # their (correlated) extrapolation error biases PnP (occlusion probe:
    # tvec err 0.46 → 2.6 mm when fills were included).
    solve = lambda ip, v: solve_pnp(object_points, ip, v, K, dist, iters=pnp_iters)
    ok, rvec, tvec, rms = jax.vmap(solve)(refined, valid & ~filled)
    return keypoints, valid, refined, ok, rvec, tvec, rms


def full_forward(detector: Detector, refinenet: Optional[RefineNet],
                 det_vars, rn_vars, frames, n_ids: int,
                 object_points, K, dist, pnp_iters: int = 20,
                 soft_refine: bool = False,
                 min_margin: Optional[float] = None,
                 rn_decode: Optional[str] = None,
                 geom_board_xy: Optional[jnp.ndarray] = None,
                 geom_fill: bool = False,
                 geom_ransac: int = 32):
    """:func:`two_stage_forward` + batched planar PnP, all in one program.

    With ``geom_fill`` the pose is solved from MEASURED detections only —
    filled corners lie on the fitted homography by construction, so they
    add no independent evidence and their correlated extrapolation error
    biases PnP (occlusion probe: tvec err 0.46 → 2.6 mm when included).
    The returned corner set still contains the fills.
    """
    keypoints, valid, refined, filled = two_stage_forward(
        detector, refinenet, det_vars, rn_vars, frames, n_ids,
        soft_refine=soft_refine, min_margin=min_margin, rn_decode=rn_decode,
        geom_board_xy=geom_board_xy, geom_fill=geom_fill,
        geom_ransac=geom_ransac, return_filled=True,
    )
    solve = lambda ip, v: solve_pnp(object_points, ip, v, K, dist, iters=pnp_iters)
    ok, rvec, tvec, rms = jax.vmap(solve)(refined, valid & ~filled)
    return keypoints, valid, refined, ok, rvec, tvec, rms


def load_model_variables(ckpt: Optional[str], kind: str, n_ids: int = 16):
    """Load detector/refinenet variables from any supported checkpoint form.

    - ``*.ckpt`` → reference Lightning torch pickle via the compat converter
      (parity with ``load_models``, ``src/inference.py:73-84``);
    - an orbax checkpoint directory (as written by the training CLIs);
    - ``None`` → freshly-initialized random weights.
    """
    import jax

    from deepcharuco_tpu.models import Detector, RefineNet

    if kind == "detector":
        model = Detector(n_ids=n_ids, dtype=jnp.float32)
        example = jnp.zeros((1, 48, 48, 1), jnp.float32)
    else:
        model = RefineNet(dtype=jnp.float32)
        example = jnp.zeros((1, 24, 24, 1), jnp.float32)

    if ckpt is None:
        return model.init(jax.random.PRNGKey(0), example)

    if ckpt.endswith(".ckpt"):
        from deepcharuco_tpu.compat import (
            detector_variables_from_torch,
            load_lightning_checkpoint,
            refinenet_variables_from_torch,
        )

        sd = load_lightning_checkpoint(ckpt)
        conv = (detector_variables_from_torch if kind == "detector"
                else refinenet_variables_from_torch)
        return conv(sd)

    if ckpt.endswith(".npz"):
        return variables_from_npz(ckpt)

    import os

    from deepcharuco_tpu.train.checkpoints import CheckpointManager

    directory, name = os.path.split(ckpt.rstrip("/"))
    mgr = CheckpointManager(directory or ".")
    restored = mgr.restore(name)
    return {"params": restored["params"], "batch_stats": restored["batch_stats"]}


def variables_to_npz(path: str, variables) -> None:
    """Flatten a Flax variable tree into a compressed ``.npz`` (keys are
    '/'-joined paths) — the portable single-file weight format for shipping
    trained models in-repo."""
    import jax

    def name_of(entry):
        k = getattr(entry, "key", None)
        if isinstance(k, str):
            return k
        s = str(entry)
        return s.strip("[]'\"")

    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        key = "/".join(name_of(k) for k in kp)
        flat[key] = np.asarray(leaf)
    np.savez_compressed(path, **flat)


def merge_variables(dst, src, _path=""):
    """Overlay ``src`` leaves onto ``dst`` where the tree path exists and the
    shape matches; leaves unique to either side are left as-is in ``dst``.

    Returns (merged, loaded_paths, skipped_paths). Used to warm-start a
    superset architecture from a subset checkpoint — e.g. the 32-patch
    RefineNet (extra ``conv2c``/``conv2d``) from the shipped 24-patch
    weights: shared layers load, new layers keep their fresh init.
    """
    loaded, skipped = [], []
    if isinstance(dst, dict) and isinstance(src, dict):
        merged = {}
        for k, v in dst.items():
            if k in src:
                m, lo, sk = merge_variables(v, src[k], f"{_path}/{k}")
                merged[k] = m
                loaded += lo
                skipped += sk
            else:
                merged[k] = v
                skipped.append(f"{_path}/{k} (absent in source)")
        for k in src:
            if k not in dst:
                skipped.append(f"{_path}/{k} (absent in target)")
        return merged, loaded, skipped
    if getattr(dst, "shape", None) == getattr(src, "shape", ()):
        return src, [_path], []
    return dst, [], [f"{_path} (shape {getattr(src, 'shape', '?')} vs "
                     f"{getattr(dst, 'shape', '?')})"]


def variables_from_npz(path: str):
    """Inverse of :func:`variables_to_npz`."""
    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree


def is_quantized_npz(ckpt: Optional[str]) -> bool:
    """True if ``ckpt`` is an int8 detector artifact (models/quant.py
    ``qvars_to_npz`` layout): the ``__quant__`` marker key, or (for
    artifacts written before the marker) a flat ``conv1a/w`` kernel that is
    actually int8. Missing/corrupt files return False so the f32 loader
    raises its own, clearer error."""
    if not (ckpt and str(ckpt).endswith(".npz") and os.path.isfile(ckpt)):
        return False
    try:
        with np.load(ckpt) as z:
            if "__quant__" in z.files:
                return True
            return "conv1a/w" in z.files and z["conv1a/w"].dtype == np.int8
    except (OSError, ValueError, zipfile.BadZipFile):
        return False


def load_detector_any(ckpt: Optional[str], n_ids: int,
                      compute_dtype=jnp.bfloat16):
    """Return ``(detector_like, variables)`` for any detector checkpoint:
    the Flax :class:`Detector` for f32/orbax/torch checkpoints, or the int8
    :class:`~deepcharuco_tpu.models.quant.QuantDetector` when ``ckpt`` is a
    quantized artifact (written by ``scripts/quantize_detector.py``)."""
    if is_quantized_npz(ckpt):
        from deepcharuco_tpu.models.quant import QuantDetector, qvars_from_npz

        return QuantDetector(n_ids), qvars_from_npz(ckpt)
    return (Detector(n_ids=n_ids, dtype=compute_dtype),
            load_model_variables(ckpt, "detector", n_ids))


def load_pipeline(config: Config, deepc_ckpt: Optional[str] = None,
                  refinenet_ckpt: Optional[str] = None,
                  camera: Optional[Camera] = None,
                  compute_dtype=jnp.bfloat16,
                  rn_upsample: str = "nearest",
                  rn_patch_size: int = 24,
                  rn_decode: Optional[str] = None,
                  hires=False,
                  geom_decode: bool = False,
                  geom_fill: bool = False,
                  geom_ransac: int = 32) -> "InferencePipeline":
    """Parity entry point for reference ``load_models`` + pipeline assembly.

    ``hires``: False (base resolution), True/2 (2× patch tap), or 4.

    An int8 detector artifact (``scripts/quantize_detector.py``) is
    auto-detected from its npz layout and served through
    :class:`~deepcharuco_tpu.models.quant.QuantDetector` — no flag needed."""
    det_quant = "int8" if is_quantized_npz(deepc_ckpt) else None
    if det_quant:
        from deepcharuco_tpu.models.quant import qvars_from_npz

        dv = qvars_from_npz(deepc_ckpt)
    else:
        dv = load_model_variables(deepc_ckpt, "detector", config.n_ids)
    rv = (load_model_variables(refinenet_ckpt, "refinenet")
          if refinenet_ckpt is not None else None)
    return InferencePipeline(config, dv, rv, camera=camera,
                             det_quant=det_quant,
                             compute_dtype=compute_dtype,
                             rn_upsample=rn_upsample,
                             rn_patch_size=rn_patch_size,
                             rn_decode=rn_decode, hires=hires,
                             geom_decode=geom_decode, geom_fill=geom_fill,
                             geom_ransac=geom_ransac)


class InferencePipeline:
    """Convenience wrapper: jits the fused program once, numpy in/out.

    Functional analogue of the reference's ``load_models`` + ``infer_image``
    + ``solve_pnp`` triple (``src/inference.py:15-84``), minus the host
    round-trips.
    """

    def __init__(self, config: Config, det_vars, rn_vars=None,
                 camera: Optional[Camera] = None,
                 compute_dtype=jnp.bfloat16, pnp_iters: int = 20,
                 soft_refine: bool = False,
                 min_margin: Optional[float] = None,
                 rn_upsample: str = "nearest",
                 rn_patch_size: int = 24,
                 decode_capacity: int = 1,
                 rn_decode: Optional[str] = None,
                 hires=False,
                 geom_decode: bool = False,
                 geom_fill: bool = False,
                 geom_ransac: int = 32,
                 det_quant: Optional[str] = None):
        self.config = config
        self.n_ids = config.n_ids
        if det_quant == "int8":
            # det_vars is the int8 qvars pytree (models/quant.py);
            # QuantDetector mirrors Detector.apply's input/output contract.
            from deepcharuco_tpu.models.quant import QuantDetector

            self.detector = QuantDetector(config.n_ids)
        elif det_quant is not None:
            raise ValueError(f"unknown det_quant {det_quant!r}")
        else:
            self.detector = Detector(n_ids=config.n_ids, dtype=compute_dtype)
        needs_offset = rn_decode in ("offset", "avg")
        self.refinenet = (RefineNet(dtype=compute_dtype, upsample=rn_upsample,
                                    patch_size=rn_patch_size,
                                    offset_head=needs_offset)
                          if rn_vars is not None else None)
        self.det_vars = jax.device_put(det_vars)
        self.rn_vars = jax.device_put(rn_vars) if rn_vars is not None else None
        self.camera = camera
        self.object_points = jnp.asarray(
            inner_corner_object_points(config.row_count, config.col_count,
                                       config.square_len)
        )
        # Geometry-consistent decode (opt-in; ops/geom.py): reselect per-id
        # candidates by planar-homography consistency with the board.
        if geom_decode and decode_capacity > 1:
            raise ValueError("geom_decode and decode_capacity>1 are exclusive")
        if geom_fill and not geom_decode:
            raise ValueError("geom_fill requires geom_decode=True")
        board_xy = self.object_points[:, :2] if geom_decode else None

        # Hi-res patch tap mode: detect()/detect_with_pose() take frames at
        # ``hires``× the config resolution (hires=True ≡ 2; e.g. the camera's
        # native 640×480 for a 320×240 detector grid); outputs stay in
        # LOW-res units. The camera, if given, is the one calibrated at the
        # INPUT (hi-res) resolution — it is rescaled to pooled-view units
        # here (Camera.scaled).
        self.hires_scale = (2 if hires is True else int(hires)) if hires else 1
        self.hires = bool(hires)
        if hires:
            if self.hires_scale not in (2, 4):
                raise ValueError("hires accepts True/2/4, got "
                                 f"{hires!r}")
            if self.refinenet is None:
                raise ValueError("hires tap needs RefineNet weights "
                                 "(the full-res patches ARE the point)")
            if decode_capacity > 1:
                raise ValueError("hires does not support decode_capacity > 1")
            hires_mode = rn_decode or "soft"
            s = self.hires_scale
            self._two_stage = jax.jit(
                lambda dv, rv, x: two_stage_forward_hires(
                    self.detector, self.refinenet, dv, rv, x, self.n_ids,
                    min_margin=min_margin, rn_decode=hires_mode,
                    geom_board_xy=board_xy, geom_fill=geom_fill,
                    geom_ransac=geom_ransac, scale=s,
                )
            )
            if camera is not None:
                cam_lo = camera.scaled(1.0 / s)
                K = jnp.asarray(cam_lo.K, jnp.float32)
                dist = jnp.asarray(cam_lo.dist, jnp.float32)
                self._full = jax.jit(
                    lambda dv, rv, x: full_forward_hires(
                        self.detector, self.refinenet, dv, rv, x, self.n_ids,
                        self.object_points, K, dist, pnp_iters,
                        min_margin=min_margin, rn_decode=hires_mode,
                        geom_board_xy=board_xy, geom_fill=geom_fill,
                        geom_ransac=geom_ransac, scale=s,
                    )
                )
            else:
                self._full = None
            return

        # decode_capacity > 1: duplicate-preserving detect() with K slots per
        # id (reference keeps every cell; see two_stage_forward). The pose
        # path is per-id by construction (object points indexed by id), so
        # _full always runs the one-slot decode.
        self._two_stage = jax.jit(
            lambda dv, rv, x: two_stage_forward(
                self.detector, self.refinenet, dv, rv, x, self.n_ids,
                soft_refine=soft_refine, min_margin=min_margin,
                decode_capacity=decode_capacity, rn_decode=rn_decode,
                geom_board_xy=board_xy, geom_fill=geom_fill,
                geom_ransac=geom_ransac,
            )
        )
        if camera is not None:
            K = jnp.asarray(camera.K, jnp.float32)
            dist = jnp.asarray(camera.dist, jnp.float32)
            self._full = jax.jit(
                lambda dv, rv, x: full_forward(
                    self.detector, self.refinenet, dv, rv, x, self.n_ids,
                    self.object_points, K, dist, pnp_iters,
                    soft_refine=soft_refine, min_margin=min_margin,
                    rn_decode=rn_decode, geom_board_xy=board_xy,
                    geom_fill=geom_fill, geom_ransac=geom_ransac,
                )
            )
        else:
            self._full = None

    # ---------------- numpy-facing API ----------------

    def detect(self, frames: np.ndarray):
        """frames: (N,H,W,3) BGR uint8 / (N,H,W) gray →
        (keypoints, valid, refined) numpy arrays."""
        kp, valid, refined = self._two_stage(self.det_vars, self.rn_vars,
                                             jnp.asarray(frames))
        return np.asarray(kp), np.asarray(valid), np.asarray(refined)

    def detect_with_pose(self, frames: np.ndarray):
        """→ (keypoints, valid, refined, ok, rvec, tvec, reproj_rms)."""
        if self._full is None:
            raise ValueError("InferencePipeline was built without a Camera")
        out = self._full(self.det_vars, self.rn_vars, jnp.asarray(frames))
        return tuple(np.asarray(o) for o in out)

    def input_coords(self, xy: np.ndarray) -> np.ndarray:
        """Map pipeline-output coordinates to INPUT-frame pixel units.

        The hires tap reports corners in pooled-view (low-res) units; for
        drawing on or printing against the caller's full-resolution frame,
        apply the pool-center contract ``x_hi = s·x_lo + (s−1)/2``. Identity
        for the base-resolution pipeline."""
        xy = np.asarray(xy)
        s = self.hires_scale
        return s * xy + (s - 1) * 0.5 if self.hires else xy

    def keypoint_array(self, refined: np.ndarray, valid: np.ndarray):
        """One frame's keypoints + mask → the reference's (M, 3) float
        ``[x, y, id]`` rows sorted by id (``inference.py:68-69``).

        Accepts both decode shapes: (n_ids, 2)/(n_ids,) from the default
        pipeline, or (n_ids, K, 2)/(n_ids, K) from a ``decode_capacity > 1``
        pipeline — duplicate slots become duplicate rows with the same id,
        exactly the reference's variable-length output."""
        refined = np.asarray(refined)
        valid = np.asarray(valid)
        if valid.ndim == 2:  # capacity-K decode: flatten slots
            ids2d, slots = np.nonzero(valid)
            rows = refined[ids2d, slots]
            ids = ids2d
        else:
            ids = np.nonzero(valid)[0]
            rows = refined[ids]
        return np.concatenate(
            [rows, ids[:, None].astype(refined.dtype)], axis=1
        )
