"""Synthetic training-sample generation: augmented board pasted on photos.

Reference pipeline (``src/transformations.py:55-142``, ``custom_aug.py:12-62``):
1. render the board once at dataset init,
2. per sample: random affine (+ optional coarse dropout) on board+mask+corners,
3. random flip/rotate/crop on the background photo,
4. paste board over photo through the warped mask (``PasteBoard``),
5. photometric stack on the composite,
6. with probability ``negative_p`` emit a background-only negative sample
   with all keypoints invalid (``transformations.py:137``, keypoints → −1).

Same distribution semantics here, explicit ``np.random.Generator``
(validation streams seed with 42 — ``data.py:64``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from deepcharuco_tpu.data import augment as A
from deepcharuco_tpu.configs import Config


@dataclasses.dataclass
class SynthSample:
    image: np.ndarray       # (H, W, 3) uint8 BGR composite
    keypoints: np.ndarray   # (M, 2) float — visible inner corners
    kpt_ids: np.ndarray     # (M,) int corner ids
    is_negative: bool


class BoardSynthesizer:
    """Functional analogue of the reference ``Transformation`` class.

    ``refinenet=True`` narrows the affine ranges and disables dropout /
    negatives exactly as the reference does (``transformations.py:23-26``,
    ``data_refinenet.py:110-111``).
    """

    def __init__(self, config: Config, negative_p: float = 0.05,
                 refinenet: bool = False, seed: Optional[int] = None,
                 use_native: bool = True):
        self.config = config
        self.negative_p = 0.0 if refinenet else negative_p
        self.refinenet = refinenet
        self.rng = np.random.default_rng(seed)
        self.input_hw = config.input_hw  # (H, W)
        self._native = None
        if use_native:
            try:
                from deepcharuco_tpu.data import native

                if native.available():
                    self._native = native
            except Exception:
                self._native = None

        # Render the board once (host cv2, setup time — transformations.py:77-78)
        from deepcharuco_tpu import board as B

        min_r = min(config.input_size)
        self.board_img, self.corners = B.board_image(
            B.get_board(config), (min_r, min_r), config.row_count, config.col_count
        )
        self.ids = np.arange(self.corners.shape[0])
        self.board_mask = np.full(self.board_img.shape[:2], 255, np.uint8)

        if refinenet:
            self.affine_kw = dict(scale_range=(0.3, 0.75), translate_frac=(0.0, 0.0))
            self.dropout_p = 0.0
        else:
            self.affine_kw = dict(scale_range=(0.25, 0.9),
                                  translate_frac=(-0.45, 0.45))
            self.dropout_p = 0.4

    # ------------------------------------------------------------------

    def _augment_board(self):
        """Pad board to frame, random affine, optional dropout.
        Returns (board_bgr, mask, keypoints, kp_visible)."""
        hw = self.input_hw
        img, kpts = A.pad_to_size(self.board_img, hw, self.corners.astype(np.float64))
        mask, _ = A.pad_to_size(self.board_mask, hw)

        M = A.affine_matrix(self.rng, hw, rotate_deg=(-360, 360),
                            shear_deg=(-35, 35), **self.affine_kw)
        img = A.warp_affine(img, M, hw)
        mask = A.warp_affine(mask, M, hw, nearest=True)
        kpts = A.transform_keypoints(kpts, M)
        visible = A.keypoints_in_bounds(kpts, hw)

        if self.dropout_p > 0 and self.rng.random() < self.dropout_p:
            img, mask, visible = A.coarse_dropout(self.rng, img, mask, kpts, visible)
        return img, mask, kpts, visible

    def _augment_background(self, photo: np.ndarray) -> np.ndarray:
        """Flip / rotate-crop / pad / random-crop to frame size
        (``transformations.py:90-99``)."""
        hw = self.input_hw
        photo = A.random_flip(self.rng, photo)
        photo = A.random_rotate_crop(self.rng, photo)
        return A.random_crop(self.rng, photo, hw)

    # ------------------------------------------------------------------

    def __call__(self, photo: np.ndarray) -> SynthSample:
        return self.synthesize(photo)

    def synthesize(self, photo: np.ndarray) -> SynthSample:
        board, mask, kpts, visible = self._augment_board()
        bg = self._augment_background(photo)

        is_negative = bool(self.rng.random() < self.negative_p)
        if is_negative:
            kpts_out = np.zeros((0, 2), np.float32)
            ids_out = np.zeros((0,), np.int64)
        else:
            kpts_out = kpts[visible].astype(np.float32)
            ids_out = self.ids[visible]

        if self._native is not None:
            # fused paste+photometric in one native pass; blur radius drawn
            # with roughly the python stack's gaussian+motion blur frequency
            blur = int(self.rng.integers(1, 3)) if self.rng.random() < 0.6 else 0
            composite = self._native.composite_photometric(
                int(self.rng.integers(0, 2**63)), board, mask, bg,
                is_negative=is_negative, blur_radius=blur,
            )
        else:
            if is_negative:
                composite = bg
            else:
                composite = bg.copy()
                m = mask.astype(bool)
                composite[m] = board[m]
            composite = A.photometric_pipeline(self.rng, composite)
        return SynthSample(image=composite, keypoints=kpts_out,
                           kpt_ids=ids_out, is_negative=is_negative)
