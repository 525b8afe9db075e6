"""On-device synthetic data generation — the TPU-native answer to the
host-bound input pipeline.

The reference's throughput machinery is CPU augmentation in DataLoader
workers (``src/train.py:27-32``); on a host with few cores that pipeline
starves the accelerator (measured: ~45 samples/s on this VM's single core vs
thousands of device steps/s). Everything the board pipeline does — affine
warp, paste, photometric corruption, dropout, label building — is dense
pixel math, so this module runs the *entire* synthesis inside the training
jit: the host supplies only PRNG keys.

Distribution parity with ``src/transformations.py`` (documented deltas):
- Affine ranges identical (scale 0.25–0.9, rotate ±360°, shear ±35°,
  translate ±0.45, negative_p, dropout p=0.4 with 1–6 holes of 16–64 px).
- Synthesis happens directly in *grayscale*: the detector consumes grayscale
  (``pre_bgr_image``), so the reference's color-space jitters (ColorJitter /
  RGBShift) act on the input only through their luma projection — modeled
  here by brightness/contrast/noise on the gray channel.
- Backgrounds are procedural (low-frequency gradients + blobs + noise) by
  default; a device-resident photo bank (``bg_bank`` / ``--bg-bank``) mixes
  in rotated/flipped crops of real or host-generated images uploaded once at
  start — the on-device analogue of the reference's paste-on-COCO diet. The
  host-side pipeline also remains available when a photo corpus exists.
- Label-map cell collisions resolve by random scatter order (a uniformly
  random winner among the ≤2 colliders) instead of the reference's 50% swap
  (``data.py:44-47``) — the same marginal distribution for two colliders.
- The RefineNet path labels with the *exact* sub-pixel corner from the warp
  (the reference approximates it with ``cv2.cornerSubPix`` on the resampled
  patch, ``data_refinenet.py:62-65``) — strictly cleaner supervision.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from deepcharuco_tpu.configs import Config


# ---------------------------------------------------------------------------
# Sampling helpers
# ---------------------------------------------------------------------------

def _bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Bilinear sample img (H, W) at float coords; returns (values, inbounds)."""
    h, w = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    val = ((1 - fy) * ((1 - fx) * v00 + fx * v01)
           + fy * ((1 - fx) * v10 + fx * v11))
    inb = (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
    return val, inb


def _affine_params(key, hw: Tuple[int, int], scale_range, translate_frac,
                   axis_snap_p: float = 0.0):
    """Forward 2×2 A and translation t about the canvas center (same
    construction as the host path, augment.affine_matrix).

    ``axis_snap_p``: probability of snapping the rotation to the nearest
    multiple of 90° (±2° jitter) and shrinking shear to ±3°. Uniform ±360°
    rotation makes exactly-frontal axis-aligned boards vanishingly rare, and
    the round-1 weights were measurably weak on them (1/16 corners on a
    frontal full-scale render; every interior checkerboard corner is locally
    identical, so the ids head needs training signal at this symmetric
    pose). Off by default — reference distribution parity.
    """
    h, w = hw
    ks = jax.random.split(key, 7)
    s = jax.random.uniform(ks[0], (), minval=scale_range[0], maxval=scale_range[1])
    ang = jax.random.uniform(ks[1], (), minval=-2 * jnp.pi, maxval=2 * jnp.pi)
    sh_deg = jax.random.uniform(ks[2], (2,), minval=-35.0, maxval=35.0)
    if axis_snap_p > 0.0:
        snap = jax.random.uniform(ks[5]) < axis_snap_p
        ang_snapped = (jnp.round(ang / (jnp.pi / 2)) * (jnp.pi / 2)
                       + jax.random.uniform(ks[6], (), minval=-0.035,
                                            maxval=0.035))
        ang = jnp.where(snap, ang_snapped, ang)
        sh_deg = jnp.where(snap, sh_deg * (3.0 / 35.0), sh_deg)
    sh = jnp.tan(jnp.deg2rad(sh_deg))
    t_frac = jax.random.uniform(ks[3], (2,), minval=translate_frac[0],
                                maxval=translate_frac[1])
    c, si = jnp.cos(ang), jnp.sin(ang)
    R = jnp.array([[c, -si], [si, c]])
    Sh = jnp.array([[1.0, sh[0]], [sh[1], 1.0]])
    A = (R @ Sh) * s
    center = jnp.array([w / 2.0, h / 2.0])
    t = center + t_frac * jnp.array([w, h]) - A @ center
    return A, t


def _procedural_bg(key, hw: Tuple[int, int]):
    """Low-frequency gray background: bilinear corner gradient + 2 soft blobs
    + broadband noise, in [0, 255]."""
    h, w = hw
    ks = jax.random.split(key, 6)
    corners = jax.random.uniform(ks[0], (2, 2), minval=0.0, maxval=255.0)
    fy = jnp.linspace(0.0, 1.0, h)[:, None]
    fx = jnp.linspace(0.0, 1.0, w)[None, :]
    base = ((1 - fy) * ((1 - fx) * corners[0, 0] + fx * corners[0, 1])
            + fy * ((1 - fx) * corners[1, 0] + fx * corners[1, 1]))
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    for i in range(2):
        kk = jax.random.split(ks[1 + i], 4)
        cx = jax.random.uniform(kk[0], (), minval=0.0, maxval=w)
        cy = jax.random.uniform(kk[1], (), minval=0.0, maxval=h)
        r = jax.random.uniform(kk[2], (), minval=h / 8.0, maxval=h / 2.0)
        col = jax.random.uniform(kk[3], (), minval=0.0, maxval=255.0)
        d2 = (xs - cx) ** 2 + (ys - cy) ** 2
        a = jnp.where(d2 < r * r, 0.45, 0.0)
        base = base * (1 - a) + col * a
    sigma = jax.random.uniform(ks[4], (), minval=2.0, maxval=12.0)
    base = base + sigma * jax.random.normal(ks[5], (h, w))
    return jnp.clip(base, 0.0, 255.0)


def _bank_bg(key, bank: jnp.ndarray, hw: Tuple[int, int]):
    """Sample one (H, W) background from an on-device image bank: random
    image, random rotation, per-axis random flip, random window — the
    device-side analogue of the host pipeline's flip/rotate-crop/random-crop
    background augmentation (``data/synth.py _augment_background``,
    reference ``src/transformations.py:90-99``). Edge-clamped bilinear
    sampling (the host path's rotate crops borders instead; at bank
    resolution ≥ 1.4× the frame the clamped band is rarely visible)."""
    nb, hb, wb = bank.shape
    h, w = hw
    ks = jax.random.split(key, 5)
    idx = jax.random.randint(ks[0], (), 0, nb)
    img = bank[idx]
    theta = jax.random.uniform(ks[1], (), minval=-jnp.pi, maxval=jnp.pi)
    flip = jax.random.randint(ks[2], (2,), 0, 2) * 2 - 1  # ±1 per axis
    c, s = jnp.cos(theta), jnp.sin(theta)
    ys = (jnp.arange(h, dtype=jnp.float32) - h / 2.0)[:, None]
    xs = (jnp.arange(w, dtype=jnp.float32) - w / 2.0)[None, :]
    xs = xs * flip[0]
    ys = ys * flip[1]
    cx = jax.random.uniform(ks[3], (), minval=0.4 * w, maxval=wb - 0.4 * w)
    cy = jax.random.uniform(ks[4], (), minval=0.4 * h, maxval=hb - 0.4 * h)
    sx = c * xs - s * ys + cx
    sy = s * xs + c * ys + cy
    val, _ = _bilinear_sample(img, sx, sy)
    return val


def make_background_bank(n: int = 64, size_hw: Tuple[int, int] = (480, 640),
                         seed: int = 0, labels=None, images_folder=None):
    """Host-side, setup-time: build an (n, H, W) float32 grayscale bank from
    the configured photo source (COCO json / directory / procedural — same
    resolution order as the host pipeline, ``data/sources.open_image_source``)
    for one-time upload to the device. This is how real photo corpora reach
    the on-device synthesis path: N images move host→HBM once at train
    start; every sample after that crops/rotates them on device."""
    import cv2
    import numpy as np

    from deepcharuco_tpu.data.sources import open_image_source

    src = open_image_source(labels, images_folder, size_hw=size_hw)
    rng = np.random.default_rng(seed)
    out = np.zeros((n, *size_hw), np.float32)
    for i in range(n):
        img = src.get(int(rng.integers(0, len(src))))
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        if gray.shape != tuple(size_hw):
            gray = cv2.resize(gray, (size_hw[1], size_hw[0]),
                              interpolation=cv2.INTER_AREA)
        out[i] = gray.astype(np.float32)
    return out


def _dropout_mask(key, hw: Tuple[int, int], p: float):
    """CoarseDropout (1–6 holes of 16–64 px, prob p): returns a (H, W) bool
    'hole' map (True = punched out)."""
    h, w = hw
    ks = jax.random.split(key, 4)
    apply = jax.random.uniform(ks[0]) < p
    n_holes = jax.random.randint(ks[1], (), 1, 7)
    sizes = jax.random.randint(ks[2], (6, 2), 16, 65)
    pos = jax.random.uniform(ks[3], (6, 2))
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    hole = jnp.zeros((h, w), bool)
    for i in range(6):
        y0 = (pos[i, 0] * (h - sizes[i, 0])).astype(jnp.int32)
        x0 = (pos[i, 1] * (w - sizes[i, 1])).astype(jnp.int32)
        inside = ((ys >= y0) & (ys < y0 + sizes[i, 0])
                  & (xs >= x0) & (xs < x0 + sizes[i, 1]))
        hole = hole | (inside & (i < n_holes))
    return hole & apply


def _photometric(key, img: jnp.ndarray, low_gain_p: float = 0.0,
                 low_gain_range=(0.08, 0.6)):
    """Gray photometric stack: contrast/brightness/noise/multiplicative +
    probabilistic 3-tap blur. img in [0,255].

    ``low_gain_p`` adds the MULTIPLICATIVE low-light model the reference
    diet lacks: its darkness is additive (RandomBrightnessContrast,
    ``src/transformations.py:115`` — bright pixels keep their gradient
    structure until clipping), whereas a real under-exposed sensor scales
    the whole signal (gain γ · luminance), adds read noise, and quantizes
    to uint8 — squeezing a board into a handful of gray levels. Measured
    consequence (tests/test_charuco_calib.py): the shipped round-3 detector
    fails below ~0.2× multiplicative brightness despite training to −0.8
    additive. With probability ``low_gain_p`` the finished frame is scaled
    by γ ~ U(low_gain_range), read-noised, and rounded to integer levels.
    ``low_gain_p=0`` keeps the stream bit-identical to rounds 1–5 (no extra
    key consumption on the base path).
    """
    ks = jax.random.split(key, 8)
    contrast = jnp.where(jax.random.uniform(ks[0]) < 0.5,
                         jax.random.uniform(ks[1], (), minval=0.8, maxval=1.2), 1.0)
    img = (img - 128.0) * contrast + 128.0
    noise_on = jax.random.uniform(ks[2]) < 0.5
    sigma = jnp.sqrt(jax.random.uniform(ks[3], (), minval=10.0, maxval=50.0))
    img = img + jnp.where(noise_on, sigma, 0.0) * jax.random.normal(ks[4], img.shape)
    mult = jnp.where(jax.random.uniform(ks[5]) < 0.5,
                     jax.random.uniform(ks[6], (), minval=0.95, maxval=1.05), 1.0)
    img = img * mult
    bright = jnp.where(jax.random.uniform(ks[7]) < 0.5,
                       jax.random.uniform(jax.random.fold_in(key, 99), (),
                                          minval=-0.8, maxval=0.35) * 255.0, 0.0)
    img = img + bright
    # blur: blend towards a 3×3 box-filtered copy with random strength
    kb = jax.random.fold_in(key, 7)
    blur_w = jnp.where(jax.random.uniform(kb) < 0.6,
                       jax.random.uniform(jax.random.fold_in(kb, 1), (),
                                          minval=0.3, maxval=1.0), 0.0)
    blurred = _box3(img)
    img = img * (1 - blur_w) + blurred * blur_w
    img = jnp.clip(img, 0.0, 255.0)
    if low_gain_p > 0.0:
        kg = jax.random.fold_in(key, 23)
        on = jax.random.uniform(jax.random.fold_in(kg, 1)) < low_gain_p
        gain = jnp.where(on, jax.random.uniform(
            kg, (), minval=low_gain_range[0], maxval=low_gain_range[1]), 1.0)
        read_sig = jnp.where(on, jax.random.uniform(
            jax.random.fold_in(kg, 2), (), minval=1.0, maxval=6.0), 0.0)
        dark = img * gain + read_sig * jax.random.normal(
            jax.random.fold_in(kg, 3), img.shape)
        # uint8 quantization dominates the dark signal (γ=0.1 leaves ~25
        # gray levels); round only on the low-gain branch
        img = jnp.where(on, jnp.round(jnp.clip(dark, 0.0, 255.0)), img)
    return img


def _box3(img: jnp.ndarray) -> jnp.ndarray:
    """3×3 box filter with edge replication, channel-free (H, W)."""
    p = jnp.pad(img, 1, mode="edge")
    out = (
        p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
        + p[1:-1, :-2] + p[1:-1, 1:-1] + p[1:-1, 2:]
        + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
    ) / 9.0
    return out


# ---------------------------------------------------------------------------
# The synthesizer
# ---------------------------------------------------------------------------

class DeviceSynthesizer:
    """Generates normalized detector training batches entirely on device.

    Usage::

        synth = DeviceSynthesizer(config)
        images, loc, ids = synth.batch(jax.random.PRNGKey(0), 32)  # jittable
    """

    def __init__(self, config: Config, negative_p: float = 0.05,
                 refinenet_ranges: bool = False, axis_snap_p: float = 0.0,
                 bg_bank=None, bg_bank_p: float = 0.5,
                 scale_range=None, perspective_p: float = 0.0,
                 low_gain_p: float = 0.0, low_gain_min: float = 0.08):
        import numpy as np

        from deepcharuco_tpu import board as B

        self.config = config
        self.hw = config.input_hw
        self.n_ids = config.n_ids
        self.negative_p = negative_p
        self.axis_snap_p = axis_snap_p  # see _affine_params
        # Device-resident photo-background bank (VERDICT r2 missing #2):
        # (B, Hb, Wb) grayscale images uploaded ONCE; per sample, with prob
        # bg_bank_p, the background is a random rotated/flipped window of a
        # random bank image instead of the procedural generator — the
        # on-device analogue of the reference's paste-on-COCO diet
        # (src/data.py:60-69). bg_bank=None keeps the round-1/2 stream
        # bit-identical (no extra key consumption on the base path).
        self.bg_bank = (jnp.asarray(bg_bank, jnp.float32)
                        if bg_bank is not None else None)
        self.bg_bank_p = bg_bank_p
        # Perspective diet (round 3): with this probability the affine warp
        # gains projective terms, i.e. the full homography a tilted planar
        # board actually undergoes. The reference trains affine+shear only
        # (src/transformations.py:22-52); the IMG_7412 per-corner analysis
        # (BENCH_NOTES) showed both missed corners sit at the FAR,
        # foreshortened end of the tilted board — a regime affine synthesis
        # never produces. 0 keeps the stream bit-identical to rounds 1-2.
        self.perspective_p = perspective_p
        # Low-light diet (round 5): multiplicative sensor-gain darkening —
        # see _photometric. 0 keeps the stream bit-identical to rounds 1-5.
        self.low_gain_p = low_gain_p
        self.low_gain_min = low_gain_min
        if refinenet_ranges:  # transformations.py:24-26
            self.scale_range = (0.3, 0.75)
            self.translate_frac = (0.0, 0.0)
            self.dropout_p = 0.0
        else:
            self.scale_range = (0.25, 0.9)
            self.translate_frac = (-0.45, 0.45)
            self.dropout_p = 0.4
        # Diet-extension override (e.g. (0.25, 1.05) teaches full-frame
        # boards — the reference's 0.25–0.9 never shows scale ≈ 1.0, which
        # is exactly where frontal full-scale probes failed; eval streams
        # keep the default range for cross-round comparability).
        if scale_range is not None:
            self.scale_range = tuple(scale_range)

        # Render the board once on host (cv2, setup time), move gray to device.
        min_r = min(config.input_size)
        img, corners = B.board_image(B.get_board(config), (min_r, min_r),
                                     config.row_count, config.col_count)
        gray = img[..., 0].astype(np.float32)  # board render is grayscale-valued
        # Pad into the frame canvas (centered), as the host pipeline does.
        h, w = self.hw
        canvas = np.zeros((h, w), np.float32)
        top, left = (h - min_r) // 2, (w - min_r) // 2
        canvas[top:top + min_r, left:left + min_r] = gray
        self.board = jnp.asarray(canvas)
        # Board-region mask in canvas coords (the un-warped paste mask).
        self.board_x0, self.board_y0 = left, top
        self.board_x1, self.board_y1 = left + min_r, top + min_r
        self.corners = jnp.asarray(corners.astype(np.float32)
                                   + np.array([left, top], np.float32))

    # ------------------------------------------------------------------

    def _sample(self, key):
        """One sample: returns (image_norm (H,W,1), loc (Hc,Wc), ids (Hc,Wc))."""
        img, loc, ids, _, _ = self._sample_full(key)
        return img, loc, ids

    def _sample_full(self, key):
        """As :meth:`_sample` plus (kpts (n_ids,2) float sub-pixel corners,
        visible (n_ids,) bool)."""
        h, w = self.hw
        ks = jax.random.split(key, 6)
        A, t = _affine_params(ks[0], self.hw, self.scale_range,
                              self.translate_frac,
                              axis_snap_p=self.axis_snap_p)

        # Optional projective terms (see __init__): forward map becomes the
        # homography x_d = (A·x_s + t) / (pv·x_s + d0), normalized so the
        # canvas center keeps its affine scale. pv = 0 reduces exactly to
        # the affine path (keys fold_in-derived — base stream unchanged).
        if self.perspective_p > 0.0:
            kp_ = jax.random.fold_in(ks[0], 7)
            on = (jax.random.uniform(jax.random.fold_in(kp_, 1))
                  < self.perspective_p)
            pv = jnp.where(on, jax.random.uniform(
                kp_, (2,), minval=-8e-4, maxval=8e-4), 0.0)
        else:
            pv = jnp.zeros(2, jnp.float32)
        center = jnp.array([w / 2.0, h / 2.0])
        d0 = 1.0 - pv @ center

        # Inverse map for sampling: invert the 3×3 homography once.
        H = jnp.array([[A[0, 0], A[0, 1], t[0]],
                       [A[1, 0], A[1, 1], t[1]],
                       [pv[0], pv[1], d0]])
        Hinv = jnp.linalg.inv(H)
        ys = jnp.arange(h, dtype=jnp.float32)[:, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, :]
        den = Hinv[2, 0] * xs + Hinv[2, 1] * ys + Hinv[2, 2]
        sx = (Hinv[0, 0] * xs + Hinv[0, 1] * ys + Hinv[0, 2]) / den
        sy = (Hinv[1, 0] * xs + Hinv[1, 1] * ys + Hinv[1, 2]) / den
        board_val, inb = _bilinear_sample(self.board, sx, sy)
        # mask: source pixel inside the board square
        on_board = (inb & (sx >= self.board_x0) & (sx <= self.board_x1 - 1)
                    & (sy >= self.board_y0) & (sy <= self.board_y1 - 1))

        bg = _procedural_bg(ks[1], self.hw)
        if self.bg_bank is not None:
            # fold_in keeps the base stream identical when the bank is off
            kb = jax.random.fold_in(ks[1], 101)
            use_bank = (jax.random.uniform(jax.random.fold_in(ks[1], 102))
                        < self.bg_bank_p)
            bg = jnp.where(use_bank, _bank_bg(kb, self.bg_bank, self.hw), bg)
        hole = _dropout_mask(ks[2], self.hw, self.dropout_p)
        is_negative = jax.random.uniform(ks[3]) < self.negative_p
        paste = on_board & ~hole & ~is_negative
        img = jnp.where(paste, board_val, bg)
        img = _photometric(ks[4], img, low_gain_p=self.low_gain_p,
                           low_gain_range=(self.low_gain_min, 0.6))

        # Keypoints: forward-transform the canvas corners (exact through the
        # same homography the pixels went through).
        wk = (self.corners @ pv + d0)[:, None]
        kpts = (self.corners @ A.T + t) / wk  # (n_ids, 2)
        kx, ky = kpts[:, 0], kpts[:, 1]
        kxi = jnp.clip(kx.astype(jnp.int32), 0, w - 1)
        kyi = jnp.clip(ky.astype(jnp.int32), 0, h - 1)
        in_frame = (kx >= 0) & (kx < w) & (ky >= 0) & (ky < h)
        in_hole = hole[kyi, kxi]
        visible = in_frame & ~in_hole & ~is_negative

        # Label maps via random-order scatter (random winner on collisions).
        hc, wc = h // 8, w // 8
        perm = jax.random.permutation(ks[5], self.n_ids)
        cx = jnp.clip((kx / 8.0).astype(jnp.int32), 0, wc - 1)
        cy = jnp.clip((ky / 8.0).astype(jnp.int32), 0, hc - 1)
        cell = cy * wc + cx
        locval = (kx.astype(jnp.int32) % 8) + 8 * (ky.astype(jnp.int32) % 8)
        # invalid slots scatter to a dummy cell
        cell = jnp.where(visible, cell, hc * wc)
        loc_flat = jnp.full((hc * wc + 1,), 64, jnp.int32)
        ids_flat = jnp.full((hc * wc + 1,), self.n_ids, jnp.int32)
        loc_flat = loc_flat.at[cell[perm]].set(locval[perm])
        ids_flat = ids_flat.at[cell[perm]].set(perm.astype(jnp.int32))
        loc = loc_flat[:-1].reshape(hc, wc)
        ids = ids_flat[:-1].reshape(hc, wc)

        img_norm = ((img - 128.0) / 255.0)[..., None]
        return img_norm, loc, ids, kpts, visible

    def batch_body(self, key, batch_size: int):
        """Unjitted batch synthesis (for embedding in larger programs)."""
        return jax.vmap(self._sample)(jax.random.split(key, batch_size))

    def batch_fn(self, batch_size: int):
        """Jitted generator for a fixed batch size: key → (images, loc, ids)."""
        if not hasattr(self, "_fns"):
            self._fns = {}
        if batch_size not in self._fns:
            self._fns[batch_size] = jax.jit(
                lambda key: self.batch_body(key, batch_size))
        return self._fns[batch_size]

    def batch(self, key, batch_size: int):
        """(images (B,H,W,1) f32, loc (B,Hc,Wc) i32, ids (B,Hc,Wc) i32)."""
        return self.batch_fn(batch_size)(key)


class FramePatchSynthesizer:
    """RefineNet patches drawn from full synthesized frames through the SAME
    ``extract_patches`` gather the inference pipeline uses — zero train/test
    distribution gap (the standalone patch sampler below renders patches
    directly, which differs subtly in sharpness/alignment from
    frame-then-crop).

    Per sample: synthesize one detector frame (known exact sub-pixel corner
    positions from the warp), pick a random visible corner, crop the 24×24
    patch at ``round(corner) + jitter`` (jitter ≤ ±3 px, the detector's raw
    error regime), label = Gaussian at ``(corner − center)·8 + 32`` on the
    64×64 grid — the exact inverse of ``refine_keypoints``.
    """

    def __init__(self, config: Config, jitter_px: float = 3.0,
                 per_frame: int = 8, continuous_targets: bool = True,
                 patch_size: int = 24, perspective_p: float = 0.0):
        self.inner = DeviceSynthesizer(config, negative_p=0.0,
                                       perspective_p=perspective_p)
        self.hw = config.input_hw
        self.n_ids = config.n_ids
        self.jitter = jitter_px
        self.per_frame = per_frame  # ≙ reference total=8 patches per image
        self.patch_size = patch_size  # 24 parity / 32 wider-context RefineNet
        # Continuous (non-rounded) Gaussian centers: the target peak sits at
        # the exact sub-pixel corner, so the soft-argmax decode is unbiased.
        # The reference rounds to the 1/8-px grid (data_refinenet.py:84-91),
        # baking up to 1/16 px of quantization into every label.
        self.continuous = continuous_targets

    def _sample(self, key):
        """One frame → (per_frame, 24, 24, 1) patches + (per_frame, 64, 64, 1)
        heats. Short corner lists pad by re-picking (reference's duplication
        padding, data_refinenet.py:163-170)."""
        from deepcharuco_tpu.ops.patches import extract_patches

        h, w = self.hw
        ks = jax.random.split(key, 3)
        img, _, _, kpts, visible = self.inner._sample_full(ks[0])
        in_frame = (visible & (kpts[:, 0] >= 4) & (kpts[:, 0] < w - 4)
                    & (kpts[:, 1] >= 4) & (kpts[:, 1] < h - 4))

        # pick per_frame corners, preferring distinct in-frame ones
        noise = jax.random.uniform(ks[1], (self.per_frame, self.n_ids))
        scores = in_frame[None, :].astype(jnp.float32) * 10.0 + noise
        idx = jnp.argmax(scores, axis=-1)                  # (per_frame,)
        p = kpts[idx]                                      # (per_frame, 2)

        off = jax.random.uniform(ks[2], (self.per_frame, 2),
                                 minval=-self.jitter, maxval=self.jitter)
        center = jnp.round(p + off)
        patches = extract_patches(img[None, ..., 0], center[None],
                                  patch_size=self.patch_size)[0]  # (P,ps,ps)

        hp = (p - center) * 8.0 + 32.0                     # (per_frame, 2)
        if not self.continuous:
            hp = jnp.round(hp)  # reference 1/8-px grid quantization
        hx = jnp.clip(hp[:, 0], 0, 63)[:, None, None]
        hy = jnp.clip(hp[:, 1], 0, 63)[:, None, None]
        gy = jnp.arange(64, dtype=jnp.float32)[None, :, None]
        gx = jnp.arange(64, dtype=jnp.float32)[None, None, :]
        expo = ((gx - hx) ** 2 + (gy - hy) ** 2) / 8.0
        heat = jnp.where(expo > 4.6052, 0.0, jnp.exp(-expo))
        return patches[..., None], heat[..., None]

    def batch_body(self, key, batch_size: int):
        """Unjitted batch synthesis (for embedding in larger programs)."""
        frames = max(1, batch_size // self.per_frame)
        p, hm = jax.vmap(self._sample)(jax.random.split(key, frames))
        ps = self.patch_size
        return (p.reshape(-1, ps, ps, 1)[:batch_size],
                hm.reshape(-1, 64, 64, 1)[:batch_size])

    def batch_fn(self, batch_size: int):
        """key → (batch_size patches, heats); batch_size must be a multiple
        of per_frame (frames = batch_size // per_frame)."""
        if not hasattr(self, "_fns"):
            self._fns = {}
        if batch_size not in self._fns:
            self._fns[batch_size] = jax.jit(
                lambda key: self.batch_body(key, batch_size))
        return self._fns[batch_size]

    def batch(self, key, batch_size: int):
        return self.batch_fn(batch_size)(key)


class DeviceRefineSynthesizer:
    """On-device RefineNet patch generation.

    Emits (patches (B,24,24,1), heatmaps (B,64,64,1)). The corner's exact
    sub-pixel position is known from the warp, so the heatmap target is
    placed at the *continuous* ``(p − c)·8 + 32`` (no grid rounding) —
    consistent with the soft-argmax inference mapping
    ``refined = (softargmax − 32)/8 + c`` (``src/models/refinenet.py:111-114``
    rounds to the 1/8-px grid instead) and free of the reference's
    cornerSubPix approximation. ``continuous_targets=False`` restores the
    reference's quantized labels.
    """

    def __init__(self, config: Config, continuous_targets: bool = True,
                 patch_size: int = 24):
        # Reuse the detector synthesizer at 2× render resolution for sharper
        # source pixels (the reference renders RefineNet data at 2×,
        # data_refinenet.py:97-100).
        import dataclasses as dc

        big = dc.replace(config, input_size=(config.input_size[0] * 2,
                                             config.input_size[1] * 2))
        self.inner = DeviceSynthesizer(big, negative_p=0.0, refinenet_ranges=True)
        self.hw = big.input_hw
        self.n_ids = config.n_ids
        self.continuous = continuous_targets  # see FramePatchSynthesizer
        self.patch_size = patch_size  # 24 parity / 32 wider-context

    def _sample(self, key):
        h, w = self.hw
        ks = jax.random.split(key, 5)
        A, t = _affine_params(ks[0], self.hw, self.inner.scale_range,
                              self.inner.translate_frac)
        det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
        Ainv = jnp.array([[A[1, 1], -A[0, 1]], [-A[1, 0], A[0, 0]]]) / det

        # pick a corner, true sub-pixel position p (in 2×-res coords)
        idx = jax.random.randint(ks[1], (), 0, self.n_ids)
        p = self.inner.corners[idx] @ A.T + t
        # half-res (original) coords: p/2; patch center = integer near p/2
        # offset within ±4 px original (the 64×64 8× window covers ±4 px)
        off = jax.random.uniform(ks[2], (2,), minval=-3.99, maxval=3.99)
        center = jnp.round(p / 2.0 + off)

        # ps×ps patch at original resolution ⇒ sample 2×-res source at
        # stride 2 around the center. Pixel j maps to source c + j − ps/2 —
        # EXACTLY the integer-aligned grid inference-time extract_patches
        # crops (ops/patches.py); any half-pixel offset here would bake a
        # 0.5 px bias into every refined corner.
        half = self.patch_size // 2
        ys = (center[1] + jnp.arange(-half, half, dtype=jnp.float32))[:, None]
        xs = (center[0] + jnp.arange(-half, half, dtype=jnp.float32))[None, :]
        sx_d = 2.0 * xs
        sy_d = 2.0 * ys
        sx = Ainv[0, 0] * (sx_d - t[0]) + Ainv[0, 1] * (sy_d - t[1])
        sy = Ainv[1, 0] * (sx_d - t[0]) + Ainv[1, 1] * (sy_d - t[1])
        val, inb = _bilinear_sample(self.inner.board, sx, sy)
        bg = _procedural_bg(ks[3], (self.patch_size, self.patch_size))
        on_board = (inb & (sx >= self.inner.board_x0) & (sx <= self.inner.board_x1 - 1)
                    & (sy >= self.inner.board_y0) & (sy <= self.inner.board_y1 - 1))
        patch = jnp.where(on_board, val, bg)
        patch = _photometric(ks[4], patch)

        # heatmap target at (p/2 − center)·8 + 32 on the 64×64 grid
        hp = (p / 2.0 - center) * 8.0 + 32.0
        if not self.continuous:
            hp = jnp.round(hp)
        hx = jnp.clip(hp[0], 0, 63)
        hy = jnp.clip(hp[1], 0, 63)
        gy = jnp.arange(64, dtype=jnp.float32)[:, None]
        gx = jnp.arange(64, dtype=jnp.float32)[None, :]
        d2 = (gx - hx) ** 2 + (gy - hy) ** 2
        expo = d2 / (2.0 * 2.0 * 2.0)
        heat = jnp.where(expo > 4.6052, 0.0, jnp.exp(-expo))

        return ((patch - 128.0) / 255.0)[..., None], heat[..., None]

    def batch_body(self, key, batch_size: int):
        """Unjitted batch synthesis (for embedding in larger programs)."""
        return jax.vmap(self._sample)(jax.random.split(key, batch_size))

    def batch_fn(self, batch_size: int):
        if not hasattr(self, "_fns"):
            self._fns = {}
        if batch_size not in self._fns:
            self._fns[batch_size] = jax.jit(
                lambda key: self.batch_body(key, batch_size))
        return self._fns[batch_size]

    def batch(self, key, batch_size: int):
        return self.batch_fn(batch_size)(key)
