"""Geometry-consistent corner decode (training-free, opt-in).

The single-slot decode keeps, per corner id, the highest-confidence cell
claiming that id (``decode.pred_to_keypoints``). On self-similar views —
frontal axis-aligned boards especially — a *wrong* cell can outscore the
true one and steal the slot: on the round-3 frontal probe 42% of missed
corners were exactly this "displaced" pathology (true cell predicts the
right id, loses the slot), and another 16% were neighbor-id confusions.
Both are recoverable at decode time: the board is planar, so all true
corners are related to the board plane by ONE homography, while decoys are
a full board cell (≥8 px) away from their id's true position.

``reselect_by_homography`` runs the duplicate-preserving capacity-K decode
(``decode.pred_to_keypoints_topk``), robustly fits a plane→image homography
(a fixed-shape RANSAC over 4-candidate subsets seeds fixed trim-refit
iterations — IRLS with 0/1 weights), then per id selects the highest-score
candidate whose reprojection sits within ``tol_px`` of the homography
prediction. Ids with no consistent candidate decode as invalid — which
also rejects confident decoys for corners that are actually outside the
frame. A refit-RMS self-consistency gate falls the frame back to the
parity decode when no single homography explains the final selection.

Everything is fixed-shape (n_ids × capacity candidates, unrolled
iterations) — XLA-friendly, no data-dependent control flow. The mode is
OFF by default: the plain decode is the reference-parity path
(``/root/reference/src/models/model_utils.py:81-123`` has no geometric
filtering).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deepcharuco_tpu.pnp.solve import _dlt_homography

from .decode import pred_to_keypoints_topk


def _apply_homography(H: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """(3,3) plane→image homography applied to (M, 2) plane points."""
    p = xy @ H[:, :2].T + H[:, 2]
    return p[:, :2] / jnp.where(jnp.abs(p[:, 2:]) > 1e-9, p[:, 2:], 1e-9)


def _ransac_seed(kp_topk: jnp.ndarray, valid_topk: jnp.ndarray,
                 board_xy: jnp.ndarray, n_subsets: int, tol: float):
    """Consensus-best homography from minimal 4-id subsets (fixed shape).

    The all-points DLT that seeds the trim-refit loop is a *least-squares*
    fit: a handful of confident decoys (a full board cell off the true
    plane) pull it far enough that the loop converges onto the decoy
    constellation instead of trimming it — measured on the 512-sample host
    stream as frames where the "reselected" output simply blesses the
    parity decode's wrong cells (scripts/check_gate_noop.py). Classical
    RANSAC is the textbook fix; this is its XLA form: ``n_subsets`` Gumbel
    top-4 draws of distinct ids that have ANY valid candidate, each paired
    with a uniformly-drawn valid slot (fixed PRNG key — the decode stays
    deterministic), an exact 4-point DLT per subset (vmapped — the 9×9
    eigenvector solve is unrolled, so the whole seed is one batched matmul
    bundle, no data-dependent control flow), and consensus counted per id
    as ANY candidate within ``tol`` of the subset's projection.

    Sampling ALL slots — not just top-1 — matters twice over (measured,
    scripts/probe_lowdet_frames.py): displaced true corners that lost
    slot 0 and loc-gate-override candidates can SEED the fit, so a frame
    whose top-1 set is sparse or decoy-ridden (host frame 138: four
    near-collinear top-1 cells but ~10 true corners in override slots)
    still reaches the true plane; and they VOTE, so the true plane
    out-scores a decoy plane even when the top-1 sets tie. Degenerate
    subsets (collinear points, NaN H) score zero inliers and are never
    picked. Returns (H_best, n_inliers_best).
    """
    n_ids = kp_topk.shape[0]
    any_val = jnp.any(valid_topk, axis=-1)
    keys = jax.random.split(jax.random.PRNGKey(0), n_subsets)

    def sample4(k):
        k1, k2 = jax.random.split(k)
        g = jax.random.gumbel(k1, (n_ids,)) + jnp.where(any_val, 0.0, -1e9)
        i4 = jax.lax.top_k(g, 4)[1].astype(jnp.int32)
        gs = (jax.random.gumbel(k2, valid_topk.shape)
              + jnp.where(valid_topk, 0.0, -1e9))
        s4 = jnp.argmax(gs, axis=-1).astype(jnp.int32)[i4]
        return i4, s4

    ids4, slot4 = jax.vmap(sample4)(keys)                # (S, 4) each
    ones4 = jnp.ones(4, jnp.float32)
    Hs = jax.vmap(lambda i4, s4: _dlt_homography(
        board_xy[i4], kp_topk[i4, s4], ones4))(ids4, slot4)   # (S, 3, 3)
    proj = jax.vmap(lambda H: _apply_homography(H, board_xy))(Hs)
    d = jnp.linalg.norm(kp_topk[None] - proj[:, :, None, :],
                        axis=-1)                         # (S, n_ids, C)
    dmin = jnp.min(jnp.where(valid_topk[None], d, jnp.inf), axis=-1)
    dmin = jnp.where(jnp.isfinite(dmin), dmin, 1e9)      # NaN/degenerate → far
    inl = dmin <= tol                                    # (S, n_ids)
    # consensus first, mean inlier residual as the tie-break
    score = (jnp.sum(inl, axis=-1).astype(jnp.float32)
             - 1e-3 * jnp.sum(jnp.minimum(dmin, tol), axis=-1) / tol)
    best = jnp.argmax(score)
    return Hs[best], jnp.sum(inl[best])


def reselect_by_homography(kp_topk: jnp.ndarray, valid_topk: jnp.ndarray,
                           board_xy: jnp.ndarray, tol_px: float = 4.0,
                           iters: int = 3, min_points: int = 6,
                           max_rms_px: float = 1.5,
                           ransac_subsets: int = 32):
    """One frame: choose, per id, the candidate consistent with the board.

    Parameters
    ----------
    kp_topk : (n_ids, C, 2) candidate pixel positions, slot 0 = highest
        ids-head score (``label_to_keypoints_topk`` order).
    valid_topk : (n_ids, C) candidate validity.
    board_xy : (n_ids, 2) the ids' inner-corner coordinates in any planar
        board parametrization (e.g. ``inner_corner_object_points[:, :2]``).
    tol_px : final consistency tolerance. Decoys claiming an id sit a full
        board cell (≥8 px at the 8×8 decode stride) from the id's true
        position, so anything ≲6 px separates them from raw-decode noise.
    iters : trim-refit rounds; tolerances anneal toward ``tol_px``.
    min_points : below this many top-1 detections the homography is
        unreliable — return the plain top-1 decode unchanged (also keeps
        negative/no-board frames at exact parity).
    max_rms_px : self-consistency gate on the FINAL selection (round 4).
        Eligibility inside the loop tests candidates against the H fit to
        the *previous* selection, so a churning fit can terminate with a
        selection that no single homography explains — measured on the
        512-sample host stream as decoy constellations with refit RMS
        4.8–60 px blessing errors up to 46 px. One extra fit to the final
        selection catches exactly this: if its masked RMS exceeds
        ``max_rms_px`` the frame falls back to the parity decode (healthy
        frames measure ≲0.5 px, so parity behavior is otherwise
        unchanged). Note the gate is a *do-no-harm* guard, not an outlier
        remover: on the measured 512-sample stream every churned-fit frame
        happened to re-select exactly the parity decode
        (scripts/check_gate_noop.py), so the fallback is a no-op there —
        it exists for the case where churn OVERRIDES a good parity decode
        (unit-tested in test_geom_decode).
    ransac_subsets : seed the trim-refit loop with the consensus-best
        4-point homography (:func:`_ransac_seed`) instead of the
        decoy-sensitive all-points least-squares fit. 0 restores the
        round-3 seeding.

    Returns
    -------
    keypoints (n_ids, 2) float32, valid (n_ids,) bool.
    """
    sel0 = kp_topk[:, 0]
    val0 = valid_topk[:, 0]
    # count ids with ANY candidate (round 4; was top-1 only): a frame whose
    # top-1 set is sparse can still carry a fittable constellation in its
    # lower/override slots (host frame 138: 4 near-collinear top-1 cells,
    # ~10 true corners in override slots — scripts/probe_lowdet_frames.py).
    # Negative frames are kept at parity by the CONSISTENCY acceptance
    # below (≥min_points ids within tol of one plane, refit RMS ≤
    # max_rms_px), which spurious candidates essentially never satisfy.
    enough = jnp.sum(jnp.any(valid_topk, axis=-1)) >= min_points

    sel, w = sel0, val0.astype(jnp.float32)
    any_elig = val0
    if ransac_subsets:
        H_seed, _ = _ransac_seed(kp_topk, valid_topk, board_xy,
                                 ransac_subsets, tol_px)
    # annealed tolerances: generous while the fit still contains decoys,
    # `tol_px` on the last round
    tols = [tol_px * (2.0 ** (iters - 1 - k)) for k in range(iters)]
    for k, tol in enumerate(tols):
        H = (H_seed if (k == 0 and ransac_subsets)
             else _dlt_homography(board_xy, sel, w))
        proj = _apply_homography(H, board_xy)              # (n_ids, 2)
        d = jnp.linalg.norm(kp_topk - proj[:, None, :], axis=-1)
        eligible = valid_topk & (d <= tol)                 # (n_ids, C)
        any_elig = jnp.any(eligible, axis=-1)
        # first eligible slot = highest-score eligible (slots score-ordered)
        slot = jnp.argmax(eligible, axis=-1).astype(jnp.int32)
        picked = jnp.take_along_axis(kp_topk, slot[:, None, None],
                                     axis=1)[:, 0]
        sel = jnp.where(any_elig[:, None], picked, sel0)
        w = any_elig.astype(jnp.float32)

    # A degenerate fit (near-collinear detections, garbage H) manifests as
    # an (almost) empty consistent set — fall back to the parity decode
    # rather than dropping real detections on a bad fit. A *churned* fit
    # (decoy constellation) manifests as a final selection no single
    # homography explains — refit once and gate on the residual.
    H = _dlt_homography(board_xy, sel, w)
    proj = _apply_homography(H, board_xy)
    resid2 = jnp.sum((proj - sel) ** 2, axis=-1)
    n_sel = jnp.maximum(jnp.sum(w), 1.0)
    rms = jnp.sqrt(jnp.sum(jnp.where(any_elig, resid2, 0.0)) / n_sel)
    fit_ok = ((jnp.sum(any_elig) >= min_points)
              & jnp.isfinite(rms) & (rms <= max_rms_px))
    use = enough & fit_ok
    keypoints = jnp.where(use, jnp.where(any_elig[:, None], sel, sel0), sel0)
    valid = jnp.where(use, any_elig, val0)
    return keypoints, valid


def fill_from_homography(keypoints: jnp.ndarray, valid: jnp.ndarray,
                         board_xy: jnp.ndarray, frame_hw: tuple[int, int],
                         min_points: int = 8, max_rms_px: float = 1.5,
                         min_spread_px: float = 3.0,
                         max_mahal: float = 3.0):
    """Predict the positions of UNDETECTED ids from the detected ones.

    The classical pipeline does exactly this: cv2.aruco's
    ``interpolateCornersCharuco`` / ``CharucoDetector.detectBoard`` project
    chessboard corners through the homography implied by the detected
    markers, then refine them locally (the classical baseline in
    ``board.cv2_aruco_detect`` relies on that machinery internally) — and,
    like here, only when the marker fit is reliable. The homography is
    refit from the (geometry-reselected) detected corners, every invalid id
    inside the frame is filled at its projected position, and the caller's
    RefineNet pass then refines filled and detected corners identically —
    measured on the frontal probe the filled corners end up as accurate as
    detected ones (0.65 vs 0.63 px median, 100% within 3 px; BENCH_NOTES
    round 3).

    Fit-quality gates (round 4): a homography interpolates reliably only
    when it actually explains the detections it was fit to, and only when
    those detections span a genuinely 2-D constellation — near-collinear
    or tightly clustered points admit low-residual fits that extrapolate
    arbitrarily badly (the measured 108-px fill outlier class,
    BENCH_NOTES round-4 acceptance). Nothing is filled unless

    * the masked RMS reprojection residual of the fit on the DETECTED
      corners is ≤ ``max_rms_px`` (decoded corners sit ≲0.5 px from the
      true plane on good frames, so 1.5 px separates healthy fits from
      decoy-skewed ones), and
    * the smaller principal std-dev of the detected constellation is
      ≥ ``min_spread_px`` (the same degeneracy gate as the PnP solver,
      ``pnp/solve.py``, with a stricter threshold because filling
      *extrapolates* where PnP only scores), and
    * per id, the projected position sits within ``max_mahal`` standard
      deviations (Mahalanobis, under the detected constellation's
      covariance) of the constellation centroid (round 4). A healthy
      mostly-detected board puts every in-board hole at ≲2σ; fills
      farther out are extrapolations whose error grows with leverage —
      the measured device-stream tail (raw fills to 7.5 px once the
      RANSAC seed let sparse-top-1 frames fill at all) lives there.

    Returns (centers (n_ids, 2), valid_out (n_ids,), filled (n_ids,)):
    ``centers`` are integer-rounded patch centers (detected ids keep their
    decoded position), ``valid_out = valid | filled``. With fewer than
    ``min_points`` detections the homography is unreliable and nothing is
    filled (negative frames stay at parity); a gated fit likewise fills
    nothing but leaves the detected corners untouched. ``min_points``
    defaults HIGHER than the reselection's floor (8 vs 6): filling
    extrapolates where reselection only arbitrates between existing
    candidates, and the measured 6-7-point fits that pass the RMS/spread
    gates still land fills up to 7.5 px off (512-sample device stream);
    at ≥8 the same stream fills with a 0.000% >3 px rate while frontal
    completeness (1.000, every probe frame) is unaffected.
    """
    w_mask = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w_mask), 1.0)
    H = _dlt_homography(board_xy, keypoints, w_mask)
    proj = _apply_homography(H, board_xy)
    h, w = frame_hw
    inb = ((proj[:, 0] >= 0) & (proj[:, 0] <= w - 1)
           & (proj[:, 1] >= 0) & (proj[:, 1] <= h - 1))
    enough = jnp.sum(valid) >= min_points

    resid2 = jnp.sum((proj - keypoints) ** 2, axis=-1)
    rms = jnp.sqrt(jnp.sum(jnp.where(valid, resid2, 0.0)) / n)
    mean_kp = jnp.sum(jnp.where(valid[:, None], keypoints, 0.0), axis=0) / n
    cen = jnp.where(valid[:, None], keypoints - mean_kp, 0.0)
    cxx = jnp.sum(cen[:, 0] * cen[:, 0]) / n
    cyy = jnp.sum(cen[:, 1] * cen[:, 1]) / n
    cxy = jnp.sum(cen[:, 0] * cen[:, 1]) / n
    tr = cxx + cyy
    det = cxx * cyy - cxy * cxy
    min_eig = tr / 2.0 - jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    fit_ok = (rms <= max_rms_px) & (min_eig >= min_spread_px * min_spread_px)

    # extrapolation-leverage gate: Mahalanobis distance of each projected
    # position under the detected constellation's covariance
    dp = proj - mean_kp
    safe_det = jnp.where(jnp.abs(det) > 1e-9, det, 1e-9)
    mahal2 = (dp[:, 0] * (cyy * dp[:, 0] - cxy * dp[:, 1])
              + dp[:, 1] * (cxx * dp[:, 1] - cxy * dp[:, 0])) / safe_det
    near = mahal2 <= max_mahal * max_mahal

    filled = (~valid) & inb & enough & fit_ok & near
    centers = jnp.where(valid[:, None], keypoints, jnp.round(proj))
    return centers, valid | filled, filled


def pred_to_keypoints_geom(loc_hat: jnp.ndarray, ids_hat: jnp.ndarray,
                           dust_bin_ids: int, board_xy: jnp.ndarray,
                           capacity: int = 3, tol_px: float = 4.0,
                           iters: int = 3, min_points: int = 6,
                           min_margin: float | None = None,
                           loc_override: bool = True,
                           override_capacity: int = 2,
                           max_rms_px: float = 1.5,
                           ransac_subsets: int = 32):
    """Batched heads → geometry-reselected single-slot keypoints.

    Drop-in shape-compatible with ``pred_to_keypoints`` ((N, n_ids, 2),
    (N, n_ids)); see :func:`reselect_by_homography`.

    ``loc_override``: also admit *loc-gated* cells as low-priority
    candidates. The parity decode drops any cell whose loc head argmaxes
    the dustbin even when the ids head confidently names a corner
    (``decode.pred_argmax``) — on the round-3 frontal probe that gate
    accounted for 42% of all missed corners, with the ids head RIGHT every
    time. Here such cells contribute candidates positioned at the loc
    head's best non-dustbin bin, appended AFTER the gated claims so they
    can only win when a gated candidate is geometrically inconsistent or
    absent. The homography consistency test is the arbiter the plain
    decode lacks; on negative frames the ``min_points`` guard keeps
    everything at exact parity.
    """
    from .decode import label_to_keypoints_topk

    kp_k, val_k = pred_to_keypoints_topk(loc_hat, ids_hat, dust_bin_ids,
                                         capacity=capacity,
                                         min_margin=min_margin)
    if loc_override:
        loc_argmax = jnp.argmax(loc_hat, axis=-1).astype(jnp.int32)
        pos64 = jnp.argmax(loc_hat[..., :64], axis=-1).astype(jnp.int32)
        ids_raw = jnp.argmax(ids_hat, axis=-1).astype(jnp.int32)
        conf = jnp.max(ids_hat, axis=-1)
        if min_margin is not None:
            margin = conf - ids_hat[..., dust_bin_ids]
            ids_raw = jnp.where(margin >= min_margin, ids_raw, dust_bin_ids)
        # only cells the parity decode dropped for the loc gate alone
        ids_ov = jnp.where(loc_argmax == 64, ids_raw, dust_bin_ids)
        kp_o, val_o = label_to_keypoints_topk(pos64, ids_ov, dust_bin_ids,
                                              capacity=override_capacity,
                                              scores=conf)
        kp_k = jnp.concatenate([kp_k, kp_o], axis=2)
        val_k = jnp.concatenate([val_k, val_o], axis=2)
    fn = lambda kp, va: reselect_by_homography(kp, va, board_xy,
                                               tol_px=tol_px, iters=iters,
                                               min_points=min_points,
                                               max_rms_px=max_rms_px,
                                               ransac_subsets=ransac_subsets)
    return jax.vmap(fn)(kp_k, val_k)
