"""Int8 QuantDetector coverage (VERDICT r4 item 2 / ADVICE r4 medium).

The int8 serving path is a beyond-reference component (the torch reference,
``src/models/net.py``, serves f32); its contract is Detector.apply's
(``models/detector.py``): normalized f32 NHWC in, {"loc","ids"} f32 logits
out. These tests pin (a) decode agreement between the f32 detector and its
quantized form on the SHIPPED weights, (b) the qvars npz round-trip incl.
``load_pipeline``'s auto-detection, and (c) that the auto-detection sniffer
can't mis-route or crash on missing/corrupt/f32 files.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deepcharuco_tpu.configs import default_config

DETECTOR = "artifacts/detector_devsynth.npz"
CFG = default_config()


def _quantize_shipped(n_calib=8):
    from deepcharuco_tpu.data.device_synth import DeviceSynthesizer
    from deepcharuco_tpu.models import Detector
    from deepcharuco_tpu.models.quant import quantize_detector
    from deepcharuco_tpu.pipeline import _to_gray_input, load_model_variables

    det = Detector(n_ids=CFG.n_ids, dtype=jnp.float32)
    dv = load_model_variables(DETECTOR, "detector", CFG.n_ids)
    synth = DeviceSynthesizer(CFG)
    imgs, _, _ = synth.batch(jax.random.PRNGKey(0), n_calib)
    return det, dv, quantize_detector(det, dv, _to_gray_input(imgs))


@pytest.mark.skipif(not os.path.exists(DETECTOR), reason="artifact absent")
def test_int8_decode_agrees_with_f32_on_shipped_weights():
    """Same frames through the f32 detector and its int8 quantization must
    decode to (nearly) the same keypoints: the valid masks agree on almost
    every slot and agreeing detections sit on identical integer cells."""
    from deepcharuco_tpu.data.device_synth import DeviceSynthesizer
    from deepcharuco_tpu.models.quant import QuantDetector
    from deepcharuco_tpu.ops import pred_to_keypoints
    from deepcharuco_tpu.pipeline import _to_gray_input

    det, dv, qv = _quantize_shipped()
    synth = DeviceSynthesizer(CFG)
    imgs, _, _ = synth.batch(jax.random.PRNGKey(1), 8)
    g = _to_gray_input(imgs)

    out_f = det.apply(dv, g)
    out_q = QuantDetector(CFG.n_ids).apply(qv, g)
    kp_f, v_f = map(np.asarray, pred_to_keypoints(out_f["loc"], out_f["ids"],
                                                  CFG.n_ids))
    kp_q, v_q = map(np.asarray, pred_to_keypoints(out_q["loc"], out_q["ids"],
                                                  CFG.n_ids))
    mask_agree = float((v_f == v_q).mean())
    assert mask_agree >= 0.98, f"valid-mask agreement {mask_agree}"
    both = v_f & v_q
    assert both.sum() > 0
    d = np.linalg.norm(kp_f - kp_q, axis=-1)[both]
    # decode positions are integer-pixel (cell + offset); int8 may flip a
    # borderline argmax by one 1-px offset bin on rare corners. At the
    # production calibration size (64 frames) the measured identical
    # fraction is 0.979 (scripts/quantize_detector.py); this test runs an
    # 8-frame calibration to stay cheap, which costs a little agreement.
    assert float((d == 0).mean()) >= 0.90, f"identical frac {(d == 0).mean()}"
    assert float(d.mean()) <= 0.2
    assert float(d.max()) <= 3.0


@pytest.mark.skipif(not os.path.exists(DETECTOR), reason="artifact absent")
def test_qvars_npz_roundtrip_and_load_pipeline_autodetect(tmp_path):
    """qvars_to_npz → load_pipeline must auto-route through QuantDetector
    and produce the same detections as the in-memory qvars."""
    from deepcharuco_tpu import board as B
    from deepcharuco_tpu.models.quant import (QuantDetector, qvars_from_npz,
                                              qvars_to_npz)
    from deepcharuco_tpu.ops import pred_to_keypoints
    from deepcharuco_tpu.pipeline import (_to_gray_input, is_quantized_npz,
                                          load_pipeline)
    import cv2

    _, _, qv = _quantize_shipped()
    path = str(tmp_path / "det_int8.npz")
    qvars_to_npz(path, qv)
    assert is_quantized_npz(path)

    img, _ = B.board_image(B.get_board(CFG), (200, 200),
                           CFG.row_count, CFG.col_count)
    frame = np.full((240, 320), 128, np.uint8)
    frame[20:220, 60:260] = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)

    pipe = load_pipeline(CFG, path)  # auto-detection, no flag
    kp_p, v_p, _ = pipe.detect(frame[None])

    qv2 = qvars_from_npz(path)
    out = QuantDetector(CFG.n_ids).apply(
        qv2, _to_gray_input(jnp.asarray(frame[None])))
    kp_d, v_d = pred_to_keypoints(out["loc"], out["ids"], CFG.n_ids)
    np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_d))
    np.testing.assert_allclose(np.asarray(kp_p)[np.asarray(v_p)],
                               np.asarray(kp_d)[np.asarray(v_d)], atol=1e-5)
    # a clean render must actually detect most of the board
    assert int(np.asarray(v_p).sum()) >= 12


RN32 = "artifacts/refinenet32_devsynth.npz"
INT8 = "artifacts/detector_devsynth_int8.npz"


@pytest.mark.skipif(not (os.path.exists(DETECTOR) and os.path.exists(INT8)
                         and os.path.exists(RN32)),
                    reason="shipped artifacts absent")
def test_int8_composes_with_hires_tap():
    """The production-shaped composition (hires-2 tap + RN-32 avg) must
    serve the int8 artifact too: QuantDetector sees the 2×2-average-pooled
    view (fractional grays ⇒ ±0.5 gray-level input quantization — the one
    input-domain difference vs the base-resolution path, models/quant.py),
    so this pins that the extra input rounding doesn't break decode
    agreement with the f32 pipeline on a real board frame."""
    from deepcharuco_tpu import board as B
    from deepcharuco_tpu.pipeline import load_pipeline
    import cv2

    img, _ = B.board_image(B.get_board(CFG), (400, 400),
                           CFG.row_count, CFG.col_count)
    frame = np.full((480, 640), 128, np.uint8)
    frame[40:440, 120:520] = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)

    outs = {}
    for name, ckpt in (("f32", DETECTOR), ("int8", INT8)):
        pipe = load_pipeline(CFG, ckpt, RN32, hires=True,
                             rn_patch_size=32, rn_decode="avg")
        kp, v, refined = pipe.detect(frame[None])
        outs[name] = (np.asarray(kp), np.asarray(v), np.asarray(refined))

    (kp_f, v_f, r_f), (kp_q, v_q, r_q) = outs["f32"], outs["int8"]
    assert int(v_f.sum()) >= 12 and int(v_q.sum()) >= 12
    assert float((v_f == v_q).mean()) >= 0.9
    both = v_f & v_q
    d_kp = np.linalg.norm(kp_f - kp_q, axis=-1)[both]
    # decode cells are integer-pixel in pooled-view units; the ±0.5-gray
    # pooled-view rounding flips borderline 1-px offset bins on a minority
    # of corners (measured 4/16 on this frame, each by exactly 1 px) —
    # never a cell-level (8-px) divergence
    assert float((d_kp == 0).mean()) >= 0.5, f"identical frac {(d_kp == 0).mean()}"
    assert float(d_kp.max()) <= 1.5, f"kp max delta {d_kp.max()}"
    # the product contract: after refinement the two pipelines agree to
    # sub-pixel on every corner both detect (RefineNet absorbs the bin
    # flips — measured ≤0.14 px on this frame)
    d_ref = np.linalg.norm(r_f - r_q, axis=-1)[both]
    assert float(d_ref.max()) <= 0.3, f"refined max delta {d_ref.max()}"


def test_int8_logits_track_f32_smoke():
    """Fast-subset smoke (the artifact pins above are slow-marked): on a
    random-init detector and small frames, the quantized forward's logits
    must track the f32 logits closely — catches any wiring/scale regression
    in the quant path without the shipped-weights decode protocol."""
    from deepcharuco_tpu.models import Detector
    from deepcharuco_tpu.models.quant import QuantDetector, quantize_detector

    det = Detector(n_ids=CFG.n_ids, dtype=jnp.float32)
    dv = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    rng = np.random.default_rng(0)
    g = ((rng.integers(0, 256, (2, 64, 64, 1)).astype(np.float32) - 128.0)
         / 255.0)
    qv = quantize_detector(det, dv, jnp.asarray(g))
    out_f = det.apply(dv, jnp.asarray(g))
    out_q = QuantDetector(CFG.n_ids).apply(qv, jnp.asarray(g))
    for head in ("loc", "ids"):
        a = np.asarray(out_f[head], np.float32).ravel()
        b = np.asarray(out_q[head], np.float32).ravel()
        corr = float(np.corrcoef(a, b)[0, 1])
        assert corr > 0.999, f"{head} logits corr {corr}"
        rel = float(np.abs(a - b).max() / (np.abs(a).max() + 1e-9))
        assert rel < 0.05, f"{head} rel max err {rel}"


def test_is_quantized_npz_never_misroutes(tmp_path):
    """Sniffer hygiene (ADVICE r4): missing, corrupt, non-npz and f32 files
    must all return False (the f32 loader then raises its own clear error);
    only a real qvars artifact returns True."""
    from deepcharuco_tpu.pipeline import is_quantized_npz

    assert not is_quantized_npz(None)
    assert not is_quantized_npz(str(tmp_path / "missing.npz"))
    assert not is_quantized_npz("artifacts/refinenet_devsynth.npz"
                                if os.path.exists(
                                    "artifacts/refinenet_devsynth.npz")
                                else None)

    corrupt = tmp_path / "corrupt.npz"
    corrupt.write_bytes(b"not a zip at all")
    assert not is_quantized_npz(str(corrupt))

    # an f32 npz that HAPPENS to carry a conv1a/w key must not mis-route
    f32like = tmp_path / "f32like.npz"
    np.savez(f32like, **{"conv1a/w": np.zeros((3, 3, 1, 64), np.float32)})
    assert not is_quantized_npz(str(f32like))

    # pre-marker artifact shape: int8 conv1a/w, no __quant__ key
    legacy = tmp_path / "legacy.npz"
    np.savez(legacy, **{"conv1a/w": np.zeros((3, 3, 1, 64), np.int8)})
    assert is_quantized_npz(str(legacy))

    # marker-tagged artifact
    marked = tmp_path / "marked.npz"
    np.savez(marked, __quant__=np.int8(1))
    assert is_quantized_npz(str(marked))
