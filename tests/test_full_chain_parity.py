"""Full-chain parity: the ENTIRE torch reference inference loop (forward →
argmax decode → patch extraction → RefineNet → sub-pixel mapping, per
src/inference.py:32-70) re-stated functionally, vs our fused pipeline with the
SAME weights on the SAME frame. Corner positions must agree exactly (the
decode is argmax-exact; conv float noise only perturbs logits)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deepcharuco_tpu.configs import default_config  # noqa: E402
from deepcharuco_tpu.models import Detector, RefineNet  # noqa: E402
from deepcharuco_tpu.compat import (  # noqa: E402
    detector_state_dict_from_variables,
    refinenet_state_dict_from_variables,
)
from deepcharuco_tpu.pipeline import two_stage_forward  # noqa: E402
from tests.test_torch_parity import (  # noqa: E402
    _torch_detector_forward,
    _torch_refinenet_forward,
)

CFG = default_config()


def _torch_reference_chain(det_sd, rn_sd, gray_u8):
    """The reference's infer_image, functionally (variable-length outputs)."""
    g = (gray_u8.astype(np.float32) - 128.0) / 255.0
    x = torch.from_numpy(g[None, None])
    with torch.no_grad():
        loc_hat, ids_hat = _torch_detector_forward(det_sd, x)
    # pred_argmax + dustbin suppression (model_utils.py:53-78)
    loc_arg = loc_hat.argmax(1)[0].numpy()
    ids_arg = ids_hat.argmax(1)[0].numpy()
    ids_arg[loc_arg == 64] = CFG.n_ids
    mask = ids_arg != CFG.n_ids
    rs, cs = np.nonzero(mask)
    pix = loc_arg[rs, cs]
    xs = 8 * cs + pix % 8
    ys = 8 * rs + pix // 8
    ids_found = ids_arg[rs, cs]
    kpts = np.stack([xs, ys], axis=1)

    if len(kpts) == 0:
        return kpts, ids_found, kpts

    # extract_patches (model_utils.py:19-36): pad 12, crop [k, k+24)
    padded = np.pad(g, 12)
    patches = np.stack([padded[y:y + 24, x:x + 24] for x, y in kpts])
    with torch.no_grad():
        heat = _torch_refinenet_forward(rn_sd, torch.from_numpy(patches[:, None]))
    heat = heat[:, 0].numpy()
    flat = heat.reshape(len(kpts), -1).argmax(1)
    corners = np.stack([flat % 64, flat // 64], axis=1)
    refined = (corners - 32) / 8 + kpts
    return kpts.astype(np.float32), ids_found, refined.astype(np.float32)


def test_full_chain_matches_reference_loop(rng):
    det = Detector(n_ids=CFG.n_ids, dtype=jnp.float32)
    rn = RefineNet(dtype=jnp.float32)
    dv = det.init(jax.random.PRNGKey(11), jnp.zeros((1, 240, 320, 1)))
    rv = rn.init(jax.random.PRNGKey(12), jnp.zeros((1, 24, 24, 1)))
    det_sd = detector_state_dict_from_variables(dv)
    rn_sd = refinenet_state_dict_from_variables(rv)

    # realistic frame: rendered board on gray
    from deepcharuco_tpu import board as B

    brd = B.get_board(CFG)
    bimg, _ = B.board_image(brd, (240, 240), CFG.row_count, CFG.col_count)
    frame = np.full((240, 320), 90, np.uint8)
    frame[:, 40:280] = bimg[..., 0]

    ref_kpts, ref_ids, ref_refined = _torch_reference_chain(det_sd, rn_sd, frame)

    kp, valid, refined = jax.jit(
        lambda dv, rv, x: two_stage_forward(det, rn, dv, rv, x, CFG.n_ids)
    )(dv, rv, jnp.asarray(frame[None]))
    kp = np.asarray(kp)[0]
    valid = np.asarray(valid)[0]
    refined = np.asarray(refined)[0]

    # ids appearing exactly once in the reference output (the fixed-capacity
    # decode delta only concerns duplicates)
    uniq, counts = np.unique(ref_ids, return_counts=True)
    once = set(uniq[counts == 1])
    checked = 0
    for i, k in enumerate(ref_ids):
        if k not in once:
            continue
        assert valid[k], f"id {k} missing from fused decode"
        np.testing.assert_array_equal(kp[k], ref_kpts[i])
        np.testing.assert_allclose(refined[k], ref_refined[i], atol=1e-4)
        checked += 1
    # our extra slots must be exactly the duplicate-id cells
    for k in range(CFG.n_ids):
        if valid[k]:
            assert k in set(ref_ids.tolist())
    assert checked >= 1, "no unique-id detections to compare (degenerate frame)"
