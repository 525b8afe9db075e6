"""Forward-parity vs a torch functional re-statement of the reference nets.

The reference's pretrained checkpoints are absent from the mount
(.MISSING_LARGE_BLOBS), so parity is proven with *shared random weights*:
Flax params are exported to a torch-layout state dict
(compat.torch_convert) and pushed through a functional torch forward that
follows the reference architecture (src/models/net.py:50-80,
src/models/refinenet.py:49-83) op by op.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deepcharuco_tpu.models import Detector, RefineNet  # noqa: E402
from deepcharuco_tpu.compat import (  # noqa: E402
    detector_state_dict_from_variables,
    detector_variables_from_torch,
    refinenet_state_dict_from_variables,
    refinenet_variables_from_torch,
)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _cbr(x, sd, conv, bn, padding=1):
    """conv → batchnorm(eval, running stats) → relu, torch functional."""
    x = F.conv2d(x, _t(sd[f"{conv}.weight"]), _t(sd[f"{conv}.bias"]), padding=padding)
    x = F.batch_norm(x, _t(sd[f"{bn}.running_mean"]), _t(sd[f"{bn}.running_var"]),
                     _t(sd[f"{bn}.weight"]), _t(sd[f"{bn}.bias"]),
                     training=False, eps=1e-5)
    return F.relu(x)


def _torch_detector_forward(sd, x):
    for name in ["1a", "1b"]:
        x = _cbr(x, sd, f"conv{name}", f"bn{name}")
    x = F.max_pool2d(x, 2, 2)
    for name in ["2a", "2b"]:
        x = _cbr(x, sd, f"conv{name}", f"bn{name}")
    x = F.max_pool2d(x, 2, 2)
    for name in ["3a", "3b"]:
        x = _cbr(x, sd, f"conv{name}", f"bn{name}")
    x = F.max_pool2d(x, 2, 2)
    for name in ["4a", "4b"]:
        x = _cbr(x, sd, f"conv{name}", f"bn{name}")
    p = _cbr(x, sd, "convPa", "bnPa")
    loc = F.conv2d(p, _t(sd["convPb.weight"]), _t(sd["convPb.bias"]))
    d = _cbr(x, sd, "convDa", "bnDa")
    ids = F.conv2d(d, _t(sd["convDb.weight"]), _t(sd["convDb.bias"]))
    return loc, ids


def _torch_refinenet_forward(sd, x):
    for name in ["1a", "1b", "2a", "2b"]:
        x = _cbr(x, sd, f"conv{name}", f"bn{name}", padding=0)
    x = F.max_pool2d(x, 2, 2)
    for name in ["3a", "3b"]:
        x = _cbr(x, sd, f"conv{name}", f"bn{name}")
    x = F.interpolate(x, scale_factor=2, mode="nearest")
    for name in ["4a", "4b"]:
        x = _cbr(x, sd, f"conv{name}", f"bn{name}")
    x = F.interpolate(x, scale_factor=2, mode="nearest")
    for name in ["5a", "5b"]:
        x = _cbr(x, sd, f"conv{name}", f"bn{name}")
    x = F.interpolate(x, scale_factor=2, mode="nearest")
    x = _cbr(x, sd, "convPa", "bnPa")
    return F.conv2d(x, _t(sd["convPb.weight"]), _t(sd["convPb.bias"]))


def _randomize_batch_stats(variables, rng):
    """Make running stats non-trivial so BN conversion is actually exercised."""
    def rand_stats(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = rand_stats(v)
            elif k == "mean":
                out[k] = jnp.asarray(rng.normal(size=v.shape).astype(np.float32))
            elif k == "var":
                out[k] = jnp.asarray(rng.uniform(0.5, 2.0, size=v.shape).astype(np.float32))
            else:
                out[k] = v
        return out

    return {"params": variables["params"], "batch_stats": rand_stats(variables["batch_stats"])}


def test_detector_forward_parity(rng):
    model = Detector(n_ids=16, dtype=jnp.float32)
    x_nhwc = rng.normal(size=(2, 120, 160, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(x_nhwc))
    variables = _randomize_batch_stats(variables, rng)

    out = model.apply(variables, jnp.asarray(x_nhwc))
    sd = detector_state_dict_from_variables(variables)
    with torch.no_grad():
        loc_t, ids_t = _torch_detector_forward(sd, _t(x_nhwc.transpose(0, 3, 1, 2)))

    np.testing.assert_allclose(
        np.asarray(out["loc"]), loc_t.numpy().transpose(0, 2, 3, 1), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["ids"]), ids_t.numpy().transpose(0, 2, 3, 1), atol=2e-4
    )


def test_refinenet_forward_parity(rng):
    model = RefineNet(dtype=jnp.float32)
    x_nhwc = rng.normal(size=(3, 24, 24, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(2), jnp.asarray(x_nhwc))
    variables = _randomize_batch_stats(variables, rng)

    out = model.apply(variables, jnp.asarray(x_nhwc))
    sd = refinenet_state_dict_from_variables(variables)
    with torch.no_grad():
        heat_t = _torch_refinenet_forward(sd, _t(x_nhwc.transpose(0, 3, 1, 2)))

    np.testing.assert_allclose(
        np.asarray(out[..., 0]), heat_t.numpy()[:, 0], atol=2e-4
    )


def test_torch_roundtrip_conversion(rng):
    """state_dict → variables → state_dict is the identity."""
    model = Detector(n_ids=16, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 48, 48, 1)))
    sd = detector_state_dict_from_variables(variables)
    variables2 = detector_variables_from_torch(sd)
    sd2 = detector_state_dict_from_variables(variables2)
    for k in sd:
        np.testing.assert_array_equal(sd[k], sd2[k])

    rn = RefineNet(dtype=jnp.float32)
    v = rn.init(jax.random.PRNGKey(4), jnp.zeros((1, 24, 24, 1)))
    sd = refinenet_state_dict_from_variables(v)
    v2 = refinenet_variables_from_torch(sd)
    sd2 = refinenet_state_dict_from_variables(v2)
    for k in sd:
        np.testing.assert_array_equal(sd[k], sd2[k])


# ---------------------------------------------------------------------------
# Parity against the reference's OWN modules (not a re-statement): import
# src/models/net.py / refinenet.py from the mount, load the converted state
# dict into the actual dcModel/RefineNet classes, compare forwards. A
# transcription error shared by the Flax model and a hand-written torch
# forward cannot cancel out here.
# ---------------------------------------------------------------------------

REF_MODELS = "/root/reference/src/models"


@pytest.fixture(scope="module")
def ref_modules():
    import importlib
    import os
    import sys
    import types

    if not os.path.isdir(REF_MODELS):
        pytest.skip("reference mount not present")
    # The reference imports numba / pytorch_lightning / torchmetrics at module
    # level (net.py:1-6); none exist in this env. Stub just enough for the
    # imports to succeed — only the plain nn.Module classes are exercised.
    stubs = {}
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.njit = lambda *a, **k: (a[0] if a and callable(a[0])
                                      else (lambda f: f))
        numba.prange = range
        stubs["numba"] = numba
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        pl.LightningModule = type("LightningModule", (), {})
        stubs["pytorch_lightning"] = pl
    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")
        tm.Metric = type("Metric", (), {
            "__init__": lambda self, *a, **k: None,
            "add_state": lambda self, *a, **k: None,
        })
        stubs["torchmetrics"] = tm
    sys.modules.update(stubs)
    sys.path.insert(0, REF_MODELS)
    try:
        yield (importlib.import_module("net"),
               importlib.import_module("refinenet"))
    finally:
        sys.path.remove(REF_MODELS)


def _load_ref(module, sd):
    missing, unexpected = module.load_state_dict(
        {k: _t(np.asarray(v)) for k, v in sd.items()}, strict=False
    )
    assert not unexpected, unexpected
    # BatchNorm bookkeeping counters are the only keys we don't carry
    assert all(k.endswith("num_batches_tracked") for k in missing), missing
    module.eval()
    return module


def test_detector_parity_vs_reference_module(rng, ref_modules):
    net, _ = ref_modules
    model = Detector(n_ids=16, dtype=jnp.float32)
    x_nhwc = rng.normal(size=(2, 120, 160, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(11), jnp.asarray(x_nhwc))
    variables = _randomize_batch_stats(variables, rng)
    out = model.apply(variables, jnp.asarray(x_nhwc))

    ref = _load_ref(net.dcModel(n_ids=16),
                    detector_state_dict_from_variables(variables))
    with torch.no_grad():
        out_t = ref(_t(x_nhwc.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(out["loc"]), out_t["loc"].numpy().transpose(0, 2, 3, 1),
        atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["ids"]), out_t["ids"].numpy().transpose(0, 2, 3, 1),
        atol=2e-4)


def test_refinenet_parity_vs_reference_module(rng, ref_modules):
    _, refinenet_mod = ref_modules
    model = RefineNet(dtype=jnp.float32)
    x_nhwc = rng.normal(size=(3, 24, 24, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(12), jnp.asarray(x_nhwc))
    variables = _randomize_batch_stats(variables, rng)
    out = model.apply(variables, jnp.asarray(x_nhwc))

    ref = _load_ref(refinenet_mod.RefineNet(),
                    refinenet_state_dict_from_variables(variables))
    with torch.no_grad():
        heat_t = ref(_t(x_nhwc.transpose(0, 3, 1, 2)))
    assert heat_t.shape == (3, 1, 64, 64)
    np.testing.assert_allclose(np.asarray(out[..., 0]), heat_t.numpy()[:, 0],
                               atol=2e-4)


def test_lightning_prefix_stripping():
    """Lightning prefixes keys with 'model.' (ckpt loaded at inference.py:73-84)."""
    model = Detector(n_ids=16, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(5), jnp.zeros((1, 48, 48, 1)))
    sd = detector_state_dict_from_variables(variables)
    prefixed = {f"model.{k}": v for k, v in sd.items()}
    variables2 = detector_variables_from_torch(prefixed)
    sd2 = detector_state_dict_from_variables(variables2)
    for k in sd:
        np.testing.assert_array_equal(sd[k], sd2[k])


# ---------------------------------------------------------------------------
# Sentinel: REAL published checkpoints. The blobs named at
# /root/reference/src/inference.py:101-102 are absent from the mount
# (.MISSING_LARGE_BLOBS); these tests skip until they appear, then
# automatically prove real-weight parity — converter + Flax forward vs the
# reference's own torch modules carrying the same trained weights.
# ---------------------------------------------------------------------------

REF_CKPT_DIR = "/root/reference/src/reference"
DEEPC_CKPT = f"{REF_CKPT_DIR}/longrun-epoch=99-step=369700.ckpt"
REFINENET_CKPT = f"{REF_CKPT_DIR}/second-refinenet-epoch-100-step=373k.ckpt"


def _real_ckpt(path):
    import os

    if not os.path.isfile(path):
        pytest.skip(f"published checkpoint not in mount: {path} "
                    "(.MISSING_LARGE_BLOBS)")
    sd = torch.load(path, map_location="cpu")["state_dict"]
    return {k[len("model."):] if k.startswith("model.") else k: v
            for k, v in sd.items()
            if not k.endswith("num_batches_tracked")}


def test_real_detector_checkpoint_parity(rng, ref_modules):
    net, _ = ref_modules
    sd = {k: v.numpy() for k, v in _real_ckpt(DEEPC_CKPT).items()}
    variables = detector_variables_from_torch(sd)
    model = Detector(n_ids=16, dtype=jnp.float32)
    x_nhwc = rng.normal(size=(2, 240, 320, 1)).astype(np.float32)
    out = model.apply(variables, jnp.asarray(x_nhwc))
    ref = _load_ref(net.dcModel(n_ids=16), sd)
    with torch.no_grad():
        out_t = ref(_t(x_nhwc.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(out["loc"]), out_t["loc"].numpy().transpose(0, 2, 3, 1),
        atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(out["ids"]), out_t["ids"].numpy().transpose(0, 2, 3, 1),
        atol=5e-4)


def test_real_refinenet_checkpoint_parity(rng, ref_modules):
    _, refinenet_mod = ref_modules
    sd = {k: v.numpy() for k, v in _real_ckpt(REFINENET_CKPT).items()}
    variables = refinenet_variables_from_torch(sd)
    model = RefineNet(dtype=jnp.float32)
    x_nhwc = rng.normal(size=(3, 24, 24, 1)).astype(np.float32)
    out = model.apply(variables, jnp.asarray(x_nhwc))
    ref = _load_ref(refinenet_mod.RefineNet(), sd)
    with torch.no_grad():
        heat_t = ref(_t(x_nhwc.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(out[..., 0]), heat_t.numpy()[:, 0],
                               atol=5e-4)


def test_real_checkpoints_end_to_end(tmp_path):
    """With the published blobs present, the FULL pipeline must load them by
    path (load_pipeline handles the Lightning pickle) and find the board on
    the real benchmark photo (IMG_7412, reference inference demo)."""
    import os

    if not (os.path.isfile(DEEPC_CKPT) and os.path.isfile(REFINENET_CKPT)):
        pytest.skip("published checkpoints not in mount (.MISSING_LARGE_BLOBS)")
    import cv2

    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.pipeline import load_pipeline

    cfg = default_config()
    pipe = load_pipeline(cfg, DEEPC_CKPT, REFINENET_CKPT,
                         compute_dtype=jnp.float32)
    img = cv2.imread("/root/reference/src/reference/samples_test/IMG_7412.png")
    if img is None:
        pytest.skip("IMG_7412 not in mount")
    img = cv2.resize(img, (320, 240))
    kp, valid, refined = pipe.detect(img[None])
    assert int(np.asarray(valid).sum()) >= 12
