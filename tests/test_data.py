"""Data synthesis tests: label semantics (ref src/data.py:14-51), gaussian
heatmaps (ref src/data_refinenet.py:16-38), synthesizer output contracts,
refinenet sampling, and the batch loader."""

import numpy as np

from deepcharuco_tpu.configs import default_config
from deepcharuco_tpu.data import (
    BatchLoader,
    BoardSynthesizer,
    CharucoDataset,
    ProceduralImageSource,
    RefineNetDataset,
    create_label,
)
from deepcharuco_tpu.ops.heatmap import gaussian_heatmap

CFG = default_config()


def test_create_label_encoding(rng):
    kpts = np.array([[18.0, 9.0], [100.5, 200.7]])
    ids = np.array([3, 7])
    loc, lids = create_label((240, 320), kpts, ids, False, 16, rng)
    assert loc.shape == (30, 40) and lids.shape == (30, 40)
    # keypoint (18, 9): cell (1, 2), offsets (2, 1) → loc = 2 + 8*1 = 10
    assert loc[1, 2] == 10 and lids[1, 2] == 3
    # keypoint (100.5, 200.7): cell x=12 (int(100.5/8)), y=25;
    # offsets from int() trunc: 100%8=4, 200%8=0 → loc = 4
    assert loc[25, 12] == 4 and lids[25, 12] == 7
    # everything else dustbin
    mask = np.ones_like(loc, bool)
    mask[1, 2] = mask[25, 12] = False
    assert np.all(loc[mask] == 64) and np.all(lids[mask] == 16)


def test_create_label_negative(rng):
    loc, lids = create_label((240, 320), np.zeros((0, 2)), np.zeros(0), True, 16, rng)
    assert np.all(loc == 64) and np.all(lids == 16)


def test_create_label_collision_keeps_one(rng):
    # two keypoints in the same 8x8 cell → exactly one survives
    kpts = np.array([[16.0, 16.0], [17.0, 17.0]])
    ids = np.array([1, 2])
    loc, lids = create_label((240, 320), kpts, ids, False, 16, rng)
    assert lids[2, 2] in (1, 2)
    assert (lids != 16).sum() == 1


def test_gaussian_heatmap_matches_reference_splat():
    """Closed form vs a direct python re-statement of the numba loop
    (_add_gaussian, data_refinenet.py:16-38) for integer centers."""
    import math

    def ref_splat(x, y, sigma=2.0, stride=1, size=64):
        heat = np.zeros((size, size), np.float32)
        n_sigma = 4
        tl = [max(int(x - n_sigma * sigma), 0), max(int(y - n_sigma * sigma), 0)]
        br = [min(int(x + n_sigma * sigma), size * stride),
              min(int(y + n_sigma * sigma), size * stride)]
        shift = stride / 2 - 0.5
        for my in range(tl[1] // stride, br[1] // stride):
            for mx in range(tl[0] // stride, br[0] // stride):
                d2 = (mx * stride + shift - x) ** 2 + (my * stride + shift - y) ** 2
                expo = d2 / 2 / sigma / sigma
                if expo > 4.6052:
                    continue
                heat[my, mx] += math.exp(-expo)
                heat[my, mx] = min(heat[my, mx], 1.0)
        return heat

    for cx, cy in [(32, 32), (0, 0), (63, 63), (5, 60)]:
        ours = gaussian_heatmap(cx, cy)
        np.testing.assert_allclose(ours, ref_splat(cx, cy), atol=1e-6)


def test_synthesizer_contract():
    synth = BoardSynthesizer(CFG, negative_p=0.0, seed=0)
    src = ProceduralImageSource()
    hits = 0
    for i in range(5):
        s = synth(src.get(i))
        assert s.image.shape == (240, 320, 3) and s.image.dtype == np.uint8
        assert s.keypoints.shape[1] == 2 if s.keypoints.size else True
        assert len(s.keypoints) == len(s.kpt_ids)
        assert not s.is_negative
        hits += len(s.keypoints)
    assert hits > 0  # at least some corners visible across samples


def test_synthesizer_negatives():
    synth = BoardSynthesizer(CFG, negative_p=1.0, seed=0)
    s = synth(ProceduralImageSource().get(0))
    assert s.is_negative and len(s.keypoints) == 0


def test_synthesizer_seeded_determinism():
    src = ProceduralImageSource()
    a = BoardSynthesizer(CFG, seed=42)(src.get(0))
    b = BoardSynthesizer(CFG, seed=42)(src.get(0))
    np.testing.assert_array_equal(a.image, b.image)
    np.testing.assert_array_equal(a.keypoints, b.keypoints)


def test_charuco_dataset_sample():
    ds = CharucoDataset(CFG, validation=True)
    item = ds[0]
    assert item["image"].shape == (240, 320, 1)
    assert item["image"].dtype == np.float32
    assert item["loc"].shape == (30, 40)
    assert item["ids"].shape == (30, 40)
    assert item["loc"].max() <= 64 and item["ids"].max() <= 16
    # normalized range
    assert -0.51 <= item["image"].min() and item["image"].max() <= 0.51


def test_labels_decode_back_to_keypoints():
    """Round-trip: synthesized keypoints → label maps → decode must return the
    same (cell-quantized) keypoints."""
    import jax.numpy as jnp

    from deepcharuco_tpu.ops import label_to_keypoints

    ds = CharucoDataset(CFG, validation=True)
    item = ds[1]
    kpts, valid = label_to_keypoints(
        jnp.asarray(item["loc"][None]), jnp.asarray(item["ids"][None]), 16
    )
    kpts, valid = np.asarray(kpts[0]), np.asarray(valid[0])
    # each decoded keypoint must sit in the cell its label occupies
    ys, xs = np.nonzero(item["ids"] != 16)
    assert valid.sum() == len(ys)
    for y, x in zip(ys, xs):
        k = item["ids"][y, x]
        assert valid[k]
        assert int(kpts[k, 0] // 8) == x and int(kpts[k, 1] // 8) == y


def test_refinenet_dataset_sample():
    ds = RefineNetDataset(CFG, validation=True, total=4)
    item = ds[0]
    assert item["patches"].shape == (4, 24, 24, 1)
    assert item["heatmaps"].shape == (4, 64, 64, 1)
    assert item["heatmaps"].max() <= 1.0
    # each heatmap has an active gaussian
    assert (item["heatmaps"].reshape(4, -1).max(1) > 0.9).all()


def test_batch_loader():
    ds = CharucoDataset(CFG, validation=True)
    loader = BatchLoader(ds, batch_size=3, num_workers=2, seed=0, max_batches=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (3, 240, 320, 1)
    assert batches[0]["loc"].shape == (3, 30, 40)
    loader.stop()


def test_coco_json_source(tmp_path):
    """Reference dataset indexing format: captions json 'images' list +
    folder of files (src/data.py:60-69)."""
    import json

    import cv2

    from deepcharuco_tpu.data import CocoJsonImageSource, open_image_source

    d = tmp_path / "imgs"
    d.mkdir()
    names = []
    for i in range(3):
        name = f"img_{i}.jpg"
        cv2.imwrite(str(d / name),
                    np.full((60, 80, 3), 50 + i * 40, np.uint8))
        names.append({"file_name": name, "id": i})
    labels = tmp_path / "captions.json"
    labels.write_text(json.dumps({"images": names}))

    src = CocoJsonImageSource(str(labels), str(d))
    assert len(src) == 3
    img = src.get(1)
    assert img.shape == (60, 80, 3)
    assert abs(int(img.mean()) - 90) < 3

    # resolver picks the COCO source when both paths exist
    resolved = open_image_source(str(labels), str(d))
    assert isinstance(resolved, CocoJsonImageSource)


def test_directory_source(tmp_path):
    import cv2

    from deepcharuco_tpu.data import DirectoryImageSource

    for i in range(2):
        cv2.imwrite(str(tmp_path / f"f{i}.png"), np.zeros((10, 10, 3), np.uint8))
    src = DirectoryImageSource(str(tmp_path))
    assert len(src) == 2
    assert src.get(5).shape == (10, 10, 3)  # wraps around
