"""Dataset / prediction grid viewer.

The reference inspects its synthetic data and predictions interactively
through GridWindow popups (``src/data.py:77-86``,
``src/data_refinenet.py:136-156``, ``src/pose_estimation.py:85-88``).
This box is headless, so the primary output is a contact-sheet PNG per
page; with a display attached (``DISPLAY`` set) ``--show`` adds the same
interactive flow (any key = next page, q/ESC = quit).

Modes
-----
- ``dataset``      — detector training stream: synthesized frames with the
  label-map corners drawn (green) — the ``data.py:104-128`` viewer.
- ``refine``       — RefineNet stream: each training patch (8× nearest
  upsample) beside its 64×64 target heatmap — the
  ``data_refinenet.py:178-202`` viewer.
- ``predictions``  — run the fused pipeline on the validation stream and
  draw refined corners (magenta) over label corners (green) — the
  ``inference.py:87-…`` demo view.

Always forces the CPU backend: a viewer must never contend for the TPU
grant with a training run (single-process chip access).
"""

from __future__ import annotations

import argparse
import os


def build_argparser():
    p = argparse.ArgumentParser(description="DeepCharuco grid viewer")
    p.add_argument("--what", choices=["dataset", "refine", "predictions"],
                   default="dataset")
    p.add_argument("--config", default=None)
    p.add_argument("--n", type=int, default=16, help="samples per page")
    p.add_argument("--pages", type=int, default=1)
    p.add_argument("--cols", type=int, default=4)
    p.add_argument("--out", default="/tmp/dctpu_view",
                   help="output prefix; writes <out>_p<k>.png per page")
    p.add_argument("--show", action="store_true",
                   help="also open an interactive window (needs DISPLAY)")
    p.add_argument("--validation", action="store_true",
                   help="seeded validation stream instead of train")
    p.add_argument("--deepc", default="artifacts/detector_devsynth.npz")
    p.add_argument("--refinenet", default="artifacts/refinenet_devsynth.npz")
    p.add_argument("--rn-patch-size", type=int, choices=[24, 32], default=24)
    p.add_argument("--rn-decode", choices=["soft", "offset", "avg"],
                   default=None)
    p.add_argument("--geom-decode", action="store_true")
    p.add_argument("--geom-fill", action="store_true")
    p.add_argument("--images", default=None,
                   help="predictions: a directory of frames to run instead "
                        "of the synthetic validation stream")
    p.add_argument("--labels", default=None,
                   help="background corpus (captions json or directory); "
                        "default = procedural backgrounds")
    return p


def _tile(cells, cols, pad=2, bg=40):
    """hstack/vstack equal-size BGR cells into one grid image."""
    import numpy as np

    h, w = cells[0].shape[:2]
    rows = (len(cells) + cols - 1) // cols
    grid = np.full((rows * (h + pad) + pad, cols * (w + pad) + pad, 3),
                   bg, np.uint8)
    for i, c in enumerate(cells):
        r, k = divmod(i, cols)
        y, x = pad + r * (h + pad), pad + k * (w + pad)
        grid[y:y + h, x:x + w] = c
    return grid


def _denorm(img_norm):
    """Invert normalize_image_host: (g-128)/255 → uint8 gray BGR."""
    import numpy as np

    g = np.clip(img_norm[..., 0] * 255.0 + 128.0, 0, 255).astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


def _pages(args, make_cells):
    """Render pages, write PNGs, optionally show interactively."""
    import cv2

    paths = []
    for page in range(args.pages):
        grid = _tile(make_cells(page), args.cols)
        path = f"{args.out}_p{page}.png"
        cv2.imwrite(path, grid)
        paths.append(path)
        print("wrote", path)
        if args.show and "DISPLAY" in os.environ:
            cv2.imshow("deepcharuco_tpu view", grid)
            key = cv2.waitKey(0) & 0xFF
            if key in (ord("q"), 27):
                break
    if args.show and "DISPLAY" in os.environ:
        cv2.destroyAllWindows()
    elif args.show:
        print("(--show ignored: no DISPLAY in environment)")
    return paths


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # never contend for the chip
    import numpy as np

    from deepcharuco_tpu.board import draw_keypoints_with_validity
    from deepcharuco_tpu.configs import default_config, load_configuration
    from deepcharuco_tpu.data import CharucoDataset, RefineNetDataset
    from deepcharuco_tpu.ops import label_to_keypoints

    cfg = load_configuration(args.config) if args.config else default_config()

    if args.what == "dataset":
        ds = CharucoDataset(cfg, labels=args.labels,
                            validation=args.validation)

        def cells(page):
            out = []
            for i in range(args.n):
                s = ds[page * args.n + i]
                kp, valid = label_to_keypoints(
                    np.asarray(s["loc"])[None], np.asarray(s["ids"])[None],
                    cfg.n_ids)
                img = _denorm(s["image"])
                out.append(draw_keypoints_with_validity(
                    img, np.asarray(kp)[0], np.asarray(valid)[0],
                    color=(0, 255, 0)))
            return out

        _pages(args, cells)
        return

    if args.what == "refine":
        import cv2

        ds = RefineNetDataset(cfg, labels=args.labels,
                              validation=args.validation)

        def cells(page):
            out = []
            i = page * args.n
            while len(out) < args.n:
                s = ds[i]
                i += 1
                for patch, heat in zip(s["patches"], s["heatmaps"]):
                    big = cv2.resize(_denorm(patch), (64, 64),
                                     interpolation=cv2.INTER_NEAREST)
                    hm = np.clip(heat[..., 0] * 255.0, 0, 255).astype(np.uint8)
                    hm = cv2.applyColorMap(hm, cv2.COLORMAP_VIRIDIS)
                    out.append(np.concatenate([big, hm], axis=1))
                    if len(out) == args.n:
                        break
            return out

        _pages(args, cells)
        return

    # predictions
    from deepcharuco_tpu.pipeline import load_pipeline

    pipe = load_pipeline(cfg, args.deepc, args.refinenet,
                         rn_patch_size=args.rn_patch_size,
                         rn_decode=args.rn_decode,
                         geom_decode=args.geom_decode,
                         geom_fill=args.geom_fill)

    if args.images:
        import cv2

        from deepcharuco_tpu.data.sources import DirectoryImageSource

        src = DirectoryImageSource(args.images)
        w, h = cfg.input_size

        def frame_and_truth(idx):
            img = src.get(idx)
            if img.shape[:2] != (h, w):
                img = cv2.resize(img, (w, h))
            return img, None
    else:
        ds = CharucoDataset(cfg, labels=args.labels, validation=True)

        def frame_and_truth(idx):
            s = ds[idx]
            kp, valid = label_to_keypoints(
                np.asarray(s["loc"])[None], np.asarray(s["ids"])[None],
                cfg.n_ids)
            return _denorm(s["image"]), (np.asarray(kp)[0],
                                         np.asarray(valid)[0])

    def cells(page):
        imgs, truths = [], []
        for i in range(args.n):
            img, truth = frame_and_truth(page * args.n + i)
            imgs.append(img)
            truths.append(truth)
        _, valid, refined = pipe.detect(np.stack(imgs))
        out = []
        for img, truth, v, r in zip(imgs, truths, valid, refined):
            if truth is not None:
                img = draw_keypoints_with_validity(img, truth[0], truth[1],
                                                   color=(0, 255, 0))
            out.append(draw_keypoints_with_validity(img, r, v,
                                                    color=(255, 0, 255)))
        return out

    _pages(args, cells)


if __name__ == "__main__":
    main()
