"""Weight-space averaging ("model soup") between two detector checkpoints.

All round-3 detector runs are fine-tunes of the shipped round-2 weights, so
they live in one loss basin; linear interpolation trades the round-2 core
recall against the round-3 robustness (outliers/frontal/perspective) along
a single axis. Writes one ``.npz`` per requested alpha.

Usage:
    python scripts/soup.py A B --alphas 0.25 0.5 0.75 --out /tmp/soup
(alpha = weight on B; A and B may be .npz files or orbax ckpt dirs)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--alphas", type=float, nargs="+", default=[0.5])
    ap.add_argument("--out", default="/tmp/soup")
    ap.add_argument("--kind", default="detector")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from deepcharuco_tpu.configs import default_config
    from deepcharuco_tpu.pipeline import load_model_variables, variables_to_npz

    cfg = default_config()
    va = load_model_variables(args.a, args.kind, cfg.n_ids)
    vb = load_model_variables(args.b, args.kind, cfg.n_ids)
    for alpha in args.alphas:
        soup = jax.tree.map(lambda x, y: (1.0 - alpha) * x + alpha * y, va, vb)
        path = f"{args.out}_a{int(round(alpha * 100)):02d}.npz"
        variables_to_npz(path, soup)
        print("wrote", path)


if __name__ == "__main__":
    main()
