"""Pose accuracy under partial occlusion: plain vs geom vs geom+fill.

Renders the board at a known pose through a physical pinhole model, blanks
a 56x56 px rectangle over a random corner region, and compares recovered
rvec/tvec to truth across the three decode modes. Reproduces the
BENCH_NOTES "Pose under occlusion" table (CPU backend; run from repo root
with PYTHONPATH=.).

Measured 2026-08-18: plain p90 rvec 1.11 rad / tvec 13.6 mm; geom (and
geom+fill, which must match exactly) p90 0.062 rad / 2.9 mm."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, cv2
from deepcharuco_tpu.configs import default_config
from deepcharuco_tpu import board as B
from deepcharuco_tpu.board import inner_corner_object_points
from deepcharuco_tpu.pipeline import Camera, load_pipeline

cfg = default_config()
img, _ = B.board_image(B.get_board(cfg), (400, 400), 5, 5)
tex = cv2.cvtColor(np.asarray(img), cv2.COLOR_BGR2GRAY)

# board texture plane: 400px == board side (row_count squares of square_len)
side_m = cfg.col_count * cfg.square_len
px2m = side_m / 400.0
K = np.array([[320, 0, 160], [0, 320, 120], [0, 0, 1]], np.float64)
cam = Camera(K=K.astype(np.float32), dist=np.zeros(5, np.float32))

obj = inner_corner_object_points(cfg.row_count, cfg.col_count, cfg.square_len)

def render(rvec, tvec):
    R, _ = cv2.Rodrigues(rvec)
    # texture pixel (u,v) -> board meters (u*px2m, v*px2m, 0) -> image
    A = np.array([[px2m, 0, 0], [0, px2m, 0], [0, 0, 1]], np.float64)
    H = K @ np.hstack([R[:, :2], tvec.reshape(3, 1)]) @ A
    frame = cv2.warpPerspective(tex, H.astype(np.float64), (320, 240),
                                borderValue=128)
    proj, _ = cv2.projectPoints(obj, rvec, tvec, K, None)
    return frame, proj.reshape(-1, 2)

pipes = {
    "plain": load_pipeline(cfg, "artifacts/detector_devsynth.npz",
                           "artifacts/refinenet_devsynth.npz", camera=cam),
    "geom": load_pipeline(cfg, "artifacts/detector_devsynth.npz",
                          "artifacts/refinenet_devsynth.npz", camera=cam,
                          geom_decode=True),
    "fill": load_pipeline(cfg, "artifacts/detector_devsynth.npz",
                          "artifacts/refinenet_devsynth.npz", camera=cam,
                          geom_decode=True, geom_fill=True),
}

rng = np.random.default_rng(0)
stats = {k: dict(r=[], t=[], n=[], ok=0, tot=0) for k in pipes}
for trial in range(24):
    rvec = np.array([0.25, -0.2, 0.1]) + rng.normal(0, 0.15, 3)
    tvec = np.array([-side_m / 2, -side_m / 2, 0.16 + 0.04 * rng.random()])
    frame, proj = render(rvec, tvec)
    # occlude a random corner-region rectangle (~25% of the board area)
    c = proj[rng.integers(0, 16)]
    x0, y0 = int(c[0]) - 28, int(c[1]) - 28
    frame = frame.copy()
    frame[max(0, y0):y0 + 56, max(0, x0):x0 + 56] = 128
    for name, pipe in pipes.items():
        kp, v, refined, ok, rv, tv, rms = pipe.detect_with_pose(frame[None])
        s = stats[name]
        s["tot"] += 1
        s["n"].append(int(v.sum()))
        if ok[0]:
            s["ok"] += 1
            s["r"].append(np.linalg.norm(rv[0] - rvec))
            s["t"].append(1000 * np.linalg.norm(tv[0] - tvec))
for name, s in stats.items():
    r, t = np.array(s["r"]), np.array(s["t"])
    print(f"{name:5s} pose ok {s['ok']}/{s['tot']}  corners med {np.median(s['n']):.0f}  "
          f"rvec err med {np.median(r):.4f} rad p90 {np.percentile(r,90):.4f}  "
          f"tvec err med {np.median(t):.2f} mm p90 {np.percentile(t,90):.2f}")
