#!/bin/bash
# Round-5 perf probe: the `rn_decode="offset"` fast serving mode.
#
# In offset mode the RefineNet heatmap decoder (upsample pyramid conv4*/
# conv5*/convPa/convPb — ~78% of RefineNet FLOPs, dominated by the
# 64×64×64ch convPa stage) is dead code under jit: the returned refined
# positions depend only on the trunk (conv1a..conv3b) + offset branch, so
# XLA's DCE should drop the pyramid entirely. RefineNet ≈ half the
# two-stage program (BENCH_NOTES int8 breakdown: detector 34.8 ms,
# RN+decode+gather 34.4 ms / batch-256), so the upside is large IF the
# offset-alone accuracy at the shipped RN-32 checkpoint holds up (it was
# only ever measured at the 40k-step checkpoint: 0.371 px median).
#
# A: fps, RN-32 avg decode (same-session baseline — the accuracy-priority
#    config); B: fps, RN-32 offset decode; A2: avg repeat (drift check).
# Then matched-stream accuracy on the 256-sample device protocol vs
# sub-pixel truth (streams keyed by PRNGKey(j) — identical across runs).
set -u
cd "$(dirname "$0")/.."
log=benchmarks/r5/offset_mode.log
common=(--rn-patch-size 32 --refinenet artifacts/refinenet32_devsynth.npz
        --batch 256 --iters 40 --fetch refined --depth 2)
evalc=(--source device --samples 256 --truth subpixel --rn-patch-size 32
       --deepc artifacts/detector_devsynth.npz
       --refinenet artifacts/refinenet32_devsynth.npz)
{
  echo "=== rn_decode offset fast mode: fps (stable fetch, depth 2, batch 256, 320x240) ==="
  echo "--- A: RN-32 avg (baseline) ---"
  timeout 1800 python -m deepcharuco_tpu.cli.benchmark "${common[@]}" --rn-decode avg
  sleep 45
  echo "--- B: RN-32 offset (heatmap pyramid DCE'd) ---"
  timeout 1800 python -m deepcharuco_tpu.cli.benchmark "${common[@]}" --rn-decode offset
  sleep 45
  echo "--- A2: RN-32 avg repeat (drift check) ---"
  timeout 1800 python -m deepcharuco_tpu.cli.benchmark "${common[@]}" --rn-decode avg
  sleep 45
  echo "=== accuracy, 256-sample device protocol, sub-pixel truth, matched streams ==="
  echo "--- avg ---"
  timeout 2700 python -m deepcharuco_tpu.cli.eval "${evalc[@]}" --rn-avg
  sleep 45
  echo "--- offset ---"
  timeout 2700 python -m deepcharuco_tpu.cli.eval "${evalc[@]}" --rn-offset
} > "$log" 2>&1
tail -40 "$log"
