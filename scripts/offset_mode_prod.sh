#!/bin/bash
# Round-5 follow-up: does the `rn_decode="offset"` fast mode compose with
# the README production configuration (hires-2 + geom decode + fill)?
# Same-session A/B at the prod_perf.sh protocol (batch 128, stable fetch,
# depth 2, VGA input), then matched-stream hires accuracy on the device
# protocol (streams keyed by PRNGKey(j) — identical across runs).
set -u
cd "$(dirname "$0")/.."
log=benchmarks/r5/offset_mode_prod.log
common=(--hires 2 --rn-patch-size 32
        --refinenet artifacts/refinenet32_devsynth.npz
        --batch 128 --iters 40 --fetch refined --depth 2
        --geom-decode --geom-fill)
evalc=(--source device --samples 256 --truth subpixel --hires 2
       --rn-patch-size 32 --deepc artifacts/detector_devsynth.npz
       --refinenet artifacts/refinenet32_devsynth.npz)
{
  echo "=== fast production config: hires-2 + geom + fill, avg vs offset ==="
  echo "--- A: rn_decode avg (the README recommendation; prod_perf.sh measured 2,806.6) ---"
  timeout 2700 python -m deepcharuco_tpu.cli.benchmark "${common[@]}" --rn-decode avg
  sleep 45
  echo "--- B: rn_decode offset (heatmap pyramid DCE'd) ---"
  timeout 2700 python -m deepcharuco_tpu.cli.benchmark "${common[@]}" --rn-decode offset
  sleep 45
  echo "=== hires accuracy, 256-sample device protocol, sub-pixel truth, matched streams ==="
  echo "--- avg ---"
  timeout 2700 python -m deepcharuco_tpu.cli.eval "${evalc[@]}" --rn-avg
  sleep 45
  echo "--- offset ---"
  timeout 2700 python -m deepcharuco_tpu.cli.eval "${evalc[@]}" --rn-offset
  echo "ALL_DONE"
} > "$log" 2>&1
tail -40 "$log"
