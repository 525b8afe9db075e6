#!/bin/bash
# Round-5 run G closure: score the low-gain fine-tune on the chip.
#
# Candidates share one process / one compiled program / identical streams
# (the eval_round3 + probe_lowlight matched protocols):
#   - shipped artifacts/detector_devsynth.npz (the acceptance anchor)
#   - best run-G checkpoint (lowest val_loss in checkpoints/r5_detector_g)
#   - alpha=0.5 soup of the two (fallback if raw loses standard recall)
#
# Ship rule (scripts/run_g_lowlight.sh): a candidate becomes a SEPARATE
# artifact (artifacts/detector_lowlight.npz) only if the standard
# 512-sample acceptance holds within noise of the shipped soup; the shipped
# artifact is not up for replacement.
#
# Usage: bash scripts/eval_run_g.sh [samples_std] [samples_lowlight]
set -u
std=${1:-512}
ll=${2:-256}
cd "$(dirname "$0")/.." || exit 1

best=$(python - <<'EOF'
import json
d = json.load(open("checkpoints/r5_detector_g/index.json"))
print("checkpoints/r5_detector_g/" + min(d, key=d.get))
EOF
) || exit 1
echo "best run-G checkpoint: $best"

mkdir -p benchmarks/r5
python scripts/soup.py artifacts/detector_devsynth.npz "$best" \
  --alphas 0.5 --out /tmp/soup_g || exit 1

bash scripts/wait_for_tpu.sh "${TPU_ATTEMPTS:-20}" || exit 1

timeout 2700 python scripts/probe_lowlight.py \
  artifacts/detector_devsynth.npz "$best" /tmp/soup_g_a0.50.npz \
  --samples "$ll" 2>&1 | tee benchmarks/r5/probe_lowlight_run_g.log
rc=${PIPESTATUS[0]}; [ "$rc" -ne 0 ] && exit "$rc"

sleep 30
bash scripts/wait_for_tpu.sh "${TPU_ATTEMPTS:-20}" || exit 1

timeout 3600 python scripts/eval_round3.py \
  artifacts/detector_devsynth.npz "$best" /tmp/soup_g_a0.50.npz \
  --samples "$std" 2>&1 | tee benchmarks/r5/eval_run_g_${std}.log
exit "${PIPESTATUS[0]}"
