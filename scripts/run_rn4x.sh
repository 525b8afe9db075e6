#!/bin/bash
# Round-4: matched 4x-octave RefineNet (VERDICT r3 item 5).
#
# The 4x patch tap with the SHIPPED RN-32 is a measured NEGATIVE (0.334 vs
# 0.235 px median — patch FOV/statistics two octaves off, BENCH_NOTES
# "4x patch tap"). This trains the matched experiment: the shipped RN-32
# regime (BENCH_NOTES "Round-3 RefineNet-32") with --frame-scale 4, warm-
# started from the shipped RN-32. Mind the 2x fine-tune precedent (trimmed
# the tail, LOST median — BENCH_NOTES "closing probes"): acceptance is
# median < 0.235 px on the 4x tap, else a recorded negative retires the tap.
#
# Usage: bash scripts/run_rn4x.sh [steps] [wall_bound_s] [resume_ckpt_name]
set -u
steps=${1:-20000}
bound=${2:-3500}
resume=${3:-}
cd "$(dirname "$0")/.." || exit 1
bash scripts/wait_for_tpu.sh "${TPU_ATTEMPTS:-20}" || exit 1
if [ -n "$resume" ]; then
  init_args=(--resume "$resume")
else
  init_args=(--init-npz artifacts/refinenet32_devsynth.npz)
fi
timeout "$bound" python -m deepcharuco_tpu.cli.train_refinenet \
  --device-synth --frame-patches --frame-scale 4 --patch-size 32 \
  --offset-weight 0.25 --perspective-p 0.12 --lr 3e-5 \
  --steps "$steps" --eval-every 500 \
  "${init_args[@]}" \
  --logdir tb_logs/r4_rn32_4x --ckpt-dir checkpoints/r4_rn32_4x \
  --top-k 4
rc=$?
echo "run_rn4x train exit: $rc"
# 124 = wall bound hit: fine — top-k checkpoints were saved at every eval.
case "$rc" in 0|124) exit 0 ;; *) exit "$rc" ;; esac
