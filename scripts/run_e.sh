#!/bin/bash
# Round-4 run E: ids-head frontal diet (--conf-fg-topk foreground mining),
# fine-tuned from the shipped soup. ROADMAP round-4 item 2.
#
# Regime = run D's narrowed diet (BENCH_NOTES "Round-3 detector runs B-D")
# + the foreground top-k hinge that targets the loc-gate/dustbin frontal
# misses the round-3 pathology dump isolated. Fine-tune only — the shipped
# artifact stays the soup ingredient; after this run, re-soup with
# scripts/soup.py and run the 512-sample acceptance (scripts/eval_round3.py).
#
# Usage: bash scripts/run_e.sh [steps] [wall_bound_s] [resume_ckpt_name]
#   resume_ckpt_name (e.g. step_0001000): continue from that checkpoint in
#   checkpoints/r4_detector_e with full optimizer state (--resume, NOT
#   --init-npz — BENCH_NOTES records why re-initialization loses the Adam
#   moments and regresses). steps then counts ADDITIONAL steps.
set -u
steps=${1:-6000}
bound=${2:-2400}
resume=${3:-}
cd "$(dirname "$0")/.." || exit 1
bash scripts/wait_for_tpu.sh "${TPU_ATTEMPTS:-20}" || exit 1
if [ -n "$resume" ]; then
  init_args=(--resume "$resume")
else
  init_args=(--init-npz artifacts/detector_devsynth.npz)
fi
timeout "$bound" python -m deepcharuco_tpu.cli.train \
  --device-synth --steps "$steps" --eval-every 250 --eval-host-batches 4 \
  "${init_args[@]}" \
  --lr 1e-4 --conf-weight 0.2 --conf-margin 4 --conf-topk 8 --conf-fg-topk 8 \
  --perspective-p 0.12 --scale-max 1.0 --axis-snap-p 0.10 \
  --bg-bank 64 --bg-bank-p 0.4 --mixed-host-every 2 \
  --logdir tb_logs/r4_detector_e --ckpt-dir checkpoints/r4_detector_e \
  --top-k 4
rc=$?
# 124 = wall bound hit: fine — top-k checkpoints were saved at every eval.
echo "run_e train exit: $rc"
case "$rc" in 0|124) exit 0 ;; *) exit "$rc" ;; esac
