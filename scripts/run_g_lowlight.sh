#!/bin/bash
# Round-5 run G: multiplicative low-light diet fine-tune from the shipped
# soup. New accuracy AXIS (not the retired host-recall target): the shipped
# detector's multiplicative brightness floor is ~0.2x (probe_lowlight.py:
# recall 0.93 @ gain 1.0 -> 0.51 @ 0.12 -> 0.23 @ 0.08) because the
# reference diet darkens additively only; --low-gain-p trains the physical
# under-exposure model (gain x signal + read noise + uint8 quantization).
#
# Regime: run E's narrowed diet WITHOUT the fg-topk hinge (retired
# negative), + --low-gain-p 0.3 (70% of the stream unchanged, anchoring
# standard recall). Candidate ships as a SEPARATE artifact only if the
# standard 512-sample acceptance holds within noise of the shipped soup —
# the shipped artifact is not up for replacement.
#
# After training:
#   python scripts/probe_lowlight.py artifacts/detector_devsynth.npz \
#       checkpoints/r5_detector_g/<best> --samples 256
#   python scripts/eval_round3.py artifacts/detector_devsynth.npz \
#       checkpoints/r5_detector_g/<best> --samples 512
#
# Usage: bash scripts/run_g_lowlight.sh [steps] [wall_bound_s] [resume_ckpt_name]
set -u
steps=${1:-5000}
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
  --lr 1e-4 --conf-weight 0.2 --conf-margin 4 --conf-topk 8 \
  --perspective-p 0.12 --scale-max 1.0 --axis-snap-p 0.10 \
  --bg-bank 64 --bg-bank-p 0.4 --mixed-host-every 2 \
  --low-gain-p 0.3 --low-gain-min 0.08 \
  --logdir tb_logs/r5_detector_g --ckpt-dir checkpoints/r5_detector_g \
  --top-k 4
rc=$?
# 124 = wall bound hit: fine — top-k checkpoints were saved at every eval.
echo "run_g train exit: $rc"
case "$rc" in 0|124) exit 0 ;; *) exit "$rc" ;; esac
