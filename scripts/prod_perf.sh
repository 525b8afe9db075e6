#!/bin/bash
# Round-5 VERDICT item 4 (throughput half): time the README-recommended
# production configuration — hires-2 tap + geom decode + homography fill +
# RN-32 `avg` decode — on the real chip at the stable-fetch depth-2
# protocol, batch 128 (the round-4 hires protocol), with a SAME-SESSION
# plain-hires baseline so the geom+fill cost is tunnel-swing-proof.
#
# The plain baseline runs FIRST (known-good compile, round-4 measured
# 1,450 fps) so a mid-compile stall on the bigger fused program — the
# failure that killed the first attempt, BENCH_NOTES "recommended
# production configuration" — still leaves a baseline on record. Bounded
# by `timeout`; never kill by pattern (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
log=benchmarks/r5/prod_perf.log
common=(--hires 2 --rn-decode avg --rn-patch-size 32
        --refinenet artifacts/refinenet32_devsynth.npz
        --batch 128 --iters 40 --fetch refined --depth 2)
{
  echo "=== production config throughput (stable fetch, depth 2, batch 128) ==="
  echo "--- A: hires-2 plain (same-session baseline) ---"
  timeout 1800 python -m deepcharuco_tpu.cli.benchmark "${common[@]}"
  echo "--- grant release wait (CLAUDE.md 20-30s rule) ---"
  sleep 45
  echo "--- B: hires-2 + geom decode + fill (the README recommendation) ---"
  timeout 2700 python -m deepcharuco_tpu.cli.benchmark "${common[@]}" \
    --geom-decode --geom-fill
} > "$log" 2>&1
tail -30 "$log"
