"""One-process A/B: f32->bf16 detector vs int8 QuantDetector throughput.

Stable-fetch protocol (--fetch refined, depth 2, batch 256) so the figure
is tunnel-stable (BENCH_NOTES round-4 harness reconciliation). Both configs
share the session/tunnel conditions. VERDICT r4 item 2c.

Usage: python scripts/bench_int8_ab.py | tee benchmarks/r5/bench_int8_ab.log
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepcharuco_tpu.cli import benchmark

ARGS = ["--fetch", "refined", "--depth", "2", "--batch", "256"]

print("=== bf16 detector (shipped f32 weights) ===", flush=True)
benchmark.main(ARGS)
print("=== int8 QuantDetector (artifacts/detector_devsynth_int8.npz) ===",
      flush=True)
benchmark.main(ARGS + ["--deepc", "artifacts/detector_devsynth_int8.npz"])
print("=== bf16 repeat (drift check) ===", flush=True)
benchmark.main(ARGS)
