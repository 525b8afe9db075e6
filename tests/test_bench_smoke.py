"""The driver's round-end harness (`bench.py`) must always run: a tiny CPU
smoke pins its import surface and the one-JSON-line stdout contract, so a
pipeline API change can never silently break the official benchmark."""

import json

import numpy as np


def test_bench_outage_guard_emits_json_instead_of_hanging(monkeypatch, capsys):
    """When the axon grant is unclaimable (2026-08-17 outage mode), bench.py
    must emit ONE honest JSON line and return — never wedge the driver."""
    import bench

    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.delenv("BENCH_SKIP_PROBE", raising=False)
    monkeypatch.setattr(bench, "_tpu_claimable", lambda **kw: False)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["value"] == 0.0 and rec["note"] == "tpu_unclaimable_outage"


def test_bench_main_contract(monkeypatch, capsys):
    import bench

    monkeypatch.setenv("BENCH_BATCH", "2")
    monkeypatch.setenv("BENCH_ITERS", "2")
    monkeypatch.setenv("BENCH_UNIQUE", "2")
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"stdout must carry exactly ONE line, got {out}"
    rec = json.loads(out[0])
    assert set(rec) >= {"metric", "value", "unit", "vs_baseline"}
    assert rec["unit"] == "fps"
    assert np.isfinite(rec["value"]) and rec["value"] > 0
