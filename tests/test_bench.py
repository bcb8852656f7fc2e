"""bench.py regression: the end-to-end path (stage-1 slice + full real
stage 2, warmup + steady passes) must run and emit the one-line JSON
contract the driver parses.  Tiny bounds keep it CPU-feasible; the TPU
numbers come from running bench.py unmodified on hardware."""

import json
import os

import pytest


@pytest.mark.skipif(not os.environ.get("TPU_ECM_SLOW"),
                    reason="~2 min CPU e2e bench smoke: TPU_ECM_SLOW=1")
def test_bench_e2e_smoke(capsys, monkeypatch):
    monkeypatch.setenv("BENCH_B1", "20000")
    monkeypatch.setenv("BENCH_B2", "200000")
    monkeypatch.setenv("BENCH_BATCH", "64")
    monkeypatch.setenv("BENCH_SLICE", "2048")
    monkeypatch.setenv("BENCH_REPS", "1")
    monkeypatch.setenv("BENCH_E2E", "1")
    import bench
    bench.main()
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["metric"].endswith("_e2e")
    assert rec["value"] > 0 and rec["unit"] == "curves/sec"
    assert rec["stage1_curves_per_sec"] > rec["value"] > 0
    assert 0 < rec["vs_baseline"] < 1000


def test_bench_stage1_only_contract(capsys, monkeypatch):
    """BENCH_E2E=0 (the CPU default) keeps the round-1 stage-1-only JSON."""
    monkeypatch.setenv("BENCH_B1", "20000")
    monkeypatch.setenv("BENCH_BATCH", "8")
    monkeypatch.setenv("BENCH_SLICE", "512")
    monkeypatch.setenv("BENCH_REPS", "1")
    monkeypatch.setenv("BENCH_E2E", "0")
    import bench
    bench.main()
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["metric"] == "ecm_stage1_curves_per_sec_per_chip_416bit_B1_1e6"
    # round-5 adds the MFU/variance companions (load_factor only on TPU
    # at the flagship batch); the driver-parsed core contract is stable
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["stage1_mac_per_s"] > 0
    assert 0 <= rec["stage1_mfu_vs_assumed_vpu_peak"] < 1
    assert rec["stage1_slice_spread"] >= 0
