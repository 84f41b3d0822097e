"""End-to-end plumbing test for bench.py in BENCH_TINY mode.

Round-2's driver bench (BENCH_r02.json) died rc=124 mid-first-compile and
left no parseable record; bench.py was restructured to emit the headline
JSON line immediately and enrich it incrementally under a wall-clock
budget.  This test drives the full script flow (XS geometry, CPU) and
asserts the incremental-emission contract the driver depends on.
"""

import json

import pytest


@pytest.mark.slow
def test_bench_tiny_emits_incremental_json(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_TINY", "1")
    monkeypatch.setenv("BENCH_BUDGET_S", "100000")
    import bench

    # _T0 is set at import; re-anchor so a warm module doesn't eat budget
    monkeypatch.setattr(bench, "_T0", bench.time.perf_counter())
    bench.main()
    out = capsys.readouterr().out

    json_lines = [ln for ln in out.splitlines() if ln.startswith("{")]
    # headline + denoiser-latency + ddim100 re-emissions at minimum
    assert len(json_lines) >= 3
    records = [json.loads(ln) for ln in json_lines]
    for rec in records:
        assert rec["unit"] == "excerpts/min/chip"
        assert rec["value"] > 0
        assert rec["vs_baseline"] > 0
    # every line carries the same headline value (self-sufficient records)
    assert len({rec["value"] for rec in records}) == 1
    # the last (richest) line reports the ddim100 full-chain number too
    assert "ddim100=" in records[-1]["metric"]
    assert "denoiser_step_ms=" in records[-1]["metric"]


@pytest.mark.slow
def test_bench_budget_skips_optional_stages(monkeypatch, capsys):
    """With an exhausted budget, bench still emits the headline line and
    exits cleanly instead of dying mid-variant."""
    monkeypatch.setenv("BENCH_TINY", "1")
    monkeypatch.setenv("BENCH_BUDGET_S", "0")
    import bench

    monkeypatch.setattr(bench, "_T0", bench.time.perf_counter())
    bench.main()
    out = capsys.readouterr().out
    json_lines = [ln for ln in out.splitlines() if ln.startswith("{")]
    assert len(json_lines) == 1          # headline only
    rec = json.loads(json_lines[0])
    assert rec["value"] > 0
    assert "budget: skip ddim100" in out
