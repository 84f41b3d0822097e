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
def test_bench_merges_prior_record_with_honest_flags(
        monkeypatch, capsys, tmp_path):
    """Round-5 driver-record hardening: the committed prior warm study is
    merged into every emitted line under measured_this_run flags, a
    fallback line lands BEFORE any compile, and live measurements
    override recorded entries (BENCH_r03/r04 both replayed cold and lost
    the full study)."""
    record = {
        "source": "unit-test prior record",
        "headline_per_min": 123.4,
        "headline_vs_baseline": 9.9,
        "variants": {
            "ddpm1000": {"per_min": 123.4, "warm_wall_s": 1.0},
            "ddim100_only_recorded": {"per_min": 55.5, "warm_wall_s": 2.0},
        },
    }
    path = tmp_path / "record.json"
    path.write_text(json.dumps(record))
    monkeypatch.setenv("BENCH_TINY", "1")
    monkeypatch.setenv("BENCH_BUDGET_S", "100000")
    monkeypatch.setenv("BENCH_RECORD_FILE", str(path))
    import bench

    monkeypatch.setattr(bench, "_T0", bench.time.perf_counter())
    bench.main()
    out = capsys.readouterr().out
    records = [json.loads(ln) for ln in out.splitlines()
               if ln.startswith("{")]
    assert len(records) >= 3

    # the very first line is the pre-compile fallback: recorded values only
    first = records[0]
    assert first["headline_measured_this_run"] is False
    assert first["value"] == 123.4
    assert first["record_source"] == "unit-test prior record"
    assert first["variants"]["ddpm1000"]["measured_this_run"] is False

    # the last line carries live measurements overriding the record,
    # while never-measured variants survive with recorded provenance
    last = records[-1]
    assert last["headline_measured_this_run"] is True
    assert last["value"] != 123.4
    assert last["recorded_headline_per_min"] == 123.4
    v = last["variants"]
    assert v["ddpm1000"]["measured_this_run"] is True
    assert "compile_s" in v["ddpm1000"] and "per_min" in v["ddpm1000"]
    assert v["ddim100_only_recorded"] == {
        "per_min": 55.5, "measured_this_run": False,
        "recorded_wall_s": 2.0}
    assert "cache_entries_at_start" in last


@pytest.mark.slow
def test_cache_tarball_roundtrip(tmp_path, monkeypatch):
    """bench._unpack_committed_cache restores a packed cache dir exactly
    and no-ops when entries already exist."""
    import bench

    cache = tmp_path / ".jax_cache"
    cache.mkdir()
    (cache / "entry_a").write_bytes(b"a" * 100)
    (cache / "entry_b").write_bytes(b"b" * 100)
    tarball = tmp_path / "assets" / "jax_cache.tar.gz"
    tarball.parent.mkdir()
    import tarfile

    with tarfile.open(tarball, "w:gz") as tf:
        for p in sorted(cache.iterdir()):
            tf.add(p, arcname=f".jax_cache/{p.name}")

    # wipe and restore
    (cache / "entry_a").unlink()
    (cache / "entry_b").unlink()
    cache.rmdir()
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    monkeypatch.setattr(bench, "CACHE_DIR", str(cache))
    monkeypatch.setattr(bench, "CACHE_TARBALL", str(tarball))
    bench._unpack_committed_cache()
    assert (cache / "entry_a").read_bytes() == b"a" * 100
    assert (cache / "entry_b").read_bytes() == b"b" * 100

    # no-op when entries exist: a marker file must survive
    (cache / "entry_a").write_bytes(b"live")
    bench._unpack_committed_cache()
    assert (cache / "entry_a").read_bytes() == b"live"


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
