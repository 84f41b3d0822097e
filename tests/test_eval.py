"""Evaluation suite tests: mgeval features, REMI tokenization, chords."""

import os

import numpy as np
import pandas as pd
import pytest

from rule_guided_music_tpu.data.midi_io import MidiData, Note, write_midi
from rule_guided_music_tpu.eval import mgeval
from rule_guided_music_tpu.eval.remi import (
    Event,
    Vocab,
    chord_symbols,
    events_to_midi,
    midi_to_events,
    recognize_chords,
)


def _make_midi(pitches, start=0.0, dur=0.5, gap=0.25, velocity=80):
    notes = []
    t = start
    for p in pitches:
        notes.append(Note(velocity=velocity, pitch=p, start=t, end=t + dur))
        t += gap
    return MidiData(notes=notes)


def test_mgeval_features():
    midi = _make_midi([60, 64, 67, 72])
    assert mgeval.total_used_pitch(midi) == 4
    assert mgeval.pitch_range(midi) == 12
    assert mgeval.avg_ioi(midi) == pytest.approx(0.25)
    assert mgeval.avg_velocity(midi) == 80
    assert mgeval.avg_note_length(midi) == pytest.approx(0.5)
    hist = mgeval.total_pitch_class_histogram(midi)
    assert hist.shape == (12,)
    assert hist[0] == pytest.approx(0.5)  # C appears twice of four


def test_mgeval_set_comparison(tmp_path):
    rng = np.random.default_rng(0)
    gen_files, ref_files = [], []
    for i in range(5):
        base = 60 + int(rng.integers(-3, 4))
        m1 = _make_midi([base, base + 4, base + 7, base + 12])
        m2 = _make_midi([base + 1, base + 5, base + 8])
        p1 = str(tmp_path / f"gen{i}.midi")
        p2 = str(tmp_path / f"ref{i}.midi")
        write_midi(p1, m1)
        write_midi(p2, m2)
        gen_files.append(p1)
        ref_files.append(p2)
    results = mgeval.evaluate_sets(
        gen_files, ref_files, features=["total_used_pitch", "pitch_range"]
    )
    assert "total_used_pitch" in results
    for stats in results.values():
        assert np.isfinite(stats["kl_divergence"])
        assert 0.0 <= stats["overlap_area"] <= 1.5


def test_remi_roundtrip():
    midi = _make_midi([60, 64, 67], start=0.0, dur=0.5, gap=0.5)
    events = midi_to_events(midi)
    kinds = [e.kind for e in events]
    assert kinds[0] == "Bar"
    assert kinds.count("Pitch") == 3
    back = events_to_midi(events)
    assert len(back.notes) == 3
    for orig, rec in zip(midi.notes, back.notes):
        assert rec.pitch == orig.pitch
        assert abs(rec.start - orig.start) < 0.13   # one grid position
        assert abs((rec.end - rec.start) - 0.5) < 0.13


def test_vocab_encode_decode():
    vocab = Vocab()
    midi = _make_midi([60, 72])
    events = midi_to_events(midi)
    ids = vocab.encode(events)
    assert all(0 <= i < len(vocab) for i in ids)
    decoded = vocab.decode(ids)
    assert [str(e) for e in decoded] == [str(e) for e in events]


def test_chord_recognition():
    # C major triad then A minor triad, one window each
    notes = (
        [Note(80, p, 0.0, 1.0) for p in (60, 64, 67)]
        + [Note(80, p, 1.0, 2.0) for p in (57, 60, 64)]
    )
    midi = MidiData(notes=notes)
    labels = recognize_chords(midi, window_seconds=1.0)
    assert labels[0] == ("maj", 0)
    assert labels[1] == ("min", 9)
    assert chord_symbols(labels) == ["C:maj", "A:min"]


def test_chord_recognition_empty_window():
    midi = MidiData(notes=[Note(80, 60, 0.0, 0.5)])
    labels = recognize_chords(midi, window_seconds=1.0, total_seconds=2.0)
    assert labels[1] == ("N", -1)


def test_eval_results_aggregation_scripts(tmp_path):
    """eval_uncond / eval_uncond_summary / edit_create_bins CLI chain
    (VERDICT r1 item 8) over synthetic inputs."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    # per-run mgeval CSVs in the <dataset>.<method>.<mean|std>.csv layout
    attrs = ["total_used_pitch", "avg_IOI", "total_pitch_class_histogram",
             "pitch_range", "mean_note_velocity", "mean_note_duration",
             "note_density", "avg"]
    folder = tmp_path / "uncond" / "ours"
    folder.mkdir(parents=True)
    for method, oa in [("scg", 0.8), ("base", 0.6)]:
        for stat in ("mean", "std"):
            pd.DataFrame({
                "attribute": attrs,
                "KL": [0.1] * len(attrs),
                "OA": [oa] * len(attrs),
            }).to_csv(folder / f"maestro.{method}.{stat}.csv", index=False)

    run = lambda *cmd: subprocess.run(
        [sys.executable, *cmd], env=env, cwd=repo, capture_output=True,
        text=True)
    r = run("scripts/eval_results/eval_uncond.py",
            "--path_to_folder", str(folder) + os.sep)
    assert r.returncode == 0, r.stderr
    mean = pd.read_csv(folder / "results_mean.csv")
    assert set(mean.method) == {"scg", "base"}
    assert mean[mean.method == "scg"].avg.item() == 0.8

    r = run("scripts/eval_results/eval_uncond_summary.py",
            "--path_to_folder", str(tmp_path / "uncond") + os.sep)
    assert r.returncode == 0, r.stderr
    summary = pd.read_csv(tmp_path / "uncond" / "summary_mean.csv")
    assert len(summary) == 2

    # edit_create_bins over a synthetic results.csv
    rng = np.random.default_rng(0)
    rows = [str([round(float(x), 3)
                 for x in rng.uniform(0.5, 7.5, size=16)])
            for _ in range(40)]
    results = tmp_path / "results.csv"
    pd.DataFrame({"note_density.target_rule": rows}).to_csv(
        results, index=False)
    bins_json = tmp_path / "bins.json"
    r = run("scripts/eval_results/edit_create_bins.py",
            "--file_name", str(results), "--out", str(bins_json))
    assert r.returncode == 0, r.stderr
    bins = json.loads(bins_json.read_text())
    assert len(bins["vertical_bounds"]) == 7
    assert len(bins["vertical_centers"]) == 8
    assert bins["horizontal_bounds"] == sorted(bins["horizontal_bounds"])


def test_remi_golden_fixture_events_and_chords():
    """VERDICT r1 item 9: a hand-verified MIDI with hand-computed REMI event
    stream + chord labels pins the eval instrument itself. Grid: 120 bpm 4/4
    (bar = 2.0 s, position = 0.125 s); chord window = 1.0 s."""
    from rule_guided_music_tpu.data.midi_io import MidiData, Note
    from rule_guided_music_tpu.eval.remi import (
        Vocab,
        chord_symbols,
        events_to_midi,
        midi_to_events,
        recognize_chords,
    )

    midi = MidiData()
    # bar 0, beat 1: C major triad, half a second
    midi.notes += [
        Note(velocity=100, pitch=60, start=0.0, end=0.5),
        Note(velocity=80, pitch=64, start=0.0, end=0.5),
        Note(velocity=64, pitch=67, start=0.0, end=0.5),
    ]
    # bar 1, beat 1: F minor triad, one full second
    midi.notes += [
        Note(velocity=90, pitch=65, start=2.0, end=3.0),
        Note(velocity=90, pitch=68, start=2.0, end=3.0),
        Note(velocity=90, pitch=72, start=2.0, end=3.0),
    ]

    # hand-computed golden stream:
    #   velocity bins: v*32/128 -> 100->25, 80->20, 64->16, 90->22
    #   durations: 0.5 s = 4 positions -> bin 3; 1.0 s = 8 positions -> bin 5
    events = midi_to_events(midi)
    assert [str(e) for e in events] == [
        "Bar_0",
        "Position_0", "Pitch_60", "Velocity_25", "Duration_3",
        "Position_0", "Pitch_64", "Velocity_20", "Duration_3",
        "Position_0", "Pitch_67", "Velocity_16", "Duration_3",
        "Bar_1",
        "Position_0", "Pitch_65", "Velocity_22", "Duration_5",
        "Position_0", "Pitch_68", "Velocity_22", "Duration_5",
        "Position_0", "Pitch_72", "Velocity_22", "Duration_5",
    ]

    # vocab round trip is exact
    vocab = Vocab()
    ids = vocab.encode(events)
    assert [str(e) for e in vocab.decode(ids)] == [str(e) for e in events]

    # grid-quantized reconstruction lands on the same starts/pitches/durations
    rebuilt = events_to_midi(events)
    assert [(n.pitch, n.start, n.end) for n in rebuilt.notes] == [
        (60, 0.0, 0.5), (64, 0.0, 0.5), (67, 0.0, 0.5),
        (65, 2.0, 3.0), (68, 2.0, 3.0), (72, 2.0, 3.0),
    ]

    # chord recognition: C major / silence / F minor — theory ground truth
    labels = recognize_chords(midi)
    assert labels == [("maj", 0), ("N", -1), ("min", 5)]
    assert chord_symbols(labels) == ["C:maj", "N", "F:min"]


def test_fad_proxy_end_to_end(tmp_path):
    """The in-env FAD proxy (additive synth + log-mel Fréchet): identical
    sets score ~0; distributionally different sets score clearly higher."""
    from rule_guided_music_tpu.eval.fad import (
        compute_fad_proxy,
        logmel_embedding,
        synth_midi,
    )

    rng = np.random.default_rng(0)

    def write_set(prefix, base_pitch, n=6):
        paths = []
        for i in range(n):
            notes = []
            t = 0.0
            for _ in range(12):
                p = int(base_pitch + rng.integers(-4, 5))
                notes.append(Note(velocity=90, pitch=p, start=t, end=t + 0.3))
                t += 0.25
            path = str(tmp_path / f"{prefix}{i}.midi")
            write_midi(path, MidiData(notes=notes))
            paths.append(path)
        return paths

    low = write_set("low", 48)
    low2 = write_set("low2", 48)
    high = write_set("high", 84)

    same = compute_fad_proxy(low, low2)
    diff = compute_fad_proxy(low, high)
    assert np.isfinite(same) and np.isfinite(diff)
    assert diff > same * 3, (same, diff)

    # synth + embedding sanity: audio is bounded, embedding fixed-size
    audio = synth_midi(MidiData(notes=[Note(90, 60, 0.0, 0.5)]))
    assert np.abs(audio).max() <= 1.0 + 1e-6
    emb = logmel_embedding(audio)
    assert emb.shape == (128,)
