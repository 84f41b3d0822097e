"""Evaluation suite tests: mgeval features, REMI tokenization, chords."""

import numpy as np
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
