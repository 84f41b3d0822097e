"""MIDI I/O + piano-roll codec round-trip tests (SURVEY.md §4 fixture (c))."""

import os

import numpy as np
import pytest

from rule_guided_music_tpu.data.midi_io import (
    ControlChange,
    MidiData,
    Note,
    read_midi,
    write_midi,
)
from rule_guided_music_tpu.data.pianoroll import (
    finalize_decoded_sample,
    midi_to_roll,
    quantize_pedal,
    roll_to_midi,
    save_piano_roll_midi,
)


def test_midi_file_roundtrip(tmp_path):
    midi = MidiData(
        notes=[
            Note(velocity=80, pitch=60, start=0.0, end=0.5),
            Note(velocity=100, pitch=64, start=0.25, end=1.0),
            Note(velocity=64, pitch=67, start=1.0, end=1.28),
        ],
        control_changes=[ControlChange(number=64, value=100, time=0.3)],
    )
    path = str(tmp_path / "test.midi")
    write_midi(path, midi)
    back = read_midi(path)
    assert len(back.notes) == 3
    for orig, parsed in zip(midi.notes, back.notes):
        assert parsed.pitch == orig.pitch
        assert parsed.velocity == orig.velocity
        assert abs(parsed.start - orig.start) < 0.005
        assert abs(parsed.end - orig.end) < 0.005
    assert len(back.control_changes) == 1
    assert back.control_changes[0].number == 64
    assert back.control_changes[0].value == 100


def test_midi_overlapping_same_pitch(tmp_path):
    midi = MidiData(
        notes=[
            Note(velocity=90, pitch=60, start=0.0, end=1.0),
            Note(velocity=90, pitch=60, start=1.5, end=2.0),
        ]
    )
    path = str(tmp_path / "re.midi")
    write_midi(path, midi)
    back = read_midi(path)
    assert len(back.notes) == 2
    assert abs(back.notes[1].start - 1.5) < 0.005


def test_varlen_delta_large_gap(tmp_path):
    # delta times beyond 1 byte exercise variable-length encoding
    midi = MidiData(notes=[Note(velocity=70, pitch=50, start=30.0, end=31.0)])
    path = str(tmp_path / "gap.midi")
    write_midi(path, midi)
    back = read_midi(path)
    assert abs(back.notes[0].start - 30.0) < 0.01


def test_quantize_pedal():
    assert quantize_pedal(0) == 8
    assert quantize_pedal(15) == 8
    assert quantize_pedal(16) == 24
    assert quantize_pedal(127) == 120  # last bin center (reference parity)


def test_midi_to_roll_channels():
    midi = MidiData(
        notes=[Note(velocity=100, pitch=60, start=0.0, end=0.5)],
        control_changes=[ControlChange(number=64, value=127, time=0.1)],
    )
    roll = midi_to_roll(midi, fs=100, length=128)
    assert roll.shape == (3, 128, 128)
    assert roll[0, 60, 0] == 100
    assert roll[0, 60, 49] == 100
    assert roll[0, 60, 50] == 0
    assert roll[1, 60, 0] == 127          # onset marker
    assert roll[1, 60, 1] == 0
    assert roll[2, 21, 10] == quantize_pedal(127)  # pedal broadcast on rows


def test_roll_to_midi_basic():
    roll = np.zeros((3, 128, 128), dtype=np.float32)
    roll[0, 60, 10:60] = 90
    roll[1, 60, 10] = 127
    midi = roll_to_midi(roll, fs=100)
    assert len(midi.notes) == 1
    note = midi.notes[0]
    assert note.pitch == 60 and note.velocity == 90
    assert abs(note.start - 0.10) < 1e-6
    assert abs(note.end - 0.60) < 1e-6


def test_roll_to_midi_onset_splits_held_span():
    """Two onsets under one held span -> two repeated notes."""
    roll = np.zeros((3, 128, 256), dtype=np.float32)
    roll[0, 64, 20:120] = 80
    roll[1, 64, 20] = 127
    roll[1, 64, 70] = 127
    midi = roll_to_midi(roll, fs=100)
    assert len(midi.notes) == 2
    assert abs(midi.notes[0].start - 0.20) < 1e-6
    assert abs(midi.notes[0].end - 0.70) < 1e-6
    assert abs(midi.notes[1].start - 0.70) < 1e-6
    assert abs(midi.notes[1].end - 1.20) < 1e-6


def test_roll_to_midi_span_without_onset_dropped():
    roll = np.zeros((3, 128, 128), dtype=np.float32)
    roll[0, 72, 5:50] = 60  # velocity but no onset -> noise, dropped
    midi = roll_to_midi(roll, fs=100)
    assert len(midi.notes) == 0


def test_roll_to_midi_low_onset_ignored():
    roll = np.zeros((3, 128, 128), dtype=np.float32)
    roll[0, 72, 5:50] = 60
    roll[1, 72, 5] = 50  # below ONSET_THRESHOLD=64
    midi = roll_to_midi(roll, fs=100)
    assert len(midi.notes) == 0


def test_roll_to_midi_pedal_values():
    roll = np.zeros((3, 128, 128), dtype=np.float32)
    roll[0, 60, 0:10] = 90
    roll[1, 60, 0] = 127
    roll[2, 21:109, 30] = 8     # quantized "0" bin -> CC value 0
    roll[2, 21:109, 60] = 120   # > 112 -> 127
    midi = roll_to_midi(roll, fs=100)
    ccs = {round(c.time * 100): c.value for c in midi.control_changes}
    assert ccs[30] == 0
    assert ccs[60] == 127


def test_full_roundtrip_midi_roll_midi(tmp_path):
    """midi -> roll -> midi preserves note boundaries at fs resolution."""
    midi = MidiData(
        notes=[
            Note(velocity=100, pitch=60, start=0.00, end=0.40),
            Note(velocity=90, pitch=64, start=0.10, end=0.55),
            Note(velocity=80, pitch=60, start=0.50, end=0.90),  # re-strike
        ]
    )
    roll = midi_to_roll(midi, fs=100, length=128)
    back = roll_to_midi(roll, fs=100)
    assert len(back.notes) == 3
    got = sorted((n.pitch, round(n.start, 2), round(n.end, 2)) for n in back.notes)
    want = sorted((n.pitch, round(n.start, 2), round(n.end, 2)) for n in midi.notes)
    for (p1, s1, e1), (p2, s2, e2) in zip(got, want):
        assert p1 == p2
        assert abs(s1 - s2) <= 0.01
        assert abs(e1 - e2) <= 0.01


def test_finalize_decoded_sample():
    x = np.array([[-1.0, -0.96, -0.9, 0.0, 1.0]], dtype=np.float32)
    out = finalize_decoded_sample(x)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out[0], [0, 0, 6, 63, 127])


def test_save_piano_roll_midi_naming(tmp_path):
    batch = np.zeros((2, 3, 128, 128), dtype=np.uint8)
    batch[:, 0, 60, 0:30] = 90
    batch[:, 1, 60, 0] = 127
    paths = save_piano_roll_midi(
        batch, str(tmp_path), fs=100, y=np.array([1, 2]), save_ind=4
    )
    assert os.path.basename(paths[0]) == "sample_4_y_1.midi"
    assert os.path.basename(paths[1]) == "sample_5_y_2.midi"
    back = read_midi(paths[0])
    assert len(back.notes) == 1


def test_first_column_onset_fix(tmp_path):
    """Notes sustained from t=0 get an injected onset so they survive."""
    batch = np.zeros((1, 3, 128, 128), dtype=np.uint8)
    batch[0, 0, 65, 0:40] = 75  # no onset anywhere
    paths = save_piano_roll_midi(batch, str(tmp_path), fs=100)
    back = read_midi(paths[0])
    assert len(back.notes) == 1
    assert back.notes[0].pitch == 65


def test_native_codec_matches_python_scan():
    """The C++ event scan must agree event-for-event with the Python scan."""
    from rule_guided_music_tpu.data.pianoroll import roll_to_midi
    from rule_guided_music_tpu.native import is_available

    if not is_available():
        import pytest

        pytest.skip("no native toolchain")
    rng = np.random.default_rng(0)
    for trial in range(5):
        roll = np.zeros((3, 128, 512), dtype=np.float32)
        for _ in range(40):
            p = int(rng.integers(21, 109))
            s = int(rng.integers(0, 480))
            e = int(rng.integers(s + 1, min(s + 120, 512)))
            v = int(rng.integers(20, 127))
            roll[0, p, s:e] = np.maximum(roll[0, p, s:e], v)
            roll[1, p, s] = 127
        roll[2, 21:109, 50] = 72
        native = roll_to_midi(roll.copy(), fs=100, use_native=True)
        python = roll_to_midi(roll.copy(), fs=100, use_native=False)
        nat = [(n.pitch, n.velocity, round(n.start, 6), round(n.end, 6))
               for n in native.notes]
        py = [(n.pitch, n.velocity, round(n.start, 6), round(n.end, 6))
              for n in python.notes]
        assert nat == py, f"trial {trial}: {len(nat)} vs {len(py)} events"
        assert len(native.control_changes) == len(python.control_changes)


def test_native_codec_speedup_sanity():
    from rule_guided_music_tpu.native import is_available

    if not is_available():
        import pytest

        pytest.skip("no native toolchain")
    import time

    from rule_guided_music_tpu.data.pianoroll import roll_to_midi

    roll = np.zeros((3, 128, 1024), dtype=np.float32)
    for p in range(30, 100):
        roll[0, p, (p * 7) % 900:(p * 7) % 900 + 60] = 80
        roll[1, p, (p * 7) % 900] = 127
    # warmup: the C++ codec builds lazily on first use — keep the (one-time,
    # per-host) compile out of the timed loop
    roll_to_midi(roll.copy(), use_native=True)
    roll_to_midi(roll.copy(), use_native=False)
    t0 = time.perf_counter()
    for _ in range(10):
        roll_to_midi(roll.copy(), use_native=True)
    native_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        roll_to_midi(roll.copy(), use_native=False)
    python_t = time.perf_counter() - t0
    # the native path must not be slower (usually 10-100x faster)
    assert native_t < python_t * 1.5


def test_native_rasterizer_matches_python():
    from rule_guided_music_tpu.data.pianoroll import midi_to_roll
    from rule_guided_music_tpu.native import is_available

    if not is_available():
        import pytest

        pytest.skip("no native toolchain")
    rng = np.random.default_rng(4)
    notes = []
    for _ in range(80):
        p = int(rng.integers(21, 109))
        s = float(rng.uniform(0, 9))
        e = s + float(rng.uniform(0.05, 1.5))
        notes.append(Note(velocity=int(rng.integers(1, 128)), pitch=p,
                          start=s, end=e))
    midi = MidiData(notes=notes)
    nat = midi_to_roll(midi, fs=100, length=1024, use_native=True)
    py = midi_to_roll(midi, fs=100, length=1024, use_native=False)
    np.testing.assert_array_equal(nat, py)


def test_roll_to_midi_nan_and_degenerate_inputs():
    """NaN/Inf lanes must decode cleanly (silence), never cast to garbage
    CC values or raise (VERDICT r1 item 10)."""
    import warnings

    from rule_guided_music_tpu.data.pianoroll import roll_to_midi

    # all-NaN 3-channel roll -> valid, empty MIDI
    roll = np.full((3, 128, 256), np.nan, dtype=np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning fails the test
        midi = roll_to_midi(roll)
    assert midi.notes == []
    assert not midi.control_changes

    # NaN pedal lane under real notes: notes survive, pedal is silent
    roll = np.zeros((3, 128, 256), dtype=np.float32)
    roll[0, 60, 10:50] = 90.0
    roll[1, 60, 10] = 127.0
    roll[2] = np.nan
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        midi = roll_to_midi(roll)
    assert len(midi.notes) == 1 and midi.notes[0].pitch == 60
    assert not midi.control_changes

    # +/-Inf velocities clamp to the [0, 127] contract
    roll = np.zeros((3, 128, 64), dtype=np.float32)
    roll[0, 70, 5:20] = np.inf
    roll[1, 70, 5] = 127.0
    roll[0, 40, 5:20] = -np.inf
    midi = roll_to_midi(roll)
    assert [n.pitch for n in midi.notes] == [70]
    assert midi.notes[0].velocity <= 127
