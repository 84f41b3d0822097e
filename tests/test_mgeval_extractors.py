"""Golden tests for the extended mgeval extractor surface.

Hand-computed values on a 4-note fixture (mgeval/core.py:16-644 semantics,
re-expressed over the note list — divergences documented in eval/mgeval.py).
"""

import numpy as np

from rule_guided_music_tpu.data.midi_io import MidiData, Note
from rule_guided_music_tpu.eval.mgeval import (
    BAR_EXTRACTORS,
    FEATURES,
    RUNNER_FEATURES,
    avg_pitch_shift,
    bar_pitch_class_histogram,
    bar_used_note,
    bar_used_pitch,
    note_length_hist,
    note_length_transition_matrix,
    pitch_class_transition_matrix,
    total_used_note,
)


def _fixture():
    # bar_seconds default 2.0; two bars: [0,2) and [2,4)
    return MidiData(notes=[
        Note(velocity=80, pitch=60, start=0.0, end=0.5),    # C4, quarter
        Note(velocity=80, pitch=64, start=0.5, end=1.5),    # E4, half
        Note(velocity=80, pitch=67, start=2.0, end=2.25),   # G4, 8th
        Note(velocity=80, pitch=72, start=2.25, end=4.25),  # C5, full (bar-straddling)
    ])


def test_total_used_note():
    assert total_used_note(_fixture()) == 4.0


def test_avg_pitch_shift():
    # onset-ordered pitches [60, 64, 67, 72] -> |diffs| [4, 3, 5]
    assert avg_pitch_shift(_fixture()) == 4.0
    assert avg_pitch_shift(MidiData()) == 0.0


def test_bar_used_pitch_and_note():
    np.testing.assert_array_equal(bar_used_pitch(_fixture()), [2.0, 2.0])
    np.testing.assert_array_equal(bar_used_note(_fixture()), [2.0, 2.0])


def test_bar_pitch_class_histogram_duration_weighted():
    hist = bar_pitch_class_histogram(_fixture())
    assert hist.shape == (2, 12)
    # bar 0: C 0.5s, E 1.0s of 1.5s total
    np.testing.assert_allclose(hist[0, 0], 0.5 / 1.5)
    np.testing.assert_allclose(hist[0, 4], 1.0 / 1.5)
    # bar 1: G 0.25s, C5 overlap [2.25, 4.0) = 1.75s of 2.0s total
    np.testing.assert_allclose(hist[1, 7], 0.25 / 2.0)
    np.testing.assert_allclose(hist[1, 0], 1.75 / 2.0)
    np.testing.assert_allclose(hist.sum(axis=1), [1.0, 1.0])


def test_pitch_class_transition_matrix_counts_and_normalization():
    mat = pitch_class_transition_matrix(_fixture())
    assert mat.sum() == 3
    assert mat[0, 4] == 1 and mat[4, 7] == 1 and mat[7, 0] == 1
    row = pitch_class_transition_matrix(_fixture(), normalize=1)
    sums = row.sum(axis=1)
    np.testing.assert_allclose(sums[[0, 4, 7]], 1.0)
    full = pitch_class_transition_matrix(_fixture(), normalize=2)
    np.testing.assert_allclose(full.sum(), 1.0)


def test_note_length_hist_classes():
    # durations 0.5 (quarter=idx2), 1.0 (half=idx1), 0.25 (8th=idx3),
    # 2.0 (full=idx0) in a 2.0s bar
    hist = note_length_hist(_fixture(), normalize=False)
    np.testing.assert_array_equal(hist[:4], [1, 1, 1, 1])
    assert hist[4:].sum() == 0
    np.testing.assert_allclose(note_length_hist(_fixture())[:4], 0.25)


def test_note_length_hist_dotted_and_triplet_classes():
    midi = MidiData(notes=[
        Note(80, 60, 0.0, 1.5),      # dotted half = 72/96 of 2.0s bar -> idx 5
        Note(80, 62, 0.0, 2.0 / 3),  # half-note triplet = 32/96 -> idx 9
    ])
    hist = note_length_hist(midi, normalize=False)
    assert hist[5] == 1 and hist[9] == 1


def test_note_length_transition_matrix():
    # onset-ordered length classes [2, 1, 3, 0] -> (2,1), (1,3), (3,0)
    mat = note_length_transition_matrix(_fixture())
    assert mat.sum() == 3
    assert mat[2, 1] == 1 and mat[1, 3] == 1 and mat[3, 0] == 1
    np.testing.assert_allclose(
        note_length_transition_matrix(_fixture(), normalize=2).sum(), 1.0)


def test_registry_shapes_fixed_for_set_metrics():
    """Every FEATURES entry must be fixed-dimension so evaluate_sets can
    stack across files; runner features stay the reference's exact 7."""
    midi = _fixture()
    for name, fn in FEATURES.items():
        out = np.atleast_1d(np.asarray(fn(midi), dtype=float))
        assert out.ndim == 1, name
    assert len(RUNNER_FEATURES) == 7
    assert set(RUNNER_FEATURES) <= set(FEATURES)
    for name, fn in BAR_EXTRACTORS.items():
        out = np.asarray(fn(midi))
        assert out.shape[0] == 2, name          # one row per bar


def test_empty_midi_is_safe():
    empty = MidiData()
    assert total_used_note(empty) == 0.0
    assert note_length_hist(empty).sum() == 0.0
    assert pitch_class_transition_matrix(empty).sum() == 0.0
    np.testing.assert_array_equal(bar_used_note(empty), [0.0])
