"""Golden agreement suite for the on-device chord/key analyzer.

VERDICT r1 item 3: deterministic rolls with music-theory-unambiguous keys and
triad progressions must be tagged exactly right by rules/chord.py, so a
behavior change in the analyzer (which drives SCG selection and the 0-1
chord loss, reference rule_maps.py:30-38) breaks CI.

Ground truth here is music theory itself, not music21's output: for purely
diatonic triad progressions the Krumhansl-Schmuckler key finder (which
music21's ``analyze('key')`` implements) provably ranks the true tonic
first, and the Roman-numeral letter of a clean triad is its scale-degree
interval from the tonic (reference chord_tag_num,
music_rule_guidance/piano_roll_to_chord.py:278-299).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rule_guided_music_tpu.rules.chord import (
    KEY_DICT,
    classify_keys,
    get_chords,
)

# music21's enharmonic spellings by pitch class (chord.py tables).
MAJOR_NAMES = ["C", "C#", "D", "E-", "E", "F", "F#", "G", "A-", "A", "B-", "B"]
MINOR_NAMES = ["c", "c#", "d", "e-", "e", "f", "f#", "g", "g#", "a", "b-", "b"]

NOTE_VALUE = 0.26  # ~velocity 80 after the /63.5 - 1 normalization


def make_roll(windows, n_channels=3, window_cols=128):
    """Build a (1, C, 128, W*128) normalized roll from per-window MIDI-pitch
    lists. Background is -1; notes sound for the whole window."""
    n = len(windows)
    roll = np.full((1, n_channels, 128, n * window_cols), -1.0, np.float32)
    for w, pitches in enumerate(windows):
        for p in pitches:
            roll[0, 0, p, w * window_cols : (w + 1) * window_cols] = NOTE_VALUE
    return jnp.asarray(roll)


def major_triad(tonic_midi, degree_semitones):
    root = tonic_midi + degree_semitones
    return [root, root + 4, root + 7]


def minor_triad(tonic_midi, degree_semitones):
    root = tonic_midi + degree_semitones
    return [root, root + 3, root + 7]


def major_progression(tonic_midi):
    """I - IV - V - I in a major key."""
    return [
        major_triad(tonic_midi, 0),
        major_triad(tonic_midi, 5),
        major_triad(tonic_midi, 7),
        major_triad(tonic_midi, 0),
    ]


def minor_progression(tonic_midi):
    """i - iv - V - i (harmonic-minor dominant) in a minor key."""
    return [
        minor_triad(tonic_midi, 0),
        minor_triad(tonic_midi, 5),
        major_triad(tonic_midi, 7),
        minor_triad(tonic_midi, 0),
    ]


@pytest.mark.parametrize("tonic_pc", range(12))
def test_major_key_and_tags(tonic_pc):
    roll = make_roll(major_progression(60 + tonic_pc))
    tags, key_idx, corr = get_chords(roll, return_key=True)
    assert int(key_idx[0]) == KEY_DICT[f"{MAJOR_NAMES[tonic_pc]} major"]
    assert float(corr[0]) > 0.8
    np.testing.assert_array_equal(np.asarray(tags[0]), [1, 4, 5, 1])


@pytest.mark.parametrize("tonic_pc", range(12))
def test_minor_key_and_tags(tonic_pc):
    roll = make_roll(minor_progression(60 + tonic_pc))
    tags, key_idx, corr = get_chords(roll, return_key=True)
    assert int(key_idx[0]) == KEY_DICT[f"{MINOR_NAMES[tonic_pc]} minor"]
    assert float(corr[0]) > 0.8
    np.testing.assert_array_equal(np.asarray(tags[0]), [1, 4, 5, 1])


def test_full_diatonic_walk_in_c_major():
    """I ii iii IV V vi vii° I: every diatonic scale degree is tagged."""
    c = 60
    windows = [
        major_triad(c, 0),
        minor_triad(c, 2),
        minor_triad(c, 4),
        major_triad(c, 5),
        major_triad(c, 7),
        minor_triad(c, 9),
        [c + 11, c + 14, c + 17],  # b diminished
        major_triad(c, 0),
    ]
    tags, key_idx, _ = get_chords(make_roll(windows), return_key=True)
    assert int(key_idx[0]) == KEY_DICT["C major"]
    np.testing.assert_array_equal(
        np.asarray(tags[0]), [1, 2, 3, 4, 5, 6, 7, 1]
    )


def test_chromatic_flat_seven_maps_to_degree_seven():
    """bVII in C major (B-flat major triad) carries the VII letter -> 7,
    matching chord_tag_num's accidental-blind letter collapse."""
    c = 60
    windows = [
        major_triad(c, 0),
        major_triad(c, 0),
        major_triad(c, 10),  # Bb major = bVII
        major_triad(c, 0),
    ]
    tags = get_chords(make_roll(windows))
    assert int(tags[0, 2]) == 7


def test_empty_roll_is_no_key_and_null_tags():
    roll = make_roll([[], [], [], []])
    tags, key_idx, corr = get_chords(roll, return_key=True)
    assert int(key_idx[0]) == KEY_DICT["no key"]
    assert float(corr[0]) == 0.0
    np.testing.assert_array_equal(np.asarray(tags[0]), [0, 0, 0, 0])


def test_silent_window_gets_null_tag():
    # I - silence - IV - I: the F rules out a G-major reading (C-?-G-C is
    # genuinely ambiguous — a Krumhansl finder may hear IV-?-I-IV in G).
    c = 60
    windows = [major_triad(c, 0), [], major_triad(c, 5), major_triad(c, 0)]
    tags = get_chords(make_roll(windows))
    np.testing.assert_array_equal(np.asarray(tags[0]), [1, 0, 4, 1])


def test_given_key_overrides_detection():
    """Scoring C-major content against a given A-minor key (profile row
    12 + 9): the C major triad is a flat-third root -> III -> 3."""
    c = 60
    windows = [major_triad(c, 0)] * 4
    tags = get_chords(make_roll(windows), given_key=12 + 9)
    np.testing.assert_array_equal(np.asarray(tags[0]), [3, 3, 3, 3])


def test_batched_rolls_tag_independently():
    r1 = make_roll(major_progression(60))        # C major
    r2 = make_roll(minor_progression(60 + 9))    # a minor
    both = jnp.concatenate([r1, r2], axis=0)
    tags, key_idx, _ = get_chords(both, return_key=True)
    assert int(key_idx[0]) == KEY_DICT["C major"]
    assert int(key_idx[1]) == KEY_DICT["a minor"]
    np.testing.assert_array_equal(np.asarray(tags[0]), [1, 4, 5, 1])
    np.testing.assert_array_equal(np.asarray(tags[1]), [1, 4, 5, 1])


def test_classify_keys_ignores_out_of_piano_range():
    """Pitches outside the 88-key range are background (piano_like)."""
    roll = np.full((1, 3, 128, 512), -1.0, np.float32)
    roll[0, 0, 5, :] = NOTE_VALUE      # below MIN_PIANO: must be ignored
    roll[0, 0, 120, :] = NOTE_VALUE    # above MAX_PIANO: must be ignored
    _, key_idx, corr = get_chords(jnp.asarray(roll), return_key=True)
    assert int(key_idx[0]) == KEY_DICT["no key"]


def test_octave_invariance():
    """The same progression two octaves apart yields identical tags/key."""
    lo = make_roll(major_progression(48))
    hi = make_roll(major_progression(84))
    t_lo, k_lo, _ = get_chords(lo, return_key=True)
    t_hi, k_hi, _ = get_chords(hi, return_key=True)
    assert int(k_lo[0]) == int(k_hi[0]) == KEY_DICT["C major"]
    np.testing.assert_array_equal(np.asarray(t_lo), np.asarray(t_hi))


def test_seventh_templates_fix_dominant_seventh_tagging():
    """Divergence class 2 made testable: a dominant seventh (G7 in C) can
    fool triad-only matching toward the vii-degree diminished triad (shared
    tritone); the opt-in seventh templates keep the root on the dominant
    -> degree 5, matching music21's letter collapse of 'V7'."""
    c = 60
    g7 = [c + 7, c + 11, c + 14, c + 17]   # G B D F
    windows = [
        major_triad(c, 0),
        major_triad(c, 5),
        g7,
        major_triad(c, 0),
    ]
    roll = make_roll(windows)
    tags7 = get_chords(roll, templates="sevenths")
    np.testing.assert_array_equal(np.asarray(tags7[0]), [1, 4, 5, 1])
    # both settings agree on plain triad progressions
    plain = make_roll(major_progression(60))
    np.testing.assert_array_equal(
        np.asarray(get_chords(plain)),
        np.asarray(get_chords(plain, templates="sevenths")),
    )


def test_seventh_templates_minor_seventh_root():
    """ii7 in C (D F A C) must tag degree 2 under seventh templates."""
    c = 60
    ii7 = [c + 2, c + 5, c + 9, c + 12]
    windows = [major_triad(c, 0), ii7, major_triad(c, 7), major_triad(c, 0)]
    tags = get_chords(make_roll(windows), templates="sevenths")
    assert int(tags[0, 1]) == 2, np.asarray(tags[0])
