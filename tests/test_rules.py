"""Golden tests for rule programs (SURVEY.md §4 fixture (b))."""

import jax.numpy as jnp
import numpy as np
import pytest

from rule_guided_music_tpu.rules import FUNC_DICT, LOSS_DICT, chord, tensor_rules


def make_roll(batch=1, length=1024, notes=(), velocity=100):
    """Build a normalized (B,3,128,L) roll. notes = [(pitch, start, end)]."""
    roll = np.zeros((batch, 3, 128, length), dtype=np.float32)
    for pitch, start, end in notes:
        roll[:, 0, pitch, start:end] = velocity
        roll[:, 1, pitch, start] = 127
    return jnp.asarray(roll / 63.5 - 1.0)


def test_piano_like_masks_out_of_range():
    x = jnp.ones((1, 1, 128, 4))
    out = tensor_rules.piano_like(x)
    assert float(out[0, 0, 20, 0]) == -1.0
    assert float(out[0, 0, 21, 0]) == 1.0
    assert float(out[0, 0, 108, 0]) == 1.0
    assert float(out[0, 0, 109, 0]) == -1.0


def test_pitch_hist_single_note():
    # A single C4 (pitch 60, pc 0) -> all mass in bin 0.
    roll = make_roll(notes=[(60, 0, 100)])
    hist = tensor_rules.total_pitch_class_histogram(roll)
    assert hist.shape == (1, 12)
    np.testing.assert_allclose(hist[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(hist[0, 1:], 0.0, atol=1e-6)


def test_pitch_hist_proportions():
    # C (pc 0) for 300 cols at velocity v, G (pc 7) for 100 cols -> 3:1 ratio.
    roll = make_roll(notes=[(60, 0, 300), (67, 0, 100)])
    hist = np.asarray(tensor_rules.total_pitch_class_histogram(roll))
    assert hist[0, 0] == pytest.approx(0.75, abs=1e-5)
    assert hist[0, 7] == pytest.approx(0.25, abs=1e-5)


def test_pitch_hist_mod12_fold():
    # Same pc from different octaves accumulates into one bin.
    roll = make_roll(notes=[(48, 0, 50), (60, 0, 50), (72, 0, 50)])
    hist = np.asarray(tensor_rules.total_pitch_class_histogram(roll))
    assert hist[0, 0] == pytest.approx(1.0, abs=1e-5)


def test_pitch_hist_out_of_piano_range_ignored():
    roll = make_roll(notes=[(5, 0, 100)])  # below MIN_PIANO
    hist = np.asarray(tensor_rules.total_pitch_class_histogram(roll))
    # empty histogram (all ~0 after normalization by +1e-12)
    assert hist.sum() < 1e-3


def test_pitch_hist_empty_roll():
    roll = make_roll()
    hist = np.asarray(tensor_rules.total_pitch_class_histogram(roll))
    assert np.isfinite(hist).all() and hist.sum() < 1e-3


def test_note_density_vertical():
    # 3 simultaneous notes for the full first window of 128 cols.
    roll = make_roll(length=256, notes=[(60, 0, 128), (64, 0, 128), (67, 0, 128)])
    nd = np.asarray(tensor_rules.note_density(roll))
    assert nd.shape == (1, 4)  # 2 windows vertical + 2 horizontal
    assert nd[0, 0] == pytest.approx(3.0, abs=1e-5)   # window 1 vertical
    assert nd[0, 1] == pytest.approx(0.0, abs=1e-5)   # window 2 empty
    # horizontal: 1 column (col 0) has onsets in window 1 -> 1/5
    assert nd[0, 2] == pytest.approx(1.0 / 5.0, abs=1e-5)
    assert nd[0, 3] == pytest.approx(0.0, abs=1e-5)


def test_note_density_horizontal_counts_onset_columns():
    # 4 notes starting at distinct columns in window 1 -> horizontal = 4/5.
    notes = [(60, 0, 10), (62, 20, 30), (64, 40, 50), (65, 60, 70)]
    roll = make_roll(length=128, notes=notes)
    nd = np.asarray(tensor_rules.note_density(roll))
    assert nd[0, 1] == pytest.approx(4.0 / 5.0, abs=1e-5)
    # vertical: 40 active columns of 1 note each / 128
    assert nd[0, 0] == pytest.approx(40.0 / 128.0, abs=1e-5)


def test_note_density_simultaneous_onsets_one_column():
    # Chord: 3 notes share one onset column -> horizontal counts 1 column.
    roll = make_roll(length=128, notes=[(60, 5, 50), (64, 5, 50), (67, 5, 50)])
    nd = np.asarray(tensor_rules.note_density(roll, horizontal_scale=1.0))
    assert nd[0, 1] == pytest.approx(1.0, abs=1e-5)


def test_note_density_hr_scale_variants():
    roll = make_roll(length=128, notes=[(60, 0, 10), (62, 20, 30)])
    nd1 = np.asarray(FUNC_DICT["note_density_hr_1"](roll))
    nd2 = np.asarray(FUNC_DICT["note_density_hr_2"](roll))
    assert nd1[0, 1] == pytest.approx(2.0)
    assert nd2[0, 1] == pytest.approx(1.0)


def test_note_density_class_bucketize():
    roll = make_roll(length=256, notes=[(60, 0, 128), (64, 0, 128), (67, 0, 128)])
    cls = np.asarray(tensor_rules.note_density_class(roll))
    # vertical nd 3.0 falls between bounds[1]=2.7578 and bounds[2]=3.61 -> class 2
    assert cls[0, 0] == 2
    assert cls[0, 1] == 0  # empty window -> class 0
    assert cls.dtype.kind in "iu"


def test_note_density_background_threshold():
    # Values just above background (-0.95 < v < binarization cutoff) count as off.
    roll = np.full((1, 3, 128, 128), -1.0, dtype=np.float32)
    roll[0, 0, 60, :] = -0.97  # below background threshold -> clamped to -1
    nd = np.asarray(tensor_rules.note_density(jnp.asarray(roll)))
    assert nd[0, 0] == pytest.approx(0.0, abs=1e-6)


def _chord_notes(root_pitch, quality="maj", start=0, end=128):
    third = 4 if quality == "maj" else 3
    return [
        (root_pitch, start, end),
        (root_pitch + third, start, end),
        (root_pitch + 7, start, end),
    ]


def test_key_detection_c_major():
    # C major scale spread over an excerpt.
    scale = [60, 62, 64, 65, 67, 69, 71, 72]
    notes = [(p, i * 128, (i + 1) * 128) for i, p in enumerate(scale)]
    roll = make_roll(length=1024, notes=notes)
    key_idx, corr, _ = chord.classify_keys(roll)
    assert int(key_idx[0]) == chord.KEY_DICT["C major"]
    assert float(corr[0]) > 0.7


def test_key_detection_a_minor():
    scale = [57, 59, 60, 62, 64, 65, 67, 69]  # A natural minor
    notes = [(p, i * 128, (i + 1) * 128) for i, p in enumerate(scale)]
    roll = make_roll(length=1024, notes=notes)
    key_idx, corr, _ = chord.classify_keys(roll)
    assert int(key_idx[0]) == chord.KEY_DICT["a minor"]


def test_key_detection_minor_progression_not_relative_major():
    """i-VII-VI-V natural-minor progressions must detect the minor key,
    not its relative major (divergence class 3 mitigation: raw KK picked
    the relative major on this material — measured 0.333 minor detection
    before, 1.000 after; scripts/chord_divergence_study.py)."""
    minor_scale = [0, 2, 3, 5, 7, 8, 10]
    for tonic, name in [(9, "a minor"), (4, "e minor"), (2, "d minor")]:
        notes = []
        for i, deg in enumerate([1, 7, 6, 5, 1, 7, 6, 5]):
            root = 48 + tonic + minor_scale[deg - 1]
            third = 3 if deg in (1, 4, 5) else 4      # i/iv/v minor else major
            for p in (root, root + third, root + 7):
                notes.append((p, i * 128, (i + 1) * 128))
        roll = make_roll(length=1024, notes=notes)
        key_idx, _, _ = chord.classify_keys(roll)
        assert int(key_idx[0]) == chord.KEY_DICT[name], name
        # raw KK (disambiguation off) drifts to the relative major here —
        # pin the contrast so the mitigation stays load-bearing
        raw_idx, _, _ = chord.classify_keys(roll,
                                            disambiguate_relative=False)
        assert int(raw_idx[0]) != chord.KEY_DICT[name]


def test_key_detection_empty_is_no_key():
    roll = make_roll(length=1024)
    key_idx, corr, _ = chord.classify_keys(roll)
    assert int(key_idx[0]) == chord.KEY_DICT["no key"]
    assert float(corr[0]) == 0.0


def test_chord_progression_i_iv_v_i():
    # C F G C in C major -> tags [1, 4, 5, 1, ...] over 8 windows.
    notes = (
        _chord_notes(60, "maj", 0, 128)
        + _chord_notes(65, "maj", 128, 256)
        + _chord_notes(67, "maj", 256, 384)
        + _chord_notes(60, "maj", 384, 512)
        # repeat to anchor the key
        + _chord_notes(60, "maj", 512, 640)
        + _chord_notes(65, "maj", 640, 768)
        + _chord_notes(67, "maj", 768, 896)
        + _chord_notes(60, "maj", 896, 1024)
    )
    roll = make_roll(length=1024, notes=notes)
    tags = np.asarray(chord.get_chords(roll))
    assert tags.shape == (1, 8)
    np.testing.assert_array_equal(tags[0], [1, 4, 5, 1, 1, 4, 5, 1])


def test_chord_progression_minor_key():
    # a minor: Am Dm E Am -> i iv v i = [1, 4, 5, 1]
    notes = (
        _chord_notes(57, "min", 0, 128)
        + _chord_notes(62, "min", 128, 256)
        + _chord_notes(64, "min", 256, 384)
        + _chord_notes(57, "min", 384, 512)
    )
    roll = make_roll(length=512, notes=notes)
    tags, key_idx, corr = chord.get_chords(roll, return_key=True)
    assert int(key_idx[0]) == chord.KEY_DICT["a minor"]
    np.testing.assert_array_equal(np.asarray(tags)[0], [1, 4, 5, 1])


def test_chord_progression_empty_windows_are_null():
    notes = _chord_notes(60, "maj", 0, 128)
    roll = make_roll(length=512, notes=notes)
    tags = np.asarray(chord.get_chords(roll))
    assert tags[0, 0] == 1
    np.testing.assert_array_equal(tags[0, 1:], [0, 0, 0])


def test_chord_progression_given_key():
    # Force G major (profile row 7): C chord is IV of G.
    notes = _chord_notes(60, "maj", 0, 128)
    roll = make_roll(length=128, notes=notes)
    tags = np.asarray(chord.get_chords(roll, given_key=7))
    assert tags[0, 0] == 4


def test_chord_batched():
    notes_a = _chord_notes(60, "maj", 0, 1024)
    notes_b = _chord_notes(67, "maj", 0, 1024)
    roll = jnp.concatenate(
        [make_roll(length=1024, notes=notes_a), make_roll(length=1024, notes=notes_b)]
    )
    tags = np.asarray(chord.get_chords(roll))
    assert tags.shape == (2, 8)


def test_loss_dict_contract():
    gen = jnp.asarray([[1, 2, 3, 4]])
    tgt = jnp.asarray([[1, 2, 0, 4]])
    assert float(LOSS_DICT["chord_progression"](gen, tgt)[0]) == pytest.approx(0.25)
    gen_f = jnp.asarray([[0.5, 0.5]])
    tgt_f = jnp.asarray([[0.0, 1.0]])
    assert float(LOSS_DICT["pitch_hist"](gen_f, tgt_f)[0]) == pytest.approx(0.25)


def test_rules_jittable_and_vmappable():
    import jax

    roll = make_roll(batch=4, length=1024, notes=_chord_notes(60))
    jit_hist = jax.jit(tensor_rules.total_pitch_class_histogram)
    jit_nd = jax.jit(tensor_rules.note_density)
    jit_chords = jax.jit(chord.get_chords)
    assert jit_hist(roll).shape == (4, 12)
    assert jit_nd(roll).shape == (4, 16)
    assert jit_chords(roll).shape == (4, 8)


def test_soft_rules_differentiable_and_close_to_hard():
    import jax

    from rule_guided_music_tpu.rules.tensor_rules import (
        note_density,
        soft_note_density,
        soft_pitch_histogram,
        total_pitch_class_histogram,
    )

    roll = make_roll(length=256, notes=[(60, 0, 128), (64, 0, 128), (67, 10, 90)])
    hard = np.asarray(note_density(roll))
    soft = np.asarray(soft_note_density(roll))
    # vertical densities agree closely for clearly-on/off cells
    np.testing.assert_allclose(soft[0, :2], hard[0, :2], atol=0.2)

    hard_h = np.asarray(total_pitch_class_histogram(roll))
    soft_h = np.asarray(soft_pitch_histogram(roll))
    assert np.argmax(hard_h[0]) == np.argmax(soft_h[0])

    # nonzero gradients flow through the soft rules
    def loss(x):
        return soft_note_density(x).sum() + soft_pitch_histogram(x).sum()

    g = jax.grad(loss)(roll)
    assert float(jnp.abs(g).max()) > 0.0


def test_hard_note_density_has_zero_gradient():
    """Why the soft variants exist: the hard rule is piecewise constant."""
    import jax

    from rule_guided_music_tpu.rules.tensor_rules import note_density

    roll = make_roll(length=128, notes=[(60, 0, 64)])
    g = jax.grad(lambda x: note_density(x).sum())(roll)
    assert float(jnp.abs(g).max()) == 0.0


def test_chord_analyzer_randomized_diatonic_progressions():
    """Across random keys and diatonic progressions, the analyzer recovers
    the generating key and the scale degrees of the chord roots."""
    rng = np.random.default_rng(0)
    major_scale = [0, 2, 4, 5, 7, 9, 11]
    triad_quality = ["maj", "min", "min", "maj", "maj", "min", "dim"]
    ok_keys = 0
    ok_tags = 0
    total_tags = 0
    trials = 6
    for trial in range(trials):
        tonic = int(rng.integers(0, 12))
        # tonic-anchored, cadence-heavy progression (a random soup of
        # degrees legitimately resolves to relative keys for ANY
        # Krumhansl-style finder, incl. music21's)
        degrees = np.array(
            [0, 0, 3, 4, 0, int(rng.integers(0, 7)), 4, 0]
        )
        notes = []
        for w, deg in enumerate(degrees):
            root_pc = (tonic + major_scale[deg]) % 12
            root = 48 + root_pc
            third = 4 if triad_quality[deg] == "maj" else 3
            fifth = 6 if triad_quality[deg] == "dim" else 7
            for iv in (0, third, fifth):
                notes.append((root + iv, w * 128, (w + 1) * 128))
        roll = make_roll(length=1024, notes=notes)
        tags, key_idx, corr = chord.get_chords(roll, return_key=True)
        expected_key = chord._MAJOR_PC2KEY[tonic]
        if int(key_idx[0]) == expected_key:
            ok_keys += 1
            expected_tags = degrees + 1
            ok_tags += int((np.asarray(tags)[0] == expected_tags).sum())
            total_tags += len(degrees)
    # Chroma-profile key finding has inherent dominant/relative-key
    # ambiguities (music21's finder shares them); demand a majority of
    # exact recoveries and near-perfect degree tags when the key is right.
    assert ok_keys >= (trials + 1) // 2, f"only {ok_keys}/{trials} keys"
    assert ok_tags / max(total_tags, 1) > 0.9
