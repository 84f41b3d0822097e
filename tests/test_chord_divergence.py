"""Regression guard for the chord-divergence study facts (rules/chord.py
docstring numbers; scripts/chord_divergence_study.py over all 24 keys).

Reduced corpus here (4 keys) so the fast tier keeps the invariants pinned:
  * class 1: zero window-boundary flips for straddles <= 32 cols (triads);
  * class 2: seventh templates tag all V7 windows 5; triad templates mistag
    some as 7; zero template-set flips on clean triad material;
  * class 4: passing-tone ornaments cause zero flips.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from chord_divergence_study import (  # noqa: E402
    MAJOR_PROGS,
    MAJOR_SCALE,
    MINOR_PROGS,
    MINOR_SCALE,
    majority_truth,
    render,
)

from rule_guided_music_tpu.rules.chord import get_chords  # noqa: E402

TONICS = [48, 50, 53, 55]        # C, D, F, G


def _small_corpus(offset=0, sevenths=False, passing=False, seed=0,
                  minor=False):
    rng = np.random.default_rng(seed)
    scale = MINOR_SCALE if minor else MAJOR_SCALE
    progs = MINOR_PROGS if minor else MAJOR_PROGS
    rolls, truths, keys = [], [], []
    for tonic in TONICS:
        for prog in progs:
            sev = {i for i, d in enumerate(prog) if d == 5} if sevenths \
                else set()
            roll, truth = render(prog, tonic, scale, offset=offset,
                                 sevenths_on=sev, passing=passing, rng=rng)
            rolls.append(roll)
            truths.append(majority_truth(truth))
            keys.append(tonic % 12 + (12 if minor else 0))
    return (jnp.asarray(np.stack(rolls)), np.stack(truths),
            jnp.asarray(np.array(keys, dtype=np.int32)))


def test_no_boundary_flips_up_to_32_cols_triads():
    for off in (0, 16, 32):
        rolls, truth, keys = _small_corpus(offset=off)
        tags = np.asarray(get_chords(rolls, given_key=keys))
        valid = tags != 0
        assert ((tags == truth) | ~valid).all(), off


def test_major_v7_windows_correct_under_both_template_sets():
    rolls, truth, keys = _small_corpus(sevenths=True)
    v7 = truth == 5
    tri = np.asarray(get_chords(rolls, given_key=keys))[v7]
    sev = np.asarray(get_chords(rolls, given_key=keys,
                                templates="sevenths"))[v7]
    assert (tri == 5).all()
    assert (sev == 5).all()


def test_seventh_templates_fix_minor_v7_windows():
    """Natural-minor v7's upper three notes ARE the VII triad: triad
    templates tag every minor v7 window 7; seventh templates fix all."""
    rolls, truth, keys = _small_corpus(sevenths=True, minor=True)
    v7 = truth == 5
    assert v7.any()
    tri = np.asarray(get_chords(rolls, given_key=keys))[v7]
    sev = np.asarray(get_chords(rolls, given_key=keys,
                                templates="sevenths"))[v7]
    assert (tri == 7).all()                      # the documented mistag
    assert (sev == 5).all()                      # sevenths: all correct


def test_template_sets_agree_on_clean_triads():
    rolls, truth, keys = _small_corpus()
    tri = np.asarray(get_chords(rolls, given_key=keys))
    sev = np.asarray(get_chords(rolls, given_key=keys,
                                templates="sevenths"))
    np.testing.assert_array_equal(tri, sev)
    np.testing.assert_array_equal(tri, truth)


def test_passing_tones_do_not_flip_tags():
    rolls_c, _, keys = _small_corpus()
    rolls_p, _, _ = _small_corpus(passing=True, seed=1)
    clean = np.asarray(get_chords(rolls_c, given_key=keys))
    orn = np.asarray(get_chords(rolls_p, given_key=keys))
    np.testing.assert_array_equal(clean, orn)
