"""Quantify the chord analyzer's divergence classes on realistic material.

rules/chord.py documents four divergence classes vs the music21 oracle
(piano_roll_to_chord.py:69-120,278-299); this study puts numbers on the two
that affect SCG selection stability:

  class 1 — window-boundary tagging: chord changes that straddle a 1.28 s
      window can be tagged with either side's numeral.  Measured as the
      tag-flip rate vs the majority-occupancy ground truth while sliding
      the progression's phase across the window (offsets 0..64 columns).
  class 2 — seventh chords: a dominant-seventh chroma shares its tritone
      with the vii° triad and can tag 7 instead of 5 under triad templates.
      Measured as the V7-window tag distribution under "triads" vs
      "sevenths" templates, plus the flip rate the seventh templates induce
      on clean triad material (the cost of switching defaults).

Also measured: passing-tone robustness (class 4) and key-detection accuracy
on the corpus.  Corpus: voice-led diatonic progressions in all 24 keys,
2 windows per chord, with seventh-chord and ornamented variants.

Run: python scripts/chord_divergence_study.py  (CPU fine; results are
     reported in rules/chord.py's module docstring)
"""

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from rule_guided_music_tpu.rules.chord import get_chords

MAJOR_SCALE = [0, 2, 4, 5, 7, 9, 11]
MINOR_SCALE = [0, 2, 3, 5, 7, 8, 10]          # natural minor

# progressions as scale degrees (1-based)
MAJOR_PROGS = [[1, 4, 5, 1], [1, 6, 2, 5], [1, 5, 6, 4]]
MINOR_PROGS = [[1, 4, 5, 1], [1, 6, 3, 7], [1, 7, 6, 5]]

WINDOW = 128                                   # 1.28 s at fs=100
ONSET = 1.0
SUSTAIN = 0.5
BG = -1.0


def triad(scale, degree, seventh=False):
    """Stacked-thirds chord pitch classes for a 1-based scale degree."""
    idx = degree - 1
    pcs = [scale[idx % 7], scale[(idx + 2) % 7], scale[(idx + 4) % 7]]
    if seventh:
        pcs.append(scale[(idx + 6) % 7])
    return pcs


def voice(pcs, tonic, register=60, prev=None):
    """Voice-led absolute pitches: nearest realization to the previous
    chord's mean pitch."""
    center = np.mean(prev) if prev is not None else register
    out = []
    for pc in pcs:
        p = tonic + pc + 12 * round((center - (tonic + pc)) / 12)
        out.append(int(np.clip(p, 24, 102)))
    return sorted(set(out))


def render(chord_seq, tonic, scale, *, cols_per_chord=2 * WINDOW,
           length=8 * WINDOW, offset=0, sevenths_on=(), passing=False,
           rng=None):
    """(3, 128, length) roll of a voiced progression; chord i starts at
    offset + i*cols_per_chord. ``sevenths_on``: degree positions rendered
    with an added seventh."""
    roll = np.full((3, 128, length), BG, dtype=np.float32)
    prev = None
    t = offset
    truth = []                                 # (start, end, degree)
    for i, deg in enumerate(chord_seq * (length // (cols_per_chord
                                                    * len(chord_seq)) + 1)):
        if t >= length:
            break
        pcs = triad(scale, deg, seventh=(i % len(chord_seq)) in sevenths_on)
        pitches = voice(pcs, tonic, prev=prev)
        prev = pitches
        end = min(t + cols_per_chord, length)
        for p in pitches:
            roll[0, p, t:end] = SUSTAIN
            roll[1, p, t] = ONSET
        if passing and rng is not None and end - t > 32:
            # scale-step run in the segment's last 16 columns, one voice
            base = pitches[-1]
            for j, step in enumerate(rng.choice([1, 2], size=2)):
                col = end - 16 + 8 * j
                p = int(np.clip(base + int(step), 24, 102))
                roll[0, p, col:col + 8] = SUSTAIN
                roll[1, p, col] = ONSET
        truth.append((t, end, deg))
        t = end
    return roll, truth


def majority_truth(truth, length=8 * WINDOW):
    """Ground-truth degree per window = chord occupying most columns."""
    out = []
    for w in range(length // WINDOW):
        lo, hi = w * WINDOW, (w + 1) * WINDOW
        occupancy = defaultdict(int)
        for (s, e, d) in truth:
            occupancy[d] += max(0, min(e, hi) - max(s, lo))
        out.append(max(occupancy.items(), key=lambda kv: kv[1])[0])
    return np.array(out)


def corpus(offset=0, sevenths=False, passing=False, seed=0):
    """Rolls + truths + given_keys over all 24 keys x progressions."""
    rng = np.random.default_rng(seed)
    rolls, truths, keys = [], [], []
    for tonic in range(12):
        for minor, scale, progs in [(0, MAJOR_SCALE, MAJOR_PROGS),
                                    (1, MINOR_SCALE, MINOR_PROGS)]:
            for prog in progs:
                sev = {i for i, d in enumerate(prog) if d == 5} \
                    if sevenths else set()
                roll, truth = render(
                    prog, tonic + 48, scale, offset=offset,
                    sevenths_on=sev, passing=passing, rng=rng)
                rolls.append(roll)
                truths.append(majority_truth(truth))
                keys.append(tonic + 12 * minor)
    return (jnp.asarray(np.stack(rolls)), np.stack(truths),
            jnp.asarray(np.array(keys, dtype=np.int32)))


def main():
    print("=== chord divergence study (24 keys x 3 progressions each) ===")

    # --- class 1: window-boundary flips vs phase offset -------------------
    print("\nclass 1 — tag-flip rate vs majority truth, by window offset")
    print("(given_key supplied; flips measure window tagging only)")
    # off=64 is an exact half-window tie: "majority" truth is a coin flip
    # by construction (music21's longest-chord rule is equally arbitrary
    # there), so flips at 64 measure ambiguity, not error
    for templates in ("triads", "sevenths"):
        rates = []
        for off in (0, 8, 16, 32, 48, 56, 64):
            rolls, truth, keys = corpus(offset=off)
            tags = np.asarray(get_chords(rolls, given_key=keys,
                                         templates=templates))
            # exclude windows the offset leaves silent (tag 0 + truth from
            # zero occupancy is undefined at the tail)
            valid = tags != 0
            flips = ((tags != truth) & valid).sum() / max(valid.sum(), 1)
            rates.append((off, float(flips)))
        print(f"  templates={templates}: " + ", ".join(
            f"off={o}: {r:.3f}" for o, r in rates))

    # --- class 2: dominant sevenths ----------------------------------------
    print("\nclass 2 — V7 windows (degree-5 chords rendered with sevenths)")
    rolls, truth, keys = corpus(sevenths=True)
    v7_mask = truth == 5
    for templates in ("triads", "sevenths"):
        tags = np.asarray(get_chords(rolls, given_key=keys,
                                     templates=templates))
        v7 = tags[v7_mask]
        dist = {int(d): round(float((v7 == d).mean()), 3)
                for d in sorted(set(v7.tolist()))}
        print(f"  templates={templates}: tag distribution on V7 windows "
              f"{dist} (correct=5)")

    # cost of switching: flips induced on CLEAN triad material
    rolls_c, truth_c, keys_c = corpus(sevenths=False)
    t_tri = np.asarray(get_chords(rolls_c, given_key=keys_c,
                                  templates="triads"))
    t_sev = np.asarray(get_chords(rolls_c, given_key=keys_c,
                                  templates="sevenths"))
    flip = float((t_tri != t_sev).mean())
    acc_tri = float((t_tri == truth_c).mean())
    acc_sev = float((t_sev == truth_c).mean())
    print(f"  clean-triad corpus: triads-vs-sevenths flip rate {flip:.3f} "
          f"(accuracy triads {acc_tri:.3f}, sevenths {acc_sev:.3f})")

    # --- class 4: passing tones --------------------------------------------
    print("\nclass 4 — passing tones (ornamented vs clean rendering)")
    rolls_p, truth_p, keys_p = corpus(passing=True, seed=1)
    for templates in ("triads", "sevenths"):
        t_clean = np.asarray(get_chords(rolls_c, given_key=keys_c,
                                        templates=templates))
        t_orn = np.asarray(get_chords(rolls_p, given_key=keys_p,
                                      templates=templates))
        print(f"  templates={templates}: ornament flip rate "
              f"{float((t_clean != t_orn).mean()):.3f}, ornamented accuracy "
              f"{float((t_orn == truth_p).mean()):.3f}")

    # --- key detection on the corpus (class 3) ------------------------------
    from rule_guided_music_tpu.rules.chord import (
        _MAJOR_PC2KEY, _MINOR_PC2KEY, classify_keys)

    def key_acc(rolls, keys, disambiguate):
        key_idx, _, _ = classify_keys(
            rolls, disambiguate_relative=disambiguate)
        expect = np.array([
            (_MAJOR_PC2KEY if k < 12 else _MINOR_PC2KEY)[int(k) % 12]
            for k in np.asarray(keys)
        ])
        got = np.asarray(key_idx)
        minor_mask = np.asarray(keys) >= 12
        return (float((got[~minor_mask] == expect[~minor_mask]).mean()),
                float((got[minor_mask] == expect[minor_mask]).mean()))

    print("\nkey detection accuracy (major / natural-minor), raw KK vs "
          "relative-pair disambiguation (classify_keys default):")
    for label, kw in [("clean", {}), ("clean off=48", {"offset": 48}),
                      ("clean off=64 (degenerate tie)", {"offset": 64}),
                      ("sevenths", {"sevenths": True}),
                      ("ornamented", {"passing": True, "seed": 1})]:
        rolls, _, keys = corpus(**kw)
        raw = key_acc(rolls, keys, False)
        fix = key_acc(rolls, keys, True)
        print(f"  {label:30s} raw {raw[0]:.3f}/{raw[1]:.3f} -> "
              f"disambiguated {fix[0]:.3f}/{fix[1]:.3f}")


if __name__ == "__main__":
    main()
