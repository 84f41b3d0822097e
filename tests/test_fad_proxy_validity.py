"""FAD-proxy validity envelope: corruption monotonicity.

The in-environment proxy (eval/fad.py compute_fad_proxy — additive synth +
log-mel Fréchet) is NOT the reference's VGGish FAD (music_evaluation/
fad.py:12-38) and is uncalibrated against it.  What makes it usable for
relative comparisons is tested here: its score must increase monotonically
as a sample set is progressively corrupted away from the background
distribution (pitch jitter and timing jitter, three severity levels), and
a held-out clean set must score below every corrupted level.
"""

import numpy as np
import pytest

from rule_guided_music_tpu.data.midi_io import MidiData, Note, write_midi
from rule_guided_music_tpu.eval.fad import compute_fad_proxy

SCALE = [60, 62, 64, 65, 67, 69, 71, 72]     # C major


def _clip(rng) -> MidiData:
    """~8 s structured clip: scale notes on a rhythmic grid, 3 voices."""
    notes = []
    t = 0.0
    root = int(rng.choice([0, 3, 5]))
    while t < 8.0:
        dur = float(rng.choice([0.25, 0.5, 0.5, 1.0]))
        for v in range(3):
            p = SCALE[(root + 2 * v + int(rng.integers(0, 2))) % len(SCALE)]
            notes.append(Note(velocity=int(rng.integers(60, 100)), pitch=p,
                              start=t, end=t + dur))
        t += dur
    return MidiData(notes=notes)


def _corrupt(midi: MidiData, severity: float, rng) -> MidiData:
    """Pitch jitter (random semitone offsets) + timing jitter, scaled by
    severity in [0, 1]."""
    notes = []
    for n in midi.notes:
        pitch = n.pitch
        if rng.random() < severity:
            pitch = int(np.clip(pitch + rng.integers(-6, 7), 21, 108))
        jitter = float(rng.normal(0.0, 0.15 * severity))
        start = max(n.start + jitter, 0.0)
        notes.append(Note(velocity=n.velocity, pitch=pitch, start=start,
                          end=start + (n.end - n.start)))
    return MidiData(notes=notes)


def _write_set(midis, directory, tag):
    paths = []
    for i, m in enumerate(midis):
        p = str(directory / f"{tag}_{i}.midi")
        write_midi(p, m)
        paths.append(p)
    return paths


@pytest.mark.slow
def test_fad_proxy_monotone_under_corruption(tmp_path):
    rng = np.random.default_rng(0)
    n = 12
    background = [_clip(rng) for _ in range(n)]
    heldout = [_clip(rng) for _ in range(n)]

    bg_paths = _write_set(background, tmp_path, "bg")
    scores = {"clean": compute_fad_proxy(
        bg_paths, _write_set(heldout, tmp_path, "clean"))}
    for severity in (0.25, 0.5, 1.0):
        corrupted = [_corrupt(m, severity, rng) for m in heldout]
        scores[severity] = compute_fad_proxy(
            bg_paths, _write_set(corrupted, tmp_path, f"sev{severity}"))

    assert scores["clean"] < scores[0.25] < scores[0.5] < scores[1.0], scores
    # clean-vs-clean sits well below heavy corruption; the baseline is
    # nonzero and sizable at small N (12 clips x 128-dim embeddings make a
    # noisy, rank-deficient covariance) — measured ratio ~0.33
    assert scores["clean"] < 0.5 * scores[1.0], scores


def test_fad_proxy_zero_for_identical_sets(tmp_path):
    rng = np.random.default_rng(1)
    midis = [_clip(rng) for _ in range(8)]
    paths = _write_set(midis, tmp_path, "same")
    score = compute_fad_proxy(paths, paths)
    assert score == pytest.approx(0.0, abs=1e-3)
